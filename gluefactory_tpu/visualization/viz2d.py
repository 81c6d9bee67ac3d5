"""2D plotting primitives (reference `gluefactory/visualization/viz2d.py`).

Host-side matplotlib; consumes numpy/jax arrays (converted with np.asarray).
Covers images/keypoints/matches/lines/epipolar-lines/heatmaps/cumulative
curves used by training figures and the benchmark inspector.
"""

from __future__ import annotations

import matplotlib
import matplotlib.patheffects as path_effects
import matplotlib.pyplot as plt
import numpy as np

matplotlib.use("Agg")


def cm_RdGn(x):
    """Red-to-green colormap for correctness coloring."""
    x = np.clip(np.asarray(x, float), 0, 1)[..., None] * 2
    c = x * np.array([[0, 1.0, 0]]) + (2 - x) * np.array([[1.0, 0, 0]])
    return np.clip(c, 0, 1)


def cm_RdBl(x):
    """Red-to-blue colormap (reference `viz2d.py:30-35`)."""
    x = np.clip(np.asarray(x, float), 0, 1)[..., None]
    c = x * np.array([[0, 0, 1.0]]) + (1 - x) * np.array([[1.0, 0, 0]])
    return np.clip(c, 0, 1)


def cm_BlRdGn(x_):
    """Blue -> red -> green over [-1, 1] (reference `viz2d.py:44-53`)."""
    x_ = np.asarray(x_, float)
    x = np.clip(x_, 0, 1)[..., None] * 2
    c = x * np.array([[0, 1.0, 0, 1.0]]) + (2 - x) * np.array([[1.0, 0, 0, 1.0]])
    xn = -np.clip(x_, -1, 0)[..., None] * 2
    cn = xn * np.array([[0, 0.1, 1, 1.0]]) + (2 - xn) * np.array([[1.0, 0, 0, 1.0]])
    return np.clip(np.where((x_ < 0)[..., None], cn, c), 0, 1)


def cm_ranking(sc, ths=(512, 1024, 2048, 4096)):
    """Color keypoints by score rank bucket (reference `viz2d.py:16-27`)."""
    sc = np.asarray(sc, float)
    ls = sc.shape[0]
    colors = ["red", "yellow", "lime", "cyan", "blue"]
    out = ["gray"] * ls
    for i, th in reversed(list(enumerate(ths))):
        if th >= ls:
            continue
        out[: min(th, ls)] = [colors[i]] * min(th, ls)
    out[: min(ths[0], ls)] = [colors[0]] * min(ths[0], ls)
    return out


def cm_grad2d(xy):
    """2D position -> color gradient (reference `viz2d.py:55-66`):
    smooth green/red/blue mix over the unit square."""
    xy = np.asarray(xy, float)
    x = np.clip(xy[..., 0], 0, 1)
    y = np.clip(xy[..., 1], 0, 1)
    c = np.stack([x * (1 - y), y, (1 - x) * (1 - y)], -1)
    return np.clip(c, 0, 1)


def plot_image_grid(
    imgs,
    titles=None,
    cmaps="gray",
    dpi=100,
    pad=0.5,
    fig=None,
    adaptive=True,
    figs=2.0,
    return_fig=False,
    set_lim=False,
):
    """Plot a grid of images: imgs is a list of rows, each a list of images
    (reference `viz2d.py:104-158`). Returns axes (and the figure when
    return_fig)."""
    n_rows = len(imgs)
    n_cols = max(len(r) for r in imgs)
    rows = [[np.asarray(im) for im in r] for r in imgs]
    if adaptive:
        ratios = [max(im.shape[1] / im.shape[0] for im in r) for r in rows]
    else:
        ratios = [4 / 3] * n_rows
    figsize = [sum(ratios) * figs / n_rows * n_cols, figs * n_rows]
    if fig is None:
        fig, axarr = plt.subplots(
            n_rows, n_cols, figsize=figsize, dpi=dpi, squeeze=False,
            gridspec_kw={"hspace": pad, "wspace": pad},
        )
    else:
        axarr = np.asarray(fig.subplots(n_rows, n_cols, squeeze=False))
    for r, row in enumerate(rows):
        for c_i in range(n_cols):
            ax = axarr[r][c_i]
            ax.set_axis_off()
            if c_i >= len(row):
                continue
            im = row[c_i]
            if im.ndim == 3 and im.shape[-1] == 1:
                im = im[..., 0]
            cmap = cmaps if isinstance(cmaps, str) else cmaps[c_i]
            ax.imshow(im, cmap=plt.get_cmap(cmap) if im.ndim == 2 else None)
            if set_lim:
                ax.set_xlim([0, im.shape[1]])
                ax.set_ylim([im.shape[0], 0])
            if titles is not None:
                ax.set_title(titles[r][c_i], fontsize=8)
    if return_fig:
        return fig, axarr
    return axarr


def plot_images(imgs, titles=None, cmaps="gray", dpi=100, pad=0.5, adaptive=True):
    """Plot images side by side; returns the figure."""
    imgs = [np.asarray(img) for img in imgs]
    imgs = [img[..., 0] if img.ndim == 3 and img.shape[-1] == 1 else img for img in imgs]
    n = len(imgs)
    if not isinstance(cmaps, (list, tuple)):
        cmaps = [cmaps] * n
    ratios = [i.shape[1] / i.shape[0] for i in imgs] if adaptive else [4 / 3] * n
    figsize = [sum(ratios) * 4.5, 4.5]
    fig, axs = plt.subplots(
        1, n, figsize=figsize, dpi=dpi, gridspec_kw={"width_ratios": ratios}
    )
    if n == 1:
        axs = [axs]
    for i, (img, ax) in enumerate(zip(imgs, axs)):
        ax.imshow(img, cmap=plt.get_cmap(cmaps[i]))
        ax.set_axis_off()
        if titles:
            ax.set_title(titles[i])
    fig.tight_layout(pad=pad)
    return fig, axs


def plot_keypoints(axs, kpts, colors="lime", ps=6, valid=None):
    for ax, k, *rest in zip(axs, kpts, *( [valid] if valid is not None else [] )):
        k = np.asarray(k)
        if valid is not None:
            k = k[np.asarray(rest[0])]
        ax.scatter(k[:, 0], k[:, 1], c=colors, s=ps, linewidths=0)


def plot_matches(ax0, ax1, kpts0, kpts1, color=None, lw=1.0, ps=4, a=0.8):
    """Draw match lines across two axes of the same figure."""
    kpts0 = np.asarray(kpts0)
    kpts1 = np.asarray(kpts1)
    fig = ax0.figure
    if color is None:
        color = ["lime"] * len(kpts0)
    elif isinstance(color, str):
        color = [color] * len(kpts0)
    for i in range(len(kpts0)):
        fig.add_artist(
            matplotlib.patches.ConnectionPatch(
                xyA=kpts0[i],
                coordsA=ax0.transData,
                xyB=kpts1[i],
                coordsB=ax1.transData,
                color=color[i],
                linewidth=lw,
                alpha=a,
                zorder=1,
            )
        )
    ax0.scatter(kpts0[:, 0], kpts0[:, 1], c=color, s=ps)
    ax1.scatter(kpts1[:, 0], kpts1[:, 1], c=color, s=ps)


def plot_lines(axs, lines, line_colors="orange", point_colors="cyan", ps=2, lw=1.5, alpha=1.0):
    """Draw segments (L, 2, 2) on each axis."""
    if isinstance(line_colors, str):
        line_colors = [line_colors] * len(axs)
    for ax, ls, c in zip(axs, lines, line_colors):
        ls = np.asarray(ls)
        for seg in ls:
            ax.plot(seg[:, 0], seg[:, 1], c=c, linewidth=lw, alpha=alpha)
        pts = ls.reshape(-1, 2)
        ax.scatter(pts[:, 0], pts[:, 1], c=point_colors, s=ps, zorder=2)


def plot_color_line_matches(axs, lines_pairs, lw=2.0):
    """Matched lines with a distinct color per match."""
    n = max(len(l) for l in lines_pairs)
    colors = plt.cm.hsv(np.linspace(0, 1, max(n, 1), endpoint=False))
    for ax, ls in zip(axs, lines_pairs):
        for i, seg in enumerate(np.asarray(ls)):
            ax.plot(seg[:, 0], seg[:, 1], c=colors[i % len(colors)], linewidth=lw)


def plot_epipolar_lines(axs, F, pts0, pts1, color="orange", lw=0.8):
    """Epipolar lines of pts0 in image 1 and vice versa. F: x1' F x0 = 0."""
    F = np.asarray(F)

    def draw(ax, lines):
        xlim = ax.get_xlim()
        for a, b, c in lines:
            xs = np.array(xlim)
            if abs(b) > 1e-9:
                ys = -(a * xs + c) / b
                ax.plot(xs, ys, c=color, linewidth=lw, alpha=0.6)

    l1 = (np.c_[np.asarray(pts0), np.ones(len(pts0))] @ F.T)
    l0 = (np.c_[np.asarray(pts1), np.ones(len(pts1))] @ F)
    draw(axs[1], l1)
    draw(axs[0], l0)


def plot_heatmaps(axs, heatmaps, cmap="Spectral_r", a=0.5):
    for ax, h in zip(axs, heatmaps):
        h = np.asarray(h)
        ax.imshow(h, alpha=a, cmap=cmap)


def add_text(ax, text, pos=(0.01, 0.99), fs=15, color="w", lcolor="k", va="top"):
    t = ax.text(
        *pos, text, fontsize=fs, ha="left", va=va, color=color, transform=ax.transAxes
    )
    t.set_path_effects(
        [path_effects.Stroke(linewidth=2, foreground=lcolor), path_effects.Normal()]
    )
    return t


def plot_cumulative(errors: dict, thresholds, colors=None, title="", unit="px", logx=False):
    """Cumulative error curves (reference `viz2d.py:501-545`)."""
    fig, ax = plt.subplots(figsize=[5, 8])
    thresholds = np.linspace(min(thresholds), max(thresholds), 100)
    for name, errs in errors.items():
        errs = np.sort(np.asarray(errs, float))
        errs = errs[np.isfinite(errs)]
        recall = [np.searchsorted(errs, t) / max(len(errs), 1) for t in thresholds]
        ax.plot(thresholds, recall, label=name)
    ax.set_ylim(0, 1)
    if logx:
        ax.set_xscale("log")
    ax.set_xlabel(f"error ({unit})")
    ax.set_ylabel("recall")
    ax.set_title(title)
    ax.legend()
    return fig


def save_plot(path, fig=None, **kw):
    (fig or plt.gcf()).savefig(path, bbox_inches="tight", pad_inches=0, **kw)
