"""RoMa dense matcher, TPU-native from scratch
(reference `gluefactory/models/matchers/roma.py:195-757`, which wraps the
external `romatch` torch package).

A from-scratch JAX implementation of the RoMa architecture (Edstedt et al.,
CVPR 2024): frozen-ViT coarse features + a convnet fine pyramid, a
Gaussian-process coarse matcher regressing Fourier-embedded support
coordinates with a cosine kernel, a coarse match decoder, and local-window
correlation ConvRefiners at successively finer scales, producing a dense
warp in [-1, 1] plus a certainty map. Unlike the reference (inference-only
wrapper around downloaded weights) this model is trainable here end-to-end
(dense EPE + certainty BCE against cached/GT warps).

The gluefactory-fork API surface is reproduced exactly and parity-tested
against the reference wrapper's own torch functions (`tests/test_roma.py`):
  - `match_keypoints_dense` (reference `roma.py:96-195`): COLMAP-coordinate
    keypoints matched through the warp, max_kp_error, mutual NN check,
    certainty threshold, optional cycle-error filter and bidirectional check;
  - `cycle_dist` (reference `utils/image.py:260-270`);
  - symmetric two-direction warps `warp0/warp1`, `certainty0/1` keys;
  - `sample_matches` balanced dense sampling (`roma.py:478-540`).

TPU-first choices (not a port of romatch):
  - the symmetric pass runs the backbone ONCE on the (2B) stacked views and
    evaluates GP + refiners batched over both directions — no duplicate
    backbone work, full MXU tiles;
  - fixed internal resolution -> every shape static under jit;
  - GP solve via Cholesky on (hw_s, hw_s) kernels (MXU matmuls + triangular
    solve), not data-dependent sampling;
  - local correlation as one batched bilinear gather over the (2r+1)^2
    offset window, contracted on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..base_model import BaseModel

__main_class__ = "RoMa"


# ---------------------------------------------------------------------------
# Coordinate / sampling utilities (reference `utils/image.py:164-270`)
# ---------------------------------------------------------------------------


def normalize_coords(coords: jnp.ndarray, hw) -> jnp.ndarray:
    """COLMAP pixel coords (x, y) -> [-1, 1] (reference `image.py:250-257`)."""
    h, w = hw
    x = coords[..., 0] / (w - 1) * 2 - 1
    y = coords[..., 1] / (h - 1) * 2 - 1
    return jnp.stack([x, y], axis=-1)


def denormalize_coords(coords: jnp.ndarray, hw) -> jnp.ndarray:
    """[-1, 1] -> COLMAP pixel coords (reference `image.py:240-247`)."""
    h, w = hw
    x = (coords[..., 0] + 1) / 2 * (w - 1)
    y = (coords[..., 1] + 1) / 2 * (h - 1)
    return jnp.stack([x, y], axis=-1)


def grid_sample_nhwc(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with torch `F.grid_sample(align_corners=False,
    padding_mode="zeros")` semantics. img: (B, H, W, C); coords: (B, ..., 2)
    in [-1, 1] as (x, y). Returns (B, ..., C)."""
    B, H, W, C = img.shape
    lead = coords.shape[1:-1]
    xy = coords.reshape(B, -1, 2)
    x = ((xy[..., 0] + 1) * W - 1) / 2
    y = ((xy[..., 1] + 1) * H - 1) / 2
    x0, y0 = jnp.floor(x), jnp.floor(y)
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            xi, yi = x0 + dx, y0 + dy
            wgt = (1 - jnp.abs(x - xi)) * (1 - jnp.abs(y - yi))
            inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yi_c, xi_c)
            out = out + vals * (wgt * inside)[..., None]
    return out.reshape(B, *lead, C)


def pixel_grid_normalized(h: int, w: int) -> jnp.ndarray:
    """(h, w, 2) grid of [-1, 1] coords at pixel centers, matching the
    reference `get_pixel_grid(normalized=True)` (linspace -1+1/n .. 1-1/n)."""
    ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h)
    xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def cycle_dist(q_to_r: jnp.ndarray, r_to_q: jnp.ndarray) -> jnp.ndarray:
    """Cycle-consistency error in target pixels (reference
    `image.py:260-270`). q_to_r/r_to_q: (B, h, w, 2) warps in [-1, 1]."""
    B, h, w, _ = q_to_r.shape
    back = grid_sample_nhwc(r_to_q, q_to_r)  # (B, h, w, 2)
    # the reference compares a +0.5 pixel-center grid (`get_pixel_grid`,
    # `image.py:214-219`) against the (w-1)-scaled denormalization —
    # reproduced as-is for parity
    gx, gy = jnp.meshgrid(jnp.arange(w) + 0.5, jnp.arange(h) + 0.5)
    grid = jnp.stack([gx, gy], axis=-1)[None]
    return jnp.linalg.norm(grid - denormalize_coords(back, (h, w)), axis=-1)


# ---------------------------------------------------------------------------
# Sparse keypoint matching through the dense warp (reference `roma.py:96-195`)
# ---------------------------------------------------------------------------


def match_keypoints_dense(
    pred: dict,
    data: dict,
    max_kp_error: float,
    filter_threshold: float,
    cycle_error_threshold: float | None = None,
    require_bidirectional_match: bool = False,
    mutual_check: bool = True,
) -> dict:
    """Match existing keypoints via the dense warps, reproducing the
    reference's `match_keypoints_dense` exactly (COLMAP coords, nearest
    warped point, max_kp_error px gate, mutual NN, certainty threshold,
    optional cycle filter + bidirectional sparse check)."""
    kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
    hw0 = data["view0"]["image"].shape[-3:-1]
    hw1 = data["view1"]["image"].shape[-3:-1]

    def find(kq, kt, warp, cert, q_hw, t_hw, cyc, vq, vt):
        kqn = normalize_coords(kq, q_hw)[:, :, None]  # (B, N, 1, 2)
        q_to_t = grid_sample_nhwc(warp, kqn)[:, :, 0]  # (B, N, 2)
        scores = grid_sample_nhwc(cert[..., None], kqn)[:, :, 0, 0]
        kq_to_t = denormalize_coords(q_to_t, t_hw)
        d2 = jnp.sum(
            (kq_to_t[:, :, None] - kt[:, None, :]) ** 2, -1
        )  # (B, N, M)
        big = jnp.float32(1e18)
        if vt is not None:
            d2 = jnp.where(vt[:, None, :], d2, big)
        matches = jnp.argmin(d2, -1)
        mdist = jnp.sqrt(jnp.min(d2, -1))
        valid = jnp.isfinite(mdist) & (mdist < max_kp_error)
        if mutual_check:
            rev = jnp.argmin(d2, -2)  # (B, M) best query per target
            mutual = (
                jnp.take_along_axis(rev, matches, axis=1)
                == jnp.arange(matches.shape[-1])[None]
            )
            valid = valid & mutual
        valid = valid & (scores > filter_threshold)
        if cycle_error_threshold is not None and cyc is not None:
            cs = grid_sample_nhwc(cyc[..., None], kqn)[:, :, 0, 0]
            valid = valid & jnp.isfinite(cs) & (cs < cycle_error_threshold)
        if vq is not None:
            valid = valid & vq
        return jnp.where(valid, matches, -1), jnp.where(valid, scores, 0.0)

    v0 = data.get("keypoint_valid0")
    v1 = data.get("keypoint_valid1")
    m0, s0 = find(
        kpts0, kpts1, pred["warp0"], pred["certainty0"], hw0, hw1,
        pred.get("cycle_error0"), v0, v1,
    )
    m1, s1 = find(
        kpts1, kpts0, pred["warp1"], pred["certainty1"], hw1, hw0,
        pred.get("cycle_error1"), v1, v0,
    )
    if require_bidirectional_match:
        n0 = kpts0.shape[1]
        n1 = kpts1.shape[1]
        mut0 = (
            jnp.take_along_axis(m1, jnp.clip(m0, 0, n1 - 1), 1)
            == jnp.arange(n0)[None]
        )
        mut1 = (
            jnp.take_along_axis(m0, jnp.clip(m1, 0, n0 - 1), 1)
            == jnp.arange(n1)[None]
        )
        ok0 = (m0 >= 0) & mut0
        ok1 = (m1 >= 0) & mut1
        m0, s0 = jnp.where(ok0, m0, -1), jnp.where(ok0, s0, 0.0)
        m1, s1 = jnp.where(ok1, m1, -1), jnp.where(ok1, s1, 0.0)
    return {
        "matches0": m0,
        "matches1": m1,
        "matching_scores0": s0,
        "matching_scores1": s1,
        "keypoints0": kpts0,
        "keypoints1": kpts1,
    }


# ---------------------------------------------------------------------------
# Model components
# ---------------------------------------------------------------------------


class FinePyramid(nn.Module):
    """VGG-style fine feature pyramid (romatch uses VGG19 slices; scales
    1/1 .. 1/8). Returns {1: f1, 2: f2, 4: f4, 8: f8} (stride -> NHWC)."""

    dim: int = 32
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        feats = {}
        d = self.dim
        x = x.astype(dt)
        for s, (ch, reps) in zip(
            (1, 2, 4, 8), ((d, 1), (d * 2, 2), (d * 4, 2), (d * 8, 2))
        ):
            for r in range(reps):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt,
                            name=f"s{s}_conv{r}")(x)
                x = nn.GroupNorm(num_groups=min(8, ch), dtype=dt,
                                 name=f"s{s}_norm{r}")(x)
                x = nn.relu(x)
            feats[s] = x
            if s < 8:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def fourier_coord_embedding(coords: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Embed [-1, 1] coords into `dim` Fourier features (romatch embeds the
    GP regression targets; cos/sin at geometric frequencies)."""
    n = dim // 4
    freqs = jnp.pi * (2.0 ** jnp.arange(n))
    ang = coords[..., None] * freqs  # (..., 2, n)
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # (..., 2, 2n)
    return emb.reshape(*coords.shape[:-1], 4 * n)


class GPMatcher(nn.Module):
    """Cosine-kernel GP coarse matcher (romatch `GP`/`CosKernel`): posterior
    mean of Fourier-embedded support coordinates given feature similarity,
      mu_q = K_qs (K_ss + sigma^2 I)^-1 E_s,
    K(x, y) = exp((cos(x, y) - 1) / T). Cholesky solve; all MXU matmuls."""

    embed_dim: int = 64
    temperature: float = 0.2
    sigma_noise: float = 0.1

    @nn.compact
    def __call__(self, f_q, f_s):
        B, hq, wq, C = f_q.shape
        hs, ws = f_s.shape[1:3]
        q = f_q.reshape(B, hq * wq, C).astype(jnp.float32)
        s = f_s.reshape(B, hs * ws, C).astype(jnp.float32)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-6)
        k_qs = jnp.exp((jnp.einsum("bnc,bmc->bnm", q, s) - 1) / self.temperature)
        k_ss = jnp.exp((jnp.einsum("bnc,bmc->bnm", s, s) - 1) / self.temperature)
        eye = jnp.eye(hs * ws) * self.sigma_noise**2
        chol = jnp.linalg.cholesky(k_ss + eye[None])
        coords_s = pixel_grid_normalized(hs, ws).reshape(-1, 2)
        e_s = fourier_coord_embedding(coords_s, self.embed_dim)  # (hw_s, De)
        e_s = jnp.broadcast_to(e_s[None], (B, hs * ws, e_s.shape[-1]))
        alpha = jax.scipy.linalg.cho_solve((chol, True), e_s)
        mu = jnp.einsum("bnm,bmd->bnd", k_qs, alpha)
        return mu.reshape(B, hq, wq, self.embed_dim)


class MatchDecoder(nn.Module):
    """Coarse decoder: (query features, GP embedding) -> initial flow
    residual + certainty logit (romatch's anchor decoder, realized as a
    regression head — TPU-first: no data-dependent anchor argmax)."""

    hidden: int = 128
    depth: int = 3
    dtype: str = "float32"

    @nn.compact
    def __call__(self, f_q, gp_emb):
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = jnp.concatenate([f_q.astype(dt), gp_emb.astype(dt)], axis=-1)
        for i in range(self.depth):
            x = nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=dt,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, dtype=dt, name=f"norm{i}")(x)
            x = nn.relu(x)
        out = nn.Conv(3, (1, 1), name="head")(x.astype(jnp.float32))
        h, w = f_q.shape[1:3]
        base = pixel_grid_normalized(h, w)[None]
        flow = base + 0.1 * jnp.tanh(out[..., :2])
        return flow, out[..., 2]


class ConvRefiner(nn.Module):
    """One refinement level (romatch `ConvRefiner`): local-window correlation
    around the current warp + stacked features -> (delta flow, delta cert).

    The correlation gathers support features at flow + the (2r+1)^2 offset
    window with ONE batched bilinear sample, then contracts against the
    query features on the MXU."""

    hidden: int = 64
    depth: int = 3
    window: int = 3  # radius in support pixels
    disp_scale: float = 0.05
    dtype: str = "float32"

    @nn.compact
    def __call__(self, f_q, f_s, flow, cert):
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        B, h, w, C = f_q.shape
        hs, ws = f_s.shape[1:3]
        r = self.window
        k = 2 * r + 1
        # offsets in normalized support coords
        dx = jnp.arange(-r, r + 1) * (2.0 / ws)
        dy = jnp.arange(-r, r + 1) * (2.0 / hs)
        gx, gy = jnp.meshgrid(dx, dy)
        offs = jnp.stack([gx, gy], -1).reshape(-1, 2)  # (k^2, 2)
        coords = flow[:, :, :, None, :] + offs[None, None, None]
        samples = grid_sample_nhwc(f_s, coords)  # (B, h, w, k^2, C)
        corr = jnp.einsum(
            "bhwc,bhwkc->bhwk",
            f_q.astype(jnp.float32),
            samples.astype(jnp.float32),
        ) / jnp.sqrt(jnp.float32(C))
        center = samples[:, :, :, (k * k) // 2]
        x = jnp.concatenate(
            [
                f_q.astype(dt),
                center.astype(dt),
                corr.astype(dt),
                flow.astype(dt),
                cert[..., None].astype(dt),
            ],
            axis=-1,
        )
        for i in range(self.depth):
            x = nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=dt,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, dtype=dt, name=f"norm{i}")(x)
            x = nn.relu(x)
        out = nn.Conv(3, (1, 1), name="head")(x.astype(jnp.float32))
        flow = flow + self.disp_scale * jnp.tanh(out[..., :2])
        cert = cert + out[..., 2]
        return flow, cert


def _resize(x, h, w, method="bilinear"):
    B = x.shape[0]
    C = x.shape[-1]
    return jax.image.resize(x, (B, h, w, C), method=method)


class RoMa(BaseModel):
    default_conf = {
        # coarse backbone: any registered model emitting dense `features`
        # (default: the from-scratch DINOv2; tests use a tiny custom preset)
        "backbone": {"name": "backbones.dinov2", "preset": "dinov2_vits14"},
        "freeze_backbone": True,
        "fine_dim": 32,
        "gp_embed_dim": 64,
        "gp_temperature": 0.2,
        "gp_sigma": 0.1,
        "decoder_hidden": 128,
        "refine_scales": [8, 4, 2],  # fine-pyramid strides, coarse -> fine
        "refiner_hidden": 64,
        "refiner_window": 3,
        "dtype": "float32",
        # reference wrapper conf keys (`roma.py:297-318`)
        "symmetric": True,
        "internal_hw": (224, 224),
        "output_hw": None,  # None = like input image
        "mixed_precision": False,
        "add_cycle_error": False,
        "sample_num_matches": 0,
        "filter_threshold": 0.05,
        "cycle_error_threshold": None,
        "require_bidirectional_match": False,
        "max_kp_error": 2.0,
        "mutual_check": True,
        "weights": None,
    }
    required_data_keys = ("view0", "view1")
    open_conf_keys = ("backbone",)

    def setup(self):
        from .. import get_model

        c = self.conf
        self.backbone = get_model(c.backbone.name).from_conf(
            dict(c.backbone, name=None)
        )
        self.fine = FinePyramid(c.fine_dim, c.dtype, name="fine")
        self.gp = GPMatcher(
            c.gp_embed_dim, float(c.gp_temperature), float(c.gp_sigma), name="gp"
        )
        self.decoder = MatchDecoder(c.decoder_hidden, dtype=c.dtype, name="decoder")
        self.refiners = [
            ConvRefiner(
                c.refiner_hidden,
                window=int(c.refiner_window),
                dtype=c.dtype,
                name=f"refiner_s{s}",
            )
            for s in c.refine_scales
        ]

    def _normalize_rgb(self, img):
        if img.shape[-1] == 1:
            img = jnp.repeat(img, 3, axis=-1)
        mean = jnp.asarray([0.485, 0.456, 0.406], img.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], img.dtype)
        return (img - mean) / std

    def _estimate(self, img_q, img_s):
        """Dense warp query->support at internal resolution. Returns
        (flow (B, h, w, 2) in [-1, 1], certainty logits (B, h, w))."""
        c = self.conf
        ih, iw = c.internal_hw
        q = _resize(self._normalize_rgb(img_q), ih, iw)
        s = _resize(self._normalize_rgb(img_s), ih, iw)
        both = jnp.concatenate([q, s], axis=0)  # one backbone pass
        coarse = self.backbone({"image": both}, train=False)["features"]
        if c.freeze_backbone:
            coarse = jax.lax.stop_gradient(coarse)
        fine = self.fine(both)
        B = img_q.shape[0]

        def split(x):
            return x[:B], x[B:]

        cq, cs = split(coarse)
        gp_emb = self.gp(cq, cs)
        flow, cert = self.decoder(cq, gp_emb)
        for s_, refiner in zip(c.refine_scales, self.refiners):
            fq, fs = split(fine[s_])
            h, w = fq.shape[1:3]
            flow = _resize(flow, h, w)
            cert = _resize(cert[..., None], h, w)[..., 0]
            flow, cert = refiner(fq, fs, flow, cert)
        return flow, cert

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        img0, img1 = data["view0"]["image"], data["view1"]["image"]
        # symmetric pass: both directions stacked along the batch
        # (reference `estimate_warp_symmetric`; romatch runs the backbone on
        # the stacked pair too — here the whole decoder stack is stacked)
        if c.symmetric:
            fl, ce = self._estimate(
                jnp.concatenate([img0, img1], 0), jnp.concatenate([img1, img0], 0)
            )
            B = img0.shape[0]
            flow01, flow10 = fl[:B], fl[B:]
            cert01, cert10 = ce[:B], ce[B:]
        else:
            flow01, cert01 = self._estimate(img0, img1)
            flow10, cert10 = self._estimate(img1, img0)

        def finalize(flow, cert, out_hw):
            h, w = out_hw
            flow = _resize(flow, h, w)
            cert = _resize(cert[..., None], h, w)[..., 0]
            # out-of-bounds targets get zero certainty, warp clamped
            # (reference `flow_to_warp`, `roma.py:44-92`)
            oob = jnp.any(jnp.abs(flow) > 1, axis=-1)
            prob = jax.nn.sigmoid(cert) * (1.0 - oob)
            return jnp.clip(flow, -1, 1), prob

        hw0 = c.output_hw or img0.shape[-3:-1]
        hw1 = c.output_hw or img1.shape[-3:-1]
        w0, p0 = finalize(flow01, cert01, hw0)
        w1, p1 = finalize(flow10, cert10, hw1)
        pred = {
            "warp0": w0,
            "certainty0": p0,
            "warp1": w1,
            "certainty1": p1,
        }
        if train:
            pred["certainty_logits0"] = _resize(cert01[..., None], *hw0)[..., 0] \
                if cert01.shape[1:3] != tuple(hw0) else cert01
            pred["certainty_logits1"] = _resize(cert10[..., None], *hw1)[..., 0] \
                if cert10.shape[1:3] != tuple(hw1) else cert10
        if c.add_cycle_error:
            pred["cycle_error0"] = cycle_dist(pred["warp0"], pred["warp1"])
            pred["cycle_error1"] = cycle_dist(pred["warp1"], pred["warp0"])
        if c.sample_num_matches > 0:
            pred.update(self.sample_matches(pred, c.sample_num_matches))
        elif "keypoints0" in data:
            pred.update(
                match_keypoints_dense(
                    pred,
                    data,
                    float(c.max_kp_error),
                    float(c.filter_threshold),
                    c.cycle_error_threshold,
                    bool(c.require_bidirectional_match),
                    bool(c.mutual_check),
                )
            )
        return pred

    @nn.nowrap
    def sample_matches(self, pred: dict, num: int) -> dict:
        """Fixed-size dense match sampling (reference `sample_matches`,
        `roma.py:478-540`, "threshold_balanced"): certainty-weighted top
        picks over the dense warp, emitted as padded keypoint pairs."""
        w0, p0 = pred["warp0"], pred["certainty0"]
        B, h, w, _ = w0.shape
        grid = pixel_grid_normalized(h, w)[None]
        score = p0.reshape(B, -1)
        # threshold_balanced: clamp confident scores to the threshold so the
        # sample spreads over all confident regions
        bal = jnp.minimum(score, 0.9)
        idx = jax.lax.top_k(bal, num)[1]  # (B, num)
        take = lambda a: jnp.take_along_axis(
            a.reshape(B, h * w, -1), idx[..., None], axis=1
        )
        q = take(jnp.broadcast_to(grid, w0.shape))
        t = take(w0)
        s = jnp.take_along_axis(score, idx, axis=1)
        return {
            "sampled_keypoints0": denormalize_coords(q, (h, w)),
            "sampled_keypoints1": denormalize_coords(t, (h, w)),
            "sampled_scores": s,
        }

    def loss(self, pred: dict, data: dict):
        """Dense supervision (romatch's training objective, simplified):
        robust EPE on the warp where GT is valid + certainty BCE with
        in-bounds GT as the positive label. GT comes from data keys
        `gt_warp0` (B, h, w, 2 in [-1, 1]) + `gt_valid0` (and optionally
        the 1-direction), e.g. cached RoMa warps or homography GT."""
        losses = {}
        total = 0.0
        n_dir = 0
        for i in ("0", "1"):
            if f"gt_warp{i}" not in data:
                continue
            gt = data[f"gt_warp{i}"]
            valid = data[f"gt_valid{i}"].astype(jnp.float32)
            warp = pred[f"warp{i}"]
            if warp.shape[1:3] != gt.shape[1:3]:
                warp = _resize(warp, *gt.shape[1:3])
            epe = jnp.linalg.norm(warp - gt, axis=-1)
            nv = jnp.maximum(jnp.sum(valid, (1, 2)), 1.0)
            l_epe = jnp.sum(jnp.minimum(epe, 1.0) * valid, (1, 2)) / nv
            logits = pred.get(f"certainty_logits{i}")
            if logits is None:
                p = jnp.clip(pred[f"certainty{i}"], 1e-6, 1 - 1e-6)
                logits = jnp.log(p) - jnp.log1p(-p)
            if logits.shape[1:3] != gt.shape[1:3]:
                logits = _resize(logits[..., None], *gt.shape[1:3])[..., 0]
            good = (epe < 0.02).astype(jnp.float32) * valid
            bce = optax_sigmoid_bce(logits, good)
            l_cert = jnp.mean(bce, (1, 2))
            losses[f"epe{i}"] = l_epe
            losses[f"certainty{i}"] = l_cert
            total = total + l_epe + 0.1 * l_cert
            n_dir += 1
        if n_dir == 0:
            raise ValueError("RoMa loss needs gt_warp0/gt_valid0 in data")
        losses["total"] = total / n_dir
        return losses, {}


def optax_sigmoid_bce(logits, labels):
    """Numerically stable sigmoid BCE (optax.sigmoid_binary_cross_entropy)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
