"""DeepLSD line detector, TPU-native from scratch
(reference `gluefactory/models/lines/deeplsd.py:9-106`, which wraps the
external `deeplsd` package + downloaded weights).

A from-scratch implementation of the DeepLSD architecture (Pautrat et al.,
CVPR 2023): a UNet backbone regressing a line DISTANCE FIELD (proximity
p = exp(-d / tau), d = distance to the nearest line in pixels) and an ANGLE
FIELD (line orientation mod pi, regressed as the doubled-angle unit vector
(cos 2t, sin 2t) to avoid the wraparound), then LSD-style region growing
guided by these fields instead of image gradients. The extraction is the
native C++ `native/line_extract.cpp` (the role pytlsd plays for the
reference), called on the host behind `jax.pure_callback` with fixed-L
padded outputs.

Unlike the reference (inference-only wrapper), this model trains here:
`loss()` supervises DF (L1 on proximity) + AF (doubled-angle cosine loss,
proximity-weighted) against GT fields rasterized from line segments
(`lines_to_df_angle`, also used by the homography line-GT path).

Output conventions follow the reference wrapper exactly
(`deeplsd.py:50-102`): `lines` (B, L, 2, 2) endpoint pairs, `line_scores` =
sqrt(length), min-length filter, score-ordered, fixed-L padded with
`valid_lines`.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel

__main_class__ = "DeepLSD"

_NATIVE_DIR = Path(__file__).parent.parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libline_extract.so"
_lib = None


def get_line_lib():
    """Build-on-demand ctypes binding for the native guided-LSD extractor."""
    global _lib
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "line_extract.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)],
            check=True,
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.extract_lines.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, f32p, f32p,
    ]
    lib.extract_lines.restype = ctypes.c_int
    _lib = lib
    return lib


def extract_lines_host(
    mag: np.ndarray,
    angle: np.ndarray,
    max_lines: int,
    mag_thresh: float,
    ang_tol: float,
    min_density: float,
    min_size: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the native extractor on one (H, W) field pair; fixed-L padded."""
    lib = get_line_lib()
    segs = np.zeros((max_lines, 4), np.float32)
    scores = np.zeros((max_lines,), np.float32)
    m = lib.extract_lines(
        np.ascontiguousarray(mag, np.float32),
        np.ascontiguousarray(angle, np.float32),
        mag.shape[0], mag.shape[1],
        float(mag_thresh), float(ang_tol), float(min_density), int(min_size),
        int(max_lines), segs, scores,
    )
    valid = np.zeros((max_lines,), bool)
    valid[:m] = True
    return segs.reshape(max_lines, 2, 2), scores, valid


def lines_to_df_angle(lines: jnp.ndarray, valid: jnp.ndarray, h: int, w: int):
    """Rasterize GT fields from segments: per-pixel distance to the nearest
    segment + that segment's orientation (mod pi).

    lines: (L, 2, 2) endpoints (x, y); valid: (L,). Returns
    (df (h, w) in pixels, angle (h, w) in [0, pi)). Used for DeepLSD
    supervision and tests; all-vectorized (h*w x L distance matrix)."""
    ys, xs = jnp.meshgrid(jnp.arange(h) + 0.5, jnp.arange(w) + 0.5, indexing="ij")
    p = jnp.stack([xs, ys], -1).reshape(-1, 2)  # (N, 2)
    a, b = lines[:, 0], lines[:, 1]  # (L, 2)
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-9)  # (L,)
    ap = p[:, None] - a[None]  # (N, L, 2)
    t = jnp.clip(jnp.sum(ap * ab[None], -1) / denom[None], 0.0, 1.0)
    proj = a[None] + t[..., None] * ab[None]
    d = jnp.linalg.norm(p[:, None] - proj, axis=-1)  # (N, L)
    d = jnp.where(valid[None], d, 1e9)
    idx = jnp.argmin(d, -1)
    df = jnp.min(d, -1).reshape(h, w)
    ang = jnp.mod(jnp.arctan2(ab[:, 1], ab[:, 0]), jnp.pi)  # (L,)
    angle = ang[idx].reshape(h, w)
    return df, angle


class ConvGN(nn.Module):
    ch: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=dt, name="conv")(
            x.astype(dt)
        )
        x = nn.GroupNorm(num_groups=min(8, self.ch), dtype=dt, name="norm")(x)
        return nn.relu(x)


class UNetBackbone(nn.Module):
    """Small UNet (DeepLSD uses a VGG-ish encoder-decoder): 3 scales down,
    skip-connected decoder back to full resolution."""

    base: int = 32
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        skips = []
        ch = self.base
        for i in range(3):
            x = ConvGN(ch, self.dtype, name=f"enc{i}_0")(x)
            x = ConvGN(ch, self.dtype, name=f"enc{i}_1")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            ch *= 2
        x = ConvGN(ch, self.dtype, name="mid")(x)
        for i in reversed(range(3)):
            ch //= 2
            B, hh, ww, _ = x.shape
            x = jax.image.resize(
                x, (B, hh * 2, ww * 2, x.shape[-1]), method="bilinear"
            )
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ConvGN(ch, self.dtype, name=f"dec{i}")(x)
        return x


class DeepLSD(BaseModel):
    default_conf = {
        "min_length": 15,
        "max_num_lines": 250,
        "force_num_lines": False,  # fixed-L padding is our only mode anyway
        # field heads
        "base_ch": 32,
        "tau": 5.0,  # DF normalization: p = exp(-d / tau)
        "dtype": "float32",
        # guided-LSD extraction (reference `line_detection_params`)
        "grad_thresh": 0.4,  # proximity threshold (~ d < 4.6 px at tau=5)
        "ang_tol": 0.3927,  # pi/8, LSD's 22.5 deg
        "min_density": 0.5,
        "min_size": 15,
        "weights": None,
    }
    required_data_keys = ("image",)

    def setup(self):
        c = self.conf
        self.backbone = UNetBackbone(int(c.base_ch), c.dtype, name="backbone")
        self.df_head = nn.Conv(1, (1, 1), name="df_head")
        self.af_head = nn.Conv(2, (1, 1), name="af_head")

    def _fields(self, image: jnp.ndarray):
        """(proximity p in (0,1), angle theta in [0, pi)) at full res."""
        if image.shape[-1] == 3:
            scale = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = jnp.sum(image * scale, axis=-1, keepdims=True)
        feat = self.backbone(image)
        p = jax.nn.sigmoid(self.df_head(feat.astype(jnp.float32))[..., 0])
        v = self.af_head(feat.astype(jnp.float32))  # (B, H, W, 2) ~ (cos2t, sin2t)
        theta = 0.5 * jnp.arctan2(v[..., 1], v[..., 0])
        theta = jnp.mod(theta, jnp.pi)
        return p, theta, v

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        p, theta, v = self._fields(data["image"])
        pred = {"df_proximity": p, "line_angle": theta}
        if train:
            pred["af_vector"] = v
            return pred  # training supervises the fields only

        L = int(c.max_num_lines)

        def host_extract(p_np, t_np):
            outs = [
                extract_lines_host(
                    np.asarray(pi), np.asarray(ti), L,
                    float(c.grad_thresh), float(c.ang_tol),
                    float(c.min_density), int(c.min_size),
                )
                for pi, ti in zip(p_np, t_np)
            ]
            return (
                np.stack([o[0] for o in outs]).astype(np.float32),
                np.stack([o[1] for o in outs]).astype(np.float32),
                np.stack([o[2] for o in outs]),
            )

        B = p.shape[0]
        lines, lengths, valid = jax.pure_callback(
            host_extract,
            (
                jax.ShapeDtypeStruct((B, L, 2, 2), jnp.float32),
                jax.ShapeDtypeStruct((B, L), jnp.float32),
                jax.ShapeDtypeStruct((B, L), jnp.bool_),
            ),
            p,
            theta,
        )
        # reference wrapper semantics (`deeplsd.py:62-75`): drop short
        # segments, score = sqrt(length), keep the best (already
        # length-ordered by the extractor)
        keep = valid & (lengths >= float(c.min_length))
        scores = jnp.where(keep, jnp.sqrt(jnp.maximum(lengths, 0.0)), 0.0)
        lines = jnp.where(keep[..., None, None], lines, 0.0)
        pred.update(
            {"lines": lines, "line_scores": scores, "valid_lines": keep}
        )
        return pred

    def loss(self, pred: dict, data: dict):
        """DF/AF supervision (DeepLSD's training objective): L1 on the
        normalized proximity + proximity-weighted doubled-angle cosine loss.
        GT fields come from `gt_df` (px) + `gt_angle` (rasterize segments
        with `lines_to_df_angle`)."""
        tau = float(self.conf.tau)
        gt_p = jnp.exp(-data["gt_df"] / tau)  # (B, H, W)
        l_df = jnp.mean(jnp.abs(pred["df_proximity"] - gt_p), axis=(1, 2))
        gt_vec = jnp.stack(
            [jnp.cos(2 * data["gt_angle"]), jnp.sin(2 * data["gt_angle"])], -1
        )
        v = pred["af_vector"]
        # safe norm: jnp.linalg.norm has a NaN gradient at exactly 0
        v = v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-9)
        cos_loss = 1.0 - jnp.sum(v * gt_vec, -1)  # in [0, 2]
        wsum = jnp.maximum(jnp.sum(gt_p, (1, 2)), 1e-6)
        l_af = jnp.sum(cos_loss * gt_p, (1, 2)) / wsum
        total = l_df + l_af
        return {"total": total, "df": l_df, "af": l_af}, {}
