"""SuperPoint keypoint detector + descriptor, TPU-native
(reference `gluefactory/models/extractors/superpoint_open.py:80-235` and
`gluefactory_nonfree/superpoint.py:155-385`).

Design notes (TPU-first, not a port):
  - NHWC layout, bf16-friendly convs sized for the MXU.
  - The whole detect -> NMS -> top-K -> describe chain is fixed-shape: exactly
    `max_num_keypoints` outputs with a validity mask, so extraction jits into
    one XLA program (the reference's `force_num_keypoints` padding is our
    *only* mode, SURVEY.md §7.1-1).
  - BatchNorm from pretrained torch checkpoints is folded into the convs at
    conversion time (`utils/torch_weights.py`), keeping the module stateless;
    from-scratch training uses GroupNorm (no cross-device stat sync needed).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops.keypoints import (
    remove_borders,
    sample_descriptors,
    simple_nms,
    soft_argmax_refinement,
    top_k_keypoints,
)
from ..base_model import BaseModel

__main_class__ = "SuperPoint"


class VGGBlock(nn.Module):
    """conv3x3 + norm + ReLU (reference `superpoint_open.py:61-77`).

    Norm modes:
      - "none": plain conv+relu (MagicLeap official checkpoints, BN-free).
      - "group": GroupNorm before relu (from-scratch training; no cross-device
        stat sync needed).
      - "affine": per-channel scale+bias AFTER relu. The rpautrat "open"
        SuperPoint's VGGBlock is conv -> relu -> BatchNorm
        (`superpoint_open.py:61-77`): the BN sits after the nonlinearity, so
        it cannot be folded into the conv exactly (padding zeros at image
        borders are not BN-shifted). An eval-mode BN is exactly a per-channel
        affine, which XLA fuses into the conv epilogue for free.
    """

    out_ch: int
    norm: str = "none"
    kernel: int = 3
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = nn.Conv(
            self.out_ch, (self.kernel, self.kernel), padding="SAME",
            dtype=dt, name="conv",
        )(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=min(32, self.out_ch), dtype=dt, name="norm")(x)
        x = nn.relu(x)
        if self.norm == "affine":
            s = self.param("post_scale", nn.initializers.ones, (self.out_ch,))
            b = self.param("post_bias", nn.initializers.zeros, (self.out_ch,))
            x = x * s.astype(x.dtype) + b.astype(x.dtype)
        return x


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channel groups
    ordered (py, px) in ((0,0),(0,1),(1,0),(1,1))."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def _s2d_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a 3x3 stride-1 SAME kernel (3, 3, Ci, Co) into the
    equivalent 2x2 kernel (2, 2, 4Ci, 4Co) over the space-to-depth grid.

    Derivation: output pixel (2b+p) of the original conv reads input pixels
    (2b+p+d-1), d in 0..2; in block coordinates that is block (b-1+t) phase q
    with d = p + 2t + q - 1. Slots with d outside 0..2 are zero (9/16 of the
    2x2x(2q)x(2p) slots are live -> 1.78x the MACs, but full 128-lane MXU
    tiles instead of ~12% utilization at 64 channels).
    """
    kh, kw, Ci, Co = K.shape
    # single gather from the zero-padded kernel (cheap even when XLA's loop
    # invariant code motion declines to hoist it out of a surrounding scan)
    Kp = jnp.pad(K, ((1, 1), (1, 1), (0, 0), (0, 0)))  # (5, 5, Ci, Co)
    r = jnp.arange(2)
    # idx[t, q, p] = p + 2t + q in padded coordinates (d + 1)
    idx = r[:, None, None] * 2 + r[None, :, None] + r[None, None, :]
    K2 = Kp[idx[:, :, :, None, None, None], idx[None, None, None, :, :, :]]
    # (ty,qy,py,tx,qx,px,Ci,Co) -> (ty,tx, (qy,qx,Ci), (py,px,Co))
    K2 = K2.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return K2.reshape(2, 2, 4 * Ci, 4 * Co)


class _ConvParams(nn.Module):
    """Bare conv parameters with nn.Conv's naming/shapes/init, so a
    space-to-depth block checkpoints identically to a standard VGGBlock."""

    kh: int
    kw: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kh, self.kw, self.cin, self.cout),
        )
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


class S2DVGGBlock(nn.Module):
    """VGGBlock evaluated in space-to-depth layout — same math, same params.

    SuperPoint's early scales run 3x3 convs with 64 channels at full
    resolution, ~12% MXU utilization on v5e (the perf wall flagged in
    VERDICT.md item 3). In the (H/2, W/2, 4C) space-to-depth layout the same
    conv is a 2x2 conv with 4x the channels: full MXU tiles. The kernel
    rearrangement happens at trace time from the standard (3, 3, Ci, Co)
    parameter, so checkpoints are interchangeable with VGGBlock.

    Supports norm "none"/"affine" (elementwise, phase-safe). Input/output are
    phase-major s2d tensors (B, h, w, 4*ch).
    """

    out_ch: int
    in_ch: int
    norm: str = "none"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, s2d: bool = True):
        import jax

        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        K, bias = _ConvParams(3, 3, self.in_ch, self.out_ch, name="conv")()
        if not s2d:
            # standard evaluation with the same parameters (odd-sized inputs)
            y = jax.lax.conv_general_dilated(
                x.astype(dt),
                K.astype(dt),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = nn.relu(y + bias.astype(dt))
            if self.norm == "affine":
                s = self.param("post_scale", nn.initializers.ones, (self.out_ch,))
                b = self.param("post_bias", nn.initializers.zeros, (self.out_ch,))
                y = y * s.astype(y.dtype) + b.astype(y.dtype)
            return y
        K2 = _s2d_kernel(K).astype(dt)
        B, h, w, _ = x.shape
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            K2,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, h+1, w+1, 4*out_ch)
        y = y + jnp.tile(bias, 4).astype(dt)
        y = nn.relu(y)
        if self.norm == "affine":
            s = self.param("post_scale", nn.initializers.ones, (self.out_ch,))
            b = self.param("post_bias", nn.initializers.zeros, (self.out_ch,))
            y = y * jnp.tile(s, 4).astype(y.dtype) + jnp.tile(b, 4).astype(y.dtype)
        # realign phases: output phase (py, px) lives at block offset (py, px)
        Co = self.out_ch
        parts = [
            y[:, py : py + h, px : px + w, (py * 2 + px) * Co : (py * 2 + px + 1) * Co]
            for py in (0, 1)
            for px in (0, 1)
        ]
        return jnp.concatenate(parts, axis=-1)


def _pack_offset(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> offset-packed (B, H, W/2+1, 2C): packed col w2 holds
    original cols (2w2-1, 2w2) (zero-padded at the borders)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return xp.reshape(B, H, (W + 2) // 2, 2 * C)


def _unpack_offset(xp: jnp.ndarray) -> jnp.ndarray:
    """Offset-packed (B, H, W/2+1, 2C) -> (B, H, W, C): original col 2j is
    phase1 of packed col j, col 2j+1 is phase0 of packed col j+1."""
    B, H, W2p, C2 = xp.shape
    C = C2 // 2
    q0, q1 = xp[..., :C], xp[..., C:]
    y = jnp.concatenate([q1[:, :, :-1], q0[:, :, 1:]], axis=-1)
    return y.reshape(B, H, 2 * (W2p - 1), C)


def _w2d_pool(y_off: jnp.ndarray) -> jnp.ndarray:
    """2x2 max-pool of an offset-packed map, emitted OFFSET-PACKED at half
    resolution (the next stage consumes it directly — no realign anywhere):
    z[j] = max(q1[j-1], q0[j]) is the width-pooled value y_pooled[j-1], and
    (z[2u], z[2u+1]) = (yp[2u-1], yp[2u]) is exactly the offset packing.
    Boundary phantoms are zero because conv_B masks its phantom slots."""
    C = y_off.shape[-1] // 2
    q0 = jnp.pad(y_off[..., :C], ((0, 0), (0, 0), (0, 1), (0, 0)))
    q1 = jnp.pad(y_off[..., C:], ((0, 0), (0, 0), (1, 0), (0, 0)))
    z = jnp.maximum(q1, q0)  # (B, H, W/2+2, C)
    B, H, Wz, _ = z.shape
    z = z.reshape(B, H, Wz // 2, 2 * C)
    return nn.max_pool(z, (2, 1), strides=(2, 1))


def _w2d_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (3, 2, 2Ci, 2Co) packed-pair kernel:
    K2[dh, t, (q, ci), (p, co)] = K[dh, 2t+q-p, ci, co], zero outside 0..2
    (6 of 8 (t, q, p) slots live = 1.33x MACs at full 128 lanes).

    The SAME kernel implements both parities of the alternating chain —
    only the conv's width padding differs:
      parity A (offset in -> aligned out): width padding (0, 0);
      parity B (aligned in -> offset out): width padding (1, 1), and the
        two phantom output slots (col 0 phase0 = original col -1, last col
        phase1 = original col W) must be zero-masked to keep SAME-pad
        semantics for the next conv/pool."""
    Kw = jnp.pad(K, ((0, 0), (1, 1), (0, 0), (0, 0)))  # width index dx+1
    ts = []
    for t in (0, 1):
        rows = []
        for q in (0, 1):
            cols = [Kw[:, 2 * t + q - p + 1] for p in (0, 1)]
            rows.append(jnp.concatenate(cols, axis=-1))  # (3, Ci, 2Co)
        ts.append(jnp.concatenate(rows, axis=-2))  # (3, 2Ci, 2Co)
    return jnp.stack(ts, axis=1)  # (3, 2, 2Ci, 2Co)


class W2DVGGBlock(nn.Module):
    """VGGBlock evaluated in width-pair packed layout — same math, params.

    3x3 convs at 64 channels use half the 128 MXU lanes on contraction AND
    output; packing adjacent WIDTH pairs into channels makes the same conv
    a 3x2 conv at 2C channels: full lanes at 1.33x the MACs (on-chip:
    2.64 -> 1.25 ms at 640x480x64, 35% -> 74% MXU —
    scripts/bench_conv_packing.py). The two convs of a stage ALTERNATE
    packing parity (A: offset in/aligned out, B: aligned in/offset out, see
    `_w2d_kernel`) so no repacking happens between them, and `_w2d_pool`
    emits the next stage's offset-packed input straight from the pool.
    Exact (same per-output dot order up to conv reassociation;
    tests/test_superpoint_w2d.py).
    """

    out_ch: int
    in_ch: int
    norm: str = "none"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, parity: str | None = None):
        import jax

        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        K, bias = _ConvParams(3, 3, self.in_ch, self.out_ch, name="conv")()
        if parity is None:
            # standard evaluation with the same parameters (odd sizes)
            y = jax.lax.conv_general_dilated(
                x.astype(dt), K.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = nn.relu(y + bias.astype(dt))
            if self.norm == "affine":
                s = self.param("post_scale", nn.initializers.ones, (self.out_ch,))
                b = self.param("post_bias", nn.initializers.zeros, (self.out_ch,))
                y = y * s.astype(y.dtype) + b.astype(y.dtype)
            return y
        K2 = _w2d_kernel(K).astype(dt)
        wpad = (0, 0) if parity == "A" else (1, 1)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), K2, (1, 1), ((1, 1), wpad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # A: (B, H, W/2, 2C) aligned; B: (B, H, W/2+1, 2C) offset
        y = nn.relu(y + jnp.tile(bias, 2).astype(dt))
        if self.norm == "affine":
            s = self.param("post_scale", nn.initializers.ones, (self.out_ch,))
            b = self.param("post_bias", nn.initializers.zeros, (self.out_ch,))
            y = y * jnp.tile(s, 2).astype(y.dtype) + jnp.tile(b, 2).astype(y.dtype)
        if parity == "B":
            # zero the phantom slots (col 0 phase0 = original col -1, last
            # col phase1 = original col W) so downstream SAME-pad reads and
            # the folded pool see exact zeros; one fused multiply
            Co = self.out_ch
            mask = np.ones((1, 1, y.shape[2], 2 * Co), np.float32)
            mask[:, :, 0, :Co] = 0.0
            mask[:, :, -1, Co:] = 0.0
            y = y * jnp.asarray(mask, y.dtype)
        return y


def _pallas_conv_available() -> bool:
    """Fused stage kernel runs on real TPUs (tests force interpret mode)."""
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _fused_block_rows(H: int) -> int:
    """Largest supported row-block size dividing H (0 = incompatible)."""
    for br in (8, 4, 2):
        if H % br == 0:
            return br
    return 0


class SuperPoint(BaseModel):
    default_conf = {
        "descriptor_dim": 256,
        "nms_radius": 4,
        "max_num_keypoints": 1024,
        "detection_threshold": 0.005,
        "remove_borders": 4,
        "channels": [64, 64, 128, 128, 256],
        "norm": "none",  # "none" (folded-BN checkpoints) | "group" (scratch)
        "refinement_radius": 0,  # soft-argmax sub-pixel refinement
        "dense_outputs": False,
        "dtype": "float32",  # "bfloat16": backbone convs on the MXU in bf16
        # leading VGG scales computed in space-to-depth layout (exact same
        # math/params; see S2DVGGBlock). Measured SLOWER than the standard
        # path on v5e (XLA lowers the 2x2/4C rearranged conv worse than the
        # direct 3x3), so default off — kept as a tested exact-equivalence
        # option for other XLA versions/hardware. Requires norm in
        # ("none", "affine"); odd feature maps fall back per level.
        "s2d_levels": 0,
        # leading VGG scales computed in width-pair packed layout (w2d,
        # W2DVGGBlock: 3x2 conv at 2C channels, 1.33x MACs at full MXU
        # lanes — the lighter-overhead sibling of s2d). Exact same
        # math/params; requires norm in ("none", "affine"), 3x3 kernels,
        # even widths (odd feature maps fall back per level). Mutually
        # exclusive with s2d_levels.
        "w2d_levels": 0,
        # leading VGG scales evaluated with the fused Pallas stage kernel
        # (ops/pallas_conv.py: conv+relu+conv+relu+pool in one HBM pass) at
        # inference on TPU. Same parameters; bf16-rounding-level numerics.
        # Requires norm == "none"; levels with incompatible shapes fall back.
        "fused_stages": 0,
        "weights": None,  # path to a converted checkpoint
    }
    required_data_keys = ("image",)

    def setup(self):
        c = self.conf
        chs = list(c.channels)
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        backbone = []
        # two convs per scale, maxpool between scales (VGG-style)
        n_s2d = int(c.get("s2d_levels", 0) or 0)
        n_w2d = int(c.get("w2d_levels", 0) or 0)
        if n_s2d and n_w2d:
            raise ValueError("s2d_levels and w2d_levels are mutually exclusive")
        if c.norm not in ("none", "affine") or c.get("kernel", 3) != 3:
            n_s2d = n_w2d = 0  # both need elementwise norms and 3x3 kernels
        # only scales followed by a pool can fold phases back via the pool max
        n_s2d = min(n_s2d, len(chs[:-1]) - 1)
        n_w2d = min(n_w2d, len(chs[:-1]) - 1)
        self.n_s2d = n_s2d
        self.n_w2d = n_w2d
        in_chs = [1] + chs[:-1]
        for i, ch in enumerate(chs[:-1]):
            if i < n_w2d:
                backbone.append(
                    (
                        W2DVGGBlock(ch, in_chs[i], c.norm, c.dtype, name=f"b{i}_0"),
                        W2DVGGBlock(ch, ch, c.norm, c.dtype, name=f"b{i}_1"),
                    )
                )
            elif i < n_s2d:
                backbone.append(
                    (
                        S2DVGGBlock(ch, in_chs[i], c.norm, c.dtype, name=f"b{i}_0"),
                        S2DVGGBlock(ch, ch, c.norm, c.dtype, name=f"b{i}_1"),
                    )
                )
            else:
                backbone.append(
                    (
                        VGGBlock(ch, c.norm, c.get("kernel", 3), c.dtype, name=f"b{i}_0"),
                        VGGBlock(ch, c.norm, c.get("kernel", 3), c.dtype, name=f"b{i}_1"),
                    )
                )
        self.backbone = backbone
        mid = chs[-1]
        self.det_head0 = VGGBlock(mid, c.norm, 3, c.dtype, name="det0")
        self.det_head1 = nn.Conv(65, (1, 1), dtype=dt, name="det1")
        self.desc_head0 = VGGBlock(mid, c.norm, 3, c.dtype, name="desc0")
        self.desc_head1 = nn.Conv(c.descriptor_dim, (1, 1), dtype=dt, name="desc1")

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]  # (B, H, W, C)
        if image.shape[-1] == 3:
            # RGB -> grayscale (ITU-R BT.601, like the reference's preprocessing)
            scale = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = jnp.sum(image * scale, axis=-1, keepdims=True)
        B, H, W, _ = image.shape

        # fused Pallas stage path: inference-only (frozen backbone in the
        # flagship pipeline; training needs the standard path for gradients)
        n_fused = int(self.conf.get("fused_stages", 0) or 0)
        use_fused = (
            not train
            and not self.is_initializing()
            and self.conf.norm == "none"
            and self.conf.get("kernel", 3) == 3
            and _pallas_conv_available()
        )

        x = image
        x_packed = None  # offset-packed running value of the w2d chain
        for i, (blk0, blk1) in enumerate(self.backbone):
            if (
                use_fused
                and i < n_fused
                and i < len(self.backbone) - 1
                and x.shape[2] % 2 == 0
                and _fused_block_rows(x.shape[1]) > 0
            ):
                from ...ops.pallas_conv import fused_conv1_pool, fused_conv2_pool

                br = _fused_block_rows(x.shape[1])
                p1 = blk1.variables["params"]["conv"]
                if x.shape[-1] == 1:
                    # 1-channel image input is lane-hostile in Pallas: run
                    # the first conv in XLA, fuse conv2+relu+pool
                    x = blk0(x)
                    x = fused_conv1_pool(
                        x, p1["kernel"], p1["bias"], block_rows=br
                    )
                else:
                    p0 = blk0.variables["params"]["conv"]
                    x = fused_conv2_pool(
                        x,
                        p0["kernel"],
                        p0["bias"],
                        p1["kernel"],
                        p1["bias"],
                        block_rows=br,
                    )
                continue
            if i < self.n_w2d:
                # width-pair packed scale (alternating parity, no repacks
                # anywhere in the chain): conv_A -> conv_B -> folded pool,
                # which emits the next stage's offset-packed input
                W_here = (
                    2 * (x_packed.shape[2] - 1) if x_packed is not None
                    else x.shape[2]
                )
                H_here = x_packed.shape[1] if x_packed is not None else x.shape[1]
                if H_here % 2 == 0 and W_here % 4 == 0:
                    if x_packed is None:
                        x_packed = _pack_offset(x)
                    y = blk0(x_packed, parity="A")
                    y = blk1(y, parity="B")
                    x_packed = _w2d_pool(y)
                    continue
                # incompatible size: unpack (if needed) and run standard
                if x_packed is not None:
                    x = _unpack_offset(x_packed)
                    x_packed = None
                x = blk0(x)
                x = blk1(x)
                if i < len(self.backbone) - 1:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            if x_packed is not None:
                x = _unpack_offset(x_packed)
                x_packed = None
            if (
                i < self.n_s2d
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            ):
                # space-to-depth scale: conv in (h/2, w/2, 4C) layout; the
                # trailing 2x2 max-pool is exactly the max over the 4 phases
                x = _space_to_depth(x)
                x = blk0(x)
                x = blk1(x)
                b, h, w, c4 = x.shape
                x = jnp.max(x.reshape(b, h, w, 4, c4 // 4), axis=3)
            else:
                if i < self.n_s2d:
                    # odd feature map: same params, standard evaluation
                    x = blk0(x, s2d=False)
                    x = blk1(x, s2d=False)
                else:
                    x = blk0(x)
                    x = blk1(x)
                if i < len(self.backbone) - 1:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # x: (B, H/8, W/8, C)

        # detector head: 65 = 8x8 cells + dustbin; pixel-shuffle to full res
        det = self.det_head1(self.det_head0(x))  # (B, H/8, W/8, 65)
        # scores/softmax in f32 regardless of compute dtype
        scores = nn.softmax(det.astype(jnp.float32), axis=-1)[..., :-1]
        Hc, Wc = scores.shape[1:3]
        scores = scores.reshape(B, Hc, Wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)

        desc = self.desc_head1(self.desc_head0(x)).astype(jnp.float32)
        # L2-normalize the dense map BEFORE bilinear sampling (reference
        # `superpoint_open.py:133-135` normalizes dense, samples, then
        # normalizes again) — interpolating unnormalized descriptors would
        # weight the 4 corner cells by their norms.
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )

        nms = simple_nms(scores, self.conf.nms_radius)
        nms = remove_borders(nms, self.conf.remove_borders)
        kpts, kp_scores, valid = top_k_keypoints(
            nms, self.conf.max_num_keypoints, self.conf.detection_threshold,
            nms_radius=self.conf.nms_radius,
        )
        if self.conf.refinement_radius > 0:
            kpts = soft_argmax_refinement(kpts, scores, self.conf.refinement_radius)

        # with square-padded batches, drop keypoints in the padding region
        if "image_size" in data:
            size = data["image_size"]  # (B, 2) true (w, h)
            inside = jnp.all(kpts < size[:, None, :], axis=-1) & jnp.all(
                kpts >= 0, axis=-1
            )
            valid = valid & inside
            kp_scores = jnp.where(valid, kp_scores, 0.0)
        # endoscope specular-highlight filtering (fork `superpoint_open.py:177-187`)
        if "specular_mask" in data:
            from .utils import filter_keypoints_by_specular_mask

            valid = filter_keypoints_by_specular_mask(
                kpts, valid, data["specular_mask"]
            )
            kp_scores = jnp.where(valid, kp_scores, 0.0)

        # descriptors are (B, Hc, Wc, D) -> channel-first for sampling
        desc_cf = jnp.moveaxis(desc, -1, 1)  # (B, D, Hc, Wc)
        d = sample_descriptors(kpts, desc_cf, 8)  # (B, K, D)
        d = jnp.where(valid[..., None], d, jnp.zeros_like(d))

        pred = {
            "keypoints": kpts,
            "keypoint_scores": kp_scores,
            "descriptors": d,
            "keypoint_valid": valid,
        }
        if self.conf.dense_outputs:
            pred["dense_scores"] = scores
            pred["dense_descriptors"] = desc
        return pred

    def loss(self, pred, data):
        raise NotImplementedError("SuperPoint is used frozen or self-supervised")
