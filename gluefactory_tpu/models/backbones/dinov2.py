"""DINOv2 ViT backbone, TPU-native from scratch
(reference `gluefactory/models/backbones/dinov2.py:7-30`, which wraps
torch.hub `facebookresearch/dinov2`).

The reference downloads the official torch ViT; this is a from-scratch flax
implementation of the DINOv2 architecture (Oquab et al., 2023): patch-14
embedding, cls token, bicubic-interpolated position embeddings, pre-norm
transformer blocks with LayerScale, and an optional SwiGLU FFN (the giant
variant). Official checkpoints convert through
`utils/torch_weights.convert_dinov2` (both the torch-hub and the
transformers key naming); forward numerics are parity-tested against a
randomly initialized torch `transformers.Dinov2Model` oracle
(`tests/test_dinov2.py`), so converted official weights reproduce reference
outputs exactly.

TPU-first choices:
  - the identical blocks are stacked with `nn.scan`: one compiled block
    body regardless of depth (vitg14 is 40 blocks).
  - fused QKV projection (one MXU matmul instead of three skinny ones);
    the conversion map concatenates the torch q/k/v weights.
  - optional bf16 compute (`dtype: bfloat16`); LayerNorms stay f32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import masked_attention
from ..base_model import BaseModel

__main_class__ = "DinoV2"

# embed_dim, depth, num_heads, ffn
PRESETS = {
    "dinov2_vits14": (384, 12, 6, "mlp"),
    "dinov2_vitb14": (768, 12, 12, "mlp"),
    "dinov2_vitl14": (1024, 24, 16, "mlp"),
    "dinov2_vitg14": (1536, 40, 24, "swiglu"),
}


def _torch_bicubic_weights(n_in: int, n_out: int):
    """Dense (n_out, n_in) interpolation matrix reproducing torch
    `F.interpolate(mode="bicubic", align_corners=False)`: cubic convolution
    kernel a=-0.75 at half-pixel-aligned source coordinates, border indices
    clamped. Computed with numpy at trace time (static shapes -> constants)."""
    import numpy as np

    a = -0.75

    def kernel(x):
        x = np.abs(x)
        return np.where(
            x <= 1,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )

    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(int)
    W = np.zeros((n_out, n_in), np.float32)
    for t in range(-1, 3):
        idx = np.clip(i0 + t, 0, n_in - 1)
        wgt = kernel(src - (i0 + t))
        np.add.at(W, (np.arange(n_out), idx), wgt)
    return W


def swiglu_hidden(dim: int, mlp_ratio: float = 4.0) -> int:
    """Hidden width of the fused SwiGLU FFN (official dinov2 convention:
    2/3 of the MLP hidden size, rounded up to a multiple of 8)."""
    h = int(dim * mlp_ratio * 2 / 3)
    return (h + 7) // 8 * 8


class DinoBlock(nn.Module):
    """One DINOv2 transformer block: pre-norm MHA and FFN, each followed by
    LayerScale, with residuals (official `dinov2/layers/block.py`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    ffn: str = "mlp"  # "mlp" | "swiglu"
    eps: float = 1e-6
    dtype: str = "float32"
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, _=None):
        B, T, C = x.shape
        H = self.num_heads
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        y = nn.LayerNorm(epsilon=self.eps, name="norm1")(x)
        qkv = nn.Dense(3 * C, dtype=dt, name="qkv")(y.astype(dt))
        q, k, v = jnp.split(qkv, 3, axis=-1)  # columns ordered [q|k|v]

        def heads(a):  # (B, T, C) -> (B, H, T, Dh)
            return a.reshape(B, T, H, C // H).transpose(0, 2, 1, 3)

        msg = masked_attention(heads(q), heads(k), heads(v), None, self.attn_impl)
        msg = msg.transpose(0, 2, 1, 3).reshape(B, T, C)
        msg = nn.Dense(C, dtype=dt, name="proj")(msg.astype(dt))
        ls1 = self.param("ls1_gamma", nn.initializers.constant(1.0), (C,))
        x = x + (msg * ls1.astype(dt)).astype(x.dtype)

        y = nn.LayerNorm(epsilon=self.eps, name="norm2")(x)
        if self.ffn == "swiglu":
            hidden = swiglu_hidden(C, self.mlp_ratio)
            w12 = nn.Dense(2 * hidden, dtype=dt, name="w12")(y.astype(dt))
            a, b = jnp.split(w12, 2, axis=-1)
            y = nn.Dense(C, dtype=dt, name="w3")(nn.silu(a) * b)
        else:
            hidden = int(C * self.mlp_ratio)
            y = nn.Dense(hidden, dtype=dt, name="fc1")(y.astype(dt))
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(C, dtype=dt, name="fc2")(y)
        ls2 = self.param("ls2_gamma", nn.initializers.constant(1.0), (C,))
        x = x + (y * ls2.astype(dt)).astype(x.dtype)
        return x, None


class DinoV2(BaseModel):
    default_conf = {
        "preset": "dinov2_vits14",  # sets dim/depth/heads/ffn unless given
        "embed_dim": None,
        "depth": None,
        "num_heads": None,
        "ffn": None,  # "mlp" | "swiglu"
        "mlp_ratio": 4.0,
        "patch_size": 14,
        # side length the position-embedding grid was trained at; other
        # input sizes bicubically resample the grid (official
        # `interpolate_pos_encoding`, antialiased). 518 = the official
        # checkpoints' grid (37x37).
        "pos_grid_size": 518,
        # resize inputs to the nearest multiple of patch_size (reference
        # `dinov2.py:17-18` `allow_resize`)
        "allow_resize": False,
        "eps": 1e-6,
        "dtype": "float32",
        "attn_impl": "xla",
        "weights": None,  # path to a converted checkpoint
    }
    required_data_keys = ("image",)

    def setup(self):
        c = self.conf
        dim, depth, heads, ffn = PRESETS.get(
            c.preset, (c.embed_dim, c.depth, c.num_heads, c.ffn or "mlp")
        )
        dim = c.embed_dim or dim
        depth = c.depth or depth
        heads = c.num_heads or heads
        ffn = c.ffn or ffn
        self.dim, self.depth = dim, depth
        P = c.patch_size
        self.patch_embed = nn.Conv(
            dim, (P, P), strides=(P, P), padding="VALID", name="patch_embed"
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, dim)
        )
        g = c.pos_grid_size // P
        self.pos_grid = g
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, 1 + g * g, dim)
        )
        self.blocks = nn.scan(
            DinoBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=depth,
        )(
            dim,
            heads,
            float(c.mlp_ratio),
            ffn,
            float(c.eps),
            c.dtype,
            c.attn_impl,
            name="blocks",
        )
        self.norm = nn.LayerNorm(epsilon=float(c.eps), name="norm")

    def _interp_pos(self, h: int, w: int) -> jnp.ndarray:
        """Resample the trained (g, g) patch position grid to (h, w)
        (official `interpolate_pos_encoding`: torch bicubic, a=-0.75,
        align_corners=False, no antialias — reproduced exactly as two
        separable weight matmuls, MXU-friendly and parity-tested vs torch).
        Exact pass-through at the trained grid."""
        cls_pos, patch_pos = self.pos_embed[:, :1], self.pos_embed[:, 1:]
        g = self.pos_grid
        if (h, w) == (g, g):
            return self.pos_embed
        grid = patch_pos.reshape(1, g, g, self.dim)
        wh = jnp.asarray(_torch_bicubic_weights(g, h))  # (h, g)
        ww = jnp.asarray(_torch_bicubic_weights(g, w))  # (w, g)
        grid = jnp.einsum("oi,biwd->bowd", wh, grid)
        grid = jnp.einsum("oi,bhid->bhod", ww, grid)
        return jnp.concatenate(
            [cls_pos, grid.reshape(1, h * w, self.dim)], axis=1
        )

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        image = data["image"]  # (B, H, W, C) in [0, 1] or normalized
        P = c.patch_size
        if c.allow_resize:
            B, H, W, _ = image.shape
            image = jax.image.resize(
                image,
                (B, H // P * P, W // P * P, image.shape[-1]),
                method="bilinear",
            )
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, axis=-1)
        B, H, W, _ = image.shape
        x = self.patch_embed(image)  # (B, h, w, D)
        h, w = x.shape[1:3]
        x = x.reshape(B, h * w, self.dim)
        x = jnp.concatenate([jnp.broadcast_to(self.cls_token, (B, 1, self.dim)), x], 1)
        x = x + self._interp_pos(h, w).astype(x.dtype)
        x, _ = self.blocks(x, None)
        x = self.norm(x.astype(jnp.float32))
        cls_tok, patches = x[:, 0], x[:, 1:]
        return {
            # dense patch features, NHWC (the reference emits NCHW; layout
            # is our framework-wide convention, content identical)
            "features": patches.reshape(B, h, w, self.dim),
            "global_descriptor": cls_tok,
            "descriptors": patches,  # (B, h*w, D)
        }

    def loss(self, pred, data):
        raise NotImplementedError("DINOv2 is a frozen backbone")
