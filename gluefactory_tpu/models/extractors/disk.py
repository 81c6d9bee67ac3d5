"""DISK extractor, TPU-native
(reference `gluefactory/models/extractors/disk_kornia.py:10-140`).

The reference wraps kornia's DISK (Tyszkiewicz et al., NeurIPS 2020). Two
architectures are provided here:

- ``arch: "official"`` (default) — the published DISK thin U-Net exactly as
  kornia instantiates it (`kornia.feature.DISK.__init__`): channel plan
  down=[16, 32, 64, 64, 64] / up=[64, 64, 64, desc_dim+1], 5x5 convs,
  pre-activation InstanceNorm (no affine) + per-channel PReLU, 2x2
  average-pool downsampling, nearest-neighbor 2x upsampling, first down
  block conv-only, output channels = [descriptors (desc_dim), heatmap (1)].
  Structure + semantics are verified against a torch re-implementation of
  the same plan in tests/test_disk_official.py; official kornia "depth"
  weights load via `utils/torch_weights.convert_disk` when mounted.
- ``arch: "generic"`` — the from-scratch trainable U-Net used in earlier
  rounds (GroupNorm/GELU, 3x3), kept as the air-gapped training variant.

Both produce dense heatmap + dense descriptors, window-NMS detection, and
fixed-K masked output.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.keypoints import simple_nms, top_k_keypoints
from ..base_model import BaseModel

__main_class__ = "DISK"


class UNetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="c0")(x)
        x = nn.GroupNorm(num_groups=min(8, self.out_ch), name="n0")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="c1")(x)
        x = nn.GroupNorm(num_groups=min(8, self.out_ch), name="n1")(x)
        return nn.gelu(x)


def _prelu(x, alpha):
    return jnp.maximum(x, 0.0) + alpha * jnp.minimum(x, 0.0)


class _NormGateConv(nn.Module):
    """One thin-U-Net conv unit: InstanceNorm -> PReLU -> 5x5 conv.

    Pre-activation order and parameterization follow the `unets` package the
    official DISK builds on (vendored by kornia): InstanceNorm2d with
    affine=False (no params), PReLU with one learnable slope per input
    channel (torch init 0.25), Conv2d(size=5, padding=2, bias=True).
    `first=True` skips norm+gate (the image-input block has conv only).
    """

    out_ch: int
    first: bool = False
    size: int = 5

    @nn.compact
    def __call__(self, x):
        if not self.first:
            mu = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            alpha = self.param(
                "alpha", nn.initializers.constant(0.25), (x.shape[-1],))
            x = _prelu(x, alpha)
        return nn.Conv(
            self.out_ch, (self.size, self.size), padding="SAME", name="conv")(x)


class ThinUNet(nn.Module):
    """The official DISK backbone (kornia `DISK` default `Unet`):
    in_features=3, size=5, down=[16, 32, 64, 64, 64],
    up=[64, 64, 64, desc_dim + 1]. 4 downsamplings -> input must be /16
    (the reference wrapper pads, `disk_kornia.py:33-37`)."""

    down: tuple = (16, 32, 64, 64, 64)
    up: tuple = (64, 64, 64, 129)

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, c in enumerate(self.down):
            if i > 0:
                skips.append(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = _NormGateConv(c, first=(i == 0), name=f"down_{i}")(x)
        for j, c in enumerate(self.up):
            B, h, w, C = x.shape
            x = jax.image.resize(x, (B, 2 * h, 2 * w, C), "nearest")
            # torch.cat([upsampled_bottom, horizontal]) order
            x = jnp.concatenate([x, skips[-1 - j]], axis=-1)
            x = _NormGateConv(c, name=f"up_{j}")(x)
        return x


class DISK(BaseModel):
    default_conf = {
        "arch": "official",  # "official" (kornia plan) | "generic"
        "max_num_keypoints": 1024,
        "detection_threshold": 0.0,
        "nms_window_size": 5,
        "descriptor_dim": 128,
        "channels": [32, 64, 128],  # generic arch only
        "weights": None,
        "dense_outputs": False,
    }
    required_data_keys = ("image",)

    def setup(self):
        if self.conf.arch == "official":
            self.unet = ThinUNet(
                up=(64, 64, 64, self.conf.descriptor_dim + 1), name="unet")
        else:
            chs = list(self.conf.channels)
            self.down = [
                UNetBlock(c, name=f"down{i}") for i, c in enumerate(chs)]
            self.up = [
                UNetBlock(c, name=f"up{i}")
                for i, c in enumerate(reversed(chs[:-1]))
            ]
            self.head = nn.Conv(
                self.conf.descriptor_dim + 1, (1, 1), name="head")

    def _dense_official(self, image):
        """Official layout: pad to /16 (reference `disk_kornia.py:33-41`),
        run the thin U-Net, crop; descriptors are channels [:D], heatmap is
        channel [D] (kornia `DISK.heatmap_and_dense_descriptors`)."""
        B, H, W, _ = image.shape
        ph = (-H) % 16
        pw = (-W) % 16
        if ph or pw:
            image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
        out = self.unet(image)[:, :H, :W]
        D = self.conf.descriptor_dim
        return out[..., D], out[..., :D]

    def _dense_generic(self, image):
        B = image.shape[0]
        skips = []
        x = image
        for i, blk in enumerate(self.down):
            x = blk(x)
            if i < len(self.down) - 1:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for blk, skip in zip(self.up, reversed(skips)):
            x = jax.image.resize(
                x, (B, skip.shape[1], skip.shape[2], x.shape[-1]), "bilinear"
            )
            x = blk(jnp.concatenate([x, skip], axis=-1))

        out = self.head(x)  # (B, H, W, D+1)
        return out[..., 0], out[..., 1:]

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, axis=-1)
        B, H, W, _ = image.shape

        if self.conf.arch == "official":
            heat, desc = self._dense_official(image)
        else:
            heat, desc = self._dense_generic(image)
        radius = self.conf.nms_window_size // 2
        nms = simple_nms(heat, radius)
        kpts, kp_scores, valid = top_k_keypoints(
            nms, self.conf.max_num_keypoints, self.conf.detection_threshold,
            nms_radius=radius,
        )
        from .aliked import bilinear_gather

        # Sample raw dense descriptors, then L2-normalize the sampled
        # vectors (kornia normalizes at merge time,
        # `Keypoints.merge_with_descriptors`), not the dense map.
        d = bilinear_gather(desc, kpts)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        d = jnp.where(valid[..., None], d, 0.0)
        if "image_size" in data:
            inside = jnp.all(kpts < data["image_size"][:, None, :], axis=-1)
            valid = valid & inside
            kp_scores = jnp.where(valid, kp_scores, 0.0)
        pred = {
            "keypoints": kpts,
            "keypoint_scores": kp_scores,
            "descriptors": d,
            "keypoint_valid": valid,
        }
        if self.conf.dense_outputs:
            pred["dense_descriptors"] = desc
            pred["dense_scores"] = heat
        return pred

    def loss(self, pred, data):
        raise NotImplementedError
