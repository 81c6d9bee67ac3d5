"""KeyNet detector + AffNet shape + HardNet descriptor, TPU-native
(reference `gluefactory/models/extractors/keynet_affnet_hardnet.py:8-74`,
which wraps `kornia.feature.KeyNetHardNet` — unavailable here, so the three
networks are built from scratch in flax after their published definitions:

  - KeyNet (Barroso-Laguna et al., ICCV 2019): a handcrafted
    first/second-order derivative filter bank feeding a small learnable conv
    stack, evaluated over a 1.2x scale pyramid whose per-level responses are
    upsampled and fused into one score map.
  - AffNet (Mishkin et al., ECCV 2018): a patch CNN predicting the local
    affine shape (3 params of an upper-triangular A).
  - HardNet (Mishchuk et al., NeurIPS 2017): a 7-conv patch CNN producing a
    128-d L2-normalized descriptor.
  - Orientation: dominant-gradient-orientation estimation (the kornia
    `LAFOrienter` default), handcrafted and parameter-free; `upright: true`
    skips it like the reference conf.

TPU-first choices: fixed-K keypoints with validity masks (NMS + blocked
top-k from `ops/keypoints`), all patch work as one batched gather + conv
over (B*K, P, P, 1) — static shapes, MXU-friendly; the scale pyramid uses
static `jax.image.resize` sizes.

No kornia checkpoints can exist on this machine (no egress); the networks
train from scratch (norm="instance"), and BN-folded official weights can be
converted later with norm="none" exactly like SuperPoint.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.keypoints import remove_borders, simple_nms, top_k_keypoints
from ..base_model import BaseModel

__main_class__ = "KeyNetAffNetHardNet"


# ---------------------------------------------------------------- patches


def _bilinear_gather(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """img: (H, W); x/y: any shape of pixel coords. Returns img[y, x]."""
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2)
    dx = jnp.clip(x - x0, 0.0, 1.0)
    dy = jnp.clip(y - y0, 0.0, 1.0)
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    flat = img.reshape(-1)

    def at(yy, xx):
        return flat[(yy * W + xx).reshape(-1)].reshape(x.shape)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    return (
        v00 * (1 - dx) * (1 - dy)
        + v01 * dx * (1 - dy)
        + v10 * (1 - dx) * dy
        + v11 * dx * dy
    )


def sample_oriented_patches(
    image: jnp.ndarray,
    kpts: jnp.ndarray,
    scales: jnp.ndarray,
    oris: jnp.ndarray,
    affine: jnp.ndarray | None = None,
    patch_size: int = 32,
):
    """Affine-LAF patch sampling (the kornia `extract_patches_from_pyramid`
    role). image: (H, W); kpts: (K, 2) xy; scales: (K,) patch radii in px;
    oris: (K,) radians; affine: (K, 2, 2) shape matrices (identity if None).
    Returns (K, P, P) patches.
    """
    P = patch_size
    r = jnp.linspace(-1.0, 1.0, P)
    gx, gy = jnp.meshgrid(r, r)  # (P, P), gy down
    uv = jnp.stack([gx, gy], axis=-1)  # (P, P, 2)
    cos, sin = jnp.cos(oris), jnp.sin(oris)
    # rotation per keypoint: (K, 2, 2)
    R = jnp.stack(
        [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], axis=-2
    )
    A = R if affine is None else jnp.einsum("kij,kjl->kil", R, affine)
    M = A * scales[:, None, None]  # (K, 2, 2)
    xy = kpts[:, None, None, :] + jnp.einsum("kij,pqj->kpqi", M, uv)
    return jax.vmap(lambda c: _bilinear_gather(image, c[..., 0], c[..., 1]))(xy)


def dominant_gradient_orientation(patches: jnp.ndarray, num_bins: int = 36):
    """Parameter-free orientation (kornia `PatchDominantGradientOrientation`).

    patches: (K, P, P). Gaussian-weighted gradient-angle histogram, returns
    the dominant angle in radians, (K,).
    """
    K, P, _ = patches.shape
    gx = patches[:, :, 2:] - patches[:, :, :-2]  # (K, P, P-2)
    gy = patches[:, 2:, :] - patches[:, :-2, :]
    gx = gx[:, 1:-1, :]
    gy = gy[:, :, 1:-1]  # both (K, P-2, P-2)
    mag = jnp.sqrt(gx**2 + gy**2 + 1e-12)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    r = jnp.linspace(-1.0, 1.0, P - 2)
    wx, wy = jnp.meshgrid(r, r)
    w = jnp.exp(-(wx**2 + wy**2) / (2 * 0.5**2))
    weights = (mag * w[None]).reshape(K, -1)
    bins = ((ang + jnp.pi) / (2 * jnp.pi) * num_bins).astype(jnp.int32)
    bins = jnp.clip(bins, 0, num_bins - 1).reshape(K, -1)
    hist = jax.vmap(
        lambda b, wt: jnp.zeros(num_bins).at[b].add(wt)
    )(bins, weights)
    # circular smoothing
    hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    idx = jnp.argmax(hist, axis=-1)
    return (idx.astype(jnp.float32) + 0.5) / num_bins * 2 * jnp.pi - jnp.pi


# ----------------------------------------------------------------- KeyNet


def handcrafted_features(img: jnp.ndarray) -> jnp.ndarray:
    """KeyNet's 10-channel handcrafted block: first/second derivatives and
    their products (Barroso-Laguna et al. §3.1). img: (B, H, W, 1)."""
    k = jnp.asarray([-0.5, 0.0, 0.5], img.dtype)

    def conv1d(x, kern, axis):
        shape = (1, 3) if axis == 2 else (3, 1)
        kern = kern.reshape(shape + (1, 1))
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    gx = conv1d(img, k, 2)
    gy = conv1d(img, k, 1)
    gxx = conv1d(gx, k, 2)
    gyy = conv1d(gy, k, 1)
    gxy = conv1d(gx, k, 1)
    return jnp.concatenate(
        [gx, gy, gx * gy, gx**2, gy**2, gxx, gyy, gxy, gxx * gyy, gxy**2],
        axis=-1,
    )


class KeyNetBlock(nn.Module):
    """Learnable block: 3x (conv5x5 num_filters + norm + ReLU)."""

    num_filters: int = 8
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(self.num_filters, (5, 5), name=f"conv{i}")(x)
            if self.norm == "instance":
                # per-sample, per-channel spatial norm (BN-at-inference analog)
                mu = jnp.mean(x, axis=(1, 2), keepdims=True)
                var = jnp.var(x, axis=(1, 2), keepdims=True)
                x = (x - mu) / jnp.sqrt(var + 1e-5)
                x = x * self.param(
                    f"scale{i}", nn.initializers.ones, (self.num_filters,)
                ) + self.param(
                    f"bias{i}", nn.initializers.zeros, (self.num_filters,)
                )
            x = nn.relu(x)
        return x


class KeyNet(nn.Module):
    """Multi-scale KeyNet score map. Input (B, H, W, 1) -> (B, H, W)."""

    num_levels: int = 3
    num_filters: int = 8
    scale_factor: float = 1.2
    norm: str = "instance"

    @nn.compact
    def __call__(self, image):
        B, H, W, _ = image.shape
        block = KeyNetBlock(self.num_filters, self.norm, name="block")
        feats = []
        level = image
        for i in range(self.num_levels):
            f = block(handcrafted_features(level))
            if i > 0:
                f = jax.image.resize(
                    f, (B, H, W, self.num_filters), method="bilinear"
                )
            feats.append(f)
            if i + 1 < self.num_levels:
                h = max(int(round(level.shape[1] / self.scale_factor)), 8)
                w = max(int(round(level.shape[2] / self.scale_factor)), 8)
                level = jax.image.resize(
                    level, (B, h, w, 1), method="bilinear"
                )
        x = jnp.concatenate(feats, axis=-1)  # (B, H, W, levels*filters)
        score = nn.Conv(1, (5, 5), name="last_conv")(x)[..., 0]
        return nn.relu(score)


# ------------------------------------------------------- patch CNNs


class _PatchCNN(nn.Module):
    """Shared conv trunk of HardNet/AffNet/OriNet: input (N, 32, 32, 1)."""

    channels: tuple
    strides: tuple
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        for i, (c, s) in enumerate(zip(self.channels, self.strides)):
            x = nn.Conv(c, (3, 3), strides=(s, s), use_bias=False,
                        name=f"conv{i}")(x)
            if self.norm == "instance":
                mu = jnp.mean(x, axis=(1, 2), keepdims=True)
                var = jnp.var(x, axis=(1, 2), keepdims=True)
                x = (x - mu) / jnp.sqrt(var + 1e-5)
            x = nn.relu(x)
        return x


class HardNet(nn.Module):
    """128-d patch descriptor (Mishchuk et al. 2017): 6 convs + final 8x8."""

    desc_dim: int = 128
    norm: str = "instance"

    @nn.compact
    def __call__(self, patches):
        # input norm (HardNet subtracts patch mean / std)
        mu = jnp.mean(patches, axis=(1, 2, 3), keepdims=True)
        sd = jnp.std(patches, axis=(1, 2, 3), keepdims=True) + 1e-6
        x = (patches - mu) / sd
        x = _PatchCNN(
            (32, 32, 64, 64, 128, 128),
            (1, 1, 2, 1, 2, 1),
            self.norm,
            name="trunk",
        )(x)  # (N, 8, 8, 128)
        x = nn.Conv(self.desc_dim, (8, 8), padding="VALID", use_bias=False,
                    name="final")(x)  # (N, 1, 1, D)
        x = x.reshape(x.shape[0], -1)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


class AffNet(nn.Module):
    """Affine-shape estimator (Mishkin et al. 2018): 3 params of a
    unit-determinant upper-triangular shape matrix."""

    norm: str = "instance"

    @nn.compact
    def __call__(self, patches):
        x = _PatchCNN(
            (16, 16, 32, 32, 64, 64), (1, 1, 2, 1, 2, 1), self.norm,
            name="trunk",
        )(patches)  # (N, 8, 8, 64)
        x = jnp.mean(x, axis=(1, 2))
        abc = nn.Dense(3, name="head")(x)
        # A = [[a, 0], [b, c]], started at identity, normalized to det 1
        a = 1.0 + 0.1 * abc[:, 0]
        b = 0.1 * abc[:, 1]
        c = 1.0 + 0.1 * abc[:, 2]
        det = jnp.sqrt(jnp.abs(a * c) + 1e-8)
        z = jnp.zeros_like(a)
        A = jnp.stack(
            [jnp.stack([a, z], -1), jnp.stack([b, c], -1)], axis=-2
        )
        return A / det[:, None, None]


# ------------------------------------------------------------ the model


class KeyNetAffNetHardNet(BaseModel):
    default_conf = {
        "max_num_keypoints": 1024,
        "desc_dim": 128,
        "upright": False,
        "estimate_affine_shape": True,
        "scale_laf": 1.0,
        "num_levels": 3,
        "num_filters": 8,
        "scale_factor": 1.2,
        "nms_radius": 4,
        "detection_threshold": 0.0,
        "mr_size": 6.0,  # patch radius = mr_size * level sigma (kornia conv.)
        "patch_size": 32,
        "norm": "instance",  # "none" for converted BN-folded weights
        "trainable": True,
    }
    required_data_keys = ("image",)

    def setup(self):
        c = self.conf
        self.keynet = KeyNet(
            c.num_levels, c.num_filters, float(c.scale_factor), c.norm,
            name="keynet",
        )
        self.hardnet = HardNet(c.desc_dim, c.norm, name="hardnet")
        if c.estimate_affine_shape:
            self.affnet = AffNet(c.norm, name="affnet")

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        image = data["image"]
        if image.shape[-1] == 3:
            scale = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = jnp.sum(image * scale, axis=-1, keepdims=True)
        B, H, W, _ = image.shape
        K = int(c.max_num_keypoints)

        scores = self.keynet(image)  # (B, H, W)
        scores = simple_nms(scores, int(c.nms_radius))
        scores = remove_borders(scores, int(c.nms_radius) + 2)
        kpts, kp_scores, valid = top_k_keypoints(
            scores, K, float(c.detection_threshold), nms_radius=int(c.nms_radius)
        )  # (B, K, 2) xy, (B, K), (B, K)

        # patch radius in pixels (kornia: mr_size * detection sigma; the
        # fused map detects at base sigma ~1)
        radius = jnp.full((B, K), float(c.mr_size) * float(c.scale_laf))
        imgs = image[..., 0]

        def per_image(img, kp, rad):
            up = sample_oriented_patches(
                img, kp, rad, jnp.zeros(K), None, int(c.patch_size)
            )
            if c.estimate_affine_shape:
                A = self.affnet(up[..., None])
            else:
                A = jnp.broadcast_to(jnp.eye(2), (K, 2, 2))
            if c.upright:
                ori = jnp.zeros(K)
            else:
                shaped = sample_oriented_patches(
                    img, kp, rad, jnp.zeros(K), A, int(c.patch_size)
                )
                ori = dominant_gradient_orientation(shaped)
            final = sample_oriented_patches(
                img, kp, rad, ori, A, int(c.patch_size)
            )
            desc = self.hardnet(final[..., None])
            return desc, ori, A

        descs, oris, As = [], [], []
        for b in range(B):  # static python loop; B is small and static
            d, o, A = per_image(imgs[b], kpts[b], radius[b])
            descs.append(d)
            oris.append(o)
            As.append(A)
        descs = jnp.stack(descs)
        oris = jnp.stack(oris)
        As = jnp.stack(As)

        return {
            "keypoints": kpts.astype(jnp.float32),
            "keypoint_scores": kp_scores.astype(jnp.float32),
            "keypoint_valid": valid,
            "scales": radius.astype(jnp.float32),
            "oris": oris.astype(jnp.float32),
            "affine_shapes": As.astype(jnp.float32),
            "descriptors": descs.astype(jnp.float32),
        }

    def loss(self, pred: dict, data: dict):
        raise NotImplementedError  # matches the reference wrapper
