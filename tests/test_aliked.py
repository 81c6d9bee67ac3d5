"""ALIKED official-weight compatibility: the deformable conv matches
torchvision `deform_conv2d` semantics (re-derived in numpy here), the
align-corners upsample matches torch, and an official-shaped state_dict
converts and runs (reference `gluefactory/models/extractors/aliked.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.models.extractors.aliked import (
    DeformConv,
    bilinear_zero,
    upsample_align_corners,
)


def _np_deform_conv(x, offset, weight, bias):
    """Independent numpy re-statement of torchvision.ops.deform_conv2d
    (stride 1, pad 1, 3x3): sample x at p + p_k + Dp_k bilinearly with zero
    padding, then apply the regular conv weight. Layouts: x (H, W, C),
    offset (H, W, 18) as (dy, dx) per tap row-major, weight (O, C, 3, 3)."""
    H, W, C = x.shape
    O = weight.shape[0]
    out = np.zeros((H, W, O))
    for h in range(H):
        for w in range(W):
            acc = np.zeros(O)
            for ti in range(3):
                for tj in range(3):
                    k = ti * 3 + tj
                    py = h - 1 + ti + offset[h, w, 2 * k]
                    px = w - 1 + tj + offset[h, w, 2 * k + 1]
                    y0, x0 = int(np.floor(py)), int(np.floor(px))
                    wy, wx = py - y0, px - x0
                    v = np.zeros(C)
                    for dy, dx, ww in [
                        (0, 0, (1 - wy) * (1 - wx)),
                        (0, 1, (1 - wy) * wx),
                        (1, 0, wy * (1 - wx)),
                        (1, 1, wy * wx),
                    ]:
                        yy, xx = y0 + dy, x0 + dx
                        if 0 <= yy < H and 0 <= xx < W:
                            v += ww * x[yy, xx]
                    acc += weight[:, :, ti, tj] @ v
            out[h, w] = acc + bias
    return out


def test_deform_conv_matches_torchvision_semantics():
    rng = np.random.RandomState(0)
    H, W, C, O = 6, 7, 3, 4
    x = rng.randn(H, W, C).astype(np.float32)
    dc = DeformConv(O)
    params = dc.init(jax.random.PRNGKey(0), jnp.asarray(x)[None])
    # plant non-trivial offsets through the offset conv params
    okern = rng.randn(3, 3, C, 18).astype(np.float32) * 0.3
    obias = rng.randn(18).astype(np.float32) * 0.3
    wmat = rng.randn(9 * C, O).astype(np.float32)
    params = {
        "params": {
            "offset_conv": {"kernel": jnp.asarray(okern), "bias": jnp.asarray(obias)},
            "weight": jnp.asarray(wmat),
        }
    }
    got = np.asarray(dc.apply(params, jnp.asarray(x)[None]))[0]

    # offsets the module actually used: plain SAME conv
    import scipy.signal as ss

    offset = np.zeros((H, W, 18), np.float32)
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    for o in range(18):
        acc = np.zeros((H, W))
        for c in range(C):
            acc += ss.correlate2d(xp[:, :, c], okern[:, :, c, o], mode="valid")
        offset[:, :, o] = acc + obias[o]
    offset = np.clip(offset, -max(H, W) / 4.0, max(H, W) / 4.0)

    # torch-layout regular weight (O, C, 3, 3) from our (9C, O) tap-major
    wt = wmat.reshape(3, 3, C, O).transpose(3, 2, 0, 1)
    want = _np_deform_conv(x, offset, wt, np.zeros(O))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upsample_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 6, 3).astype(np.float32)
    for factor in (2, 4):
        H, W = 5 * factor, 6 * factor
        got = np.asarray(upsample_align_corners(jnp.asarray(x), H, W))
        up = torch.nn.Upsample(scale_factor=factor, mode="bilinear", align_corners=True)
        want = (
            up(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_zero_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    B, H, W, C = 2, 8, 9, 4
    x = rng.randn(B, H, W, C).astype(np.float32)
    px = rng.uniform(-1.5, W + 0.5, (B, 20)).astype(np.float32)
    py = rng.uniform(-1.5, H + 0.5, (B, 20)).astype(np.float32)
    got = np.asarray(bilinear_zero(jnp.asarray(x), jnp.asarray(px), jnp.asarray(py)))
    # torch grid_sample with align_corners=True on normalized coords
    gx = 2 * torch.from_numpy(px) / (W - 1) - 1
    gy = 2 * torch.from_numpy(py) / (H - 1) - 1
    grid = torch.stack([gx, gy], -1).view(B, 1, -1, 2)
    want = (
        torch.nn.functional.grid_sample(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            grid,
            mode="bilinear",
            align_corners=True,
        )[:, :, 0, :]
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def _fake_official_state_dict(rng, cfg):
    """State dict with the official ALIKED key names and shapes."""
    c1, c2, c3, c4, dim, M = cfg["c1"], cfg["c2"], cfg["c3"], cfg["c4"], cfg["dim"], cfg["M"]
    sd = {}

    def conv(name, o, i, k, bias):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.2
        if bias:
            sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.1

    def bn(name, c):
        sd[f"{name}.weight"] = 1 + 0.1 * rng.randn(c).astype(np.float32)
        sd[f"{name}.bias"] = 0.1 * rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = 0.1 * rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(1 + 0.1 * rng.randn(c)).astype(np.float32)

    conv("block1.conv1", c1, 3, 3, False); bn("block1.bn1", c1)
    conv("block1.conv2", c1, c1, 3, False); bn("block1.bn2", c1)
    conv("block2.conv1", c2, c1, 3, False); bn("block2.bn1", c2)
    conv("block2.conv2", c2, c2, 3, False); bn("block2.bn2", c2)
    conv("block2.downsample", c2, c1, 1, True)
    for name, ci, co in (("block3", c2, c3), ("block4", c3, c4)):
        for j, (i_, o_) in enumerate(((ci, co), (co, co))):
            conv(f"{name}.conv{j+1}.offset_conv", 18, i_, 3, True)
            conv(f"{name}.conv{j+1}.regular_conv", o_, i_, 3, False)
        bn(f"{name}.bn1", co); bn(f"{name}.bn2", co)
        conv(f"{name}.downsample", co, ci, 1, True)
    conv("conv1", dim // 4, c1, 1, False)
    conv("conv2", dim // 4, c2, 1, False)
    conv("conv3", dim // 4, c3, 1, False)
    conv("conv4", dim // 4, c4, 1, False)
    conv("score_head.0", 8, dim, 1, False)
    conv("score_head.2", 4, 8, 3, False)
    conv("score_head.4", 4, 4, 3, False)
    conv("score_head.6", 1, 4, 3, False)
    conv("desc_head.offset_conv.0", 2 * M, dim, 3, True)
    conv("desc_head.offset_conv.2", 2 * M, 2 * M, 1, True)
    conv("desc_head.sf_conv", dim, dim, 1, False)
    sd["desc_head.agg_weights"] = rng.randn(M, dim, dim).astype(np.float32) * 0.1
    return sd


def test_aliked_conversion_and_forward():
    from gluefactory_tpu.models.extractors.aliked import CFGS
    from gluefactory_tpu.utils.torch_weights import convert_aliked

    cfg = CFGS["aliked-t16"]
    rng = np.random.RandomState(3)
    sd = _fake_official_state_dict(rng, cfg)
    variables = convert_aliked(sd, "aliked-t16")

    model = get_model("aliked").from_conf(
        {
            "name": "aliked",
            "model_name": "aliked-t16",
            "max_num_keypoints": 128,
            "detection_threshold": 0.0,
        }
    )
    img = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    # structure must match init exactly
    ref = model.init(jax.random.PRNGKey(0), {"image": img}, train=False)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, variables)
    assert ref_shapes == got_shapes

    pred = model.apply(variables, {"image": img}, train=False)
    assert pred["keypoints"].shape == (1, 128, 2)
    assert pred["descriptors"].shape[-1] == cfg["dim"]
    assert bool(jnp.any(pred["keypoint_valid"]))
    d = np.asarray(pred["descriptors"])[np.asarray(pred["keypoint_valid"])]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
