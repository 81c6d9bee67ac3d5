"""Official-architecture DISK: structure + numerics against a torch oracle.

The reference consumes DISK through kornia
(`gluefactory/models/extractors/disk_kornia.py:28`,
`kornia.feature.DISK.from_pretrained`). kornia is not installed here, so the
oracle below re-implements the published thin U-Net plan in plain torch with
the same module-tree key layout (`unet.path_down.{i}.*` / `unet.path_up.{j}.*`)
and the documented semantics: 5x5 pre-activation convs
(InstanceNorm2d(affine=False) -> per-channel PReLU -> Conv2d), 2x2 average
pool downsampling, nearest 2x upsampling, first down block conv-only,
up-block input = cat([upsampled_bottom, skip]), channel plan
down=[16,32,64,64,64] / up=[64,64,64,129], output = [desc(128), heatmap(1)].
`convert_disk` matches structurally within block prefixes, so it loads this
oracle's state dict the same way it would load the kornia checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from gluefactory_tpu.models import get_model
from gluefactory_tpu.utils.torch_weights import convert_disk


class _TorchConvUnit(nn.Module):
    def __init__(self, in_, out_, first=False):
        super().__init__()
        self.first = first
        if not first:
            self.norm = nn.InstanceNorm2d(in_, affine=False)
            self.gate = nn.PReLU(in_)
        self.conv = nn.Conv2d(in_, out_, 5, padding=2, bias=True)

    def forward(self, x):
        if not self.first:
            x = self.gate(self.norm(x))
        return self.conv(x)


class _TorchThinUNet(nn.Module):
    def __init__(self, down=(16, 32, 64, 64, 64), up=(64, 64, 64, 129)):
        super().__init__()
        dims = (3,) + tuple(down)
        self.path_down = nn.ModuleList(
            _TorchConvUnit(i, o, first=(n == 0))
            for n, (i, o) in enumerate(zip(dims[:-1], dims[1:]))
        )
        bot = (down[-1],) + tuple(up[:-1])
        hor = dims[-2::-1]
        self.path_up = nn.ModuleList(
            _TorchConvUnit(b + h, o) for b, h, o in zip(bot, hor, up)
        )

    def forward(self, x):
        feats = [self.path_down[0](x)]
        for blk in self.path_down[1:]:
            feats.append(blk(F.avg_pool2d(feats[-1], 2)))
        y = feats[-1]
        for blk, skip in zip(self.path_up, feats[-2::-1]):
            y = F.interpolate(y, scale_factor=2, mode="nearest")
            y = blk(torch.cat([y, skip], dim=1))
        return y


class _TorchDISK(nn.Module):
    def __init__(self):
        super().__init__()
        self.unet = _TorchThinUNet()


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    m = _TorchDISK()
    # non-default PReLU slopes so the gate actually gets tested
    with torch.no_grad():
        for p in m.modules():
            if isinstance(p, nn.PReLU):
                p.weight.uniform_(0.1, 0.5)
    m.eval()
    return m


def test_convert_disk_structure(oracle):
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_disk(sd)

    model = get_model("disk").from_conf(
        {"name": "disk", "arch": "official", "max_num_keypoints": 64}
    )
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), {"image": img}, train=False)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, variables)
    assert ref_shapes == got_shapes


def test_dense_forward_parity(oracle):
    """Converted weights reproduce the torch forward to float tolerance."""
    rng = np.random.RandomState(0)
    img = rng.rand(2, 48, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = oracle.unet(torch.from_numpy(img).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()  # (B, H, W, 129)

    variables = convert_disk({k: v.numpy() for k, v in oracle.state_dict().items()})
    from gluefactory_tpu.models.extractors.disk import ThinUNet

    got = ThinUNet().apply(
        {"params": variables["params"]["unet"]}, jnp.asarray(img)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_model_forward_and_padding(oracle):
    """Full extractor on a non-/16 size: pad, crop, detect, sample."""
    variables = convert_disk({k: v.numpy() for k, v in oracle.state_dict().items()})
    model = get_model("disk").from_conf(
        {
            "name": "disk",
            "arch": "official",
            "max_num_keypoints": 128,
            "detection_threshold": 0.0,
        }
    )
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 41, 59, 3), jnp.float32)
    pred = model.apply(variables, {"image": img}, train=False)
    assert pred["keypoints"].shape == (1, 128, 2)
    assert pred["descriptors"].shape == (1, 128, 128)
    assert bool(jnp.any(pred["keypoint_valid"]))
    d = np.asarray(pred["descriptors"])[np.asarray(pred["keypoint_valid"])]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    kp = np.asarray(pred["keypoints"])[np.asarray(pred["keypoint_valid"])]
    assert kp[:, 0].max() < 59 and kp[:, 1].max() < 41


def test_scalar_prelu_broadcast(oracle):
    """A checkpoint storing scalar PReLU slopes still converts."""
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    sd2 = {
        k: (v[:1] if k.endswith("gate.weight") else v) for k, v in sd.items()
    }
    v2 = convert_disk(sd2)
    for name, blk in v2["params"]["unet"].items():
        if name != "down_0":
            assert blk["alpha"].ndim == 1 and blk["alpha"].shape[0] > 1
