"""From-scratch DINOv2 backbone: forward-numerics parity against a randomly
initialized torch `transformers.Dinov2Model` oracle (same architecture as the
reference's torch.hub DINOv2, `gluefactory/models/backbones/dinov2.py:7-30`),
through the real conversion map — converted official checkpoints therefore
reproduce reference outputs. Covers the no-resize path, the bicubic
position-embedding interpolation path, and the SwiGLU (giant) FFN variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gluefactory_tpu.models import get_model  # noqa: E402
from gluefactory_tpu.utils.torch_weights import convert_dinov2  # noqa: E402

DIM, DEPTH, HEADS, PATCH, GRID = 64, 2, 4, 14, 70


def _oracle(use_swiglu=False):
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=DIM,
        num_hidden_layers=DEPTH,
        num_attention_heads=HEADS,
        intermediate_size=4 * DIM,
        patch_size=PATCH,
        image_size=GRID,
        use_swiglu_ffn=use_swiglu,
    )
    m = Dinov2Model(cfg).eval()
    # randomize the constant-initialized params so the test is non-trivial
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for n, p in m.named_parameters():
            if "lambda1" in n or "cls_token" in n or "position_embeddings" in n:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.3)
    return m


def _ours(m, use_swiglu=False):
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    model = get_model("backbones.dinov2").from_conf(
        {
            "preset": "custom",
            "embed_dim": DIM,
            "depth": DEPTH,
            "num_heads": HEADS,
            "ffn": "swiglu" if use_swiglu else "mlp",
            "pos_grid_size": GRID,
        }
    )
    return model, convert_dinov2(sd)


def _compare(m, model, variables, h, w, atol):
    rng = np.random.RandomState(1)
    img = rng.rand(2, h, w, 3).astype(np.float32)
    with torch.no_grad():
        ref = m(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out = jax.jit(lambda v, d: model.apply(v, d, train=False))(
        variables, {"image": jnp.asarray(img)}
    )
    ref_cls = ref.last_hidden_state[:, 0].numpy()
    ref_patches = ref.last_hidden_state[:, 1:].numpy()
    np.testing.assert_allclose(
        np.asarray(out["global_descriptor"]), ref_cls, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(out["descriptors"]), ref_patches, atol=atol
    )
    assert out["features"].shape == (2, h // PATCH, w // PATCH, DIM)


def test_forward_parity():
    m = _oracle()
    model, variables = _ours(m)
    _compare(m, model, variables, GRID, GRID, 2e-5)


def test_forward_parity_interpolated_positions():
    """Non-square input forces the bicubic position-grid resample; our
    separable-matmul bicubic reproduces torch `F.interpolate` exactly."""
    m = _oracle()
    model, variables = _ours(m)
    _compare(m, model, variables, GRID, GRID + PATCH, 2e-5)


def test_forward_parity_swiglu():
    m = _oracle(use_swiglu=True)
    model, variables = _ours(m, use_swiglu=True)
    _compare(m, model, variables, GRID, GRID, 2e-5)


def test_grayscale_and_resize():
    model = get_model("backbones.dinov2").from_conf(
        {
            "preset": "custom",
            "embed_dim": DIM,
            "depth": DEPTH,
            "num_heads": HEADS,
            "pos_grid_size": GRID,
            "allow_resize": True,
        }
    )
    img = jnp.asarray(np.random.RandomState(0).rand(1, 60, 75, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"image": img}, train=False)
    out = model.apply(variables, {"image": img}, train=False)
    # 60x75 -> resized to 56x70 -> 4x5 patches
    assert out["features"].shape == (1, 4, 5, DIM)
    assert out["global_descriptor"].shape == (1, DIM)
    assert np.all(np.isfinite(np.asarray(out["descriptors"])))
