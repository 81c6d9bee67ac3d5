"""Numerical parity of the LightGlue loss vs an independent torch
re-implementation of the reference formulation
(`/root/reference/gluefactory/models/matchers/lightglue.py:257-268` +
`/root/reference/gluefactory/models/utils/losses.py:6-60`), written from the
published equations, on random inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gluefactory_tpu.models.utils.losses import nll_loss
from gluefactory_tpu.ops.assignment import sigmoid_log_double_softmax, with_dustbins


def torch_log_assignment(sim, z0, z1):
    """Reference math: double-softmax + matchability, dustbins logsigmoid(-z)."""
    b, m, n = sim.shape
    certainties = F.logsigmoid(z0)[:, :, None] + F.logsigmoid(z1)[:, None, :]
    scores0 = F.log_softmax(sim, 2)
    scores1 = F.log_softmax(sim.transpose(-1, -2).contiguous(), 2).transpose(-1, -2)
    scores = sim.new_full((b, m + 1, n + 1), 0.0)
    scores[:, :m, :n] = scores0 + scores1 + certainties
    scores[:, :-1, -1] = F.logsigmoid(-z0)
    scores[:, -1, :-1] = F.logsigmoid(-z1)
    return scores


def torch_nll(la, gt0, gt1, balancing=0.5):
    """Reference math: weight matrix from GT labels, joint pos/neg balance."""
    b, mp1, np1 = la.shape
    m, n = mp1 - 1, np1 - 1
    weights = torch.zeros_like(la)
    for bi in range(b):
        for i in range(m):
            j = int(gt0[bi, i])
            if j >= 0:
                weights[bi, i, j] = 1.0
            elif j == -1:
                weights[bi, i, n] = 1.0
        for j in range(n):
            if int(gt1[bi, j]) == -1:
                weights[bi, m, j] = 1.0
    loss_sc = la * weights
    num_neg0 = weights[:, :m, -1].sum(-1).clamp(min=1.0)
    num_neg1 = weights[:, -1, :n].sum(-1).clamp(min=1.0)
    num_pos = weights[:, :m, :n].sum((-1, -2)).clamp(min=1.0)
    nll_pos = -loss_sc[:, :m, :n].sum((-1, -2)) / num_pos
    nll_neg = (-loss_sc[:, :m, -1].sum(-1) - loss_sc[:, -1, :n].sum(-1)) / (
        num_neg0 + num_neg1
    )
    return balancing * nll_pos + (1 - balancing) * nll_neg


def random_case(rng, B=2, N=12, M=10):
    sim = rng.randn(B, N, M).astype(np.float32)
    z0 = rng.randn(B, N).astype(np.float32)
    z1 = rng.randn(B, M).astype(np.float32)
    # GT labels: mix of positives, unmatched (-1), ignore (-2)
    gt0 = np.full((B, N), -1, np.int32)
    gt1 = np.full((B, M), -1, np.int32)
    for b in range(B):
        perm = rng.permutation(min(N, M))[: rng.randint(1, min(N, M))]
        for i, j in enumerate(perm):
            gt0[b, i] = j
            gt1[b, j] = i
        # sprinkle ignores
        ig0 = rng.choice(N, 2, replace=False)
        for i in ig0:
            if gt0[b, i] == -1:
                gt0[b, i] = -2
    return sim, z0, z1, gt0, gt1


@pytest.mark.parametrize("balancing", [0.5, 0.3])
def test_nll_parity_vs_reference_formulation(balancing):
    rng = np.random.RandomState(0)
    max_err = 0.0
    for _ in range(100):
        sim, z0, z1, gt0, gt1 = random_case(rng)
        # torch side
        la_t = torch_log_assignment(
            torch.from_numpy(sim), torch.from_numpy(z0), torch.from_numpy(z1)
        )
        nll_t = torch_nll(la_t, gt0, gt1, balancing).numpy()
        # jax side: inner scores then dustbins, as the model does in training
        inner = sigmoid_log_double_softmax(
            jnp.asarray(sim), jnp.asarray(z0), jnp.asarray(z1)
        )
        la_j = with_dustbins(inner, jnp.asarray(z0), jnp.asarray(z1))
        out = nll_loss(
            la_j, jnp.asarray(gt0), jnp.asarray(gt1), nll_balancing=balancing
        )
        nll_j = np.asarray(out["assignment_nll"])
        max_err = max(max_err, float(np.max(np.abs(nll_j - nll_t))))
    assert max_err < 1e-5, max_err


def test_log_assignment_matrix_parity():
    """The full (N+1, M+1) matrix itself matches entry-wise."""
    rng = np.random.RandomState(1)
    sim, z0, z1, _, _ = random_case(rng)
    la_t = torch_log_assignment(
        torch.from_numpy(sim), torch.from_numpy(z0), torch.from_numpy(z1)
    ).numpy()
    inner = sigmoid_log_double_softmax(
        jnp.asarray(sim), jnp.asarray(z0), jnp.asarray(z1)
    )
    la_j = np.asarray(with_dustbins(inner, jnp.asarray(z0), jnp.asarray(z1)))
    np.testing.assert_allclose(la_j, la_t, atol=1e-5)


def test_masked_padding_does_not_change_loss():
    """Padding extra invalid keypoints must leave the NLL unchanged."""
    rng = np.random.RandomState(2)
    sim, z0, z1, gt0, gt1 = random_case(rng, B=1, N=8, M=6)
    inner = sigmoid_log_double_softmax(
        jnp.asarray(sim), jnp.asarray(z0), jnp.asarray(z1)
    )
    la = with_dustbins(inner, jnp.asarray(z0), jnp.asarray(z1))
    base = np.asarray(nll_loss(la, jnp.asarray(gt0), jnp.asarray(gt1))["assignment_nll"])

    # pad with 4 invalid keypoints on each side (gt label -2 = ignore)
    P = 4
    simp = np.pad(sim, ((0, 0), (0, P), (0, P)), constant_values=0.0)
    z0p = np.pad(z0, ((0, 0), (0, P)), constant_values=0.0)
    z1p = np.pad(z1, ((0, 0), (0, P)), constant_values=0.0)
    gt0p = np.pad(gt0, ((0, 0), (0, P)), constant_values=-2)
    gt1p = np.pad(gt1, ((0, 0), (0, P)), constant_values=-2)
    mask0 = np.pad(np.ones((1, 8), bool), ((0, 0), (0, P)))
    mask1 = np.pad(np.ones((1, 6), bool), ((0, 0), (0, P)))
    innerp = sigmoid_log_double_softmax(
        jnp.asarray(simp), jnp.asarray(z0p), jnp.asarray(z1p),
        jnp.asarray(mask0), jnp.asarray(mask1),
    )
    lap = with_dustbins(
        innerp, jnp.asarray(z0p), jnp.asarray(z1p),
        jnp.asarray(mask0), jnp.asarray(mask1),
    )
    padded = np.asarray(
        nll_loss(lap, jnp.asarray(gt0p), jnp.asarray(gt1p))["assignment_nll"]
    )
    np.testing.assert_allclose(padded, base, atol=1e-5)
