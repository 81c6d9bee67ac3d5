"""Weight-gated golden integration test
(reference `tests/test_integration.py:50-135`).

The accuracy-parity gate: official SP+LG weights on the reference's boat
pair through the full match + device-RANSAC stack, asserting the reference's
published floors. No egress exists on this machine, so the test SKIPS until
the official torch checkpoints are mounted at the documented paths
(`gluefactory_tpu/eval/golden.py:OFFICIAL_WEIGHTS`).

The conversion leg runs weight-free below: a fixture-shaped state dict with
the official tensor layout goes through the same convert -> pipeline ->
boat-pair -> RANSAC path end to end (no accuracy floors — random weights).
"""

import numpy as np
import pytest

from gluefactory_tpu.eval.golden import (
    GOLDEN_FLOORS,
    OFFICIAL_WEIGHTS,
    build_official_pipeline,
    find_boat_images,
    official_weights_available,
    run_boat_golden,
)


@pytest.mark.skipif(
    not official_weights_available(),
    reason=(
        "official weights not mounted (no egress on this machine); expected "
        + " and ".join(str(p) for p in OFFICIAL_WEIGHTS.values())
    ),
)
def test_golden_boat_pair_official_weights():
    results = run_boat_golden(max_num_keypoints=2048)
    assert results["num_matches"] > GOLDEN_FLOORS["num_matches"], results
    assert results["prec@3px"] > GOLDEN_FLOORS["prec@3px"], results
    assert results["H_error_ransac"] < GOLDEN_FLOORS["H_error_ransac"], results


@pytest.mark.skipif(find_boat_images() is None, reason="boat pair not found")
def test_golden_plumbing_with_fixture_weights():
    """The full golden path runs with official-layout random weights:
    convert -> pipeline assembly -> forward -> metrics -> device RANSAC.
    Guarantees the gated test above cannot fail on plumbing the day the
    real checkpoints appear."""
    from test_torch_weights import fake_lightglue_sd, fake_superpoint_sd

    rng = np.random.RandomState(0)
    sp_sd = {k: v * 0.1 for k, v in fake_superpoint_sd().items()}
    lg_sd = fake_lightglue_sd(L=9, D=256)
    model, variables = build_official_pipeline(
        sp_weights=sp_sd, lg_weights=lg_sd, max_num_keypoints=128
    )
    results = run_boat_golden(model=model, variables=variables,
                              max_num_keypoints=128)
    # random weights: only shape/finiteness guarantees, no accuracy floors
    for key in ("num_matches", "prec@3px", "H_error_dlt", "H_error_ransac"):
        assert key in results, sorted(results)
    assert results["num_matches"] >= 0
    assert 0 <= results["prec@3px"] <= 1
