"""Fidelity tool: metrics sanity + full cross-framework comparison on the
shipped lambda_00 model (the BASELINE parity check, end to end)."""

import numpy as np
import pytest

from tests.conftest import reference_available
from tha4_tpu.utils import fidelity


def test_psnr_ssim_basics(rng):
    a = rng.uniform(-1, 1, (32, 32, 4))
    assert fidelity.psnr(a, a) == float("inf")
    assert fidelity.ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    b = a + 0.1
    assert 20 < fidelity.psnr(a, b) < 30
    assert fidelity.ssim(a, b) < 1.0


def test_pose_suite_ranges():
    poses = fidelity.random_pose_suite(32, seed=1)
    assert poses.shape == (32, 45)
    assert poses[:, :35].min() >= 0
    assert poses[:, 35:42].min() < 0  # rotation dims span (-1, 1)
    np.testing.assert_array_equal(poses, fidelity.random_pose_suite(32, seed=1))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_lambda00_parity_vs_reference():
    stats = fidelity.compare_with_reference(
        "/root/reference/data/character_models/lambda_00/character_model.yaml",
        num_poses=4,
    )
    assert stats is not None
    # f32 CPU run of both frameworks on identical weights: near-identical.
    assert stats["psnr_min"] > 60.0, stats
    assert stats["ssim_mean"] > 0.999, stats
