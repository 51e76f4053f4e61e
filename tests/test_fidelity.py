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
    assert fidelity.ssim_global(a, a) == pytest.approx(1.0, abs=1e-9)
    b = a + 0.1
    assert 20 < fidelity.psnr(a, b) < 30
    assert fidelity.ssim(a, b) < 1.0


def test_windowed_ssim_matches_naive(rng):
    """The separable-filter windowed SSIM equals a direct per-window
    evaluation of the Wang et al. formula."""
    a = rng.uniform(-1, 1, (20, 24, 2))
    b = a + 0.15 * rng.standard_normal((20, 24, 2))
    k1 = fidelity._gaussian_kernel1d(11, 1.5)
    k2 = np.outer(k1, k1)  # (11, 11) full window
    c1 = (0.01 * 2.0) ** 2
    c2 = (0.03 * 2.0) ** 2
    vals = []
    for ch in range(2):
        for i in range(20 - 10):
            for j in range(24 - 10):
                wa = a[i : i + 11, j : j + 11, ch]
                wb = b[i : i + 11, j : j + 11, ch]
                mu_a = (k2 * wa).sum()
                mu_b = (k2 * wb).sum()
                va = (k2 * wa * wa).sum() - mu_a**2
                vb = (k2 * wb * wb).sum() - mu_b**2
                cov = (k2 * wa * wb).sum() - mu_a * mu_b
                vals.append(
                    (2 * mu_a * mu_b + c1) * (2 * cov + c2)
                    / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
                )
    assert fidelity.ssim(a, b) == pytest.approx(float(np.mean(vals)), abs=1e-10)


def test_windowed_ssim_punishes_local_damage():
    """Flattening one 8x8 patch of a smooth image barely moves the global
    statistics (global SSIM ~0.999) but destroys local structure; the
    windowed score must drop an order of magnitude harder."""
    y, x = np.mgrid[0:64, 0:64]
    a = (np.sin(x / 5.0) * np.cos(y / 7.0))[..., None]
    b = a.copy()
    b[28:36, 28:36] = a[28:36, 28:36].mean()
    drop_windowed = 1.0 - fidelity.ssim(a, b)
    drop_global = 1.0 - fidelity.ssim_global(a, b)
    assert drop_windowed > 10 * drop_global


def test_lpips_graceful_without_weights(rng, tmp_path):
    a = rng.uniform(-1, 1, (64, 64, 4))
    assert fidelity.lpips(a, a, None) is None
    assert fidelity.lpips(a, a, str(tmp_path / "missing.pt")) is None


def test_lpips_hook_with_synthetic_weights(rng, tmp_path):
    """Exercise the full LPIPS(alex) forward with randomly initialized
    weights in the official lpips-package state-dict layout: zero distance on
    identical frames, positive on different ones."""
    import torch

    gen = torch.Generator().manual_seed(0)
    sd = {}
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    conv_idx = [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)]
    for (si, ci), (cin, cout, k) in zip(conv_idx, chans):
        sd[f"net.slice{si}.{ci}.weight"] = 0.1 * torch.randn(cout, cin, k, k, generator=gen)
        sd[f"net.slice{si}.{ci}.bias"] = torch.zeros(cout)
    for i, (_, cout, _) in enumerate(chans):
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, cout, 1, 1, generator=gen)
    path = tmp_path / "lpips_alex.pt"
    torch.save(sd, path)

    a = rng.uniform(-1, 1, (64, 64, 4)).astype(np.float32)
    b = a + 0.3 * rng.standard_normal((64, 64, 4)).astype(np.float32)
    assert fidelity.lpips(a, a, str(path)) == pytest.approx(0.0, abs=1e-12)
    assert fidelity.lpips(a, b, str(path)) > 0.0


def test_lpips_proxy_self_contained(rng):
    """The random-feature perceptual proxy needs no weights files: zero on
    identical frames, monotone in perturbation size, deterministic."""
    a = rng.uniform(-1, 1, (64, 64, 4)).astype(np.float32)
    assert fidelity.lpips_proxy(a, a) == pytest.approx(0.0, abs=1e-10)
    small = a + 0.02 * rng.standard_normal(a.shape).astype(np.float32)
    large = a + 0.4 * rng.standard_normal(a.shape).astype(np.float32)
    d_small = fidelity.lpips_proxy(a, small)
    d_large = fidelity.lpips_proxy(a, large)
    assert 0.0 < d_small < d_large
    assert fidelity.lpips_proxy(a, small) == pytest.approx(d_small, rel=1e-6)
    # Grayscale input path.
    g = rng.uniform(-1, 1, (32, 32)).astype(np.float32)
    assert fidelity.lpips_proxy(g, g) == pytest.approx(0.0, abs=1e-10)


def test_lpips_proxy_shift_robustness():
    """The LPIPS-shaped property deep-feature distances add over pixel
    metrics: robustness to imperceptible geometric shifts.  At exactly
    matched per-pixel MSE, a 1-px translation (visually identical) must
    score well below iid noise of the same energy — PSNR cannot tell the
    two apart at all."""
    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:64, 0:64]
    a = (np.sin(x / 5.0) * np.cos(y / 7.0)).astype(np.float32)[..., None]
    a = np.repeat(a, 3, axis=-1)
    shifted = np.roll(a, 1, axis=1)
    mse = float(np.mean((a - shifted) ** 2))
    noise = rng.standard_normal(a.shape).astype(np.float32)
    noisy = a + noise * np.sqrt(mse / float(np.mean(noise**2)))
    assert fidelity.psnr(a, shifted) == pytest.approx(fidelity.psnr(a, noisy), abs=0.1)
    assert 2.0 * fidelity.lpips_proxy(a, shifted) < fidelity.lpips_proxy(a, noisy)


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
