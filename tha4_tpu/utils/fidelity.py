"""Fidelity metrics: PSNR / SSIM between rendered frames.

The BASELINE north star is output parity with the PyTorch reference
(PSNR/LPIPS).  LPIPS needs pretrained perceptual weights that are not
bundled, so the built-in metrics are PSNR and SSIM; ``compare_with_reference``
runs the original torch implementation side by side when it is mounted.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

SIGNAL_RANGE = 2.0  # model units are [-1, 1]


def psnr(a: np.ndarray, b: np.ndarray, signal_range: float = SIGNAL_RANGE) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(signal_range ** 2 / mse)


def ssim(a: np.ndarray, b: np.ndarray, signal_range: float = SIGNAL_RANGE) -> float:
    """Global-statistics SSIM (single window over the image, per channel).

    A full windowed SSIM needs a gaussian pyramid; for regression tracking
    between near-identical renders the global form is a stable scalar.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c1 = (0.01 * signal_range) ** 2
    c2 = (0.03 * signal_range) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
    )


def random_pose_suite(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic pose set covering the schema ranges."""
    from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters

    pp = get_pose_parameters()
    rng = np.random.default_rng(seed)
    poses = rng.uniform(0, 1, (n, pp.get_parameter_count())).astype(np.float32)
    for group in pp.get_pose_parameter_groups():
        lo, hi = group.get_range()
        for k in range(group.arity):
            idx = group.parameter_index + k
            poses[:, idx] = poses[:, idx] * (hi - lo) + lo
    return poses


def compare_posers(poser_a, poser_b, image, poses: np.ndarray, output_index: int = 0) -> Dict:
    """Frame-by-frame PSNR/SSIM between two Poser implementations."""
    psnrs: List[float] = []
    ssims: List[float] = []
    for pose in poses:
        fa = np.asarray(poser_a.pose(image, pose, output_index))
        fb = np.asarray(poser_b.pose(image, pose, output_index))
        psnrs.append(psnr(fa, fb))
        ssims.append(ssim(fa, fb))
    return {
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_min": float(np.min(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
        "frames": len(psnrs),
    }


def compare_with_reference(
    character_model_yaml: str,
    num_poses: int = 16,
    reference_src: str = "/root/reference/src",
    seed: int = 0,
) -> Optional[Dict]:
    """Render the same pose suite through this framework and the original
    PyTorch implementation; returns PSNR/SSIM stats (None if the reference
    is not mounted)."""
    import os
    import sys

    if not os.path.isdir(reference_src):
        return None
    if reference_src not in sys.path:
        sys.path.insert(0, reference_src)
    import torch

    from tha4_tpu.charmodel import CharacterModel

    ours = CharacterModel.load(character_model_yaml)
    poser = ours.get_poser()
    image = ours.get_character_image()

    # Load the reference poser through its mode_14 loaders directly (the
    # reference CharacterModel class pulls in omegaconf, which may be absent).
    import tha4.poser.modes.mode_14 as ref_mode_14

    ref_poser = ref_mode_14.create_poser(
        torch.device("cpu"),
        module_file_names={
            ref_mode_14.KEY_FACE_MORPHER: ours.face_morpher_file_name,
            ref_mode_14.KEY_BODY_MORPHER: ours.body_morpher_file_name,
        },
    )
    ref_image = torch.from_numpy(
        np.ascontiguousarray(np.transpose(image, (2, 0, 1)))
    ).float()

    poses = random_pose_suite(num_poses, seed)
    psnrs, ssims = [], []
    for pose in poses:
        fa = np.asarray(poser.pose(image, pose))[0]
        with torch.no_grad():
            fb = ref_poser.pose(ref_image, torch.from_numpy(pose))[0].permute(1, 2, 0).numpy()
        psnrs.append(psnr(fa, fb))
        ssims.append(ssim(fa, fb))
    return {
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_min": float(np.min(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
        "frames": len(psnrs),
    }
