"""Pose sampling for distillation.

The reference trains on rows of ``data/pose_dataset.pt``, a shipped tensor of
pre-generated poses (reference: src/tha4/distiller/distiller_config.py:17,
src/tha4/dataset/image_poses_and_aother_images_dataset.py:31-35).  That file
is not in the bundle (placeholder only), so this module:

  * loads it when present (torch deserialization, one-time, -> numpy), and
  * otherwise samples poses procedurally on-device, seeded: each parameter
    uniform over its schema range, with categorical sparsity applied to the
    morph groups (at most one eyebrow/eye/mouth shape strongly active at a
    time, mirroring how the UI and mocap converters drive the rig) — a dense,
    reproducible covering of the input space for teacher mimicry.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters


def load_pose_dataset(path: str) -> Optional[np.ndarray]:
    """(N, 45) float32 array from the reference .pt file, if present."""
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        return None
    import torch

    data = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(data, (list, tuple)):
        data = data[0]
    return np.asarray(data, dtype=np.float32)


_pp = get_pose_parameters()
_LOWS = np.zeros(_pp.get_parameter_count(), np.float32)
_HIGHS = np.zeros(_pp.get_parameter_count(), np.float32)
for _g in _pp.get_pose_parameter_groups():
    for _k in range(_g.arity):
        _LOWS[_g.parameter_index + _k] = _g.range[0]
        _HIGHS[_g.parameter_index + _k] = _g.range[1]

# Index spans of the mutually-sparse morph categories, derived from the
# schema BY NAME so a pose_parameters reorder cannot silently shift the
# sampling distribution (tests/test_distill.py pins these to the documented
# 45-dim layout).
_EYEBROW = (_pp.get_group_start_index("eyebrow_troubled"),
            _pp.get_group_start_index("eye_wink"))
_EYE = (_pp.get_group_start_index("eye_wink"),
        _pp.get_group_start_index("iris_small"))
# aaa iii uuu eee ooo delta (one-hot-ish); the arity-2 mouth corners and
# smirk that follow stay independently sampled, like the reference UI sliders.
_MOUTH_SHAPES = (_pp.get_group_start_index("mouth_aaa"),
                 _pp.get_group_start_index("mouth_lowered_corner"))


import functools


@functools.partial(jax.jit, static_argnums=1)
def sample_poses(key: jax.Array, n: int) -> jnp.ndarray:
    """(n, 45) poses on device; pure function of the key. Jitted: the host
    loop dispatches ONE program per batch (tunnel round-trips are the real
    per-step cost on axon)."""
    k_u, k_eb, k_eye, k_mouth, k_scale = jax.random.split(key, 5)
    lo = jnp.asarray(_LOWS)
    hi = jnp.asarray(_HIGHS)
    pose = jax.random.uniform(k_u, (n, lo.shape[0])) * (hi - lo) + lo

    # Sparsify morphs: keep one eyebrow pair, one eye pair, one mouth shape.
    def keep_group(key, pose, span, group_size):
        start, stop = span
        num_groups = (stop - start) // group_size
        choice = jax.random.randint(key, (n,), 0, num_groups)
        idx = (jnp.arange(stop - start)[None, :] // group_size) == choice[:, None]
        section = pose[:, start:stop] * idx
        return pose.at[:, start:stop].set(section)

    pose = keep_group(k_eb, pose, _EYEBROW, 2)
    pose = keep_group(k_eye, pose, _EYE, 2)
    pose = keep_group(k_mouth, pose, _MOUTH_SHAPES, 1)
    return pose.astype(jnp.float32)


class PoseSource:
    """Batch provider: shipped dataset rows when available, else procedural."""

    def __init__(self, pose_dataset_path: Optional[str] = None):
        self.dataset = load_pose_dataset(pose_dataset_path) if pose_dataset_path else None
        if self.dataset is not None:
            self.dataset = jnp.asarray(self.dataset)

    def batch(self, key: jax.Array, n: int) -> jnp.ndarray:
        if self.dataset is not None:
            idx = jax.random.randint(key, (n,), 0, self.dataset.shape[0])
            return self.dataset[idx]
        return sample_poses(key, n)
