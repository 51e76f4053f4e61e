"""Morpher00: the 256x256 half-resolution body rotator teacher.

Reference: src/tha4/nn/morpher/morpher_00.py:35-80.  U-Net outputs 7
channels: direct RGBA (4) + grid_change (2) + alpha logit (1); final image =
alpha-blend(direct, warp(input)).  t is always zeros at inference
(reference :51) — kept as an argument for structural parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import jax
import jax.numpy as jnp

from tha4_tpu.models import unet
from tha4_tpu.ops import warp

INDEX_MERGED = 0
INDEX_ALPHA = 1
INDEX_WARPED = 2
INDEX_GRID_CHANGE = 3
INDEX_DIRECT = 4
OUTPUT_LENGTH = 5


def shipped_unet_config() -> unet.UnetConfig:
    """The exact instantiation matching data/tha4/body_morpher.pt
    (reference mode_07.py:210-231)."""
    return unet.UnetConfig(
        in_channels=4,
        out_channels=7,
        model_channels=64,
        level_channel_multipliers=(1, 2, 4, 4, 4),
        level_use_attention=(False, False, False, False, True),
        num_res_blocks_per_level=1,
        num_middle_res_blocks=4,
        time_embedding_channels=None,
        cond_input_channels=6,
        cond_internal_channels=256,
        attention=unet.AttentionConfig(num_heads=8, use_new_attention_order=True),
        dropout_prob=0.0,
    )


@dataclass(frozen=True)
class BodyMorpherConfig:
    image_size: int = 256
    image_channels: int = 4
    num_pose_parameters: int = 6
    unet: unet.UnetConfig = field(default_factory=shipped_unet_config)


def init(key, cfg: BodyMorpherConfig) -> Dict:
    return {"body": unet.init(key, cfg.unet)}


def apply(cfg: BodyMorpherConfig, params: Dict, image: jnp.ndarray, pose: jnp.ndarray) -> List[jnp.ndarray]:
    """image (N,256,256,4) + pose (N,6) -> 5 outputs (reference :42-66)."""
    c = cfg.image_channels
    t = jnp.zeros((image.shape[0], 1), dtype=image.dtype)
    out = unet.apply(cfg.unet, params["body"], image, t, pose)
    direct = out[..., 0:c]
    grid_change = out[..., c : c + 2]
    alpha = jax.nn.sigmoid(out[..., c + 2 : c + 3])
    warped = warp.apply_grid_change(grid_change, image)
    merged = warp.apply_color_change(alpha, direct, warped)
    return [merged, alpha, warped, grid_change, direct]
