"""Upscaler02: the 512x512 refiner teacher.

Reference: src/tha4/nn/upscaler/upscaler_02.py:37-110.  Warps the rest image
by the upsampled coarse grid change, injects coarse info through a zero-init
conv added to the U-Net's first conv activation, and outputs
direct + grid_change + alpha like the body morpher.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import jax
import jax.numpy as jnp

from tha4_tpu.models import unet
from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops import warp

INDEX_MERGED = 0
INDEX_ALPHA = 1
INDEX_WARPED = 2
INDEX_GRID_CHANGE = 3
INDEX_DIRECT = 4
OUTPUT_LENGTH = 5


def shipped_unet_config() -> unet.UnetConfig:
    """The exact instantiation matching data/tha4/upscaler.pt
    (reference mode_07.py:241-262)."""
    return unet.UnetConfig(
        in_channels=4,
        out_channels=7,
        model_channels=32,
        level_channel_multipliers=(1, 2, 4, 8, 8, 8),
        level_use_attention=(False, False, False, False, False, True),
        num_res_blocks_per_level=1,
        num_middle_res_blocks=4,
        time_embedding_channels=None,
        cond_input_channels=6,
        cond_internal_channels=256,
        attention=unet.AttentionConfig(num_heads=8, use_new_attention_order=True),
        dropout_prob=0.0,
    )


@dataclass(frozen=True)
class UpscalerConfig:
    image_size: int = 512
    image_channels: int = 4
    num_pose_parameters: int = 6
    unet: unet.UnetConfig = field(default_factory=shipped_unet_config)


def init(key, cfg: UpscalerConfig) -> Dict:
    k0, k1 = jax.random.split(key)
    coarse = tnn.init_conv(
        k0, 3, 3, cfg.image_channels * 2 + 2, cfg.unet.model_channels, bias=True, method="zero"
    )
    coarse["b"] = jnp.zeros_like(coarse["b"])  # reference zero-inits both (:49-51)
    return {"body": unet.init(k1, cfg.unet), "coarse_image_conv": coarse}


def apply(
    cfg: UpscalerConfig,
    params: Dict,
    rest_image: jnp.ndarray,
    coarse_posed_image: jnp.ndarray,
    coarse_grid_change: jnp.ndarray,
    pose: jnp.ndarray,
) -> List[jnp.ndarray]:
    """All images (N,512,512,*) NHWC; coarse_grid_change (N,512,512,2)
    (reference forward: upscaler_02.py:59-98)."""
    c = cfg.image_channels
    warped_by_coarse = warp.apply_grid_change(coarse_grid_change, rest_image)
    feature = jnp.concatenate([coarse_posed_image, warped_by_coarse, coarse_grid_change], axis=-1)
    first_conv_addition = tnn.conv2d(params["coarse_image_conv"], feature)

    t = jnp.zeros((rest_image.shape[0], 1), dtype=rest_image.dtype)
    out = unet.apply(cfg.unet, params["body"], rest_image, t, pose, first_conv_addition)

    direct = out[..., 0:c]
    grid_change = out[..., c : c + 2]
    alpha = jax.nn.sigmoid(out[..., c + 2 : c + 3])
    warped = warp.apply_grid_change(grid_change, rest_image)
    merged = warp.apply_color_change(alpha, direct, warped)
    return [merged, alpha, warped, grid_change, direct]
