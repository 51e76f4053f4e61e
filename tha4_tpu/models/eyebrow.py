"""Eyebrow teacher networks: decomposer + morphing combiner.

Reference: src/tha4/nn/eyebrow_decomposer/eyebrow_decomposer_00.py:36-81 and
src/tha4/nn/eyebrow_morphing_combiner/eyebrow_morphing_combiner_00.py:37-91.

Both wrap a PoserEncoderDecoder00 trunk with conv3 output heads
(alpha -> sigmoid, color_change -> tanh, grid_change -> zero-init conv3
no-bias; reference: src/tha4/nn/common/poser_args.py:31-68).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import jax
import jax.numpy as jnp

from tha4_tpu.models import encoder_decoder
from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops import warp

# Output indices (reference eyebrow_decomposer_00.py:66-72)
DECOMPOSER_EYEBROW_LAYER_INDEX = 0
DECOMPOSER_EYEBROW_LAYER_ALPHA_INDEX = 1
DECOMPOSER_EYEBROW_LAYER_COLOR_CHANGE_INDEX = 2
DECOMPOSER_BACKGROUND_LAYER_INDEX = 3
DECOMPOSER_BACKGROUND_LAYER_ALPHA_INDEX = 4
DECOMPOSER_BACKGROUND_LAYER_COLOR_CHANGE_INDEX = 5
DECOMPOSER_OUTPUT_LENGTH = 6

# Output indices (reference eyebrow_morphing_combiner_00.py:74-82)
COMBINER_EYEBROW_IMAGE_INDEX = 0
COMBINER_COMBINE_ALPHA_INDEX = 1
COMBINER_EYEBROW_IMAGE_NO_COMBINE_ALPHA_INDEX = 2
COMBINER_MORPHED_EYEBROW_LAYER_INDEX = 3
COMBINER_MORPHED_EYEBROW_LAYER_ALPHA_INDEX = 4
COMBINER_MORPHED_EYEBROW_LAYER_COLOR_CHANGE_INDEX = 5
COMBINER_WARPED_EYEBROW_LAYER_INDEX = 6
COMBINER_MORPHED_EYEBROW_LAYER_GRID_CHANGE_INDEX = 7
COMBINER_OUTPUT_LENGTH = 8


def _teacher_encdec_cfg(image_size, in_channels, num_pose_params, start_channels,
                        bottleneck_image_size, num_bottleneck_blocks, max_channels):
    return encoder_decoder.EncoderDecoderConfig(
        image_size=image_size,
        input_image_channels=in_channels,
        num_pose_params=num_pose_params,
        start_channels=start_channels,
        bottleneck_image_size=bottleneck_image_size,
        num_bottleneck_blocks=num_bottleneck_blocks,
        max_channels=max_channels,
    )


@dataclass(frozen=True)
class EyebrowDecomposerConfig:
    """Shipped hyperparameters (reference mode_07.py:137-152)."""

    image_size: int = 128
    image_channels: int = 4
    start_channels: int = 64
    bottleneck_image_size: int = 16
    num_bottleneck_blocks: int = 6
    max_channels: int = 512

    @property
    def body(self) -> encoder_decoder.EncoderDecoderConfig:
        return _teacher_encdec_cfg(
            self.image_size, self.image_channels, 0, self.start_channels,
            self.bottleneck_image_size, self.num_bottleneck_blocks, self.max_channels,
        )


def _init_head(key, start_channels: int, out_channels: int, bias: bool, method: str) -> Dict:
    return {"conv": tnn.init_conv(key, 3, 3, start_channels, out_channels, bias=bias, method=method)}


def eyebrow_decomposer_init(key, cfg: EyebrowDecomposerConfig) -> Dict:
    keys = jax.random.split(key, 5)
    c = cfg.image_channels
    return {
        "body": encoder_decoder.init(keys[0], cfg.body),
        "background_layer_alpha": _init_head(keys[1], cfg.start_channels, 1, True, "he"),
        "background_layer_color_change": _init_head(keys[2], cfg.start_channels, c, True, "he"),
        "eyebrow_layer_alpha": _init_head(keys[3], cfg.start_channels, 1, True, "he"),
        "eyebrow_layer_color_change": _init_head(keys[4], cfg.start_channels, c, True, "he"),
    }


def eyebrow_decomposer_apply(cfg: EyebrowDecomposerConfig, params: Dict, image: jnp.ndarray) -> List[jnp.ndarray]:
    """image: (N,128,128,4) eyebrow crop -> 6 outputs
    (reference eyebrow_decomposer_00.py:46-64)."""
    feature = encoder_decoder.apply(cfg.body, params["body"], image)

    bg_alpha = jax.nn.sigmoid(tnn.conv2d(params["background_layer_alpha"]["conv"], feature))
    bg_color = jnp.tanh(tnn.conv2d(params["background_layer_color_change"]["conv"], feature))
    background_layer = warp.apply_color_change(bg_alpha, bg_color, image)

    eb_alpha = jax.nn.sigmoid(tnn.conv2d(params["eyebrow_layer_alpha"]["conv"], feature))
    eb_color = jnp.tanh(tnn.conv2d(params["eyebrow_layer_color_change"]["conv"], feature))
    # Note argument order: the eyebrow layer lerps *towards the image* from
    # the color change (reference :57 apply_color_change(alpha, image, color)).
    eyebrow_layer = warp.apply_color_change(eb_alpha, image, eb_color)

    return [eyebrow_layer, eb_alpha, eb_color, background_layer, bg_alpha, bg_color]


@dataclass(frozen=True)
class EyebrowCombinerConfig:
    """Shipped hyperparameters (reference mode_07.py:162-177)."""

    image_size: int = 128
    image_channels: int = 4
    num_pose_params: int = 12
    start_channels: int = 64
    bottleneck_image_size: int = 16
    num_bottleneck_blocks: int = 6
    max_channels: int = 512

    @property
    def body(self) -> encoder_decoder.EncoderDecoderConfig:
        return _teacher_encdec_cfg(
            self.image_size, 2 * self.image_channels, self.num_pose_params, self.start_channels,
            self.bottleneck_image_size, self.num_bottleneck_blocks, self.max_channels,
        )


def eyebrow_combiner_init(key, cfg: EyebrowCombinerConfig) -> Dict:
    keys = jax.random.split(key, 5)
    c = cfg.image_channels
    return {
        "body": encoder_decoder.init(keys[0], cfg.body),
        "morphed_eyebrow_layer_grid_change": _init_head(keys[1], cfg.start_channels, 2, False, "zero"),
        "morphed_eyebrow_layer_alpha": _init_head(keys[2], cfg.start_channels, 1, True, "he"),
        "morphed_eyebrow_layer_color_change": _init_head(keys[3], cfg.start_channels, c, True, "he"),
        "combine_alpha": _init_head(keys[4], cfg.start_channels, 1, True, "he"),
    }


def eyebrow_combiner_apply(
    cfg: EyebrowCombinerConfig,
    params: Dict,
    background_layer: jnp.ndarray,
    eyebrow_layer: jnp.ndarray,
    pose: jnp.ndarray,
) -> List[jnp.ndarray]:
    """(N,128,128,4) x2 + (N,12) pose -> 8 outputs
    (reference eyebrow_morphing_combiner_00.py:47-72)."""
    combined = jnp.concatenate([background_layer, eyebrow_layer], axis=-1)
    feature = encoder_decoder.apply(cfg.body, params["body"], combined, pose)

    grid_change = tnn.conv2d(params["morphed_eyebrow_layer_grid_change"]["conv"], feature)
    alpha = jax.nn.sigmoid(tnn.conv2d(params["morphed_eyebrow_layer_alpha"]["conv"], feature))
    color = jnp.tanh(tnn.conv2d(params["morphed_eyebrow_layer_color_change"]["conv"], feature))
    warped_eyebrow = warp.apply_grid_change(grid_change, eyebrow_layer)
    morphed_eyebrow = warp.apply_color_change(alpha, color, warped_eyebrow)

    combine_alpha = jax.nn.sigmoid(tnn.conv2d(params["combine_alpha"]["conv"], feature))
    eyebrow_image = warp.apply_rgb_change(combine_alpha, morphed_eyebrow, background_layer)
    eyebrow_image_no_combine_alpha = warp.apply_rgb_change(
        (morphed_eyebrow[..., 3:4] + 1.0) / 2.0, morphed_eyebrow, background_layer
    )

    return [
        eyebrow_image,
        combine_alpha,
        eyebrow_image_no_combine_alpha,
        morphed_eyebrow,
        alpha,
        color,
        warped_eyebrow,
        grid_change,
    ]
