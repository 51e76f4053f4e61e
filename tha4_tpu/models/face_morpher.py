"""FaceMorpher08: the 192x192 expression morpher teacher.

Reference: src/tha4/nn/face_morpher/face_morpher_08.py:48-211.  Same
encoder-decoder shape as PoserEncoderDecoder00 (built inline in the
reference) with two head branches: iris/mouth (grid-warp + color-change +
alpha) and eye (color-change + alpha over the *detached* iris/mouth result —
detach matters only for training gradients; see apply()).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp

from tha4_tpu.models import encoder_decoder
from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops import warp

# Output indices (reference face_morpher_08.py:199-206)
OUTPUT_IMAGE_INDEX = 0
EYE_ALPHA_INDEX = 1
EYE_COLOR_CHANGE_INDEX = 2
IRIS_MOUTH_IMAGE_1_INDEX = 3
IRIS_MOUTH_ALPHA_INDEX = 4
IRIS_MOUTH_COLOR_CHANGE_INDEX = 5
IRIS_MOUTH_IMAGE_0_INDEX = 6
IRIS_MOUTH_GRID_CHANGE_INDEX = 7
OUTPUT_LENGTH = 8


@dataclass(frozen=True)
class FaceMorpherConfig:
    """Shipped hyperparameters (reference mode_07.py:183-203)."""

    image_size: int = 192
    image_channels: int = 4
    num_expression_params: int = 27
    start_channels: int = 64
    bottleneck_image_size: int = 24
    num_bottleneck_blocks: int = 6
    max_channels: int = 512
    output_iris_mouth_grid_change: bool = True
    # Shipped face morpher uses ReLU blocks (mode_07.py:196), unlike the
    # class default LeakyReLU(0.2) (face_morpher_08.py:43).
    nonlin: str = "relu"

    @property
    def body(self) -> encoder_decoder.EncoderDecoderConfig:
        return encoder_decoder.EncoderDecoderConfig(
            image_size=self.image_size,
            input_image_channels=self.image_channels,
            num_pose_params=self.num_expression_params,
            start_channels=self.start_channels,
            bottleneck_image_size=self.bottleneck_image_size,
            num_bottleneck_blocks=self.num_bottleneck_blocks,
            max_channels=self.max_channels,
            nonlin=self.nonlin,
        )


def init(key, cfg: FaceMorpherConfig) -> Dict:
    keys = jax.random.split(key, 6)
    c = cfg.image_channels
    s = cfg.start_channels
    return {
        "body": encoder_decoder.init(keys[0], cfg.body),
        "iris_mouth_grid_change": {"conv": tnn.init_conv(keys[1], 3, 3, s, 2, bias=False, method="zero")},
        "iris_mouth_color_change": {"conv": tnn.init_conv(keys[2], 3, 3, s, c, bias=True, method="he")},
        "iris_mouth_alpha": {"conv": tnn.init_conv(keys[3], 3, 3, s, 1, bias=True, method="he")},
        "eye_color_change": {"conv": tnn.init_conv(keys[4], 3, 3, s, c, bias=True, method="he")},
        "eye_alpha": {"conv": tnn.init_conv(keys[5], 3, 3, s, 1, bias=True, method="he")},
    }


def apply(
    cfg: FaceMorpherConfig,
    params: Dict,
    image: jnp.ndarray,
    pose: jnp.ndarray,
    stop_gradient_between_branches: bool = True,
) -> List[jnp.ndarray]:
    """image (N,192,192,4) + pose (N,27) -> 7-8 outputs
    (reference face_morpher_08.py:158-197)."""
    feature = encoder_decoder.apply(cfg.body, params["body"], image, pose)

    im_grid_change = tnn.conv2d(params["iris_mouth_grid_change"]["conv"], feature)
    iris_mouth_image_0 = warp.apply_grid_change(im_grid_change, image)
    im_color = jnp.tanh(tnn.conv2d(params["iris_mouth_color_change"]["conv"], feature))
    im_alpha = jax.nn.sigmoid(tnn.conv2d(params["iris_mouth_alpha"]["conv"], feature))
    iris_mouth_image_1 = warp.apply_color_change(im_alpha, im_color, iris_mouth_image_0)

    eye_color = jnp.tanh(tnn.conv2d(params["eye_color_change"]["conv"], feature))
    eye_alpha = jax.nn.sigmoid(tnn.conv2d(params["eye_alpha"]["conv"], feature))
    base = jax.lax.stop_gradient(iris_mouth_image_1) if stop_gradient_between_branches else iris_mouth_image_1
    output_image = warp.apply_color_change(eye_alpha, eye_color, base)

    outputs = [
        output_image,
        eye_alpha,
        eye_color,
        iris_mouth_image_1,
        im_alpha,
        im_color,
        iris_mouth_image_0,
    ]
    if cfg.output_iris_mouth_grid_change:
        outputs.append(im_grid_change)
    return outputs
