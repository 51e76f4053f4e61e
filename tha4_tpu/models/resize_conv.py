"""Resize-conv trunks: encoder-decoder and skip-connected U-Net.

Reference: src/tha4/nn/common/resize_conv_encoder_decoder.py and
src/tha4/nn/common/resize_conv_unet.py (not used by the shipped modes; kept
for capability parity).  Decoders upsample with bilinear/nearest resize
followed by a conv3 block instead of transposed convs — the classic
checkerboard-free decoder.  Both return the bottleneck feature plus each
upsample level's feature, like the reference (:94-104 / :92-107).

The U-Net variant goes through the BlockConfig factory (ops.blocks), so
spectral norm / separable-conv / norm / nonlinearity flags all plumb through
exactly as the reference's ConvBlockFactory does.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import jax
import jax.numpy as jnp

from tha4_tpu.ops import blocks as B
from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops.resize import resize_bilinear, upsample_nearest_2x


@dataclass(frozen=True)
class ResizeConvEncoderDecoderConfig:
    image_size: int
    input_channels: int
    start_channels: int
    bottleneck_image_size: int
    num_bottleneck_blocks: int
    max_channels: int
    upsample_mode: str = "bilinear"  # or "nearest"
    nonlin: str = "relu"
    init: str = "he"

    def channels_at(self, image_size: int) -> int:
        return min(self.start_channels * (self.image_size // image_size), self.max_channels)


def init(key, cfg: ResizeConvEncoderDecoderConfig) -> Dict:
    keys = iter(jax.random.split(key, 64))
    down = [tnn.init_conv_block(next(keys), 7, cfg.input_channels, cfg.start_channels, cfg.init)]
    size, ch = cfg.image_size, cfg.start_channels
    while size > cfg.bottleneck_image_size:
        nsize = size // 2
        nch = cfg.channels_at(nsize)
        down.append(tnn.init_downsample_block(next(keys), ch, nch, cfg.init))
        size, ch = nsize, nch
    bottleneck = [tnn.init_resnet_block(next(keys), ch, cfg.init) for _ in range(cfg.num_bottleneck_blocks)]
    up = []
    while size < cfg.image_size:
        nsize = size * 2
        nch = cfg.channels_at(nsize)
        up.append(tnn.init_conv_block(next(keys), 3, ch, nch, cfg.init))
        size, ch = nsize, nch
    return {"downsample_blocks": down, "bottleneck_blocks": bottleneck, "upsample_blocks": up}


def apply(cfg: ResizeConvEncoderDecoderConfig, params: Dict, image: jnp.ndarray) -> List[jnp.ndarray]:
    x = tnn.conv_block(params["downsample_blocks"][0], image, cfg.nonlin)
    for block in params["downsample_blocks"][1:]:
        x = tnn.downsample_block(block, x, cfg.nonlin)
    for block in params["bottleneck_blocks"]:
        x = tnn.resnet_block(block, x, cfg.nonlin)
    outputs = [x]
    for block in params["upsample_blocks"]:
        if cfg.upsample_mode == "nearest":
            x = upsample_nearest_2x(x)
        else:
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = tnn.conv_block(block, x, cfg.nonlin)
        outputs.append(x)
    return outputs


# ---------------------------------------------------------------------------
# ResizeConvUNet (reference: src/tha4/nn/common/resize_conv_unet.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ResizeConvUNetConfig:
    """reference ResizeConvUNetArgs (resize_conv_unet.py:13-37).

    Differences from the encoder-decoder: the first block is a conv3 (not
    conv7), and the decoder concatenates the mirrored encoder feature before
    each conv3 block (skip connections, reference forward :92-107)."""

    image_size: int
    input_channels: int
    start_channels: int
    bottleneck_image_size: int
    num_bottleneck_blocks: int
    max_channels: int
    upsample_mode: str = "bilinear"  # or "nearest"
    block: B.BlockConfig = field(default_factory=B.BlockConfig)

    def channels_at(self, image_size: int) -> int:
        return min(self.start_channels * (self.image_size // image_size), self.max_channels)


def unet_init(key, cfg: ResizeConvUNetConfig, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 64))
    down = [B.init_conv_block(next(keys), 3, cfg.input_channels, cfg.start_channels, cfg.block, dtype)]
    size, ch = cfg.image_size, cfg.start_channels
    while size > cfg.bottleneck_image_size:
        nsize = size // 2
        nch = cfg.channels_at(nsize)
        down.append(B.init_downsample_block(next(keys), ch, nch, False, cfg.block, dtype))
        size, ch = nsize, nch
    bottleneck = [
        B.init_resnet_block(next(keys), ch, cfg.block, is_1x1=False, dtype=dtype)
        for _ in range(cfg.num_bottleneck_blocks)
    ]
    up = []
    while size < cfg.image_size:
        nsize = size * 2
        nch = cfg.channels_at(nsize)
        # decoder conv consumes [upsampled current || encoder skip at nsize]
        up.append(B.init_conv_block(next(keys), 3, ch + nch, nch, cfg.block, dtype))
        size, ch = nsize, nch
    return {"downsample_blocks": down, "bottleneck_blocks": bottleneck, "upsample_blocks": up}


def unet_apply(cfg: ResizeConvUNetConfig, params: Dict, feature: jnp.ndarray) -> List[jnp.ndarray]:
    """Returns [bottleneck, level_1, ..., full_res] features
    (reference forward resize_conv_unet.py:92-107)."""
    x = B.apply_conv_block(cfg.block, params["downsample_blocks"][0], feature)
    downsampled = [x]
    for block in params["downsample_blocks"][1:]:
        x = B.apply_downsample_block(cfg.block, block, x)
        downsampled.append(x)
    for block in params["bottleneck_blocks"]:
        x = B.apply_resnet_block(cfg.block, block, x)
    outputs = [x]
    for i, block in enumerate(params["upsample_blocks"]):
        if cfg.upsample_mode == "nearest":
            x = upsample_nearest_2x(x)
        else:
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = jnp.concatenate([x, downsampled[-i - 2]], axis=-1)
        x = B.apply_conv_block(cfg.block, block, x)
        outputs.append(x)
    return outputs
