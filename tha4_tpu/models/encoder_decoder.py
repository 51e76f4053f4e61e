"""PoserEncoderDecoder00: the shared teacher encoder-decoder trunk.

Reference: src/tha4/nn/common/poser_encoder_decoder_00.py:43-121.
Structure: conv3 block, then stride-2 downsample blocks to the bottleneck
size; pose vector broadcast-concat at the bottleneck; conv3 block + resnet
stack; mirrored transposed-conv upsample blocks.  Channels double per
halving, capped at ``max_channels``.

The reference returns every intermediate feature reversed; the THA4 networks
only ever consume element [0] (the final full-resolution feature), so apply()
returns just that.  All blocks are InstanceNorm+ReLU in the shipped teachers
(reference: src/tha4/poser/modes/mode_07.py:147-152).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tha4_tpu.ops import nn as tnn


@dataclass(frozen=True)
class EncoderDecoderConfig:
    image_size: int
    input_image_channels: int
    num_pose_params: int
    start_channels: int
    bottleneck_image_size: int
    num_bottleneck_blocks: int
    max_channels: int
    nonlin: str = "relu"
    init: str = "he"

    def channels_at(self, image_size: int) -> int:
        return min(self.start_channels * (self.image_size // image_size), self.max_channels)


def init(key, cfg: EncoderDecoderConfig) -> Dict:
    keys = iter(jax.random.split(key, 64))
    down = [tnn.init_conv_block(next(keys), 3, cfg.input_image_channels, cfg.start_channels, cfg.init)]
    size = cfg.image_size
    ch = cfg.start_channels
    while size > cfg.bottleneck_image_size:
        nsize = size // 2
        nch = cfg.channels_at(nsize)
        down.append(tnn.init_downsample_block(next(keys), ch, nch, cfg.init))
        size, ch = nsize, nch

    bottleneck = [tnn.init_conv_block(next(keys), 3, ch + cfg.num_pose_params, ch, cfg.init)]
    for _ in range(1, cfg.num_bottleneck_blocks):
        bottleneck.append(tnn.init_resnet_block(next(keys), ch, cfg.init))

    up = []
    while size < cfg.image_size:
        nsize = size * 2
        nch = cfg.channels_at(nsize)
        up.append(tnn.init_upsample_block(next(keys), ch, nch, cfg.init))
        size, ch = nsize, nch

    return {"downsample_blocks": down, "bottleneck_blocks": bottleneck, "upsample_blocks": up}


def apply(
    cfg: EncoderDecoderConfig, params: Dict, image: jnp.ndarray, pose: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """image (N,S,S,Cin) [+ pose (N,P)] -> final feature (N,S,S,start_channels)."""
    assert (pose is not None) == (cfg.num_pose_params != 0)
    x = tnn.conv_block(params["downsample_blocks"][0], image, cfg.nonlin)
    for block in params["downsample_blocks"][1:]:
        x = tnn.downsample_block(block, x, cfg.nonlin)

    if pose is not None:
        n = pose.shape[0]
        s = cfg.bottleneck_image_size
        pose_img = jnp.broadcast_to(pose[:, None, None, :].astype(x.dtype), (n, s, s, pose.shape[1]))
        x = jnp.concatenate([x, pose_img], axis=-1)

    x = tnn.conv_block(params["bottleneck_blocks"][0], x, cfg.nonlin)
    for block in params["bottleneck_blocks"][1:]:
        x = tnn.resnet_block(block, x, cfg.nonlin)

    for block in params["upsample_blocks"]:
        x = tnn.upsample_block(block, x, cfg.nonlin)
    return x
