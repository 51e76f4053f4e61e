"""Converters from the reference's torch ``state_dict`` files to our pytrees.

These are both the weight-compatibility path (load the shipped
``data/character_models/*/{face,body}_morpher.pt`` and the teacher
``data/tha4/*.pt``) and the parity-test oracle glue.  torch is used only to
deserialize; no torch at inference time.

Layout rules:
  * Conv2d OIHW -> HWIO: transpose (2, 3, 1, 0).
  * 1x1 Conv2d (O, I, 1, 1) -> (I, O) matrix.
  * ConvTranspose2d (I, O, kh, kw) -> spatial flip + transpose (2, 3, 0, 1)
    = HWIO of the equivalent forward conv over the dilated input.
  * Linear (O, I) -> (I, O).
  * InstanceNorm/GroupNorm weight/bias -> scale/bias.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Deserialize a .pt state dict into float32 numpy arrays (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def conv_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def conv1x1_to_matrix(w: np.ndarray) -> np.ndarray:
    o, i = w.shape[0], w.shape[1]
    return np.ascontiguousarray(w.reshape(o, i).T)


def linear_to_matrix(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(sd, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    params = {"w": conv_oihw_to_hwio(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        params["b"] = sd[prefix + ".bias"]
    return params


def _convT(sd, prefix: str) -> Dict[str, np.ndarray]:
    params = {"w": conv_transpose_to_hwio(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        params["b"] = sd[prefix + ".bias"]
    return params


def _norm(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _linear1x1(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"w": conv1x1_to_matrix(sd[prefix + ".weight"]), "b": sd[prefix + ".bias"]}


def _linear(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"w": linear_to_matrix(sd[prefix + ".weight"]), "b": sd[prefix + ".bias"]}


# ---------------------------------------------------------------------------
# Students (reference: src/tha4/poser/modes/mode_14.py:93-131)
# ---------------------------------------------------------------------------


def convert_siren_face_morpher(sd: Dict[str, np.ndarray]) -> Dict:
    """SirenFaceMorpher00 state dict -> models.siren params."""
    num_sine = 0
    while f"siren.sine_layers.{num_sine}.linear.weight" in sd:
        num_sine += 1
    return {
        "siren": {
            "sine_layers": [
                _linear1x1(sd, f"siren.sine_layers.{i}.linear") for i in range(num_sine)
            ],
            "last_linear": _linear1x1(sd, "siren.last_linear"),
        }
    }


def convert_siren_morpher(sd: Dict[str, np.ndarray]) -> Dict:
    """SirenMorpher03 state dict -> models.siren params."""
    levels = []
    i = 0
    while f"siren_layers.{i}.0.linear.weight" in sd:
        layers = []
        j = 0
        while f"siren_layers.{i}.{j}.linear.weight" in sd:
            layers.append(_linear1x1(sd, f"siren_layers.{i}.{j}.linear"))
            j += 1
        levels.append(layers)
        i += 1
    return {"levels": levels, "last_linear": _linear1x1(sd, "last_linear")}


# ---------------------------------------------------------------------------
# Teacher encoder-decoder family
# (reference: src/tha4/nn/common/poser_encoder_decoder_00.py:43-97)
# ---------------------------------------------------------------------------


def _conv_block(sd, prefix: str) -> Dict:
    """Sequential(conv, norm, nonlin) from create_conv3_block etc."""
    return {"conv": _conv(sd, prefix + ".0"), "norm": _norm(sd, prefix + ".1")}


def _upsample_block(sd, prefix: str) -> Dict:
    return {"conv": _convT(sd, prefix + ".0"), "norm": _norm(sd, prefix + ".1")}


def _resnet_block(sd, prefix: str) -> Dict:
    """ResnetBlock.resnet_path = Sequential(conv, norm, nonlin, conv, norm)."""
    return {
        "conv0": _conv(sd, prefix + ".resnet_path.0"),
        "norm0": _norm(sd, prefix + ".resnet_path.1"),
        "conv1": _conv(sd, prefix + ".resnet_path.3"),
        "norm1": _norm(sd, prefix + ".resnet_path.4"),
    }


def convert_poser_encoder_decoder(sd: Dict[str, np.ndarray], prefix: str = "body.") -> Dict:
    """PoserEncoderDecoder00 under ``prefix`` -> params for models.encoder_decoder."""
    down = []
    i = 0
    while f"{prefix}downsample_blocks.{i}.0.weight" in sd:
        down.append(_conv_block(sd, f"{prefix}downsample_blocks.{i}"))
        i += 1
    bottleneck = [_conv_block(sd, f"{prefix}bottleneck_blocks.0")]
    i = 1
    while f"{prefix}bottleneck_blocks.{i}.resnet_path.0.weight" in sd:
        bottleneck.append(_resnet_block(sd, f"{prefix}bottleneck_blocks.{i}"))
        i += 1
    up = []
    i = 0
    while f"{prefix}upsample_blocks.{i}.0.weight" in sd:
        up.append(_upsample_block(sd, f"{prefix}upsample_blocks.{i}"))
        i += 1
    return {"downsample_blocks": down, "bottleneck_blocks": bottleneck, "upsample_blocks": up}


def _head_conv_sigmoid_or_tanh(sd, prefix: str) -> Dict:
    """Sequential(conv3, Sigmoid/Tanh) heads from PoserArgs00."""
    return {"conv": _conv(sd, prefix + ".0")}


def convert_eyebrow_decomposer(sd: Dict[str, np.ndarray]) -> Dict:
    """EyebrowDecomposer00 (reference eyebrow_decomposer_00.py:36-60)."""
    return {
        "body": convert_poser_encoder_decoder(sd, "body."),
        "background_layer_alpha": _head_conv_sigmoid_or_tanh(sd, "background_layer_alpha"),
        "background_layer_color_change": _head_conv_sigmoid_or_tanh(sd, "background_layer_color_change"),
        "eyebrow_layer_alpha": _head_conv_sigmoid_or_tanh(sd, "eyebrow_layer_alpha"),
        "eyebrow_layer_color_change": _head_conv_sigmoid_or_tanh(sd, "eyebrow_layer_color_change"),
    }


def convert_eyebrow_morphing_combiner(sd: Dict[str, np.ndarray]) -> Dict:
    """EyebrowMorphingCombiner00 (reference eyebrow_morphing_combiner_00.py:37-46)."""
    return {
        "body": convert_poser_encoder_decoder(sd, "body."),
        "morphed_eyebrow_layer_grid_change": {"conv": _conv(sd, "morphed_eyebrow_layer_grid_change")},
        "morphed_eyebrow_layer_alpha": _head_conv_sigmoid_or_tanh(sd, "morphed_eyebrow_layer_alpha"),
        "morphed_eyebrow_layer_color_change": _head_conv_sigmoid_or_tanh(sd, "morphed_eyebrow_layer_color_change"),
        "combine_alpha": _head_conv_sigmoid_or_tanh(sd, "combine_alpha"),
    }


def convert_face_morpher_08(sd: Dict[str, np.ndarray]) -> Dict:
    """FaceMorpher08 (reference face_morpher_08.py:49-103). Same enc-dec shape
    as PoserEncoderDecoder00 but blocks live at the top level (no ``body.``)."""
    return {
        "body": convert_poser_encoder_decoder(sd, ""),
        "iris_mouth_grid_change": {"conv": _conv(sd, "iris_mouth_grid_change")},
        "iris_mouth_color_change": _head_conv_sigmoid_or_tanh(sd, "iris_mouth_color_change"),
        "iris_mouth_alpha": _head_conv_sigmoid_or_tanh(sd, "iris_mouth_alpha"),
        "eye_color_change": _head_conv_sigmoid_or_tanh(sd, "eye_color_change"),
        "eye_alpha": _head_conv_sigmoid_or_tanh(sd, "eye_alpha"),
    }


# ---------------------------------------------------------------------------
# U-Net family (reference: src/tha4/nn/common/unet.py)
# ---------------------------------------------------------------------------


def _unet_resblock(sd, prefix: str) -> Dict:
    p = {
        "norm0": _norm(sd, prefix + ".norm0"),
        "conv0": _conv(sd, prefix + ".conv0"),
    }
    if prefix + ".cond0_layers.1.weight" in sd:
        p["cond0"] = _linear(sd, prefix + ".cond0_layers.1")
        p["norm1"] = _norm(sd, prefix + ".norm1")
        p["conv1"] = _conv(sd, prefix + ".conv1")
    if prefix + ".cond1_layers.1.weight" in sd:
        p["cond1"] = _linear(sd, prefix + ".cond1_layers.1")
    if prefix + ".skip.weight" in sd:
        p["skip"] = _conv(sd, prefix + ".skip")
    # Resampling convs only exist when use_conv/in!=out; shipped modes use
    # identity/avgpool/nearest so there are no parameters.
    if prefix + ".x_resample.postprocess.weight" in sd:
        p["x_resample"] = _conv(sd, prefix + ".x_resample.postprocess")
    if prefix + ".h_resample.postprocess.weight" in sd:
        p["h_resample"] = _conv(sd, prefix + ".h_resample.postprocess")
    if prefix + ".x_resample.op.weight" in sd:
        p["x_resample"] = _conv(sd, prefix + ".x_resample.op")
    if prefix + ".h_resample.op.weight" in sd:
        p["h_resample"] = _conv(sd, prefix + ".h_resample.op")
    return p


def _attention_block(sd, prefix: str) -> Dict:
    return {
        "norm": _norm(sd, prefix + ".norm"),
        "qkv": _conv(sd, prefix + ".qkv"),
        "proj": _conv(sd, prefix + ".conv"),
    }


def convert_unet(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Unet / UnetWithFirstConvAddition state dict -> models.unet params.

    ``cfg`` is a models.unet.UnetConfig (needed to know attention placement and
    block counts; the reference encodes them in module structure)."""
    p: Dict = {
        "time_embed": [_linear(sd, "time_embed.1"), _linear(sd, "time_embed.3")],
        "cond_embed": [_linear(sd, "cond_embed.0"), _linear(sd, "cond_embed.2")],
        "first_conv": _conv(sd, "first_conv"),
        "last_norm": _norm(sd, "last.0"),
        "last_conv": _conv(sd, "last.2"),
    }
    num_levels = len(cfg.level_channel_multipliers)
    down = []
    for i in range(num_levels):
        blk: Dict = {
            "res_blocks": [
                _unet_resblock(sd, f"down_blocks.{i}.res_blocks.{j}")
                for j in range(cfg.num_res_blocks_per_level)
            ]
        }
        if cfg.level_use_attention[i]:
            blk["attention_blocks"] = [
                _attention_block(sd, f"down_blocks.{i}.attention_blocks.{j}")
                for j in range(cfg.num_res_blocks_per_level)
            ]
        if i < num_levels - 1:
            blk["downsample"] = _unet_resblock(sd, f"down_blocks.{i}.downsample")
        down.append(blk)
    p["down_blocks"] = down

    middle = []
    for i in range(cfg.num_middle_res_blocks - 1):
        middle.append({"res": _unet_resblock(sd, f"middle_blocks.{2 * i}")})
        middle.append({"attn": _attention_block(sd, f"middle_blocks.{2 * i + 1}.module")})
    middle.append({"res": _unet_resblock(sd, f"middle_blocks.{2 * (cfg.num_middle_res_blocks - 1)}")})
    p["middle_blocks"] = middle

    up = []
    for idx, i in enumerate(reversed(range(num_levels))):
        blk = {
            "res_blocks": [
                _unet_resblock(sd, f"up_blocks.{idx}.resnet_blocks.{j}")
                for j in range(cfg.num_res_blocks_per_level + 1)
            ]
        }
        if cfg.level_use_attention[i]:
            blk["attention_blocks"] = [
                _attention_block(sd, f"up_blocks.{idx}.attention_blocks.{j}")
                for j in range(cfg.num_res_blocks_per_level + 1)
            ]
        if i > 0:
            blk["upsample"] = _unet_resblock(sd, f"up_blocks.{idx}.upsample")
        up.append(blk)
    p["up_blocks"] = up
    return p


def convert_morpher_00(sd: Dict[str, np.ndarray], unet_cfg) -> Dict:
    """Morpher00 = {body: Unet} (reference morpher_00.py:35-40)."""
    body_sd = {k[len("body."):]: v for k, v in sd.items() if k.startswith("body.")}
    return {"body": convert_unet(body_sd, unet_cfg)}


def convert_upscaler_02(sd: Dict[str, np.ndarray], unet_cfg) -> Dict:
    """Upscaler02 = {body: UnetWithFirstConvAddition, coarse_image_conv}
    (reference upscaler_02.py:37-51)."""
    body_sd = {k[len("body."):]: v for k, v in sd.items() if k.startswith("body.")}
    return {
        "body": convert_unet(body_sd, unet_cfg),
        "coarse_image_conv": _conv(sd, "coarse_image_conv"),
    }
