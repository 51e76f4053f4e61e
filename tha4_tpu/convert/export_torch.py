"""Export trained student params to the reference's torch .pt format.

Character models distilled with this framework are written as standard
``state_dict`` files (reference format: data/character_models/*/
{face,body}_morpher.pt), so they load in BOTH frameworks — the reference's
mode_14 poser (src/tha4/poser/modes/mode_14.py:93-131) and ours.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _matrix_to_conv1x1(w: np.ndarray) -> "object":
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(w, np.float32).T)[:, :, None, None].copy())


def _vec(b: np.ndarray):
    import torch

    return torch.from_numpy(np.asarray(b, np.float32).copy())


def siren_face_morpher_state_dict(params: Dict) -> Dict:
    sd = {}
    for i, layer in enumerate(params["siren"]["sine_layers"]):
        sd[f"siren.sine_layers.{i}.linear.weight"] = _matrix_to_conv1x1(layer["w"])
        sd[f"siren.sine_layers.{i}.linear.bias"] = _vec(layer["b"])
    sd["siren.last_linear.weight"] = _matrix_to_conv1x1(params["siren"]["last_linear"]["w"])
    sd["siren.last_linear.bias"] = _vec(params["siren"]["last_linear"]["b"])
    return sd


def siren_morpher_state_dict(params: Dict) -> Dict:
    sd = {}
    for i, level in enumerate(params["levels"]):
        for j, layer in enumerate(level):
            sd[f"siren_layers.{i}.{j}.linear.weight"] = _matrix_to_conv1x1(layer["w"])
            sd[f"siren_layers.{i}.{j}.linear.bias"] = _vec(layer["b"])
    sd["last_linear.weight"] = _matrix_to_conv1x1(params["last_linear"]["w"])
    sd["last_linear.bias"] = _vec(params["last_linear"]["b"])
    return sd


def save_face_morpher_pt(params: Dict, file_name: str) -> None:
    import torch

    torch.save(siren_face_morpher_state_dict(params), file_name)


def save_body_morpher_pt(params: Dict, file_name: str) -> None:
    import torch

    torch.save(siren_morpher_state_dict(params), file_name)
