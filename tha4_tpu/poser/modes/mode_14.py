"""mode_14 — the student poser (real-time path).

Reference: src/tha4/poser/modes/mode_14.py.  Two networks:
  1. SirenFaceMorpher00 paints a 128x128 RGBA face crop at center
    (x=256, y=144) from pose[0:39] (reference :59-71).
  2. SirenMorpher03 takes the composited 512x512 image + full 45-dim pose
    (reference :72-84).

The reference's TwoStepPoserComputationProtocol (a memoized string-keyed DAG)
becomes one jitted function returning all 6 outputs; XLA CSE and fusion do
the caching.  Output list = body morpher's 5 outputs + [face morpher output]
(reference :85-91).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tha4_tpu.models import siren
from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters
from tha4_tpu.poser.poser import Poser, PoseParameterGroup

KEY_FACE_MORPHER = "face_morpher"
KEY_BODY_MORPHER = "body_morpher"

FACE_CENTER_X = 256
FACE_CENTER_Y = 128 + 16
FACE_HALF = 64

OUTPUT_LENGTH = siren.SIREN_MORPHER_OUTPUT_LENGTH + 1  # 5 + 1 (reference :161)
INDEX_FACE_MORPHER_OUTPUT = 5


def compute_outputs(
    face_cfg: siren.SirenFaceMorpherConfig,
    body_cfg: siren.SirenMorpherConfig,
    params: Dict,
    image: jnp.ndarray,
    pose: jnp.ndarray,
):
    """(N,512,512,4) image + (N,45) pose -> tuple of 6 NHWC outputs."""
    face_pose = pose[:, 0 : face_cfg.pose_size]
    face_out = siren.siren_face_morpher_apply(face_cfg, params[KEY_FACE_MORPHER], face_pose)

    y0 = FACE_CENTER_Y - FACE_HALF
    x0 = FACE_CENTER_X - FACE_HALF
    body_input = jax.lax.dynamic_update_slice(image, face_out.astype(image.dtype), (0, y0, x0, 0))

    body_out = siren.siren_morpher_apply(body_cfg, params[KEY_BODY_MORPHER], body_input, pose)
    return tuple(body_out) + (face_out,)


class StudentPoser(Poser):
    """GeneralPoser02-equivalent wrapper for the mode_14 pipeline
    (reference: src/tha4/poser/general_poser_02.py:10-98)."""

    def __init__(
        self,
        params: Dict,
        face_cfg: Optional[siren.SirenFaceMorpherConfig] = None,
        body_cfg: Optional[siren.SirenMorpherConfig] = None,
        default_output_index: int = 0,
        compute_dtype=jnp.float32,
        matmul_precision: Optional[str] = None,
    ):
        self.face_cfg = face_cfg or siren.SirenFaceMorpherConfig()
        self.body_cfg = body_cfg or siren.SirenMorpherConfig()
        self.params = params
        self.default_output_index = default_output_index
        self.compute_dtype = compute_dtype
        self.pose_parameters = get_pose_parameters()

        cfg_f, cfg_b = self.face_cfg, self.body_cfg
        # Precision ladder on TPU (MXU): 'default' = 1-pass bf16 multiplies,
        # 'high' = 3-pass bf16 (error-compensated), 'highest' = full f32.
        # Storage dtype (compute_dtype) and multiply precision are
        # independent knobs; the parity path wants full f32 matmuls.
        precision = matmul_precision or ("highest" if compute_dtype == jnp.float32 else "default")

        @jax.jit
        def _run(params, image, pose):
            image = image.astype(compute_dtype)
            pose = pose.astype(compute_dtype)
            with jax.default_matmul_precision(precision):
                outs = compute_outputs(cfg_f, cfg_b, params, image, pose)
            return tuple(o.astype(jnp.float32) for o in outs)

        self._run = _run

    # -- Poser interface ---------------------------------------------------
    def get_image_size(self) -> int:
        return self.body_cfg.image_size

    def get_output_length(self) -> int:
        return OUTPUT_LENGTH

    def get_pose_parameter_groups(self) -> List[PoseParameterGroup]:
        return self.pose_parameters.get_pose_parameter_groups()

    def get_num_parameters(self) -> int:
        return self.pose_parameters.get_parameter_count()

    def get_posing_outputs(self, image, pose) -> List[jnp.ndarray]:
        image = jnp.asarray(image)
        pose = jnp.asarray(pose, dtype=jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if pose.ndim == 1:
            pose = pose[None]
        return list(self._run(self.params, image, pose))

    def pose(self, image, pose, output_index: Optional[int] = None) -> jnp.ndarray:
        if output_index is None:
            output_index = self.default_output_index
        return self.get_posing_outputs(image, pose)[output_index]


def create_poser(
    module_file_names: Optional[Dict[str, str]] = None,
    default_output_index: int = 0,
    compute_dtype=jnp.float32,
    matmul_precision: Optional[str] = None,
) -> StudentPoser:
    """Build the student poser from torch .pt checkpoints or fresh params
    (reference: src/tha4/poser/modes/mode_14.py:134-161)."""
    module_file_names = dict(module_file_names or {})
    module_file_names.setdefault(KEY_FACE_MORPHER, "data/character_models/lambda_00/face_morpher.pt")
    module_file_names.setdefault(KEY_BODY_MORPHER, "data/character_models/lambda_00/body_morpher.pt")

    params = {
        KEY_FACE_MORPHER: _load_student(module_file_names[KEY_FACE_MORPHER], "face"),
        KEY_BODY_MORPHER: _load_student(module_file_names[KEY_BODY_MORPHER], "body"),
    }
    return StudentPoser(
        params, default_output_index=default_output_index,
        compute_dtype=compute_dtype, matmul_precision=matmul_precision,
    )


def _load_student(path: str, kind: str):
    """Accepts both the reference's torch .pt format and this framework's
    native .npz checkpoints."""
    if path.endswith(".npz"):
        from tha4_tpu.models import siren as s
        from tha4_tpu.training import checkpoint as ckpt

        if kind == "face":
            template = s.siren_face_morpher_init(jax.random.PRNGKey(0), s.SirenFaceMorpherConfig())
        else:
            template = s.siren_morpher_init(jax.random.PRNGKey(0), s.SirenMorpherConfig())
        flat = ckpt._load_npz(path)
        return jax.tree.map(jnp.asarray, ckpt.unflatten_into(template, flat))
    from tha4_tpu.convert import torch_weights as tw

    sd = tw.load_torch_state_dict(path)
    converted = tw.convert_siren_face_morpher(sd) if kind == "face" else tw.convert_siren_morpher(sd)
    return jax.tree.map(jnp.asarray, converted)
