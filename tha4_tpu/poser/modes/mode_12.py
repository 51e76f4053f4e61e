"""mode_12 — the face-only 3-network teacher (face-student distillation oracle).

Reference: src/tha4/poser/modes/mode_12.py.  Same decomposer -> combiner ->
face-morpher sub-pipeline as mode_07, but stops at the 192x192 face morph.
All-outputs = face(8) + combiner(8) + decomposer(6) = 22 tensors.
(The reference declares output_length 5+5+8=18 at :201 — stale metadata used
only to populate a UI dropdown; the real list length is 22.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from tha4_tpu.models import eyebrow, face_morpher
from tha4_tpu.poser.general_poser import GeneralPoser
from tha4_tpu.poser.modes import mode_07
from tha4_tpu.poser.modes.pose_parameters import NUM_EYEBROW_PARAMS, NUM_FACE_PARAMS

KEY_EYEBROW_DECOMPOSER = mode_07.KEY_EYEBROW_DECOMPOSER
KEY_EYEBROW_MORPHING_COMBINER = mode_07.KEY_EYEBROW_MORPHING_COMBINER
KEY_FACE_MORPHER = mode_07.KEY_FACE_MORPHER

OUTPUT_LENGTH = 8 + 8 + 6  # actual concatenated list length
INDEX_FACE_MORPHED_IMAGE = 0


@dataclass(frozen=True)
class FaceTeacherConfig:
    eyebrow_decomposer: eyebrow.EyebrowDecomposerConfig = field(default_factory=eyebrow.EyebrowDecomposerConfig)
    eyebrow_combiner: eyebrow.EyebrowCombinerConfig = field(default_factory=eyebrow.EyebrowCombinerConfig)
    face_morpher: face_morpher.FaceMorpherConfig = field(default_factory=face_morpher.FaceMorpherConfig)
    eyebrow_morphed_image_index: int = eyebrow.COMBINER_EYEBROW_IMAGE_NO_COMBINE_ALPHA_INDEX


def init(key, cfg: FaceTeacherConfig = FaceTeacherConfig()) -> Dict:
    k = jax.random.split(key, 3)
    return {
        KEY_EYEBROW_DECOMPOSER: eyebrow.eyebrow_decomposer_init(k[0], cfg.eyebrow_decomposer),
        KEY_EYEBROW_MORPHING_COMBINER: eyebrow.eyebrow_combiner_init(k[1], cfg.eyebrow_combiner),
        KEY_FACE_MORPHER: face_morpher.init(k[2], cfg.face_morpher),
    }


def compute_outputs(cfg: FaceTeacherConfig, params: Dict, image: jnp.ndarray, pose: jnp.ndarray):
    """image (N,512,512,4) + pose (N,>=39) -> 22 outputs (reference :66-96)."""
    crop = image[:, 64:192, 192:320, :]
    decomposer_outputs = eyebrow.eyebrow_decomposer_apply(
        cfg.eyebrow_decomposer, params[KEY_EYEBROW_DECOMPOSER], crop
    )

    combiner_outputs = eyebrow.eyebrow_combiner_apply(
        cfg.eyebrow_combiner,
        params[KEY_EYEBROW_MORPHING_COMBINER],
        decomposer_outputs[eyebrow.DECOMPOSER_BACKGROUND_LAYER_INDEX],
        decomposer_outputs[eyebrow.DECOMPOSER_EYEBROW_LAYER_INDEX],
        pose[:, :NUM_EYEBROW_PARAMS],
    )

    eyebrow_morphed = combiner_outputs[cfg.eyebrow_morphed_image_index]
    face_input = image[:, 32:224, 160:352, :]
    face_input = jax.lax.dynamic_update_slice(
        face_input, eyebrow_morphed.astype(face_input.dtype), (0, 32, 32, 0)
    )
    face_outputs = face_morpher.apply(
        cfg.face_morpher,
        params[KEY_FACE_MORPHER],
        face_input,
        pose[:, NUM_EYEBROW_PARAMS : NUM_EYEBROW_PARAMS + NUM_FACE_PARAMS],
    )

    return tuple(face_outputs) + tuple(combiner_outputs) + tuple(decomposer_outputs)


def load_params_from_torch(module_file_names: Optional[Dict[str, str]] = None) -> Dict:
    from tha4_tpu.convert import torch_weights as tw

    files = dict(mode_07.DEFAULT_TEACHER_FILES)
    files.update(module_file_names or {})
    return {
        KEY_EYEBROW_DECOMPOSER: jax.tree.map(
            jnp.asarray, tw.convert_eyebrow_decomposer(tw.load_torch_state_dict(files[KEY_EYEBROW_DECOMPOSER]))
        ),
        KEY_EYEBROW_MORPHING_COMBINER: jax.tree.map(
            jnp.asarray,
            tw.convert_eyebrow_morphing_combiner(tw.load_torch_state_dict(files[KEY_EYEBROW_MORPHING_COMBINER])),
        ),
        KEY_FACE_MORPHER: jax.tree.map(
            jnp.asarray, tw.convert_face_morpher_08(tw.load_torch_state_dict(files[KEY_FACE_MORPHER]))
        ),
    }


def create_poser(
    module_file_names: Optional[Dict[str, str]] = None,
    eyebrow_morphed_image_index: int = eyebrow.COMBINER_EYEBROW_IMAGE_NO_COMBINE_ALPHA_INDEX,
    default_output_index: int = 0,
    compute_dtype=jnp.float32,
    params: Optional[Dict] = None,
    cfg: Optional[FaceTeacherConfig] = None,
    subrect=None,
) -> GeneralPoser:
    import dataclasses

    cfg = cfg or FaceTeacherConfig()
    if eyebrow_morphed_image_index != cfg.eyebrow_morphed_image_index:
        cfg = dataclasses.replace(cfg, eyebrow_morphed_image_index=eyebrow_morphed_image_index)

    if params is not None:
        loader = lambda: params
    else:
        loader = lambda: load_params_from_torch(module_file_names)

    return GeneralPoser(
        image_size=512,
        output_length=OUTPUT_LENGTH,
        params_loader=loader,
        run_fn=lambda p, image, pose: compute_outputs(cfg, p, image, pose),
        default_output_index=default_output_index,
        compute_dtype=compute_dtype,
        subrect=subrect,
    )
