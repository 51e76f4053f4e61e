"""GeneralPoser: jitted-pipeline Poser wrapper.

Equivalent of the reference's GeneralPoser02
(reference: src/tha4/poser/general_poser_02.py:10-98), minus the device
bookkeeping (JAX owns placement) and the string-keyed memo DAG (XLA CSE owns
caching).  Lazy param loading is preserved: heavy checkpoint deserialization
happens on first pose() call.

Two reference behaviors live at this layer rather than inside the jitted
program:

* ``subrect`` — pose a sub-rectangle of the input image
  (reference general_poser_02.py:63-79: ``image[:, :, y0:y1, x0:x1]``,
  NCHW there, NHWC here).  The crop happens before the pipeline runs, so
  every network sees the cropped frame exactly as the reference's
  ComputationState did.
* ``prologue_fn`` — an image-only stage memoized across frames
  (reference mode_07.py:54-70 caches the eyebrow-decomposer output and
  reuses it for every pose change on the same rest image).  The prologue is
  compiled as its own program; its outputs are cached keyed on the identity
  of the caller's image object (a strong reference is held, so the id can
  never be recycled while cached) and fed to the main program as extra
  arguments.  Interactive posing therefore pays the decomposer exactly once
  per image, like the reference — a content-equal but distinct array object
  misses the cache (recompute, still correct), which is the deliberate
  trade against the reference's per-frame device-side tensor diff (that
  diff is a host sync per frame; identity is free).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters
from tha4_tpu.poser.poser import Poser, PoseParameterGroup

Subrect = Tuple[Tuple[int, int], Tuple[int, int]]  # ((y0, y1), (x0, x1))


class GeneralPoser(Poser):
    def __init__(
        self,
        image_size: int,
        output_length: int,
        params_loader: Callable[[], Dict],
        run_fn: Callable,  # (params, image_nhwc_f32, pose_f32[, *prologue_outs]) -> tuple
        default_output_index: int = 0,
        compute_dtype=jnp.float32,
        matmul_precision: Optional[str] = None,
        subrect: Optional[Subrect] = None,
        prologue_fn: Optional[Callable] = None,  # (params, image_nhwc) -> tuple
    ):
        self.image_size = image_size
        self.output_length = output_length
        self.default_output_index = default_output_index
        self.compute_dtype = compute_dtype
        self.subrect = subrect
        self._params_loader = params_loader
        self._params: Optional[Dict] = None
        self.pose_parameters = get_pose_parameters()

        dtype = compute_dtype
        # TPU f32 matmuls default to bf16 passes; unless the caller picks a
        # tier, the f32 (parity) path forces true float32 so outputs match
        # the CPU/torch reference (~32 dB -> >60 dB PSNR). bf16 compute is
        # the fast path; f32 + explicit 'default' is the measured middle of
        # the ladder (visually lossless, near-bf16 speed —
        # tools/precision_sweep.py).
        precision = matmul_precision or ("highest" if dtype == jnp.float32 else "default")

        @jax.jit
        def _run(params, image, pose, *prologue_outs):
            with jax.default_matmul_precision(precision):
                outs = run_fn(params, image.astype(dtype), pose.astype(dtype), *prologue_outs)
            return tuple(o.astype(jnp.float32) for o in outs)

        self._run = _run

        self._prologue = None
        if prologue_fn is not None:

            @jax.jit
            def _prologue(params, image):
                with jax.default_matmul_precision(precision):
                    # Stays in compute dtype: the cached outputs feed the main
                    # program exactly where the unsplit pipeline produced them.
                    return tuple(prologue_fn(params, image.astype(dtype)))

            self._prologue = _prologue
        # Strong reference to the image the cache was computed for; `is`
        # identity is exact while this reference pins the object alive.
        self._cached_image = None
        self._cached_prologue_outs: Tuple = ()
        self.prologue_cache_misses = 0  # observable for tests / FPS analysis

    @property
    def params(self) -> Dict:
        if self._params is None:
            self._params = self._params_loader()
        return self._params

    def free(self) -> None:
        self._params = None
        self._cached_image = None
        self._cached_prologue_outs = ()

    # -- Poser interface ---------------------------------------------------
    def get_image_size(self) -> int:
        return self.image_size

    def get_output_length(self) -> int:
        return self.output_length

    def get_pose_parameter_groups(self) -> List[PoseParameterGroup]:
        return self.pose_parameters.get_pose_parameter_groups()

    def get_num_parameters(self) -> int:
        return self.pose_parameters.get_parameter_count()

    def get_posing_outputs(self, image, pose) -> List[jnp.ndarray]:
        image_key = image  # the caller's object identity keys the prologue cache
        image = jnp.asarray(image)
        pose = jnp.asarray(pose, dtype=jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if pose.ndim == 1:
            pose = pose[None]
        if self.subrect is not None:
            (y0, y1), (x0, x1) = self.subrect
            image = image[:, y0:y1, x0:x1, :]
        prologue_outs: Tuple = ()
        if self._prologue is not None:
            if self._cached_image is not image_key:
                self._cached_prologue_outs = self._prologue(self.params, image)
                self._cached_image = image_key
                self.prologue_cache_misses += 1
            prologue_outs = self._cached_prologue_outs
        return list(self._run(self.params, image, pose, *prologue_outs))

    def pose(self, image, pose, output_index: Optional[int] = None) -> jnp.ndarray:
        if output_index is None:
            output_index = self.default_output_index
        return self.get_posing_outputs(image, pose)[output_index]
