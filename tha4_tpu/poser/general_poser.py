"""GeneralPoser: jitted-pipeline Poser wrapper.

Equivalent of the reference's GeneralPoser02
(reference: src/tha4/poser/general_poser_02.py:10-98), minus the device
bookkeeping (JAX owns placement) and the string-keyed memo DAG (XLA CSE owns
caching).  Lazy param loading is preserved: heavy checkpoint deserialization
happens on first pose() call.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters
from tha4_tpu.poser.poser import Poser, PoseParameterGroup


class GeneralPoser(Poser):
    def __init__(
        self,
        image_size: int,
        output_length: int,
        params_loader: Callable[[], Dict],
        run_fn: Callable,  # (params, image_nhwc_f32, pose_f32) -> tuple of outputs
        default_output_index: int = 0,
        compute_dtype=jnp.float32,
        matmul_precision: Optional[str] = None,
    ):
        self.image_size = image_size
        self.output_length = output_length
        self.default_output_index = default_output_index
        self.compute_dtype = compute_dtype
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
        def _run(params, image, pose):
            with jax.default_matmul_precision(precision):
                outs = run_fn(params, image.astype(dtype), pose.astype(dtype))
            return tuple(o.astype(jnp.float32) for o in outs)

        self._run = _run

    @property
    def params(self) -> Dict:
        if self._params is None:
            self._params = self._params_loader()
        return self._params

    def free(self) -> None:
        self._params = None

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
