"""tha4_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of Talking Head Anime 4.

Capabilities mirror pkhungurn/talking-head-anime-4-demo (mounted read-only at
/root/reference): given one 512x512 RGBA anime character image, animate it from
a 45-dimensional pose vector, via

  * a five-network teacher pipeline (reference: src/tha4/poser/modes/mode_07.py)
  * per-character distillation of two tiny SIREN student networks
    (reference: src/tha4/distiller/), and
  * real-time student inference for puppeteering
    (reference: src/tha4/poser/modes/mode_14.py).

Design stance (TPU-first, not a port):
  * NHWC layout everywhere on device (channels ride the 128-wide lane
    dimension; 1x1 convs become MXU matmuls).
  * Models are pure functions: ``init(key, cfg) -> params`` pytrees and
    ``apply(cfg, params, ...)`` jittable functions.  The reference's
    string-keyed memoized computation DAG (shion cached_computation) is
    subsumed by XLA CSE inside one jitted program per poser mode.
  * Multi-chip scaling via ``jax.sharding.Mesh`` + NamedSharding: a ``data``
    axis for distillation batch parallelism and a ``space`` axis that shards
    the pixel grid of the SIREN students (they are pixelwise, so spatial
    sharding needs no halo exchange).
  * bf16 activations / f32 params and norm statistics; f32 reference path for
    parity tests against the PyTorch implementation.
"""

__version__ = "0.1.0"

from tha4_tpu.utils.compile_cache import enable_persistent_cache as _enable_cc

_enable_cc()
del _enable_cc
