"""Shared helpers for the Pallas TPU kernels."""

import jax
import jax.numpy as jnp


def kernel_dot_precision(dtype):
    """Explicit MXU precision for a kernel ``dot_general`` on ``dtype`` operands.

    Kernel dots must ALWAYS pass an explicit ``precision``: with ``None`` the
    ambient ``jax.default_matmul_precision`` context is baked into the traced
    jaxpr, and Mosaic only lowers DEFAULT and HIGHEST — a caller running the
    poser under the ``'high'`` (3-pass) tier would crash the kernel lowering
    with ``Unsupported dot precision: HIGH``.

    The kernels cast their operands to an explicit compute dtype before every
    dot and accumulate in f32, so the multiply precision is fully determined
    by that dtype: bf16 operands are exact at DEFAULT (one MXU pass covers the
    full bf16 mantissa), f32 operands need HIGHEST to keep the f32 mantissa
    (DEFAULT would silently truncate them to one bf16 pass).  The ambient
    'high' tier therefore only ever applies to the XLA-side matmuls around
    the kernels, which is the semantics the precision ladder documents.
    """
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT
