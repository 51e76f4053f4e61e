"""Spectral normalization (power iteration) for conv/linear weights.

Reference: src/tha4/nn/spectral_norm.py wraps torch's spectral_norm; shipped
modes all run with use_spectral_norm=False, so this exists for capability
parity.  Functional formulation: the ``u`` vector lives in the param dict and
is updated per application (one power-iteration step, like torch).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def init_spectral_state(key, w: jnp.ndarray) -> jnp.ndarray:
    """u vector for a weight reshaped to (rows, cols) with rows = out dim."""
    w2 = w.reshape(-1, w.shape[-1]).T  # HWIO -> (O, HWI)
    u = jax.random.normal(key, (w2.shape[0],), w.dtype)
    return u / (jnp.linalg.norm(u) + 1e-12)


def spectral_normalize(w: jnp.ndarray, u: jnp.ndarray, eps: float = 1e-12) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One power-iteration step; returns (w / sigma, new u)."""
    w2 = w.reshape(-1, w.shape[-1]).T  # (O, HWI)
    v = w2.T @ u
    v = v / (jnp.linalg.norm(v) + eps)
    u_new = w2 @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + eps)
    sigma = u_new @ (w2 @ v)
    return w / sigma, jax.lax.stop_gradient(u_new)
