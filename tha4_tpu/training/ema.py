"""EMA parameter accumulator (reference DecayAccumulator,
src/tha4/shion/base/module_accumulators.py:10-29, beta=0.999).

The reference ships this but both distill trainers run with empty
``accumulators={}``; kept for capability parity and available to recipes.
"""

from __future__ import annotations

import jax


def init(params):
    return jax.tree.map(lambda p: p, params)


def update(ema_params, params, decay: float = 0.999):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
