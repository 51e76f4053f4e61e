"""Functional losses (reference: src/tha4/shion/base/loss/).

The reference composes Loss objects over the string-keyed computation state;
here losses are plain jnp functions over tensors, and compositions return
``(total, {name: value})`` so the named terms can be logged exactly as the
reference's SumLoss does (sum_loss.py:22-27).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def l1(expected: jnp.ndarray, actual: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """weight * mean|e - a| (reference l1_loss.py:22)."""
    return weight * jnp.abs(expected - actual).mean()


def l2(expected: jnp.ndarray, actual: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    return weight * ((expected - actual) ** 2).mean()


def masked_l1(
    expected: jnp.ndarray, actual: jnp.ndarray, mask: jnp.ndarray, weight: float = 1.0
) -> jnp.ndarray:
    """weight * mean|(e - a) * mask| — mean over ALL elements, matching the
    reference exactly (l1_loss.py:66: ((expected - actual) * mask).abs().mean())."""
    return weight * jnp.abs((expected - actual) * mask).mean()


def list_l1(expected: Sequence[jnp.ndarray], actual: Sequence[jnp.ndarray], weight: float = 1.0) -> jnp.ndarray:
    assert len(expected) == len(actual)
    total = 0.0
    for e, a in zip(expected, actual):
        total = total + jnp.abs(e - a).mean()
    return weight * total


def computed_scale_loss(base_value: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Loss scaled by a runtime-computed factor (reference ComputedScaleLoss);
    the scale is treated as a constant w.r.t. gradients, like the reference's
    detached scale."""
    return jax.lax.stop_gradient(scale) * base_value


def computed_scaled_l2(expected, actual, scale) -> jnp.ndarray:
    """reference ComputedScaledL2Loss: runtime scale x mean squared error."""
    return computed_scale_loss(l2(expected, actual), scale)


def time_dependently_weighted(base_value: jnp.ndarray, weight: float) -> jnp.ndarray:
    """reference TimeDependentlyWeightedLoss: the weight is a host-side
    function of examples-seen, evaluated by the schedule and passed in as a
    scalar (see training.schedules.TrainingPhases.loss_weight)."""
    return weight * base_value


def sum_named(terms: List[Tuple[str, jnp.ndarray]]) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """SumLoss equivalent: total + per-name scalars for logging."""
    named = {name: value for name, value in terms}
    total = 0.0
    for _, value in terms:
        total = total + value
    named["loss"] = total
    return total, named
