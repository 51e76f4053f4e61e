"""Optimizer factories: Adam, AdamW, SparseAdam, RMSprop.

Functional equivalents of the reference's factory set
(reference: src/tha4/shion/base/optimizer_factories.py:9-46), with the exact
torch.optim update rules so a recipe switched from the reference to this
framework trains identically:

  * Adam      — L2 weight decay folded into the gradient (torch style),
                p -= lr * m_hat / (sqrt(v_hat) + eps).
  * AdamW     — DECOUPLED decay: p *= (1 - lr*wd) before the Adam step
                (torch AdamW default wd=0.01).
  * SparseAdam — Adam whose moments update only where the gradient is
                nonzero.  The reference uses it on dense SIREN grads, where
                torch SparseAdam degenerates to masked-Adam; we reproduce the
                masking so zero-gradient parameters keep stale moments
                exactly as torch does.  (There is no sparse tensor type on
                TPU; the mask IS the sparsity.)
  * RMSprop   — torch defaults: alpha=0.99, eps=1e-8, no momentum, eps added
                OUTSIDE the sqrt.

Each factory returns an object with ``init(params) -> state`` and
``update(grads, state, params, lr) -> (params, state)``; ``lr`` is a traced
scalar so schedule changes never recompile.  The lr is applied by the caller
per-step (matching the reference's set_learning_rate-then-step contract,
reference: src/tha4/shion/core/training/util.py:36-41).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class MomentState(NamedTuple):
    count: jnp.ndarray  # scalar int32
    mu: Any  # first moment pytree
    nu: Any  # second moment pytree


def _zeros_like_tree(params):
    return jax.tree.map(jnp.zeros_like, params)


@dataclass(frozen=True)
class AdamFactory:
    """torch.optim.Adam: L2 decay in-gradient (reference factory :9-17)."""

    betas: Tuple[float, float] = (0.9, 0.999)
    epsilon: float = 1e-8
    weight_decay: float = 0.0

    def init(self, params) -> MomentState:
        return MomentState(jnp.zeros((), jnp.int32), _zeros_like_tree(params), _zeros_like_tree(params))

    def update(self, grads, state: MomentState, params, lr):
        b1, b2 = self.betas
        count = state.count + 1
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t

        def upd(p, g, m, v):
            g = g + self.weight_decay * p if self.weight_decay else g
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * (g * g)
            # torch order: denom = sqrt(v)/sqrt(bc2) + eps; step = lr/bc1
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + self.epsilon
            return p - (lr / bc1) * m / denom, m, v

        out = jax.tree.map(upd, params, grads, state.mu, state.nu)
        params = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return params, MomentState(count, mu, nu)


@dataclass(frozen=True)
class AdamWFactory:
    """torch.optim.AdamW: decoupled decay (reference factory :20-28)."""

    betas: Tuple[float, float] = (0.9, 0.999)
    epsilon: float = 1e-8
    weight_decay: float = 0.01

    def init(self, params) -> MomentState:
        return AdamFactory(self.betas, self.epsilon).init(params)

    def update(self, grads, state: MomentState, params, lr):
        b1, b2 = self.betas
        count = state.count + 1
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t

        def upd(p, g, m, v):
            p = p * (1.0 - lr * self.weight_decay)
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * (g * g)
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + self.epsilon
            return p - (lr / bc1) * m / denom, m, v

        out = jax.tree.map(upd, params, grads, state.mu, state.nu)
        params = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return params, MomentState(count, mu, nu)


class SparseAdamState(NamedTuple):
    steps: Any  # per-parameter step counts (torch SparseAdam advances t per update)
    mu: Any
    nu: Any


@dataclass(frozen=True)
class SparseAdamFactory:
    """torch.optim.SparseAdam semantics on dense grads (reference :31-38).

    torch SparseAdam updates moments and applies bias correction only on the
    nonzero coordinates of the gradient; each parameter tensor keeps one step
    count that advances on every optimizer step.  We mask elementwise: where
    g == 0, moments and the parameter are untouched."""

    betas: Tuple[float, float] = (0.9, 0.999)
    epsilon: float = 1e-8

    def init(self, params) -> SparseAdamState:
        return SparseAdamState(
            jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params),
            _zeros_like_tree(params),
            _zeros_like_tree(params),
        )

    def update(self, grads, state: SparseAdamState, params, lr):
        b1, b2 = self.betas

        def upd(p, g, s, m, v):
            s = s + 1
            t = s.astype(jnp.float32)
            mask = (g != 0).astype(p.dtype)
            m = jnp.where(mask > 0, b1 * m + (1.0 - b1) * g, m)
            v = jnp.where(mask > 0, b2 * v + (1.0 - b2) * g * g, v)
            bc1 = 1.0 - b1**t
            bc2 = 1.0 - b2**t
            # torch SparseAdam: std = sqrt(v) + eps; step = lr*sqrt(bc2)/bc1
            denom = jnp.sqrt(v) + self.epsilon
            return p - (lr * jnp.sqrt(bc2) / bc1) * m / denom * mask, s, m, v

        out = jax.tree.map(upd, params, grads, state.steps, state.mu, state.nu)
        leaf = lambda x: isinstance(x, tuple)
        return (
            jax.tree.map(lambda o: o[0], out, is_leaf=leaf),
            SparseAdamState(
                jax.tree.map(lambda o: o[1], out, is_leaf=leaf),
                jax.tree.map(lambda o: o[2], out, is_leaf=leaf),
                jax.tree.map(lambda o: o[3], out, is_leaf=leaf),
            ),
        )


class RMSpropState(NamedTuple):
    square_avg: Any


@dataclass(frozen=True)
class RMSpropFactory:
    """torch.optim.RMSprop defaults (reference :41-46): alpha=0.99, eps=1e-8,
    momentum 0, centered=False; eps OUTSIDE the sqrt."""

    alpha: float = 0.99
    epsilon: float = 1e-8

    def init(self, params) -> RMSpropState:
        return RMSpropState(_zeros_like_tree(params))

    def update(self, grads, state: RMSpropState, params, lr):
        def upd(p, g, sq):
            sq = self.alpha * sq + (1.0 - self.alpha) * g * g
            return p - lr * g / (jnp.sqrt(sq) + self.epsilon), sq

        out = jax.tree.map(upd, params, grads, state.square_avg)
        leaf = lambda x: isinstance(x, tuple)
        return (
            jax.tree.map(lambda o: o[0], out, is_leaf=leaf),
            RMSpropState(jax.tree.map(lambda o: o[1], out, is_leaf=leaf)),
        )
