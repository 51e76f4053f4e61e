"""Optimizer factories vs torch.optim oracles.

The reference exposes Adam/AdamW/SparseAdam/RMSprop factories
(reference: src/tha4/shion/base/optimizer_factories.py:9-46); these tests
lock our functional implementations to the torch update rules step by step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tha4_tpu.training import optimizers


def _run_pair(factory, torch_opt_fn, steps=5, lr=0.01, grad_fn=None):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(steps)]
    if grad_fn is not None:
        grads = [grad_fn(g, i) for i, g in enumerate(grads)]

    # torch
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch_opt_fn([tp], lr)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    params = {"w": jnp.asarray(p0)}
    state = factory.init(params)
    for g in grads:
        params, state = factory.update({"w": jnp.asarray(g)}, state, params, lr)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), rtol=2e-6, atol=5e-7)


def test_adam_matches_torch():
    _run_pair(
        optimizers.AdamFactory(weight_decay=0.05),
        lambda ps, lr: torch.optim.Adam(ps, lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.05),
    )


def test_adamw_matches_torch():
    _run_pair(
        optimizers.AdamWFactory(),
        lambda ps, lr: torch.optim.AdamW(ps, lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01),
    )


def test_rmsprop_matches_torch():
    _run_pair(
        optimizers.RMSpropFactory(),
        lambda ps, lr: torch.optim.RMSprop(ps, lr=lr),
    )


def test_sparse_adam_matches_dense_adam_on_dense_grads():
    """With fully dense (nonzero) grads, torch SparseAdam == torch Adam; our
    masked implementation must agree."""
    grad_fn = lambda g, i: np.where(g == 0, 1e-3, g).astype(np.float32)
    _run_pair(
        optimizers.SparseAdamFactory(),
        lambda ps, lr: torch.optim.Adam(ps, lr=lr, betas=(0.9, 0.999), eps=1e-8),
        grad_fn=grad_fn,
    )


def test_sparse_adam_masks_zero_gradients():
    """Zero-gradient coordinates must keep both their value and their
    moments untouched (torch SparseAdam semantics)."""
    factory = optimizers.SparseAdamFactory()
    params = {"w": jnp.ones((2, 2))}
    state = factory.init(params)
    g = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
    params, state = factory.update({"w": g}, state, params, 0.1)
    w = np.asarray(params["w"])
    assert w[0, 1] == 1.0 and w[1, 0] == 1.0  # untouched
    assert w[0, 0] != 1.0 and w[1, 1] != 1.0
    mu = np.asarray(state.mu["w"])
    assert mu[0, 1] == 0.0 and mu[0, 0] != 0.0


def test_factories_jit_with_traced_lr():
    factory = optimizers.AdamWFactory()
    params = {"w": jnp.ones((3,))}
    state = factory.init(params)

    @jax.jit
    def step(params, state, lr):
        return factory.update({"w": jnp.full((3,), 0.5)}, state, params, lr)

    p1, s1 = step(params, state, 0.01)
    p2, _ = step(params, state, 0.02)
    assert not np.allclose(np.asarray(p1["w"]), np.asarray(p2["w"]))
