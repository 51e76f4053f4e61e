"""Fused SIREN kernels (forward + backward) vs the jnp composition.

Run in Pallas interpreter mode on CPU; on the real chip the same code paths
are exercised by bench.py and the distillation recipes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tha4_tpu.ops import pallas_siren


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setattr(pallas_siren, "_fused_ok", lambda *a: True)
    monkeypatch.setattr(pallas_siren, "_fused_bwd_ok", lambda *a: True)


def _make_layers(key, dims):
    layers = []
    for i, (ci, co) in enumerate(zip(dims[:-1], dims[1:])):
        k1, k2, key = jax.random.split(key, 3)
        layers.append(
            {
                "w": jax.random.normal(k1, (ci, co), jnp.float32) * (0.5 / np.sqrt(ci)),
                "b": jax.random.normal(k2, (co,), jnp.float32) * 0.1,
            }
        )
    return layers


@pytest.mark.parametrize("with_prev,with_final", [(False, True), (True, False), (True, True)])
def test_forward_parity(with_prev, with_final):
    key = jax.random.PRNGKey(0)
    n, hw, pose_dim, cp = 2, 1024, 7, 6
    cin = (cp if with_prev else 0) + 2 + pose_dim
    layers = _make_layers(key, [cin, 24, 16])
    final = _make_layers(jax.random.PRNGKey(9), [16, 5])[0] if with_final else None
    pos = jax.random.normal(jax.random.PRNGKey(1), (2, hw), jnp.float32)
    pose = jax.random.normal(jax.random.PRNGKey(2), (n, pose_dim), jnp.float32)
    prev = jax.random.normal(jax.random.PRNGKey(3), (n, cp, hw), jnp.float32) if with_prev else None

    fused = pallas_siren.sine_chain_t(prev, pos, pose, layers, final, 30.0)
    ref = pallas_siren._jnp_chain_t(prev, pos, pose, layers, final, 30.0)
    # omega=30 amplifies f32 rounding inside sin() chains; 1e-4 is the
    # noise floor of two valid f32 evaluation orders here.
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("with_prev,with_final", [(False, True), (True, False), (True, True)])
@pytest.mark.parametrize("omega,atol", [(3.0, 1e-5), (30.0, 1e-4)])
def test_gradient_parity(with_prev, with_final, omega, atol):
    """Fused backward vs jax.vjp over the jnp composition, f32.

    At omega=3 the two evaluation orders agree to 1e-5; at the production
    omega=30 each sine layer amplifies f32 input rounding by ~omega in the
    cotangent chain, so the honest shared floor is ~1e-4 (both paths are
    'exact' — they differ only in summation order)."""
    key = jax.random.PRNGKey(0)
    n, hw, pose_dim, cp = 2, 512, 5, 4
    cin = (cp if with_prev else 0) + 2 + pose_dim
    layers = _make_layers(key, [cin, 16, 16])
    final = _make_layers(jax.random.PRNGKey(9), [16, 3])[0] if with_final else None
    pos = jax.random.normal(jax.random.PRNGKey(1), (2, hw), jnp.float32)
    pose = jax.random.normal(jax.random.PRNGKey(2), (n, pose_dim), jnp.float32)
    prev = jax.random.normal(jax.random.PRNGKey(3), (n, cp, hw), jnp.float32) if with_prev else None
    cot = jax.random.normal(jax.random.PRNGKey(4), (n, (final or layers[-1])["w"].shape[1], hw))

    def loss_fused(prev_, pose_, layers_, final_):
        out = pallas_siren.sine_chain_t(prev_, pos, pose_, layers_, final_, omega)
        return jnp.sum(out * cot)

    def loss_ref(prev_, pose_, layers_, final_):
        out = pallas_siren._jnp_chain_t(prev_, pos, pose_, layers_, final_, omega)
        return jnp.sum(out * cot)

    argnums = (0, 1, 2, 3) if with_prev else (1, 2, 3)
    g_fused = jax.grad(loss_fused, argnums=argnums)(prev, pose, layers, final)
    g_ref = jax.grad(loss_ref, argnums=argnums)(prev, pose, layers, final)
    flat_f, _ = jax.tree.flatten(g_fused)
    flat_r, _ = jax.tree.flatten(g_ref)
    assert len(flat_f) == len(flat_r)
    for a, b in zip(flat_f, flat_r):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale, atol=atol)


@pytest.mark.parametrize("omega,atol", [(1.0, 1e-5), (30.0, 1e-3)])
def test_gradient_parity_real_level_shapes(omega, atol):
    """Level-1-like shapes (prev 12ch, pose 45, 3 sine layers) at reduced hw.

    At omega=1 the kernel and the jnp path agree to ~1e-6 (the kernel math
    is exact); at the production omega=30 three chained sine layers amplify
    f32 rounding by up to ~omega^3 in the worst cotangent direction, so the
    honest shared floor is ~5e-4 (measured for both orderings)."""
    key = jax.random.PRNGKey(5)
    n, hw, pose_dim, cp = 2, 1024, 45, 12
    layers = _make_layers(key, [cp + 2 + pose_dim, 32, 32, 16])
    pos = jax.random.normal(jax.random.PRNGKey(1), (2, hw), jnp.float32)
    pose = jax.random.normal(jax.random.PRNGKey(2), (n, pose_dim), jnp.float32)
    prev = jax.random.normal(jax.random.PRNGKey(3), (n, cp, hw), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(4), (n, 16, hw))

    def run(fn, *args):
        def loss(prev_, pose_, layers_):
            return jnp.sum(fn(prev_, pos, pose_, layers_, None, omega) * cot)

        return jax.grad(loss, argnums=(0, 1, 2))(*args)

    g_fused = run(pallas_siren.sine_chain_t, prev, pose, layers)
    g_ref = run(pallas_siren._jnp_chain_t, prev, pose, layers)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale, atol=atol)
