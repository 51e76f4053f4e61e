"""Pallas warp kernel parity vs the pure-jnp reference implementation.

On CPU these run the kernel in interpreter mode (slow but exact semantics);
on the real chip the same assertions are checked by /tmp-level perf scripts
and the distillation loop itself.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tha4_tpu.ops import pallas_warp, warp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # Run the kernels in interpreter mode on CPU.
    import jax.experimental.pallas as pl

    original = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(original, interpret=True))
    yield


def _smooth_grid(key, n, h, w, scale=0.05):
    coarse = jax.random.normal(key, (n, 8, 8, 2), jnp.float32) * scale
    flow = jax.image.resize(coarse, (n, h, w, 2), "bilinear")
    return warp.identity_grid(h, w)[None] + flow


@pytest.mark.parametrize("size", [128, 192, 256])
def test_forward_parity(rng, size):
    key = jax.random.PRNGKey(size)
    img = jax.random.normal(key, (2, size, size, 4), jnp.float32)
    grid = _smooth_grid(key, 2, size, size)
    ref = warp.grid_sample_bilinear_border(img, grid)
    out = pallas_warp.grid_sample_fast(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_grad_parity(rng):
    size = 128
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, size, size, 4), jnp.float32)
    grid = _smooth_grid(key, 1, size, size)

    def loss_ref(g):
        return (warp.grid_sample_bilinear_border(img, g) ** 2).sum()

    def loss_fast(g):
        return (pallas_warp.grid_sample_fast(img, g) ** 2).sum()

    gr = np.asarray(jax.grad(loss_ref)(grid))
    gf = np.asarray(jax.grad(loss_fast)(grid))
    # Gradient magnitudes reach ~1e3; compare in relative terms.
    scale = np.abs(gr).max()
    np.testing.assert_allclose(gf / scale, gr / scale, atol=2e-5)


def test_image_treated_as_constant():
    """The fast path stops gradients at the image by contract."""
    size = 128
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (1, size, size, 4), jnp.float32)
    grid = _smooth_grid(key, 1, size, size)
    dimg = jax.grad(lambda im: (pallas_warp.grid_sample_fast(im, grid) ** 2).sum())(img)
    assert float(jnp.abs(dimg).max()) == 0.0
