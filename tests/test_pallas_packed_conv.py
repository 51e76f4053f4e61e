"""Parity of the packed-layout fused conv kernel (interpret mode on CPU).

The kernel is a reference implementation (see its module docstring for the
measured negative result that keeps it out of the U-Net path); these tests
pin its semantics: exactly XLA-SAME conv on the packed tensor, with the
pre-activation affine+SiLU, bias, and both skip modes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops import packed_conv as PC
from tha4_tpu.ops import pallas_packed_conv as PPC


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _setup(rng, n=2, h=96, w=128, c=16, co=8, f=8):
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wconv = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal((n, c)) * 0.3 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal((n, c)) * 0.2, jnp.float32)
    xp = PC.pack_nhwc(x, f)
    wp = PC.pack_conv3_weights(wconv, f)
    return xp, wp, PC.tile_channel_vector(b, f), PC.tile_channel_vector(scale, f), PC.tile_channel_vector(shift, f), f, c, co


def test_affine_conv_parity(rng):
    """Multi-tile (h=96 -> 3 row tiles): affine+silu+conv3 vs XLA packed."""
    xp, wp, bp, sp, shp, f, c, co = _setup(rng)
    act = jax.nn.silu(xp * sp[:, None, None, :] + shp[:, None, None, :])
    ref = tnn.conv2d({"w": wp, "b": bp}, act)
    got = PPC.fused_packed_conv3(xp, sp, shp, wp, bp, skip="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_conv_skip_parity(rng):
    xp, wp, bp, sp, shp, f, c, co = _setup(rng)
    skw = jnp.asarray(rng.standard_normal((c, co)) * 0.1, jnp.float32)
    skp = PC.pack_conv1_weights(skw, f)[0, 0]
    act = jax.nn.silu(xp * sp[:, None, None, :] + shp[:, None, None, :])
    ref = tnn.conv2d({"w": wp, "b": bp}, act) + tnn.conv2d(
        {"w": skp[None, None], "b": jnp.zeros((f * co,))}, xp, padding=0
    )
    got = PPC.fused_packed_conv3(xp, sp, shp, wp, bp, skip="conv", skip_w=skp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_identity_skip_and_no_affine(rng):
    xp, wp, bp, sp, shp, f, c, co = _setup(rng, c=8, co=8)
    act = jax.nn.silu(xp * sp[:, None, None, :] + shp[:, None, None, :])
    ref = tnn.conv2d({"w": wp, "b": bp}, act) + xp
    got = PPC.fused_packed_conv3(xp, sp, shp, wp, bp, skip="identity")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    ref2 = tnn.conv2d({"w": wp, "b": bp}, xp)
    got2 = PPC.fused_packed_conv3(xp, None, None, wp, bp, skip="none")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=2e-5)
