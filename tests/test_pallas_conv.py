"""Fused NCHW affine+SiLU+conv3 kernel vs the XLA composition.

Interpreter mode on CPU; the real-chip speedup is tracked in README/bench.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tha4_tpu.models import unet
from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops import pallas_conv


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def _ref_conv3(w_hwio, b, x_nchw):
    x = jnp.transpose(x_nchw, (0, 2, 3, 1))
    out = tnn.conv2d({"w": w_hwio, "b": b}, x)
    return jnp.transpose(out, (0, 3, 1, 2))


def test_plain_conv3_parity(rng):
    n, c, h, w = 2, 8, 16, 128
    x = jnp.asarray(rng.standard_normal((n, c, h, w)), jnp.float32)
    wts = jnp.asarray(rng.standard_normal((3, 3, c, 5)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(5), jnp.float32)
    out = pallas_conv.fused_affine_conv3_nchw(x, None, None, pallas_conv.to_w9(wts), b)
    ref = _ref_conv3(wts, b, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_affine_silu_conv3_parity(rng):
    n, c, h, w = 2, 8, 32, 128
    x = jnp.asarray(rng.standard_normal((n, c, h, w)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (n, c)), jnp.float32)
    shift = jnp.asarray(rng.uniform(-0.5, 0.5, (n, c)), jnp.float32)
    wts = jnp.asarray(rng.standard_normal((3, 3, c, 8)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    out = pallas_conv.fused_affine_conv3_nchw(x, scale, shift, pallas_conv.to_w9(wts), b)
    act = jax.nn.silu(x * scale[:, :, None, None] + shift[:, :, None, None])
    ref = _ref_conv3(wts, b, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_skip_identity_and_conv(rng):
    n, c, co, h, w = 1, 8, 8, 16, 128
    x = jnp.asarray(rng.standard_normal((n, c, h, w)), jnp.float32)
    wts = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.2, jnp.float32)
    b = jnp.zeros(co, jnp.float32)
    skip = jnp.asarray(rng.standard_normal((n, co, h, w)), jnp.float32)
    out = pallas_conv.fused_affine_conv3_nchw(x, None, None, pallas_conv.to_w9(wts), b, skip=skip)
    ref = _ref_conv3(wts, b, x) + skip
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    cs = 12
    skip2 = jnp.asarray(rng.standard_normal((n, cs, h, w)), jnp.float32)
    skip_w = jnp.asarray(rng.standard_normal((co, cs)) * 0.2, jnp.float32)
    out2 = pallas_conv.fused_affine_conv3_nchw(
        x, None, None, pallas_conv.to_w9(wts), b, skip=skip2, skip_w=skip_w
    )
    ref2 = _ref_conv3(wts, b, x) + jnp.einsum("oc,nchw->nohw", skip_w, skip2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=2e-5)


def test_fold_groupnorm_film_matches_ops(rng):
    n, c, h, w = 2, 16, 8, 128
    x_nchw = jnp.asarray(rng.standard_normal((n, c, h, w)), jnp.float32)
    gn_scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    gn_bias = jnp.asarray(rng.uniform(-0.5, 0.5, c), jnp.float32)
    f_scale = jnp.asarray(rng.standard_normal((n, c)) * 0.3, jnp.float32)
    f_shift = jnp.asarray(rng.standard_normal((n, c)) * 0.3, jnp.float32)
    cb = 1.0

    scale, shift = pallas_conv.fold_groupnorm_film(
        x_nchw, 8, gn_scale, gn_bias, ((f_scale, f_shift),), cb
    )
    got = x_nchw * scale[:, :, None, None] + shift[:, :, None, None]

    x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
    gn = tnn.group_norm({"scale": gn_scale, "bias": gn_bias}, x_nhwc, num_groups=8)
    ss = jnp.concatenate([f_scale, f_shift], axis=-1)
    ref = unet._apply_scaleshift(gn, ss, cb)
    ref = jnp.transpose(ref, (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,sampling",
    [
        (8, 8, "same"), (12, 8, "same"), (32, 32, "same"), (96, 32, "same"),
        (8, 16, "down"), (32, 32, "down"), (96, 32, "down"),
        (16, 8, "up"), (32, 32, "up"), (96, 32, "up"),
    ],
)
def test_fused_resblock_matches_reference_path(rng, cin, cout, sampling, monkeypatch):
    """Full lane-packed resblock (packed convs + affine folds + in-packed-
    space resampling) vs the plain XLA _resblock, for all three sampling
    modes at upscaler-level channel combos (incl. the up-path concat
    96->32 case)."""
    monkeypatch.setattr(unet, "_fuse_resblock_ok", lambda *a: True)
    key = jax.random.PRNGKey(0)
    params = unet._init_resblock(key, cin, cout, 24, True)
    n, h, w = 2, 16, 128
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.float32)
    cond0 = jnp.asarray(rng.standard_normal((n, 24)), jnp.float32)
    cond1 = jnp.asarray(rng.standard_normal((n, 24)), jnp.float32)

    fused = unet._resblock(params, x, cond0, cond1, sampling, 1.0)
    monkeypatch.setattr(unet, "_fuse_resblock_ok", lambda *a: False)
    ref = unet._resblock(params, x, cond0, cond1, sampling, 1.0)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-5)


def test_packed_conv_weights_parity(rng):
    """pack_conv3_weights: the packed conv equals the original conv after
    the free reshape, for several pack factors."""
    from tha4_tpu.ops import nn as tnn2
    from tha4_tpu.ops import packed_conv as PC

    for f, c, co, w in [(2, 8, 8, 32), (4, 8, 4, 64), (4, 4, 12, 128)]:
        x = jnp.asarray(rng.standard_normal((2, 8, w, c)), jnp.float32)
        wts = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.3, jnp.float32)
        b = jnp.asarray(rng.standard_normal(co), jnp.float32)
        ref = tnn2.conv2d({"w": wts, "b": b}, x)
        packed = tnn2.conv2d(
            {"w": PC.pack_conv3_weights(wts, f), "b": PC.tile_channel_vector(b, f)},
            PC.pack_nhwc(x, f),
        )
        got = PC.unpack_nhwc(packed, f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, err_msg=f"f={f}")


def test_packed_channel_stats(rng):
    from tha4_tpu.ops import packed_conv as PC

    x = jnp.asarray(rng.standard_normal((2, 8, 32, 8)), jnp.float32)
    xp = PC.pack_nhwc(x, 4)
    m1, m2 = PC.packed_channel_stats(xp, 4)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(x.mean(axis=(1, 2))), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray((x * x).mean(axis=(1, 2))), atol=1e-6)