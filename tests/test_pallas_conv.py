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

def test_packed_conv_weights_parts_parity(rng):
    """Part-major packed conv (lane-concat of per-part packs) equals the
    plain conv over the channel-concatenated input — the identity that lets
    up-path skip concats stay packed (ops/packed_conv.py multi-part notes)."""
    from tha4_tpu.ops import nn as tnn2
    from tha4_tpu.ops import packed_conv as PC

    f, ca, cb_, co = 4, 8, 12, 16
    a = jnp.asarray(rng.standard_normal((2, 8, 32, ca)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 8, 32, cb_)), jnp.float32)
    wts = jnp.asarray(rng.standard_normal((3, 3, ca + cb_, co)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(co), jnp.float32)
    ref = tnn2.conv2d({"w": wts, "b": bias}, jnp.concatenate([a, b], axis=-1))

    hcat = jnp.concatenate([PC.pack_nhwc(a, f), PC.pack_nhwc(b, f)], axis=-1)
    packed = tnn2.conv2d(
        {"w": PC.pack_conv3_weights_parts(wts, f, (ca, cb_)),
         "b": PC.tile_channel_vector(bias, f)},
        hcat,
    )
    np.testing.assert_allclose(np.asarray(PC.unpack_nhwc(packed, f)),
                               np.asarray(ref), atol=2e-5)

    # 1x1 parts + per-part stats/tiling on the same part-major tensor.
    w1 = jnp.asarray(rng.standard_normal((ca + cb_, co)) * 0.3, jnp.float32)
    ref1 = tnn2.conv2d({"w": w1[None, None], "b": bias},
                       jnp.concatenate([a, b], axis=-1), padding=0)
    got1 = tnn2.conv2d(
        {"w": PC.pack_conv1_weights_parts(w1, f, (ca, cb_)),
         "b": PC.tile_channel_vector(bias, f)},
        hcat, padding=0)
    np.testing.assert_allclose(np.asarray(PC.unpack_nhwc(got1, f)),
                               np.asarray(ref1), atol=2e-5)

    m1, m2 = PC.packed_channel_stats_parts(hcat, f, (ca, cb_))
    cat = jnp.concatenate([a, b], axis=-1)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(cat.mean(axis=(1, 2))), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray((cat * cat).mean(axis=(1, 2))), atol=1e-6)

    v = jnp.asarray(rng.standard_normal((2, ca + cb_)), jnp.float32)
    tiled = PC.tile_channel_vector_parts(v, f, (ca, cb_))
    expect = jnp.concatenate(
        [PC.tile_channel_vector(v[:, :ca], f), PC.tile_channel_vector(v[:, ca:], f)], axis=-1)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(expect))


def test_fused_resblock_packed_multipart(rng):
    """Multi-part packed resblock (the up-path concat case, without ever
    unpacking) vs the plain _resblock over the concatenated input."""
    key = jax.random.PRNGKey(1)
    ca, cs, cout, f = 16, 8, 16, 4
    params = unet._init_resblock(key, ca + cs, cout, 24, True)
    n, h, w = 2, 16, 64
    a = jnp.asarray(rng.standard_normal((n, h, w, ca)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((n, h, w, cs)), jnp.float32)
    cond0 = jnp.asarray(rng.standard_normal((n, 24)), jnp.float32)
    cond1 = jnp.asarray(rng.standard_normal((n, 24)), jnp.float32)

    from tha4_tpu.ops import packed_conv as PC

    hcat = jnp.concatenate([PC.pack_nhwc(a, f), PC.pack_nhwc(s, f)], axis=-1)
    got_p, f_out = unet._fused_resblock_packed(
        params, hcat, f, (ca, cs), cond0, cond1, 1.0, "same")
    got = PC.unpack_nhwc(got_p, f_out)

    ref = unet._resblock(params, jnp.concatenate([a, s], axis=-1), cond0, cond1, "same", 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_packed_flow_full_unet_parity(rng, monkeypatch):
    """End-to-end packed flow (skips stored packed, lane-concat up path,
    packed first/last convs, attention unpack points) vs the plain apply on
    a full small U-Net with attention and first_conv_addition."""
    cfg = unet.UnetConfig(
        in_channels=4, out_channels=7, model_channels=8,
        # (1, 2, 2): every up-concat channel count stays divisible by its
        # GroupNorm group count, as in the reference architectures.
        level_channel_multipliers=(1, 2, 2), level_use_attention=(False, False, True),
        num_res_blocks_per_level=2, num_middle_res_blocks=2,
        time_embedding_channels=None, cond_input_channels=6, cond_internal_channels=16,
        attention=unet.AttentionConfig(num_heads=2, use_new_attention_order=True),
        dropout_prob=0.0,
    )
    key = jax.random.PRNGKey(0)
    params = unet.init(key, cfg)
    # Zero-init heads (conv1 / last_conv) would make the comparison trivial;
    # perturb every leaf so all paths carry signal.
    leaves, treedef = jax.tree.flatten(params)
    pkeys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, pkeys)],
    )

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 4)), jnp.float32)
    t = jnp.zeros((2, 1), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((2, 6)), jnp.float32)
    fca = jnp.asarray(rng.standard_normal((2, 64, 64, 8)) * 0.2, jnp.float32)

    monkeypatch.setenv("THA4_PACKED_FLOW", "0")
    ref = unet.apply(cfg, params, x, t, cond, fca)
    monkeypatch.setenv("THA4_PACKED_FLOW", "force")
    got = unet.apply(cfg, params, x, t, cond, fca)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
