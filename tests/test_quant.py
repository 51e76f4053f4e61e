"""int8 frozen-teacher quantization (ops/quant.py).

Covers: weight quantization accuracy, the calibrate->apply positional
protocol (traced calibration, signature checks, consumption checks),
eligibility rules (heads/small convs stay bf16), end-to-end closeness of a
quantized conv stack, and the distill-chunk plumbing (teacher_quant=...).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tha4_tpu.ops import nn as tnn
from tha4_tpu.ops import quant


def _conv_params(rng, kh, cin, cout, dtype=jnp.float32):
    return {
        "w": jnp.asarray(rng.standard_normal((kh, kh, cin, cout)) * 0.1, dtype),
        "b": jnp.asarray(rng.standard_normal((cout,)) * 0.01, dtype),
    }


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 64)), jnp.float32)
    w8, s = quant.quantize_weight(w)
    assert w8.dtype == jnp.int8 and s.shape == (64,)
    back = np.asarray(w8, np.float32) * np.asarray(s)
    # Max quantization error is s/2 per channel.
    err = np.abs(back - np.asarray(w))
    assert np.all(err <= np.asarray(s)[None, None, None, :] * 0.5 + 1e-7)


def test_structural_zeros_stay_zero(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16)), jnp.float32)
    w = w.at[:, :, 8:, :].set(0.0)
    w8, _ = quant.quantize_weight(w)
    assert np.all(np.asarray(w8)[:, :, 8:, :] == 0)


def _stack(params, x):
    """Two eligible convs + one ineligible head (cout=4 < 16)."""
    h = jax.nn.silu(tnn.conv2d(params["c0"], x))
    h = jax.nn.silu(tnn.conv2d(params["c1"], h))
    return tnn.conv2d(params["head"], h)


@pytest.fixture
def stack_setup(rng):
    params = {
        "c0": _conv_params(rng, 3, 16, 32),
        "c1": _conv_params(rng, 3, 32, 32),
        "head": _conv_params(rng, 3, 32, 4),
    }
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16)), jnp.float32)
    return params, x


def test_calibrate_apply_close(stack_setup):
    params, x = stack_setup
    ref = np.asarray(_stack(params, x))

    scales = quant.run_calibration(_stack, params, x)
    assert len(scales) == 2  # head excluded by the cout>=16 rule

    def quantized(params, x):
        with quant.apply_scales(scales):
            return _stack(params, x)

    out = np.asarray(jax.jit(quantized)(params, x))
    # int8 with calibrated scales: small relative error on a 2-conv stack.
    rel = np.mean(np.abs(out - ref)) / (np.mean(np.abs(ref)) + 1e-12)
    assert rel < 0.04, rel
    assert not np.allclose(out, ref)  # actually took the int8 path


def test_apply_none_is_noop(stack_setup):
    params, x = stack_setup
    ref = np.asarray(_stack(params, x))
    with quant.apply_scales(None):
        out = np.asarray(_stack(params, x))
    np.testing.assert_array_equal(out, ref)


def test_signature_mismatch_raises(stack_setup):
    params, x = stack_setup
    scales = quant.run_calibration(_stack, params, x)
    bad = jnp.asarray(np.zeros((2, 8, 8, 16), np.float32))  # wrong spatial dims
    with pytest.raises(RuntimeError, match="signature mismatch"):
        with quant.apply_scales(scales):
            _stack(params, bad)


def test_consumption_mismatch_raises(stack_setup):
    params, x = stack_setup
    scales = quant.run_calibration(_stack, params, x)
    with pytest.raises(RuntimeError, match="consumed 1 of 2"):
        with quant.apply_scales(scales):
            tnn.conv2d(params["c0"], x)  # only one of the two calibrated convs


def test_too_many_convs_raises(stack_setup):
    params, x = stack_setup
    scales = quant.run_calibration(_stack, params, x)
    with pytest.raises(RuntimeError, match="more eligible convs"):
        with quant.apply_scales(scales):
            h = tnn.conv2d(params["c0"], x)
            h = tnn.conv2d(params["c1"], jax.nn.silu(h))
            tnn.conv2d(params["c1"], jax.nn.silu(h))


def test_batch_excluded_from_signature(stack_setup):
    params, x = stack_setup
    scales = quant.run_calibration(_stack, params, x)
    xb = jnp.concatenate([x, x], axis=0)  # different batch, same spatial

    def quantized(params, x):
        with quant.apply_scales(scales):
            return _stack(params, x)

    out = jax.jit(quantized)(params, xb)
    assert out.shape[0] == 4


def test_strided_conv_not_quantized(rng):
    params = {"c": _conv_params(rng, 4, 16, 32)}
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16)), jnp.float32)
    scales = quant.run_calibration(lambda p, a: tnn.conv2d(p["c"], a, stride=2, padding=1), params, x)
    assert scales == []


def test_merge_calibrations(stack_setup):
    params, x = stack_setup
    s1 = quant.run_calibration(_stack, params, x)
    s2 = quant.run_calibration(_stack, params, x * 2.0)
    merged = quant.Calibration.merge([s1, s2])
    for m, a, b in zip(merged, s1, s2):
        assert m["scale"] == max(a["scale"], b["scale"])


def test_scales_io_roundtrip(tmp_path, stack_setup):
    params, x = stack_setup
    scales = quant.run_calibration(_stack, params, x)
    path = str(tmp_path / "scales.json")
    quant.save_scales(path, scales)
    assert quant.load_scales(path) == scales


def test_face_chunk_with_teacher_quant(rng):
    """The distill-chunk plumbing end to end on a tiny face teacher."""
    from tha4_tpu.distiller import recipes
    from tha4_tpu.models import eyebrow as eb, face_morpher as fm, siren
    from tha4_tpu.poser.modes import mode_12

    cfg = mode_12.FaceTeacherConfig(
        eyebrow_decomposer=eb.EyebrowDecomposerConfig(start_channels=16, num_bottleneck_blocks=1, max_channels=32),
        eyebrow_combiner=eb.EyebrowCombinerConfig(start_channels=16, num_bottleneck_blocks=1, max_channels=32),
        face_morpher=fm.FaceMorpherConfig(start_channels=16, num_bottleneck_blocks=1, max_channels=32),
    )
    key = jax.random.PRNGKey(0)
    tparams = mode_12.init(key, cfg)
    scfg = siren.SirenFaceMorpherConfig(
        siren=siren.SirenConfig(in_channels=41, out_channels=4, intermediate_channels=16, num_sine_layers=2)
    )
    sparams = siren.siren_face_morpher_init(key, scfg)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 512, 512, 4)), jnp.float32)
    mask = jnp.ones((128, 128, 4), jnp.float32)

    def pose_batch(k, n):
        return jax.random.uniform(k, (n, 45), jnp.float32)

    scales = quant.run_calibration(
        lambda tp, i, p: mode_12.compute_outputs(cfg, tp, i, p),
        tparams, jnp.broadcast_to(image, (2, 512, 512, 4)), pose_batch(key, 2))
    assert len(scales) > 0

    chunk = recipes.make_face_distill_chunk(
        cfg, scfg, pose_batch, batch_size=2, compute_dtype=jnp.float32,
        teacher_quant=scales)
    opt = recipes.adam_init(sparams)
    params, opt, named = chunk(sparams, opt, tparams, image, mask, key, jnp.float32(1e-4), n_steps=2)
    assert np.isfinite(float(named["loss"]))
