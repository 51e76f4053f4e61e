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
    """LOUD contract test: the fast path's image cotangent is exactly zero
    (grid-only gradients), while the jnp path propagates real image grads.
    If the kernel ever grows image gradients (or a caller starts relying on
    them through the fast path), this test must be revisited."""
    size = 128
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (1, size, size, 4), jnp.float32)
    grid = _smooth_grid(key, 1, size, size)
    dimg = jax.grad(lambda im: (pallas_warp.grid_sample_fast(im, grid) ** 2).sum())(img)
    assert float(jnp.abs(dimg).max()) == 0.0
    dimg_ref = jax.grad(lambda im: (warp.grid_sample_bilinear_border(im, grid) ** 2).sum())(img)
    assert float(jnp.abs(dimg_ref).max()) > 0.0  # the exact path does differentiate


def test_out_of_budget_displacement_clamps_to_window():
    """The documented deviation: displacements beyond the VMEM-window budget
    clamp to the window edge instead of sampling the true source pixel.
    This pins the failure mode (and the budget arithmetic) so a silent
    behavior change can't pass unnoticed."""
    size = 256
    key = jax.random.PRNGKey(2)
    img = jax.random.normal(key, (1, size, size, 4), jnp.float32)
    by, bx = pallas_warp.displacement_budget_px(img.shape, (1, size, size, 2))
    # A uniform displacement follows the window (in budget even if large), so
    # an out-of-budget case needs intra-tile SPREAD: alternate huge +/- row
    # offsets within one 8-row tile.
    dy_px = by * 4.0
    sign = (jnp.arange(size) % 2 * 2 - 1).astype(jnp.float32)
    gc = jnp.zeros((1, size, size, 2), jnp.float32)
    gc = gc.at[..., 1].set(sign[:, None] * (2.0 * dy_px / size))
    grid = warp.identity_grid(size, size)[None] + gc

    exact = warp.grid_sample_bilinear_border(img, grid)
    fast = pallas_warp.grid_sample_fast(img, grid)
    # In budget the two agree (see test_forward_parity); out of budget they
    # must NOT (the clamp is real) — and the kernel must stay finite.
    assert not np.allclose(np.asarray(fast), np.asarray(exact), atol=1e-3)
    assert np.isfinite(np.asarray(fast)).all()
    assert not bool(pallas_warp.within_budget(gc, img.shape, grid.shape))


def test_within_budget_flags():
    img_shape = (1, 512, 512, 4)
    grid_shape = (1, 512, 512, 2)
    by, bx = pallas_warp.displacement_budget_px(img_shape, grid_shape)
    assert by >= 36.0, "budget must cover trained THA4 flows (~36 px vertical)"
    small = jnp.full((1, 512, 512, 2), 0.05)  # 12.8 px
    big = jnp.full((1, 512, 512, 2), 0.9)  # 230 px
    assert bool(pallas_warp.within_budget(small, img_shape, grid_shape))
    assert not bool(pallas_warp.within_budget(big, img_shape, grid_shape))


def test_strict_mode_falls_back_to_exact(monkeypatch):
    """fast='strict' routes out-of-budget grids to the exact jnp path at
    RUNTIME (lax.cond), so pathological flows can never clamp silently."""
    monkeypatch.setattr(pallas_warp, "supported", lambda i, g: True)
    size = 256
    key = jax.random.PRNGKey(3)
    img = jax.random.normal(key, (1, size, size, 4), jnp.float32)
    by, _ = pallas_warp.displacement_budget_px(img.shape, (1, size, size, 2))
    sign = (jnp.arange(size) % 2 * 2 - 1).astype(jnp.float32)
    gc = jnp.zeros((1, size, size, 2), jnp.float32)
    gc = gc.at[..., 1].set(sign[:, None] * (2.0 * by * 4.0 / size))

    exact = warp.apply_grid_change(gc, img, fast="never")
    strict = warp.apply_grid_change(gc, img, fast="strict")
    np.testing.assert_allclose(np.asarray(strict), np.asarray(exact), atol=1e-5)

    # And an in-budget grid still uses the fast kernel (parity check).
    gc_small = jnp.full((1, size, size, 2), 0.02)
    np.testing.assert_allclose(
        np.asarray(warp.apply_grid_change(gc_small, img, fast="strict")),
        np.asarray(warp.apply_grid_change(gc_small, img, fast="never")),
        atol=1e-4,
    )


def test_trained_flows_fit_the_fast_kernel_budget():
    """The fast warp's window clamp is safe for REAL trained flows: the
    shipped lambda_00 body student's grid_change extremes (measured ~58 px
    horizontal / ~37 px vertical at 512 px over random poses) must stay
    inside displacement_budget_px for BOTH the forward and backward tile
    configurations, with the margin this asserts (budgets: 64 px horizontal,
    52/60 px vertical)."""
    import numpy as np

    from tests.conftest import reference_available

    if not reference_available():
        pytest.skip("reference data not mounted")

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.core import imagecodec
    from tha4_tpu.models import siren

    L = "/root/reference/data/character_models/lambda_00"
    params = tw.convert_siren_morpher(tw.load_torch_state_dict(f"{L}/body_morpher.pt"))
    cfg = siren.SirenMorpherConfig()
    img = imagecodec.load_image_hwc(f"{L}/character.png")[None]
    rng = np.random.default_rng(0)
    pose = rng.uniform(0, 1, (4, 45)).astype(np.float32)
    pose[:, 35:42] = rng.uniform(-1, 1, (4, 7))
    outs = siren.siren_morpher_apply_nhwc(
        cfg, params, jnp.asarray(np.repeat(img, 4, 0)), jnp.asarray(pose)
    )
    gc = np.asarray(outs[siren.SIREN_MORPHER_INDEX_GRID_CHANGE])
    dx_px = float(np.abs(gc[..., 0]).max()) * 256
    dy_px = float(np.abs(gc[..., 1]).max()) * 256

    img_shape = (1, 512, 512, 4)
    grid_shape = (1, 512, 512, 2)
    by, bx = pallas_warp.displacement_budget_px(img_shape, grid_shape)
    assert dx_px <= bx, (dx_px, bx)
    assert dy_px <= by, (dy_px, by)
    # Also the batch-8 training configuration.
    by8, bx8 = pallas_warp.displacement_budget_px((8, 512, 512, 4), (8, 512, 512, 2))
    assert dx_px <= bx8 and dy_px <= by8


def _kernel_dot_precisions(jaxpr):
    """Collect the `precision` of every dot_general inside pallas_call kernels
    reachable from ``jaxpr`` (recursing through all sub-jaxprs)."""
    from jax.extend import core as jcore

    found = []

    def walk(jx, inside_kernel):
        for eqn in jx.eqns:
            is_kernel = inside_kernel or eqn.primitive.name == "pallas_call"
            if eqn.primitive.name == "dot_general" and inside_kernel:
                found.append(eqn.params.get("precision"))
            for v in eqn.params.values():
                for sub in jax.tree_util.tree_leaves(
                    v, is_leaf=lambda x: isinstance(x, (jcore.Jaxpr, jcore.ClosedJaxpr))
                ):
                    if isinstance(sub, jcore.ClosedJaxpr):
                        walk(sub.jaxpr, is_kernel)
                    elif isinstance(sub, jcore.Jaxpr):
                        walk(sub, is_kernel)

    walk(jaxpr, False)
    return found


def test_ambient_high_precision_never_reaches_kernel_dots():
    """Regression for the round-4 Mosaic crash AND the round-4 perf regression.

    (a) Mosaic only lowers DEFAULT and HIGHEST: tracing the warp under an
        ambient ``jax.default_matmul_precision('high')`` must not leak the
        (unloweable) HIGH tier into any kernel dot.
    (b) The inference (primal-only) forward's folded one-hot dot must stay at
        DEFAULT — pinning it to HIGHEST is a 6-pass f32 MXU emulation that
        regressed end-to-end student fps 2.8x (BENCH_r03 331 -> BENCH_r04 117).
    """
    size = 256
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, size, size, 4), jnp.bfloat16)
    grid = _smooth_grid(key, 1, size, size).astype(jnp.bfloat16)

    with jax.default_matmul_precision("high"):
        primal = jax.make_jaxpr(pallas_warp.grid_sample_fast)(img, grid)

        def loss(g):
            return pallas_warp.grid_sample_fast(img, g).astype(jnp.float32).sum()

        diff = jax.make_jaxpr(jax.grad(loss))(grid)

    ok = {jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST}
    primal_precs = _kernel_dot_precisions(primal.jaxpr)
    diff_precs = _kernel_dot_precisions(diff.jaxpr)
    assert primal_precs, "expected at least one kernel dot in the primal trace"
    assert diff_precs, "expected at least one kernel dot in the grad trace"
    for prec in primal_precs + diff_precs:
        assert prec is not None, "kernel dot inherited ambient precision (None)"
        assert set(prec) <= ok, f"Mosaic-unloweable precision in kernel: {prec}"
    # (b): the inference fwd kernel's folded dot is DEFAULT (1 MXU pass).
    for prec in primal_precs:
        assert set(prec) == {jax.lax.Precision.DEFAULT}, (
            f"inference warp dot pinned to {prec}: this is the 6-pass f32 "
            "emulation that regressed BENCH 331 -> 117 fps in round 4"
        )
