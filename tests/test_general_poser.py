"""GeneralPoser layer mechanics: subrect crop and the image-keyed prologue
cache (the reference's eyebrow-decomposer memoization, mode_07.py:54-70, and
GeneralPoser02's subrect, general_poser_02.py:63-79).  Uses dummy run/prologue
functions so the semantics are pinned without network cost; full-pipeline
parity against the torch oracle lives in test_teacher_poser_parity.py.
"""

import jax.numpy as jnp
import numpy as np

from tha4_tpu.poser.general_poser import GeneralPoser


class _Counter:
    def __init__(self):
        self.calls = 0


def _make_poser(counter, subrect=None, with_prologue=True):
    def prologue_fn(params, image):
        counter.calls += 1
        return (image.mean(axis=(1, 2, 3)),)  # (N,) image-only summary

    def run_fn(params, image, pose, *prologue_outs):
        if prologue_outs:
            (summary,) = prologue_outs
        else:
            summary = image.mean(axis=(1, 2, 3))
        first = image[:, 0, 0, :].sum(axis=-1)
        return (summary + pose.sum(axis=-1), first)

    return GeneralPoser(
        image_size=16,
        output_length=2,
        params_loader=dict,
        run_fn=run_fn,
        prologue_fn=prologue_fn if with_prologue else None,
        subrect=subrect,
    )


def test_prologue_cached_per_image_object():
    c = _Counter()
    poser = _make_poser(c)
    image = np.random.default_rng(0).normal(size=(16, 16, 4)).astype(np.float32)
    pose_a = np.zeros(45, np.float32)
    pose_b = np.ones(45, np.float32)

    out_a = poser.get_posing_outputs(image, pose_a)
    out_a2 = poser.get_posing_outputs(image, pose_a)
    out_b = poser.get_posing_outputs(image, pose_b)
    # One prologue dispatch for three frames on the same image object.
    # (c.calls counts TRACES, not executions — the prologue is jitted — so
    # cache behavior is asserted via the host-side miss counter.)
    assert poser.prologue_cache_misses == 1
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_a2[0]))
    assert float(out_b[0][0]) != float(out_a[0][0])  # pose still flows

    # A NEW image object (even content-equal) misses the cache — documented
    # trade vs the reference's per-frame device-side tensor diff.
    image2 = image.copy()
    poser.get_posing_outputs(image2, pose_a)
    assert poser.prologue_cache_misses == 2

    # Different content through a new object refreshes the cached prologue:
    # the output reflects the new image, never the stale cache.
    out_c = poser.get_posing_outputs(image2 * 2.0, pose_a)
    assert poser.prologue_cache_misses == 3
    assert float(out_c[0][0]) != float(out_a[0][0])


def test_prologue_cache_cleared_by_free():
    c = _Counter()
    poser = _make_poser(c)
    image = np.ones((16, 16, 4), np.float32)
    poser.get_posing_outputs(image, np.zeros(45, np.float32))
    poser.free()
    poser.get_posing_outputs(image, np.zeros(45, np.float32))
    assert poser.prologue_cache_misses == 2


def test_prologue_matches_inline_computation():
    """Split prologue + main program == the single unsplit program."""
    c = _Counter()
    split = _make_poser(c, with_prologue=True)
    inline = _make_poser(c, with_prologue=False)
    image = np.random.default_rng(1).normal(size=(16, 16, 4)).astype(np.float32)
    pose = np.linspace(0, 1, 45).astype(np.float32)
    a = split.get_posing_outputs(image, pose)
    b = inline.get_posing_outputs(image, pose)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_subrect_crops_before_everything():
    """subrect ((y0,y1),(x0,x1)) poses the sub-rectangle: equivalent to
    cropping the image by hand (reference general_poser_02.py:63-79,
    NCHW image[:, :, y0:y1, x0:x1] == NHWC image[:, y0:y1, x0:x1, :])."""
    c = _Counter()
    sub = _make_poser(c, subrect=((4, 20), (8, 24)))
    plain = _make_poser(c)
    big = np.random.default_rng(2).normal(size=(32, 32, 4)).astype(np.float32)
    pose = np.zeros(45, np.float32)
    a = sub.get_posing_outputs(big, pose)
    b = plain.get_posing_outputs(np.ascontiguousarray(big[4:20, 8:24]), pose)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
