"""The driver contract: entry() compile-checks and dryrun_multichip runs."""

import sys

import jax
import pytest


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 512, 512, 4)
    # trace + lower (no execution) to validate jittability
    jax.jit(fn).lower(*args)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_dryrun_multichip_smoke():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
