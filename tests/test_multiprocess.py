"""REAL multi-process distributed training (2 processes x 4 CPU devices).

The virtual 8-device mesh used everywhere else lives in ONE process; this
test launches two separate Python processes that rendezvous through
``parallel.mesh.initialize_multihost()`` (the env-var bootstrap branch — the
same code path a multi-host TPU launch uses), build a (data, space) mesh
spanning both processes, and run the jitted face distill step with the
gradient psum crossing the process boundary over Gloo — the true analogue of
the reference's torchrun + DDP-over-gloo path (reference:
src/tha4/shion/core/training/distrib/distributed_trainer.py:281-285,
:398-408).

Asserts: both workers bootstrap (process_count=2, 8 global devices), agree
with each other, and reproduce the single-process loss and updated params
exactly (rtol 1e-5 — GSPMD collectives preserve f32 numerics).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_multichip import _run_step, tiny_face_setup

pytestmark = pytest.mark.slow  # two real processes over gloo (~2m)

_WORKER = os.path.join(os.path.dirname(__file__), "fixtures", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse(out: str, tag: str) -> float:
    for line in out.splitlines():
        if line.startswith(tag + " "):
            return float(line.split()[1])
    raise AssertionError(f"no '{tag}' line in worker output:\n{out[-3000:]}")


def test_two_process_step_matches_single_process():
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        # The parent's own CPU-device fan-out must not leak into workers.
        "XLA_FLAGS": "",
        # Workers run with cwd=tests/fixtures; the parent may itself import
        # tha4_tpu via pytest's rootdir insertion, which children don't get.
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER],
                env=env,
                cwd=os.path.dirname(_WORKER),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    losses = [_parse(o, "LOSS") for o in outs]
    params = [_parse(o, "PARAM") for o in outs]
    # Workers agree with each other (they fetched the same global arrays).
    assert losses[0] == losses[1]
    assert params[0] == params[1]

    # And with the single-process run of the identical problem.
    import jax  # parent-process jax, already configured by conftest

    loss_single, params_single = _run_step(None, tiny_face_setup())
    np.testing.assert_allclose(losses[0], loss_single, rtol=1e-5)
    checksum_single = float(
        np.asarray(jax.tree.leaves(params_single)[0]).astype(np.float64).sum()
    )
    np.testing.assert_allclose(params[0], checksum_single, rtol=1e-5)
