"""Multi-process worker for tests/test_multiprocess.py.

Launched (2 processes x 4 virtual CPU devices) by the parent test with the
JAX coordination env vars set.  Exercises the REAL multi-process comm path —
the same code a v5e pod-slice launch runs:

  * ``parallel.mesh.initialize_multihost()`` env-var bootstrap branch
    (torchrun-rendezvous equivalent; reference:
    src/tha4/shion/core/training/distrib/distributed_trainer.py:398-408),
  * a (data, space) mesh spanning both processes,
  * the jitted face distill step with GSPMD-inserted cross-process
    collectives (gradient psum = DDP allreduce; Gloo transport on CPU).

Prints ``LOSS <v>`` and ``PARAM <v>`` for the parent to compare against the
single-process run.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from tha4_tpu.parallel import mesh as meshlib  # noqa: E402  (needs jax configured first)

assert meshlib.initialize_multihost() is True, "env bootstrap branch did not fire"
jax.config.update("jax_num_cpu_devices", 4)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # tests/ (for test_multichip)
from test_multichip import tiny_face_setup  # noqa: E402

from tha4_tpu.distiller import recipes  # noqa: E402


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    cfg, tparams, scfg, sparams, opt, image, mask, poses = tiny_face_setup()
    step = recipes.make_face_distill_step(cfg, scfg, compute_dtype=jnp.float32)

    # make_mesh reshapes row-major, so with processes owning devices
    # [0..3] and [4..7], data=4/space=2 puts each space pair within a host
    # while every data column spans BOTH hosts — the gradient psum (the
    # production collective, DDP-allreduce equivalent) crosses the process
    # boundary on every step.
    mesh = meshlib.make_mesh(data=4, space=2, devices=jax.devices())
    with mesh:
        poses_g = jax.device_put(poses, NamedSharding(mesh, P("data")))
        image_g = jax.device_put(image, NamedSharding(mesh, P(None, "space")))
        sparams_g = meshlib.replicate(mesh, sparams)
        tparams_g = meshlib.replicate(mesh, tparams)
        opt_g = meshlib.replicate(mesh, opt)
        mask_g = meshlib.replicate(mesh, mask)
        p2, o2, m = step(sparams_g, opt_g, tparams_g, image_g, mask_g, poses_g, 1e-4)
        loss = float(np.asarray(jax.device_get(m["loss"])))
        leaf = jax.tree.leaves(p2)[0]
        checksum = float(np.asarray(jax.device_get(leaf)).astype(np.float64).sum())

    print(f"LOSS {loss:.10f}", flush=True)
    print(f"PARAM {checksum:.10f}", flush=True)


if __name__ == "__main__":
    main()
