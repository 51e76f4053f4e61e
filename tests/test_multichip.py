"""Multi-device sharding: the distillation step over a (data, space) mesh.

Runs on the 8 virtual CPU devices from conftest; validates that the sharded
step (a) compiles and executes with real dp+sp shardings and (b) produces the
same loss as the single-device step (GSPMD-inserted collectives preserve
numerics in f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tha4_tpu.distiller import recipes
from tha4_tpu.models import eyebrow as eb
from tha4_tpu.models import face_morpher as fm
from tha4_tpu.models import siren
from tha4_tpu.parallel import mesh as meshlib
from tha4_tpu.poser.modes import mode_12


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = mode_12.FaceTeacherConfig(
        eyebrow_decomposer=eb.EyebrowDecomposerConfig(start_channels=4, num_bottleneck_blocks=1, max_channels=8),
        eyebrow_combiner=eb.EyebrowCombinerConfig(start_channels=4, num_bottleneck_blocks=1, max_channels=8),
        face_morpher=fm.FaceMorpherConfig(start_channels=4, num_bottleneck_blocks=1, max_channels=8),
    )
    key = jax.random.PRNGKey(0)
    tparams = mode_12.init(key, cfg)
    scfg = siren.SirenFaceMorpherConfig()
    sparams = siren.siren_face_morpher_init(key, scfg)
    opt = recipes.adam_init(sparams)
    image = jax.random.uniform(key, (1, 512, 512, 4), jnp.float32, -1, 1)
    mask = jnp.zeros((128, 128, 4), jnp.float32)
    poses = jax.random.uniform(jax.random.PRNGKey(5), (8, 45), jnp.float32)
    return cfg, tparams, scfg, sparams, opt, image, mask, poses


def _run_step(mesh, tiny_setup):
    cfg, tparams, scfg, sparams, opt, image, mask, poses = tiny_setup
    step = recipes.make_face_distill_step(cfg, scfg, compute_dtype=jnp.float32)
    sparams = jax.tree.map(jnp.copy, sparams)
    opt = jax.tree.map(jnp.copy, opt)
    if mesh is not None:
        with mesh:
            poses = jax.device_put(poses, NamedSharding(mesh, P("data")))
            image = jax.device_put(image, NamedSharding(mesh, P(None, "space")))
            sparams = meshlib.replicate(mesh, sparams)
            tparams = meshlib.replicate(mesh, tparams)
            opt = meshlib.replicate(mesh, opt)
            mask = meshlib.replicate(mesh, mask)
            p2, o2, m = step(sparams, opt, tparams, image, mask, poses, 1e-4)
            return float(m["loss"]), p2
    p2, o2, m = step(sparams, opt, tparams, image, mask, poses, 1e-4)
    return float(m["loss"]), p2


def test_dp_sp_step_matches_single_device(tiny_setup):
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    loss_single, params_single = _run_step(None, tiny_setup)

    mesh = meshlib.make_mesh(data=4, space=2, devices=jax.devices()[:8])
    loss_sharded, params_sharded = _run_step(mesh, tiny_setup)

    assert np.isfinite(loss_sharded)
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-5)
    # Updated params agree too (allreduce-equivalent grad sync).
    a = np.asarray(jax.tree.leaves(params_single)[0])
    b = np.asarray(jax.tree.leaves(params_sharded)[0])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_data_only_mesh(tiny_setup):
    mesh = meshlib.make_mesh(data=8, space=1, devices=jax.devices()[:8])
    loss, _ = _run_step(mesh, tiny_setup)
    assert np.isfinite(loss)


def test_chunked_trainer_on_mesh(tiny_setup, tmp_path):
    """The production path: DistillationJobs with num_gpus=8 runs the fused
    multi-step chunk with the batch sharded over the data axis."""
    import os

    from tha4_tpu.distiller.config import DistillerConfig
    from tha4_tpu.distiller.pipeline import DistillationJobs

    cfg, tparams, *_ = tiny_setup
    prefix = str(tmp_path / "job")
    os.makedirs(prefix)
    config = DistillerConfig(
        prefix=prefix,
        character_image_file_name="/root/reference/data/character_models/lambda_00/character.png",
        face_mask_image_file_name="/root/reference/data/images/lambda_00_face_mask.png",
        face_morpher_num_training_examples_per_sample_output=None,
        body_morpher_num_training_examples_per_sample_output=None,
        num_gpus=8,
    )
    jobs = DistillationJobs(
        config,
        teacher_params_12=tparams,
        teacher_cfg_12=cfg,
        compute_dtype=jnp.float32,
        face_total_examples=64,
        examples_per_checkpoint=64,
        examples_per_snapshot=32,
    )
    assert jobs.mesh is not None and jobs.mesh.shape["data"] == 8
    result = jobs.make_face_trainer().train(64)
    assert result["examples_seen"] == 64
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(result["params"])[0])))


def test_shard_batch_helper():
    mesh = meshlib.make_mesh(data=4, space=2, devices=jax.devices()[:8])
    batch = {
        "images": jnp.zeros((8, 16, 16, 4)),
        "poses": jnp.zeros((8, 45)),
        "scalar": jnp.zeros(()),
    }
    sharded = meshlib.shard_batch(mesh, batch)
    assert sharded["images"].sharding.spec == P("data", "space")
    assert sharded["poses"].sharding.spec == P("data")
