"""End-to-end distillation: config -> task DAG -> training -> CharacterModel.

Uses a small random teacher (full image geometry, reduced channels) so the
whole pipeline runs on CPU in test time.  Verifies: loss decreases, the task
DAG produces the byte-compatible character-model directory, and the exported
.pt weights round-trip through our converter AND load in the reference.
"""

import json
import os

import jax
import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.slow  # distillation pipeline smoke runs (minutes each)

LAMBDA_00 = "/root/reference/data/character_models/lambda_00"
MASK = "/root/reference/data/images/lambda_00_face_mask.png"


def _small_face_teacher():
    import dataclasses

    from tha4_tpu.models import eyebrow as eb
    from tha4_tpu.models import face_morpher as fm
    from tha4_tpu.poser.modes import mode_12

    cfg = mode_12.FaceTeacherConfig(
        eyebrow_decomposer=eb.EyebrowDecomposerConfig(start_channels=4, num_bottleneck_blocks=1, max_channels=8),
        eyebrow_combiner=eb.EyebrowCombinerConfig(start_channels=4, num_bottleneck_blocks=1, max_channels=8),
        face_morpher=fm.FaceMorpherConfig(start_channels=4, num_bottleneck_blocks=1, max_channels=8),
    )
    params = mode_12.init(jax.random.PRNGKey(11), cfg)
    return cfg, params


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_face_distill_smoke(tmp_path):
    import jax.numpy as jnp

    from tha4_tpu.distiller.config import DistillerConfig
    from tha4_tpu.distiller.pipeline import DistillationJobs
    from tha4_tpu.training import checkpoint as ckpt

    prefix = str(tmp_path / "distill")
    os.makedirs(prefix)
    config = DistillerConfig(
        prefix=prefix,
        character_image_file_name=f"{LAMBDA_00}/character.png",
        face_mask_image_file_name=MASK,
        face_morpher_num_training_examples_per_sample_output=None,
        body_morpher_num_training_examples_per_sample_output=None,
        face_morpher_batch_size=4,
    )
    config.check()

    tcfg, tparams = _small_face_teacher()
    jobs = DistillationJobs(
        config,
        teacher_params_12=tparams,
        teacher_cfg_12=tcfg,
        compute_dtype=jnp.float32,
        face_total_examples=320,
        examples_per_checkpoint=160,
        examples_per_snapshot=80,
    )
    trainer = jobs.make_face_trainer()

    # Fixed-batch eval loss before vs after training (lr=0 "step" = eval).
    from tha4_tpu.distiller import recipes
    from tha4_tpu.models import siren

    eval_step = recipes.make_face_distill_step(tcfg, siren.SirenFaceMorpherConfig(), jnp.float32)
    image = jobs.character_image
    mask = jnp.asarray(recipes.load_face_mask_crop(config.face_mask_image_file_name))
    eval_poses = jobs.pose_source.batch(jax.random.PRNGKey(99), 8)

    def eval_loss(params):
        p = jax.tree.map(jnp.copy, params)  # real copy: the step donates its input
        opt = recipes.adam_init(p)
        _, _, m = eval_step(p, opt, tparams, image, mask, eval_poses, 0.0)
        return float(m["loss"])

    init_params = trainer.init_params(jax.random.PRNGKey(0))
    loss_before = eval_loss(init_params)

    result = trainer.train(320)
    assert result["examples_seen"] == 320
    loss_after = eval_loss(result["params"])
    assert loss_after < loss_before, (loss_before, loss_after)

    assert ckpt.can_load(ckpt.checkpoint_dir(config.face_morpher_prefix(), 2), ["module"])


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_export_students_roundtrip(tmp_path):
    """params -> .pt -> (reference load_state_dict) and (our converter)."""
    import torch

    from tha4_tpu.convert import export_torch
    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import siren

    add_reference_to_path()
    from tha4.poser.modes.mode_14 import load_body_morpher, load_face_morpher

    key = jax.random.PRNGKey(3)
    face_params = siren.siren_face_morpher_init(key, siren.SirenFaceMorpherConfig())
    body_params = siren.siren_morpher_init(key, siren.SirenMorpherConfig())

    face_pt = str(tmp_path / "face_morpher.pt")
    body_pt = str(tmp_path / "body_morpher.pt")
    export_torch.save_face_morpher_pt(face_params, face_pt)
    export_torch.save_body_morpher_pt(body_params, body_pt)

    # The reference modules accept the exported state dicts (strict load).
    ref_face = load_face_morpher(face_pt)
    ref_body = load_body_morpher(body_pt)

    # Round trip through our converter gives back identical params.
    rt_face = tw.convert_siren_face_morpher(tw.load_torch_state_dict(face_pt))
    np.testing.assert_allclose(
        np.asarray(face_params["siren"]["sine_layers"][0]["w"]),
        rt_face["siren"]["sine_layers"][0]["w"],
        atol=0,
    )
    rt_body = tw.convert_siren_morpher(tw.load_torch_state_dict(body_pt))
    np.testing.assert_allclose(
        np.asarray(body_params["levels"][2][1]["w"]), rt_body["levels"][2][1]["w"], atol=0
    )

    # And the reference forward agrees with ours on the exported weights.
    import jax.numpy as jnp

    pose = np.random.default_rng(0).uniform(0, 1, (1, 39)).astype(np.float32)
    ours = np.asarray(
        siren.siren_face_morpher_apply(siren.SirenFaceMorpherConfig(), face_params, jnp.asarray(pose))
    )
    with torch.no_grad():
        theirs = ref_face(torch.from_numpy(pose)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_distiller_config_yaml_compat(tmp_path):
    """Our loader accepts the reference's shipped example config."""
    import shutil

    import yaml

    from tha4_tpu.distiller.config import DistillerConfig

    with open("/root/reference/data/distill_examples/lambda_00/config.yaml") as f:
        conf = yaml.safe_load(f)
    # Re-point paths at real files in a tmp prefix
    prefix = str(tmp_path / "job")
    os.makedirs(prefix)
    conf["prefix"] = prefix
    conf["character_image_file_name"] = f"{LAMBDA_00}/character.png"
    conf["face_mask_image_file_name"] = MASK
    path = str(tmp_path / "config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(conf, f)
    config = DistillerConfig.load(path)
    assert config.face_morpher_batch_size >= 1
    config.save(config.config_yaml_file_name())
    reloaded = DistillerConfig.load(config.config_yaml_file_name())
    assert reloaded.face_morpher_random_seed_0 == config.face_morpher_random_seed_0


def test_pose_sampling_spans_pinned_to_schema():
    """The procedural sampler's morph-category spans must agree with
    get_pose_parameters() name lookups AND with the documented 45-dim layout
    (reference src/tha4/poser/modes/pose_parameters.py:4-36) — a schema
    reorder has to fail here rather than silently corrupt the sampling
    distribution (round-1/round-2 flagged the hand-derived constants)."""
    from tha4_tpu.distiller import pose_dataset as pd
    from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters

    pp = get_pose_parameters()
    assert pp.get_parameter_count() == 45
    # Name-derived spans equal the documented absolute indices.
    assert pd._EYEBROW == (0, 12)
    assert pd._EYE == (12, 24)
    assert pd._MOUTH_SHAPES == (26, 32)
    # And the names bounding each span really are the right groups.
    assert pp.get_group_start_index("eyebrow_troubled") == 0
    assert pp.get_group_start_index("eye_wink") == 12
    assert pp.get_group_start_index("iris_small") == 24
    assert pp.get_group_start_index("mouth_aaa") == 26
    assert pp.get_group_start_index("mouth_delta") == 31
    assert pp.get_group_start_index("mouth_lowered_corner") == 32
    # Range table: rotations are (-1, 1), morphs (0, 1).
    for name in ("iris_rotation_x", "head_x", "head_y", "neck_z", "body_y", "body_z"):
        i = pp.get_parameter_index(name)
        assert pd._LOWS[i] == -1.0 and pd._HIGHS[i] == 1.0
    for i in range(26, 32):
        assert pd._LOWS[i] == 0.0 and pd._HIGHS[i] == 1.0


def test_pose_sampling_distribution_sanity():
    """Categorical sparsity really holds per sample: at most one mouth shape
    strongly active, at most one eyebrow/eye L-R pair nonzero."""
    import jax.numpy as jnp

    from tha4_tpu.distiller.pose_dataset import sample_poses

    poses = np.asarray(sample_poses(jax.random.PRNGKey(7), 512))
    assert poses.shape == (512, 45)
    # Bounds respected everywhere.
    assert poses[:, :35].min() >= 0.0 and poses.max() <= 1.0
    assert poses[:, 35:42].min() >= -1.0
    # Mouth shapes 26:32 — exactly one may be nonzero per row.
    mouth_active = (poses[:, 26:32] > 0.0).sum(axis=1)
    assert mouth_active.max() <= 1
    # Eyebrow pairs: nonzero entries confined to one 2-wide group per row.
    for start, stop in ((0, 12), (12, 24)):
        sec = poses[:, start:stop].reshape(len(poses), -1, 2)
        pairs_active = (np.abs(sec).sum(axis=2) > 0.0).sum(axis=1)
        assert pairs_active.max() <= 1
    # The sampler covers the space: every mouth shape appears somewhere.
    assert ((poses[:, 26:32] > 0.2).any(axis=0)).all()


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_distill_cli_random_teacher_flag(tmp_path, monkeypatch):
    """--random-teacher must inject full-architecture random teacher params
    into run_config instead of loading the (placeholder) data/tha4/*.pt files
    (the pipeline-validation / wall-clock-benchmark mode, docs/distill.md)."""
    import yaml

    from tha4_tpu.apps import distill as distill_app

    prefix = str(tmp_path / "job")
    os.makedirs(prefix)
    cfg_path = os.path.join(prefix, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            {
                "prefix": prefix,
                "character_image_file_name": "/root/reference/data/images/lambda_00.png",
                "face_mask_image_file_name": MASK,
            },
            f,
        )

    seen = {}

    def fake_run_config(config, **kwargs):
        seen.update(kwargs)
        seen["prefix"] = config.prefix

    def fake_init(key, cfg):
        return {"marker": "random-teacher"}

    monkeypatch.setattr("tha4_tpu.distiller.pipeline.run_config", fake_run_config)
    monkeypatch.setattr("tha4_tpu.poser.modes.mode_07.init", fake_init)

    assert distill_app.main(["--config_file", cfg_path, "--random-teacher"]) == 0
    assert seen["teacher_params_07"] == {"marker": "random-teacher"}
    assert seen["prefix"] == prefix

    # Without the flag, no teacher params are injected (the pipeline would
    # load the real .pt files lazily).
    seen.clear()
    assert distill_app.main(["--config_file", cfg_path]) == 0
    assert "teacher_params_07" not in seen


def test_distill_cli_only_and_mixed_flags(tmp_path, monkeypatch):
    """--only body must run ONLY the body student's train task (not the full
    /all DAG), and --mixed must thread student_mixed=True into
    DistillationJobs -> make_body_distill_chunk (the selective-f32 recipe,
    docs/perf.md training-dtype table)."""
    import yaml

    from tha4_tpu.apps import distill as distill_app
    from tha4_tpu.distiller import pipeline

    prefix = str(tmp_path / "job")
    os.makedirs(prefix)
    cfg_path = os.path.join(prefix, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            {
                "prefix": prefix,
                "character_image_file_name": "/root/reference/data/images/lambda_00.png",
                "face_mask_image_file_name": MASK,
            },
            f,
        )

    seen = {}

    def fake_run_config(config, target="all", **kwargs):
        seen["target"] = target
        seen.update(kwargs)

    monkeypatch.setattr("tha4_tpu.distiller.pipeline.run_config", fake_run_config)
    assert distill_app.main(["--config_file", cfg_path, "--only", "body", "--mixed"]) == 0
    assert seen["target"] == "body"
    assert seen["student_mixed"] is True

    # mixed is the production default since the round-5 dtype A/B; --no-mixed
    # restores the plain-bf16 student.
    seen.clear()
    assert distill_app.main(["--config_file", cfg_path]) == 0
    assert seen["target"] == "all"
    assert seen["student_mixed"] is True

    seen.clear()
    assert distill_app.main(["--config_file", cfg_path, "--no-mixed"]) == 0
    assert seen["student_mixed"] is False

    # run_config target plumbing: 'body' resolves to the body train task.
    ran = []
    monkeypatch.undo()
    monkeypatch.setattr(
        "tha4_tpu.distiller.pipeline.DistillationJobs.define_tasks", lambda self, ws: None
    )
    monkeypatch.setattr(
        "tha4_tpu.tasks.workspace.Workspace.run", lambda self, name: ran.append(name)
    )
    from tha4_tpu.distiller.config import DistillerConfig

    cfg = DistillerConfig.load(cfg_path)
    pipeline.run_config(cfg, target="body")
    pipeline.run_config(cfg, target="face")
    pipeline.run_config(cfg, target="all")
    assert ran[0] == cfg.body_morpher_prefix() + "/train"
    assert ran[1] == cfg.face_morpher_prefix() + "/train"
    assert ran[2] == cfg.prefix + "/all"


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_face_distill_smoke_meshed_compile_ahead(tmp_path):
    """The pipeline's compile-ahead path under a real (data) mesh: the
    trainer captures sharding-annotated ShapeDtypeStructs from the live
    arrays and the AOT-compiled chunks must accept the loop's sharded
    params — a plain-CPU run would not catch an aval/sharding mismatch."""
    import jax.numpy as jnp

    from tha4_tpu.distiller.config import DistillerConfig
    from tha4_tpu.distiller.pipeline import DistillationJobs
    from tha4_tpu.parallel import mesh as meshlib

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices (virtual CPU mesh)")

    prefix = str(tmp_path / "distill_mesh")
    os.makedirs(prefix)
    config = DistillerConfig(
        prefix=prefix,
        character_image_file_name=f"{LAMBDA_00}/character.png",
        face_mask_image_file_name=MASK,
        face_morpher_num_training_examples_per_sample_output=None,
        body_morpher_num_training_examples_per_sample_output=None,
        face_morpher_batch_size=4,
        num_gpus=4,
    )
    config.check()

    tcfg, tparams = _small_face_teacher()
    jobs = DistillationJobs(
        config,
        teacher_params_12=tparams,
        teacher_cfg_12=tcfg,
        compute_dtype=jnp.float32,
        face_total_examples=320,
        examples_per_checkpoint=320,
        examples_per_snapshot=80,
        mesh=meshlib.make_mesh(data=4, space=1, devices=jax.devices()[:4]),
    )
    trainer = jobs.make_face_trainer()
    assert trainer.chunk_compiler is not None and trainer.cfg.precompile_chunks
    planned = trainer.plan_chunk_sizes(0, 320)
    result = trainer.train(320)
    assert result["examples_seen"] == 320
    # Every planned size was AOT-compiled and used (none fell back to jit).
    assert sorted(trainer._chunk_compiled.keys()) == sorted(planned)


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_sample_writers_through_pipeline(tmp_path):
    """Both sample-grid writers driven through DistillationJobs (the examples
    -seen==0 dump that every run writes).  These paths run every 10k examples
    in production; they must be ONE jitted program each — the eager teacher
    dispatch they once did cost ~220 s per dump on a tunnel-attached chip
    (measured in the round-3 wall-clock run) and no test covered them."""
    import jax.numpy as jnp

    from tha4_tpu.distiller.config import DistillerConfig
    from tha4_tpu.distiller.pipeline import DistillationJobs
    from tha4_tpu.models import siren
    from tests.test_multichip import _tiny_body_setup

    prefix = str(tmp_path / "samples")
    os.makedirs(prefix)
    config = DistillerConfig(
        prefix=prefix,
        character_image_file_name=f"{LAMBDA_00}/character.png",
        face_mask_image_file_name=MASK,
        face_morpher_num_training_examples_per_sample_output=10_000,
        body_morpher_num_training_examples_per_sample_output=10_000,
    )
    config.check()

    fcfg, fparams = _small_face_teacher()
    bcfg, btparams, bscfg, bsparams = _tiny_body_setup()
    jobs = DistillationJobs(
        config,
        teacher_params_07=btparams,
        teacher_params_12=fparams,
        teacher_cfg_07=bcfg,
        teacher_cfg_12=fcfg,
        compute_dtype=jnp.float32,
    )
    jobs.body_student_cfg = bscfg
    os.makedirs(config.face_morpher_prefix(), exist_ok=True)
    os.makedirs(config.body_morpher_prefix(), exist_ok=True)

    face_params = jobs.make_face_trainer().init_params(jax.random.PRNGKey(0))
    jobs._write_face_samples(face_params, fparams, jobs.character_image, 0)
    jobs._write_body_samples(bsparams, btparams, jobs.character_image, 0)

    from tha4_tpu.distiller import sample_output

    for pfx in (config.face_morpher_prefix(), config.body_morpher_prefix()):
        path = sample_output.sample_output_file_name(pfx, 0)
        assert os.path.isfile(path), path
        assert os.path.getsize(path) > 1000
    # The renders are memoized jitted programs (the perf contract).
    assert jobs._face_sample_render is not None
    assert jobs._body_sample_render is not None


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_sample_image_spec_writer_matches_reference(tmp_path):
    """Column-spec grid writer (BATCH/OUTPUT sources, all four render types
    incl. SIGMOID_LOGIT) vs the reference SampleImageSaver, pixel-for-pixel
    on the written PNGs (reference sample_image_creator.py:86-130)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("matplotlib")
    add_reference_to_path()
    from tha4.sampleoutput.sample_image_creator import (
        ImageSource as RefSource,
        ImageType as RefType,
        SampleImageSaver,
        SampleImageSpec as RefSpec,
    )

    from tha4_tpu.distiller import sample_output as so

    rng = np.random.RandomState(7)
    n, hw = 3, 16
    batch = [rng.uniform(-1, 1, (n, hw, hw, 4)).astype(np.float32)]
    outputs = [
        rng.uniform(-1, 1, (n, hw, hw, 4)).astype(np.float32),  # COLOR
        rng.uniform(0, 1, (n, hw, hw, 1)).astype(np.float32),  # ALPHA
        rng.uniform(-0.3, 0.3, (n, hw, hw, 2)).astype(np.float32),  # GRID_CHANGE
        rng.uniform(-4, 4, (n, hw, hw, 1)).astype(np.float32),  # SIGMOID_LOGIT
    ]
    specs = [
        so.SampleImageSpec(so.ImageSource.BATCH, 0, so.ImageType.COLOR),
        so.SampleImageSpec(so.ImageSource.OUTPUT, 0, so.ImageType.COLOR),
        so.SampleImageSpec(so.ImageSource.OUTPUT, 1, so.ImageType.ALPHA),
        so.SampleImageSpec(so.ImageSource.OUTPUT, 2, so.ImageType.GRID_CHANGE),
        so.SampleImageSpec(so.ImageSource.OUTPUT, 3, so.ImageType.SIGMOID_LOGIT),
    ]
    ours_path = str(tmp_path / "ours.png")
    so.save_sample_output_image(batch, outputs, specs, ours_path, cell_size=hw)

    def to_torch(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))

    ref_specs = [
        RefSpec(RefSource[s.image_source.name], s.index, RefType[s.image_type.name])
        for s in specs
    ]
    saver = SampleImageSaver(
        image_size=hw, cell_size=hw, image_channels=4, sample_image_specs=ref_specs
    )
    ref_path = str(tmp_path / "ref.png")
    saver.save_sample_output_image(
        [to_torch(b) for b in batch], [to_torch(o) for o in outputs], ref_path
    )

    import PIL.Image

    ours = np.asarray(PIL.Image.open(ours_path)).astype(np.int16)
    ref = np.asarray(PIL.Image.open(ref_path)).astype(np.int16)
    assert ours.shape == ref.shape == (n * hw, len(specs) * hw, 4)
    for col, spec in enumerate(specs):
        o = ours[:, col * hw : (col + 1) * hw]
        r = ref[:, col * hw : (col + 1) * hw]
        if spec.image_type == so.ImageType.GRID_CHANGE:
            # The reference renders the flow wheel through matplotlib's
            # 'hsv' colormap, which is a smoothed 256-entry approximation of
            # the hue wheel (deviates up to 0.094 in linear rgb from the
            # exact formula we use); after the x3 scale + sRGB encode that
            # is up to ~90 uint8 levels at dark pixels.  Visualization-only.
            assert np.abs(o - r).max() <= 90, spec
            assert np.abs(o - r).mean() <= 6, spec
        else:
            assert np.abs(o - r).max() == 0, spec
