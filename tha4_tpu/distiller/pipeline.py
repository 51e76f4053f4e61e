"""Distillation pipeline: config -> trainers -> task DAG -> CharacterModel.

Reference flow (src/tha4/distiller/distiller_config.py:250-310 +
config_based_training_tasks.py): per-checkpoint file tasks that shell out to
torchrun.  Here each student trains in-process as a sequence of jitted steps
over the device mesh; the file-task DAG provides the same interruptibility
contract (kill any time, rerun the same command).

The produced character model directory is byte-compatible with the reference
(character.png + face_morpher.pt + body_morpher.pt + character_model.yaml).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tha4_tpu.charmodel import CharacterModel
from tha4_tpu.distiller import recipes, sample_output
from tha4_tpu.distiller.config import POSE_DATASET_FILE_NAME, DistillerConfig, copy_file
from tha4_tpu.distiller.pose_dataset import PoseSource
from tha4_tpu.models import siren
from tha4_tpu.poser.modes import mode_07, mode_12
from tha4_tpu.tasks.workspace import Workspace, file_task
from tha4_tpu.training import checkpoint as ckpt
from tha4_tpu.training.trainer import Trainer, TrainerConfig

logger = logging.getLogger(__name__)


def _load_character_image(path: str) -> jnp.ndarray:
    from tha4_tpu.core import imagecodec

    return jnp.asarray(imagecodec.load_image_hwc(path))[None]


class DistillationJobs:
    """Builds and runs the two student trainings for one config."""

    def __init__(
        self,
        config: DistillerConfig,
        teacher_params_07: Optional[Dict] = None,
        teacher_params_12: Optional[Dict] = None,
        teacher_cfg_07: Optional[mode_07.TeacherConfig] = None,
        teacher_cfg_12: Optional[mode_12.FaceTeacherConfig] = None,
        compute_dtype=jnp.bfloat16,
        face_total_examples: int = recipes.FACE_MORPHER_TOTAL_EXAMPLES,
        body_total_examples: int = recipes.BODY_MORPHER_TOTAL_EXAMPLES,
        examples_per_checkpoint: int = recipes.EXAMPLES_PER_CHECKPOINT,
        examples_per_snapshot: int = 10_000,
        mesh=None,
        teacher_int8: bool = False,
        student_mixed: bool = True,
    ):
        self.config = config
        self.teacher_int8 = teacher_int8
        self.student_mixed = student_mixed
        self._teacher_quant_07 = None
        self._teacher_quant_12 = None
        self.compute_dtype = compute_dtype
        self.teacher_cfg_07 = teacher_cfg_07 or mode_07.TeacherConfig()
        self.teacher_cfg_12 = teacher_cfg_12 or mode_12.FaceTeacherConfig()
        self._teacher_params_07 = teacher_params_07
        self._teacher_params_12 = teacher_params_12
        self.face_total_examples = face_total_examples
        self.body_total_examples = body_total_examples
        self.examples_per_checkpoint = examples_per_checkpoint
        self.examples_per_snapshot = examples_per_snapshot

        self.face_student_cfg = siren.SirenFaceMorpherConfig()
        self.body_student_cfg = siren.SirenMorpherConfig()
        self.pose_source = PoseSource(POSE_DATASET_FILE_NAME)
        self._character_image = None
        self._face_trainer = None
        self._body_trainer = None
        self._face_sample_render = None
        self._body_sample_render = None

        # Multi-chip data parallelism: config.num_gpus names the chip count
        # (field kept for compatibility; chips, not CUDA devices).  The batch
        # shards over the mesh's 'data' axis inside the fused train chunks.
        if mesh is None and config.num_gpus > 1:
            import jax

            if len(jax.devices()) >= config.num_gpus:
                from tha4_tpu.parallel import mesh as meshlib

                mesh = meshlib.make_mesh(data=config.num_gpus, space=1)
            else:
                logger.warning(
                    "config requests %d chips but only %d devices are visible; "
                    "running single-device", config.num_gpus, len(jax.devices()),
                )
        self.mesh = mesh

    # -- lazy heavy assets -------------------------------------------------

    @property
    def character_image(self) -> jnp.ndarray:
        if self._character_image is None:
            self._character_image = _load_character_image(self.config.character_image_file_name)
        return self._character_image

    def teacher_params_07(self) -> Dict:
        if self._teacher_params_07 is None:
            self._teacher_params_07 = mode_07.load_params_from_torch()
        return self._teacher_params_07

    def teacher_params_12(self) -> Dict:
        if self._teacher_params_12 is None:
            if self._teacher_params_07 is not None:
                self._teacher_params_12 = {
                    k: self._teacher_params_07[k]
                    for k in (
                        mode_07.KEY_EYEBROW_DECOMPOSER,
                        mode_07.KEY_EYEBROW_MORPHING_COMBINER,
                        mode_07.KEY_FACE_MORPHER,
                    )
                }
            else:
                self._teacher_params_12 = mode_12.load_params_from_torch()
        return self._teacher_params_12

    def teacher_quant_07(self):
        """Calibrated int8 activation scales for the frozen mode_07 teacher
        (ops/quant.py), or None when int8 is off.  Calibrated once per run on
        the actual character image + a pose-dataset batch and saved next to
        the training outputs for the record."""
        if not self.teacher_int8:
            return None
        if self._teacher_quant_07 is None:
            self._teacher_quant_07 = self._calibrate(
                "07", lambda tp, i, p: mode_07.compute_outputs(self.teacher_cfg_07, tp, i, p),
                self.teacher_params_07())
        return self._teacher_quant_07

    def teacher_quant_12(self):
        if not self.teacher_int8:
            return None
        if self._teacher_quant_12 is None:
            self._teacher_quant_12 = self._calibrate(
                "12", lambda tp, i, p: mode_12.compute_outputs(self.teacher_cfg_12, tp, i, p),
                self.teacher_params_12())
        return self._teacher_quant_12

    def _calibrate(self, tag: str, fn, teacher_params):
        import os

        from tha4_tpu.ops import quant

        key = jax.random.PRNGKey(0xCA11B)
        poses = self.pose_source.batch(key, 8).astype(self.compute_dtype)
        image = self.character_image.astype(self.compute_dtype)  # (1, H, W, 4)
        image_b = jnp.broadcast_to(image, (8,) + image.shape[1:])
        scales = quant.run_calibration(fn, teacher_params, image_b, poses)
        logger.info("int8 teacher (mode_%s): calibrated %d convs", tag, len(scales))
        try:
            os.makedirs(self.config.prefix, exist_ok=True)
            quant.save_scales(os.path.join(self.config.prefix, f"teacher_int8_scales_{tag}.json"), scales)
        except OSError:
            pass  # scales are reproducible; persistence is best-effort
        return scales

    def checkpoint_boundaries(self, total: int):
        n = total // self.examples_per_checkpoint
        return [self.examples_per_checkpoint * (i + 1) for i in range(n)]

    # -- face student ------------------------------------------------------

    def make_face_trainer(self) -> Trainer:
        config = self.config
        teacher_params = self.teacher_params_12()
        image = self.character_image
        mask = jnp.asarray(recipes.load_face_mask_crop(config.face_mask_image_file_name))

        chunk = recipes.make_face_distill_chunk(
            self.teacher_cfg_12,
            self.face_student_cfg,
            self.pose_source.batch,
            config.face_morpher_batch_size,
            self.compute_dtype,
            mesh=self.mesh,
            lookahead=recipes.default_lookahead(config.face_morpher_batch_size, self.mesh),
            teacher_quant=self.teacher_quant_12(),
        )

        def train_chunk(params, opt_state, chunk_key, examples_seen, lr, weights, n_steps):
            return chunk(params, opt_state, teacher_params, image, mask, chunk_key, jnp.float32(lr), n_steps=n_steps)

        def chunk_compiler(n_steps, params, opt_state, chunk_key, examples_seen, lr, weights):
            # AOT path for the trainer's compile-ahead: params/opt_state/
            # chunk_key arrive as (sharding-annotated) ShapeDtypeStructs;
            # lower only, never execute.
            compiled = chunk.lower(
                params, opt_state, teacher_params, image, mask, chunk_key, jnp.float32(lr), n_steps=n_steps
            ).compile()

            def call(params, opt_state, chunk_key, examples_seen, lr, weights):
                return compiled(params, opt_state, teacher_params, image, mask, chunk_key, jnp.float32(lr))

            return call

        def init_params(key):
            return siren.siren_face_morpher_init(key, self.face_student_cfg)

        def sample_fn(params, examples_seen):
            self._write_face_samples(params, teacher_params, image, examples_seen)

        cadence = config.face_morpher_num_training_examples_per_sample_output
        return Trainer(
            TrainerConfig(
                prefix=config.face_morpher_prefix(),
                checkpoint_examples=self.checkpoint_boundaries(self.face_total_examples),
                total_batch_size=config.face_morpher_batch_size,
                examples_per_snapshot=self.examples_per_snapshot,
                examples_per_sample_output=cadence,
                random_seed=config.face_morpher_random_seed_0,
                max_chunk_steps=1024,  # ~18 s/dispatch at 17 ms/step
            ),
            init_params=init_params,
            init_opt_state=recipes.adam_init,
            train_chunk=train_chunk,
            chunk_compiler=chunk_compiler,
            schedule_boundaries=[200_000, 500_000, 800_000],  # face lr ladder
            lr_fn=recipes.default_face_lr_fn(),
            sample_output_fn=sample_fn if cadence is not None else None,
        )

    def _write_face_samples(self, params, teacher_params, image, examples_seen):
        """8 poses x (teacher GT | student) grid
        (reference siren_face_morpher_protocols_00.py sample grids)."""
        config = self.config
        key = jax.random.PRNGKey(config.face_morpher_random_seed_1 & 0xFFFFFFFF)
        poses = self.pose_source.batch(key, 8)
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image, (n,) + image.shape[1:])
        if self._face_sample_render is None:
            y0, x0 = recipes.FACE_CROP_Y0, recipes.FACE_CROP_X0

            # One jitted program for the whole render: eagerly dispatching
            # the teacher op-by-op costs minutes per sample dump on a
            # tunnel-attached chip (~30 ms per dispatch), and this runs
            # every 10k examples.
            @jax.jit
            def render(tparams, sparams, image_b, poses):
                touts = mode_12.compute_outputs(self.teacher_cfg_12, tparams, image_b, poses)
                gt = touts[mode_12.INDEX_FACE_MORPHED_IMAGE][:, y0 : y0 + 128, x0 : x0 + 128, :]
                pred = siren.siren_face_morpher_apply(
                    self.face_student_cfg, sparams, poses[:, : self.face_student_cfg.pose_size]
                )
                return gt, pred

            self._face_sample_render = render
        gt, pred = (np.asarray(x) for x in self._face_sample_render(teacher_params, params, image_b, poses))
        cells = [
            [(gt[i], sample_output.ImageType.COLOR), (pred[i], sample_output.ImageType.COLOR)]
            for i in range(n)
        ]
        path = sample_output.sample_output_file_name(config.face_morpher_prefix(), examples_seen)
        sample_output.save_sample_grid(cells, path, cell_size=128)

    # -- body student ------------------------------------------------------

    def make_body_trainer(self, phases=None) -> Trainer:
        config = self.config
        phases = phases or recipes.default_body_phases()
        teacher_params = self.teacher_params_07()
        image = self.character_image

        chunk = recipes.make_body_distill_chunk(
            self.teacher_cfg_07,
            self.body_student_cfg,
            self.pose_source.batch,
            config.body_morpher_batch_size,
            self.compute_dtype,
            mesh=self.mesh,
            lookahead=recipes.default_lookahead(config.body_morpher_batch_size, self.mesh),
            teacher_quant=self.teacher_quant_07(),
            student_mixed=self.student_mixed,
        )

        def train_chunk(params, opt_state, chunk_key, examples_seen, lr, weights, n_steps):
            w = jnp.asarray([weights[t] for t in recipes.BODY_LOSS_TERMS], jnp.float32)
            return chunk(params, opt_state, teacher_params, image, chunk_key, jnp.float32(lr), w, n_steps=n_steps)

        def chunk_compiler(n_steps, params, opt_state, chunk_key, examples_seen, lr, weights):
            w = jnp.asarray([weights[t] for t in recipes.BODY_LOSS_TERMS], jnp.float32)
            compiled = chunk.lower(
                params, opt_state, teacher_params, image, chunk_key, jnp.float32(lr), w, n_steps=n_steps
            ).compile()

            def call(params, opt_state, chunk_key, examples_seen, lr, weights):
                w = jnp.asarray([weights[t] for t in recipes.BODY_LOSS_TERMS], jnp.float32)
                return compiled(params, opt_state, teacher_params, image, chunk_key, jnp.float32(lr), w)

            return call

        def init_params(key):
            return siren.siren_morpher_init(key, self.body_student_cfg)

        def sample_fn(params, examples_seen):
            self._write_body_samples(params, teacher_params, image, examples_seen)

        cadence = config.body_morpher_num_training_examples_per_sample_output
        return Trainer(
            TrainerConfig(
                prefix=config.body_morpher_prefix(),
                checkpoint_examples=self.checkpoint_boundaries(self.body_total_examples),
                total_batch_size=config.body_morpher_batch_size,
                examples_per_snapshot=self.examples_per_snapshot,
                examples_per_sample_output=cadence,
                random_seed=config.body_morpher_random_seed_0,
                max_chunk_steps=64,  # ~16 s/dispatch at 254 ms/step (axon
                # worker watchdog kills single executions near ~60 s)
            ),
            init_params=init_params,
            init_opt_state=recipes.adam_init,
            train_chunk=train_chunk,
            chunk_compiler=chunk_compiler,
            schedule_boundaries=[p.num_examples_upper_bound for p in phases.phases],
            lr_fn=phases.learning_rate,
            loss_weights_fn=lambda e: phases.loss_weights(recipes.BODY_LOSS_TERMS, e),
            sample_output_fn=sample_fn if cadence is not None else None,
        )

    def _write_body_samples(self, params, teacher_params, image, examples_seen):
        """4 poses x (gt | student | alpha | grid-change) grid
        (reference siren_morpher_protocols_03.py:217-352)."""
        config = self.config
        key = jax.random.PRNGKey(config.body_morpher_random_seed_1 & 0xFFFFFFFF)
        poses = self.pose_source.batch(key, 4)
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image, (n,) + image.shape[1:])
        if self._body_sample_render is None:

            # Jitted for the same reason as the face render: the eager
            # five-net teacher forward is minutes of tunnel dispatches.
            @jax.jit
            def render(tparams, sparams, image_b, poses):
                touts = mode_07.compute_outputs(self.teacher_cfg_07, tparams, image_b, poses)
                souts = siren.siren_morpher_apply(
                    self.body_student_cfg, sparams, touts[mode_07.INDEX_FACE_MORPHED_FULL], poses
                )
                return (
                    touts[0],
                    souts[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE],
                    souts[siren.SIREN_MORPHER_INDEX_ALPHA],
                    souts[siren.SIREN_MORPHER_INDEX_GRID_CHANGE],
                )

            self._body_sample_render = render
        gt_posed, pred, alpha, grid = (
            np.asarray(x) for x in self._body_sample_render(teacher_params, params, image_b, poses)
        )
        cells = [
            [
                (gt_posed[i], sample_output.ImageType.COLOR),
                (pred[i], sample_output.ImageType.COLOR),
                (alpha[i], sample_output.ImageType.ALPHA),
                (grid[i], sample_output.ImageType.GRID_CHANGE),
            ]
            for i in range(n)
        ]
        path = sample_output.sample_output_file_name(config.body_morpher_prefix(), examples_seen)
        sample_output.save_sample_grid(cells, path, cell_size=512)

    # -- task DAG (reference distiller_config.py:250-310) ------------------

    def define_tasks(self, workspace: Workspace) -> None:
        config = self.config

        @file_task(workspace, config.config_yaml_file_name(), [])
        def create_config_yaml():
            config.save(config.config_yaml_file_name())

        def student_tasks(prefix: str, total: int, make_trainer: Callable[[], Trainer]):
            boundaries = self.checkpoint_boundaries(total)
            prev = [config.config_yaml_file_name()]
            for i, boundary in enumerate(boundaries):
                index = i + 1
                target_file = os.path.join(ckpt.checkpoint_dir(prefix, index), "module_module.npz")

                def run(boundary=boundary):
                    make_trainer().train(boundary)

                workspace.create_file_task(target_file, list(prev), run)
                prev = [target_file]
            workspace.create_command_task(f"{prefix}/train", list(prev))
            return prev[0]

        # One trainer instance per student for the whole DAG run: the jitted
        # chunk programs (30-60 s compiles each) stay cached across the
        # per-checkpoint tasks instead of recompiling at every boundary.
        def face_trainer():
            if self._face_trainer is None:
                self._face_trainer = self.make_face_trainer()
            return self._face_trainer

        def body_trainer():
            if self._body_trainer is None:
                self._body_trainer = self.make_body_trainer()
            return self._body_trainer

        face_final = student_tasks(
            config.face_morpher_prefix(), self.face_total_examples, face_trainer
        )
        body_final = student_tasks(
            config.body_morpher_prefix(), self.body_total_examples, body_trainer
        )

        @file_task(workspace, config.character_model_character_png_file_name(), [config.character_image_file_name])
        def copy_character_image():
            copy_file(config.character_image_file_name, config.character_model_character_png_file_name())

        @file_task(workspace, config.character_model_face_morpher_file_name(), [face_final])
        def export_face_morpher():
            self._export_student(
                config.face_morpher_prefix(),
                self.face_total_examples,
                lambda key: siren.siren_face_morpher_init(key, self.face_student_cfg),
                "face",
                config.character_model_face_morpher_file_name(),
            )

        @file_task(workspace, config.character_model_body_morpher_file_name(), [body_final])
        def export_body_morpher():
            self._export_student(
                config.body_morpher_prefix(),
                self.body_total_examples,
                lambda key: siren.siren_morpher_init(key, self.body_student_cfg),
                "body",
                config.character_model_body_morpher_file_name(),
            )

        @file_task(workspace, config.character_model_yaml_file_name(), [])
        def create_character_model_yaml():
            model = CharacterModel(
                config.character_model_character_png_file_name(),
                config.character_model_face_morpher_file_name(),
                config.character_model_body_morpher_file_name(),
            )
            model.save(config.character_model_yaml_file_name())

        workspace.create_command_task(
            f"{config.prefix}/all",
            [
                f"{config.face_morpher_prefix()}/train",
                f"{config.body_morpher_prefix()}/train",
                config.character_model_character_png_file_name(),
                config.character_model_face_morpher_file_name(),
                config.character_model_body_morpher_file_name(),
                config.character_model_yaml_file_name(),
            ],
        )

    def _export_student(self, prefix, total, init_fn, kind, dest):
        from tha4_tpu.convert import export_torch

        index = total // self.examples_per_checkpoint
        directory = ckpt.checkpoint_dir(prefix, index)
        template = init_fn(jax.random.PRNGKey(0))
        flat = ckpt._load_npz(os.path.join(directory, "module_module.npz"))
        params = ckpt.unflatten_into(template, flat)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if kind == "face":
            export_torch.save_face_morpher_pt(params, dest)
        else:
            export_torch.save_body_morpher_pt(params, dest)


def run_config(config: DistillerConfig, target: str = "all", **kwargs) -> None:
    """The distill entry (reference app/distill.py:8-25).

    ``target`` selects which DAG node to run: ``all`` (default, the full
    reference pipeline), ``face`` or ``body`` (that student's train task
    only — useful for bounded single-student throughput runs).
    """
    jobs = DistillationJobs(config, **kwargs)
    workspace = Workspace()
    jobs.define_tasks(workspace)
    if target == "face":
        workspace.run(f"{config.face_morpher_prefix()}/train")
    elif target == "body":
        workspace.run(f"{config.body_morpher_prefix()}/train")
    else:
        workspace.run(f"{config.prefix}/all")
