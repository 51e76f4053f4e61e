"""The two distillation recipes: face student and body student.

Each builds a single jitted, buffer-donated train step that fuses
teacher-label generation (no-grad), the student forward, the loss, and the
Adam update into one XLA program — the reference instead ran the teacher as a
separate Python DAG per batch (reference:
src/tha4/nn/siren/morpher/siren_morpher_protocols_03.py:104-108, :178-214),
which SURVEY.md section 7 calls out as the big inefficiency to delete.

Recipes (numbers copied from the reference exactly):
  * Face (reference siren_face_morpher_00_trainer.py): teacher = mode_12
    output 0 (192x192) cropped to the central 128x128 at center (96, 112)
    (:115-126); student input pose[0:39]; loss = L1 + 20 x MaskedL1 over the
    eye-mouth mask (:185-203); 1M examples, Adam(0.9, 0.999), lr 1e-4 with
    /3 /10 /30 steps at 200k/500k/800k (:44-52, :134-150).
  * Body (reference siren_morpher_03_trainer.py + distiller_config.py:177-232):
    teacher = mode_07 outputs {0: posed, 1: alpha, 2: warped, 3: grid, 5:
    face_morphed_full}; student input = output 5; four L1 terms
    (blended/warped/grid_change/color_change-vs-posed) with 6 phases of
    (lr, weights); 1.5M examples.

Adam here = optax.scale_by_adam (same update rule as torch.optim.Adam:
p -= lr * m_hat / (sqrt(v_hat) + eps)), with lr injected per step so phase
changes never recompile.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tha4_tpu.models import siren
from tha4_tpu.poser.modes import mode_07, mode_12, mode_14
from tha4_tpu.training import losses
from tha4_tpu.training.schedules import TrainingPhase, TrainingPhases, step_lr_schedule

# Face-crop geometry (reference siren_face_morpher_00_trainer.py:115-126 and
# mode_14.py:60-62): the student paints the 128x128 square at center
# (256, 144) of the 512x512 frame; the teacher's 192x192 face morph covers
# [32:224, 160:352], so the same square sits at center (96, 112) there.
FACE_CROP_Y0, FACE_CROP_X0 = 48, 32  # within the 192x192 teacher face morph

BODY_LOSS_TERMS = ("full_blended", "full_warped", "full_grid_change", "full_color_change")

FACE_MORPHER_TOTAL_EXAMPLES = 1_000_000
BODY_MORPHER_TOTAL_EXAMPLES = 1_500_000
EXAMPLES_PER_CHECKPOINT = 100_000


def default_body_phases() -> TrainingPhases:
    """reference distiller_config.py:177-232, verbatim."""
    w_a = {"full_blended": 0.25, "full_warped": 0.25, "full_grid_change": 0.5, "full_color_change": 2.0}
    w_b = {"full_blended": 1.0, "full_warped": 2.5, "full_grid_change": 5.0, "full_color_change": 1.0}
    w_c = {"full_blended": 10.0, "full_warped": 1.0, "full_grid_change": 1.0, "full_color_change": 1.0}
    return TrainingPhases(
        [
            TrainingPhase(200_000, 1e-4, w_a),
            TrainingPhase(400_000, 3e-5, w_a),
            TrainingPhase(600_000, 3e-5, w_b),
            TrainingPhase(800_000, 1e-5, w_b),
            TrainingPhase(1_300_000, 1e-5, w_c),
            TrainingPhase(1_500_000, 3e-6, w_c),
        ]
    )


def default_face_lr_fn(base_lr: float = 1e-4):
    return step_lr_schedule(base_lr, [200_000, 500_000, 800_000], [3.0, 10.0, 30.0])


def adam_update(grads, opt_state, params, lr):
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return params, opt_state


def adam_init(params):
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8).init(params)


def load_face_mask_crop(face_mask_file_name: str) -> np.ndarray:
    """Eye-mouth mask: red channel of the user's 512x512 mask PNG, cropped to
    the face square and replicated to 4 channels
    (reference siren_face_morpher_00_trainer.py:83-95). HWC (128,128,4)."""
    from tha4_tpu.core import imagecodec

    loaded = imagecodec.load_image_hwc(
        face_mask_file_name, scale=1.0, offset=0.0, premultiply_alpha=True
    )
    crop = loaded[80:208, 192:320, 0:1]  # center (256, 144), red channel
    return np.repeat(crop, 4, axis=2).astype(np.float32)


# ---------------------------------------------------------------------------
# Face student
# ---------------------------------------------------------------------------


def make_face_distill_step(
    teacher_cfg: mode_12.FaceTeacherConfig,
    student_cfg: siren.SirenFaceMorpherConfig,
    compute_dtype=jnp.bfloat16,
):
    """Returns step(params, opt_state, teacher_params, image, mask, poses, lr)
    -> (params, opt_state, metrics).  image (1,512,512,4), mask (128,128,4),
    poses (N,45)."""

    def loss_fn(params, teacher_params, image, mask, poses):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image.astype(compute_dtype), (n,) + image.shape[1:])
        teacher_outs = mode_12.compute_outputs(
            teacher_cfg, teacher_params, image_b, poses.astype(compute_dtype)
        )
        face_morphed = jax.lax.stop_gradient(teacher_outs[mode_12.INDEX_FACE_MORPHED_IMAGE])
        gt = face_morphed[:, FACE_CROP_Y0 : FACE_CROP_Y0 + 128, FACE_CROP_X0 : FACE_CROP_X0 + 128, :]
        gt = gt.astype(jnp.float32)

        pred = siren.siren_face_morpher_apply(
            student_cfg, params, poses[:, : student_cfg.pose_size].astype(compute_dtype)
        ).astype(jnp.float32)

        total, named = losses.sum_named(
            [
                ("full", losses.l1(gt, pred, weight=1.0)),
                ("eye_mouth", losses.masked_l1(gt, pred, mask[None], weight=20.0)),
            ]
        )
        return total, named

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, teacher_params, image, mask, poses, lr):
        (loss, named), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, teacher_params, image, mask, poses
        )
        params, opt_state = adam_update(grads, opt_state, params, lr)
        return params, opt_state, named

    return step


def _shard_poses(poses, mesh):
    """Constrain the pose batch to the mesh's data axis inside the chunk:
    GSPMD then shards the teacher+student batch work across chips and
    inserts the gradient psum (the DDP-allreduce equivalent)."""
    if mesh is None:
        return poses
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(poses, NamedSharding(mesh, P("data")))


def make_face_distill_chunk(
    teacher_cfg: mode_12.FaceTeacherConfig,
    student_cfg: siren.SirenFaceMorpherConfig,
    pose_batch_fn,
    batch_size: int,
    compute_dtype=jnp.bfloat16,
    mesh=None,
):
    """Multi-step fused trainer: ONE dispatch runs ``n_steps`` optimization
    steps via lax.scan, with pose-batch sampling inside the compiled program.

    On the axon tunnel each dispatch costs ~10-15 ms of host overhead, which
    dwarfs the ~1 ms of per-step compute; scanning a whole cadence window
    (e.g. 10k examples) per dispatch removes it.  Per-step RNG is
    fold_in(chunk_key, step), so results are independent of how the driver
    partitions steps into chunks.
    """
    def loss_fn(params, teacher_params, image, mask, poses):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image.astype(compute_dtype), (n,) + image.shape[1:])
        teacher_outs = mode_12.compute_outputs(
            teacher_cfg, teacher_params, image_b, poses.astype(compute_dtype)
        )
        face_morphed = jax.lax.stop_gradient(teacher_outs[mode_12.INDEX_FACE_MORPHED_IMAGE])
        gt = face_morphed[:, FACE_CROP_Y0 : FACE_CROP_Y0 + 128, FACE_CROP_X0 : FACE_CROP_X0 + 128, :]
        gt = gt.astype(jnp.float32)
        pred = siren.siren_face_morpher_apply(
            student_cfg, params, poses[:, : student_cfg.pose_size].astype(compute_dtype)
        ).astype(jnp.float32)
        return losses.sum_named(
            [
                ("full", losses.l1(gt, pred, weight=1.0)),
                ("eye_mouth", losses.masked_l1(gt, pred, mask[None], weight=20.0)),
            ]
        )

    @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0, 1))
    def chunk(params, opt_state, teacher_params, image, mask, chunk_key, lr, n_steps):
        def body(carry, i):
            params, opt_state = carry
            poses = _shard_poses(pose_batch_fn(jax.random.fold_in(chunk_key, i), batch_size), mesh)
            (loss, named), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, teacher_params, image, mask, poses
            )
            params, opt_state = adam_update(grads, opt_state, params, lr)
            return (params, opt_state), named

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps)
        )
        last = jax.tree.map(lambda x: x[-1], metrics)
        return params, opt_state, last

    return chunk


def make_body_distill_chunk(
    teacher_cfg: mode_07.TeacherConfig,
    student_cfg: siren.SirenMorpherConfig,
    pose_batch_fn,
    batch_size: int,
    compute_dtype=jnp.bfloat16,
    mesh=None,
):
    """Body-student analogue of make_face_distill_chunk."""

    def loss_fn(params, teacher_params, image, poses, weights):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image.astype(compute_dtype), (n,) + image.shape[1:])
        t = mode_07.compute_outputs(teacher_cfg, teacher_params, image_b, poses.astype(compute_dtype))
        gt_posed = jax.lax.stop_gradient(t[0]).astype(jnp.float32)
        gt_warped = jax.lax.stop_gradient(t[2]).astype(jnp.float32)
        gt_grid = jax.lax.stop_gradient(t[3]).astype(jnp.float32)
        student_input = jax.lax.stop_gradient(t[mode_07.INDEX_FACE_MORPHED_FULL])
        outs = siren.siren_morpher_apply_nhwc(student_cfg, params, student_input, poses.astype(compute_dtype))
        pred_blended = outs[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE].astype(jnp.float32)
        pred_warped = outs[siren.SIREN_MORPHER_INDEX_WARPED_IMAGE].astype(jnp.float32)
        pred_grid = outs[siren.SIREN_MORPHER_INDEX_GRID_CHANGE].astype(jnp.float32)
        pred_color = outs[siren.SIREN_MORPHER_INDEX_COLOR_CHANGE].astype(jnp.float32)
        return losses.sum_named(
            [
                ("full_blended", weights[0] * losses.l1(gt_posed, pred_blended)),
                ("full_warped", weights[1] * losses.l1(gt_warped, pred_warped)),
                ("full_grid_change", weights[2] * losses.l1(gt_grid, pred_grid)),
                ("full_color_change", weights[3] * losses.l1(gt_posed, pred_color)),
            ]
        )

    @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0, 1))
    def chunk(params, opt_state, teacher_params, image, chunk_key, lr, weights, n_steps):
        def body(carry, i):
            params, opt_state = carry
            poses = _shard_poses(pose_batch_fn(jax.random.fold_in(chunk_key, i), batch_size), mesh)
            (loss, named), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, teacher_params, image, poses, weights
            )
            params, opt_state = adam_update(grads, opt_state, params, lr)
            return (params, opt_state), named

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps)
        )
        last = jax.tree.map(lambda x: x[-1], metrics)
        return params, opt_state, last

    return chunk


# ---------------------------------------------------------------------------
# Body student
# ---------------------------------------------------------------------------


def make_body_distill_step(
    teacher_cfg: mode_07.TeacherConfig,
    student_cfg: siren.SirenMorpherConfig,
    compute_dtype=jnp.bfloat16,
):
    """Returns step(params, opt_state, teacher_params, image, poses, lr,
    weights(4,)) -> (params, opt_state, metrics).

    weights order = BODY_LOSS_TERMS.  Only the five teacher outputs the loss
    consumes are materialized; XLA dead-code-eliminates the rest of mode_07.
    """

    def loss_fn(params, teacher_params, image, poses, weights):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image.astype(compute_dtype), (n,) + image.shape[1:])
        t = mode_07.compute_outputs(teacher_cfg, teacher_params, image_b, poses.astype(compute_dtype))
        gt_posed = jax.lax.stop_gradient(t[0]).astype(jnp.float32)
        gt_alpha = jax.lax.stop_gradient(t[1]).astype(jnp.float32)  # noqa: F841 (sample outputs)
        gt_warped = jax.lax.stop_gradient(t[2]).astype(jnp.float32)
        gt_grid = jax.lax.stop_gradient(t[3]).astype(jnp.float32)
        student_input = jax.lax.stop_gradient(t[mode_07.INDEX_FACE_MORPHED_FULL])

        outs = siren.siren_morpher_apply_nhwc(
            student_cfg, params, student_input, poses.astype(compute_dtype)
        )
        pred_blended = outs[siren.SIREN_MORPHER_INDEX_BLENDED_IMAGE].astype(jnp.float32)
        pred_warped = outs[siren.SIREN_MORPHER_INDEX_WARPED_IMAGE].astype(jnp.float32)
        pred_grid = outs[siren.SIREN_MORPHER_INDEX_GRID_CHANGE].astype(jnp.float32)
        pred_color = outs[siren.SIREN_MORPHER_INDEX_COLOR_CHANGE].astype(jnp.float32)

        total, named = losses.sum_named(
            [
                ("full_blended", weights[0] * losses.l1(gt_posed, pred_blended)),
                ("full_warped", weights[1] * losses.l1(gt_warped, pred_warped)),
                ("full_grid_change", weights[2] * losses.l1(gt_grid, pred_grid)),
                # color_change is regressed against the BLENDED groundtruth
                # (reference siren_morpher_03_trainer.py:46-49)
                ("full_color_change", weights[3] * losses.l1(gt_posed, pred_color)),
            ]
        )
        return total, named

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, teacher_params, image, poses, lr, weights):
        (loss, named), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, teacher_params, image, poses, weights
        )
        params, opt_state = adam_update(grads, opt_state, params, lr)
        return params, opt_state, named

    return step
