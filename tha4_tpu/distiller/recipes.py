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
from tha4_tpu.ops import quant
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


# Per-chip teacher batch at which the 512x512 U-Net forward stops gaining
# per-pose throughput on a v5e core (measured; README perf table).  The
# default lookahead targets this: under D-way data parallelism at per-shard
# batch B/D, lookahead K = SAT/(B/D) restores saturated teacher batches.
TEACHER_SATURATION_BATCH = 8


def default_lookahead(batch_size: int, mesh=None) -> int:
    """Teacher-lookahead depth K that brings the per-data-shard teacher batch
    up to TEACHER_SATURATION_BATCH (1 = plain stepping, always safe)."""
    data = mesh.shape.get("data", 1) if mesh is not None else 1
    per_shard = max(1, batch_size // max(1, data))
    return max(1, TEACHER_SATURATION_BATCH // per_shard)


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
    lookahead: int = 1,
    teacher_quant=None,
):
    """Multi-step fused trainer: ONE dispatch runs ``n_steps`` optimization
    steps via lax.scan, with pose-batch sampling inside the compiled program.

    On the axon tunnel each dispatch costs ~10-15 ms of host overhead, which
    dwarfs the ~1 ms of per-step compute; scanning a whole cadence window
    (e.g. 10k examples) per dispatch removes it.  Per-step RNG is
    fold_in(chunk_key, step), so results are independent of how the driver
    partitions steps into chunks.

    ``lookahead`` batches the frozen teacher K steps ahead (identical update
    stream; see make_body_distill_chunk for the full rationale).
    """
    def teacher_targets(teacher_params, image, poses):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image.astype(compute_dtype), (n,) + image.shape[1:])
        with quant.apply_scales(teacher_quant):
            teacher_outs = mode_12.compute_outputs(
                teacher_cfg, teacher_params, image_b, poses.astype(compute_dtype)
            )
        face_morphed = jax.lax.stop_gradient(teacher_outs[mode_12.INDEX_FACE_MORPHED_IMAGE])
        return face_morphed[:, FACE_CROP_Y0 : FACE_CROP_Y0 + 128, FACE_CROP_X0 : FACE_CROP_X0 + 128, :]

    def loss_from_targets(params, gt_c, mask, poses):
        gt = gt_c.astype(jnp.float32)
        pred = siren.siren_face_morpher_apply(
            student_cfg, params, poses[:, : student_cfg.pose_size].astype(compute_dtype)
        ).astype(jnp.float32)
        return losses.sum_named(
            [
                ("full", losses.l1(gt, pred, weight=1.0)),
                ("eye_mouth", losses.masked_l1(gt, pred, mask[None], weight=20.0)),
            ]
        )

    def update(params, opt_state, gt, mask, poses, lr):
        (_, named), grads = jax.value_and_grad(loss_from_targets, has_aux=True)(
            params, gt, mask, poses
        )
        params, opt_state = adam_update(grads, opt_state, params, lr)
        return params, opt_state, named

    k = max(1, int(lookahead))

    @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0, 1))
    def chunk(params, opt_state, teacher_params, image, mask, chunk_key, lr, n_steps):
        def poses_for(i):
            return _shard_poses(pose_batch_fn(jax.random.fold_in(chunk_key, i), batch_size), mesh)

        def plain_body(carry, i):
            params, opt_state = carry
            poses = poses_for(i)
            gt = teacher_targets(teacher_params, image, poses)
            params, opt_state, named = update(params, opt_state, gt, mask, poses, lr)
            return (params, opt_state), named

        def group_body(carry, g):
            params, opt_state = carry
            poses_all = jnp.concatenate([poses_for(g * k + j) for j in range(k)], axis=0)
            gt_all = teacher_targets(teacher_params, image, poses_all)
            xs = _split_groups((gt_all, poses_all), k, batch_size, mesh)

            def inner(c, x):
                p, o = c
                gt_j, poses_j = x
                p, o, named = update(p, o, gt_j, mask, poses_j, lr)
                return (p, o), named

            (params, opt_state), named = jax.lax.scan(inner, (params, opt_state), xs)
            return (params, opt_state), jax.tree.map(lambda x: x[-1], named)

        n_groups, rem = divmod(n_steps, k) if k > 1 else (0, n_steps)
        last = None
        if n_groups > 0:
            (params, opt_state), gm = jax.lax.scan(
                group_body, (params, opt_state), jnp.arange(n_groups)
            )
            last = jax.tree.map(lambda x: x[-1], gm)
        if rem > 0:
            (params, opt_state), pm = jax.lax.scan(
                plain_body, (params, opt_state), n_groups * k + jnp.arange(rem)
            )
            last = jax.tree.map(lambda x: x[-1], pm)
        return params, opt_state, last

    return chunk


def _split_groups(xs, k: int, batch_size: int, mesh):
    """(K*B, ...) -> (K, B, ...), re-constraining the batch axis to the data
    mesh axis so the inner scan sees exactly the per-step sharding the plain
    path would."""

    def split(x):
        x = x.reshape((k, batch_size) + x.shape[1:])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(None, "data")))
        return x

    return jax.tree.map(split, xs)


def make_body_distill_chunk(
    teacher_cfg: mode_07.TeacherConfig,
    student_cfg: siren.SirenMorpherConfig,
    pose_batch_fn,
    batch_size: int,
    compute_dtype=jnp.bfloat16,
    mesh=None,
    lookahead: int = 1,
    teacher_quant=None,
    teacher_dtype=None,
    student_mixed: bool = False,
):
    """Body-student analogue of make_face_distill_chunk.

    ``teacher_dtype`` (default: ``compute_dtype``) sets the FROZEN teacher's
    activation dtype independently of the student's: the teacher is pure
    label generation (like ``teacher_quant``), while the student's dtype is
    a gradient-precision choice — tools/dtype_ab.py measures the two
    separately.

    ``student_mixed``: run the student's forward/backward in selective-f32
    (bf16 matmul operands, f32 accumulation + sines + head;
    models/siren.py _sine_linear docstring) — closes the measured bf16
    training-fidelity gap (grid_l1 6x worse than f32, docs/runs/dtype_ab)
    at near-bf16 step cost.

    ``lookahead`` = K batches the teacher in groups of K steps: the teacher is
    FROZEN, so the labels for the next K optimization steps can be computed in
    one call at batch K*B, stashed, and consumed by K exact sequential student
    updates.  The pose stream, the per-step batches, and the update order are
    identical to K=1 (per-step RNG stays fold_in(chunk_key, step)) — only the
    teacher's batch-level utilization changes.  This is the lever for 8-way
    data parallelism: at total batch 8 on 8 chips, K=1 runs the teacher U-Nets
    at batch 1/chip (badly under-utilized on the MXU); K=8 runs them at batch
    8/chip for an ~2x per-pose win (measured; README perf table).  Stash cost:
    K*B x 512^2 x 14ch bf16 = 59 MB/chip at K=B=8 over 8 chips.
    """

    t_dtype = teacher_dtype or compute_dtype

    def teacher_targets(teacher_params, image, poses):
        n = poses.shape[0]
        image_b = jnp.broadcast_to(image.astype(t_dtype), (n,) + image.shape[1:])
        with quant.apply_scales(teacher_quant):
            t = mode_07.compute_outputs(teacher_cfg, teacher_params, image_b, poses.astype(t_dtype))
        # Stash stays in the teacher's activation dtype (t_dtype, which can
        # differ from the student's compute_dtype in split arms like
        # bf16t+f32s); the loss casts to f32 at use, exactly as the unstashed
        # path did on the already-activation-dtype outputs.
        return tuple(
            jax.lax.stop_gradient(t[i]) for i in (0, 2, 3, mode_07.INDEX_FACE_MORPHED_FULL)
        )

    def loss_from_targets(params, targets, poses, weights):
        gt_posed_c, gt_warped_c, gt_grid_c, student_input = targets
        gt_posed = gt_posed_c.astype(jnp.float32)
        gt_warped = gt_warped_c.astype(jnp.float32)
        gt_grid = gt_grid_c.astype(jnp.float32)
        outs = siren.siren_morpher_apply_nhwc(
            student_cfg, params, student_input.astype(compute_dtype),
            poses.astype(compute_dtype), mixed=student_mixed)
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

    def update(params, opt_state, targets, poses, lr, weights):
        (_, named), grads = jax.value_and_grad(loss_from_targets, has_aux=True)(
            params, targets, poses, weights
        )
        params, opt_state = adam_update(grads, opt_state, params, lr)
        return params, opt_state, named

    k = max(1, int(lookahead))

    @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0, 1))
    def chunk(params, opt_state, teacher_params, image, chunk_key, lr, weights, n_steps):
        def poses_for(i):
            return _shard_poses(pose_batch_fn(jax.random.fold_in(chunk_key, i), batch_size), mesh)

        def plain_body(carry, i):
            params, opt_state = carry
            poses = poses_for(i)
            targets = teacher_targets(teacher_params, image, poses)
            params, opt_state, named = update(params, opt_state, targets, poses, lr, weights)
            return (params, opt_state), named

        def group_body(carry, g):
            params, opt_state = carry
            poses_all = jnp.concatenate([poses_for(g * k + j) for j in range(k)], axis=0)
            targets_all = teacher_targets(teacher_params, image, poses_all)
            xs = _split_groups((targets_all, poses_all), k, batch_size, mesh)

            def inner(c, x):
                p, o = c
                targets_j, poses_j = x
                p, o, named = update(p, o, targets_j, poses_j, lr, weights)
                return (p, o), named

            (params, opt_state), named = jax.lax.scan(inner, (params, opt_state), xs)
            return (params, opt_state), jax.tree.map(lambda x: x[-1], named)

        n_groups, rem = divmod(n_steps, k) if k > 1 else (0, n_steps)
        last = None
        if n_groups > 0:
            (params, opt_state), gm = jax.lax.scan(
                group_body, (params, opt_state), jnp.arange(n_groups)
            )
            last = jax.tree.map(lambda x: x[-1], gm)
        if rem > 0:
            (params, opt_state), pm = jax.lax.scan(
                plain_body, (params, opt_state), n_groups * k + jnp.arange(rem)
            )
            last = jax.tree.map(lambda x: x[-1], pm)
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
