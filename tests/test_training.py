"""Training core: checkpoint roundtrip, resume scan, trainer loop, schedules."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from tha4_tpu.training import checkpoint as ckpt
from tha4_tpu.training.schedules import TrainingPhase, TrainingPhases, step_lr_schedule
from tha4_tpu.training.trainer import Trainer, TrainerConfig, get_least_greater_multiple
import pytest

pytestmark = pytest.mark.slow  # trainer loops with real chunk compiles


def test_flatten_roundtrip():
    tree = {"a": [np.ones((2, 3)), {"b": np.zeros(4)}], "c": (np.arange(5.0), None)}
    flat = ckpt.flatten_tree(tree)
    rebuilt = ckpt.unflatten_into(tree, flat)
    np.testing.assert_array_equal(rebuilt["a"][0], tree["a"][0])
    np.testing.assert_array_equal(rebuilt["a"][1]["b"], tree["a"][1]["b"])
    np.testing.assert_array_equal(rebuilt["c"][0], tree["c"][0])
    assert rebuilt["c"][1] is None
    assert isinstance(rebuilt["c"], tuple)


def test_checkpoint_save_load(tmp_path):
    d = str(tmp_path / "state")
    params = {"w": np.ones((3, 3)), "layers": [np.zeros(2), np.full(2, 7.0)]}
    opt = {"mu": np.zeros((3, 3)), "count": np.asarray(5)}
    key = np.asarray(jax.random.PRNGKey(42))
    ckpt.save_state(d, {"module": params}, {"module": opt}, 12345, key)
    assert ckpt.can_load(d, ["module"])
    assert ckpt.read_examples_seen(d) == 12345
    mods, opts, _, seen, rng = ckpt.load_state(d, {"module": params}, {"module": opt})
    np.testing.assert_array_equal(mods["module"]["layers"][1], params["layers"][1])
    np.testing.assert_array_equal(rng, key)
    assert seen == 12345


def test_resume_scan_prefers_snapshot_then_newest(tmp_path):
    prefix = str(tmp_path)
    params = {"w": np.ones(2)}
    opt = {"m": np.zeros(2)}
    key = np.asarray(jax.random.PRNGKey(0))
    ckpt.save_state(ckpt.checkpoint_dir(prefix, 1), {"module": params}, {"module": opt}, 100, key)
    ckpt.save_state(ckpt.checkpoint_dir(prefix, 2), {"module": params}, {"module": opt}, 200, key)
    assert ckpt.find_resume_dir(prefix, 1000, 8, ["module"]) == ckpt.checkpoint_dir(prefix, 2)
    # snapshot wins when valid and within target
    ckpt.save_state(ckpt.snapshot_dir(prefix), {"module": params}, {"module": opt}, 250, key)
    assert ckpt.find_resume_dir(prefix, 1000, 8, ["module"]) == ckpt.snapshot_dir(prefix)
    # snapshot beyond target is skipped
    assert ckpt.find_resume_dir(prefix, 150, 8, ["module"]) == ckpt.checkpoint_dir(prefix, 1)
    # incomplete dir never loads
    os.remove(os.path.join(ckpt.checkpoint_dir(prefix, 2), "module_module.npz"))
    ckpt_dir = ckpt.find_resume_dir(prefix, 1000, 8, ["module"])
    assert ckpt_dir == ckpt.snapshot_dir(prefix)


def test_schedules():
    lr = step_lr_schedule(1e-4, [200_000, 500_000, 800_000], [3.0, 10.0, 30.0])
    assert lr(0) == 1e-4
    assert lr(200_000) == 1e-4 / 3
    assert lr(499_999) == 1e-4 / 3
    assert lr(500_000) == 1e-4 / 10
    assert lr(900_000) == 1e-4 / 30

    phases = TrainingPhases(
        [
            TrainingPhase(100, 1e-3, {"a": 1.0}),
            TrainingPhase(200, 1e-4, {"a": 2.0, "b": 0.5}),
        ]
    )
    assert phases.learning_rate(0) == 1e-3
    assert phases.learning_rate(150) == 1e-4
    assert phases.learning_rate(500) == 1e-4  # last phase extends
    assert phases.loss_weight("a", 50) == 1.0
    assert phases.loss_weight("b", 50) == 0.0
    assert phases.loss_weights(["a", "b"], 150) == {"a": 2.0, "b": 0.5}
    assert phases.total_examples == 200


def _toy_trainer(prefix, target=64, batch=8, seed=7):
    """Fit y = 2x with one weight; checkpoint every 32 examples."""
    from tha4_tpu.distiller.recipes import adam_init, adam_update

    def init_params(key):
        return {"w": jnp.zeros(())}

    def train_step(params, opt_state, batch_data, lr, weights, key):
        def loss_fn(p):
            pred = p["w"] * batch_data["x"]
            return ((pred - batch_data["y"]) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = adam_update(grads, opt_state, params, lr)
        return params, opt_state, {"loss": loss}

    def make_batch(key, n):
        x = jax.random.normal(key, (n,))
        return {"x": x, "y": 2.0 * x}

    cfg = TrainerConfig(
        prefix=prefix,
        checkpoint_examples=[32, 64],
        total_batch_size=batch,
        examples_per_snapshot=16,
        examples_per_sample_output=None,
        random_seed=seed,
    )
    return Trainer(
        cfg,
        init_params=init_params,
        init_opt_state=adam_init,
        train_step=train_step,
        make_batch=make_batch,
        lr_fn=lambda e: 0.1,
    )


def test_trainer_loop_and_resume(tmp_path):
    prefix = str(tmp_path / "toy")
    trainer = _toy_trainer(prefix)
    result = trainer.train(64)
    assert result["examples_seen"] == 64
    assert ckpt.can_load(ckpt.checkpoint_dir(prefix, 1), ["module"])
    assert ckpt.can_load(ckpt.checkpoint_dir(prefix, 2), ["module"])
    assert ckpt.can_load(ckpt.snapshot_dir(prefix), ["module"])
    w_after = float(result["params"]["w"])

    # Deterministic resume: a second trainer reaching the same target from
    # checkpoint 1 must land on the same weight as an uninterrupted run.
    import shutil

    shutil.rmtree(ckpt.snapshot_dir(prefix))
    shutil.rmtree(ckpt.checkpoint_dir(prefix, 2))
    trainer2 = _toy_trainer(prefix)
    result2 = trainer2.train(64)
    assert result2["examples_seen"] == 64
    np.testing.assert_allclose(float(result2["params"]["w"]), w_after, atol=1e-6)


def test_validation_cadence(tmp_path):
    """The validation protocol (reference shion ValidationProtocol semantics):
    validation_fn fires every examples_per_validation examples with the
    dedicated validation seed, and its metrics land in the scalar log."""
    import json

    from tha4_tpu.distiller.recipes import adam_init, adam_update

    calls = []

    def validation_fn(params, vkey, examples_seen):
        calls.append((examples_seen, np.asarray(vkey).tolist()))
        return {"loss": 0.5}

    def init_params(key):
        return {"w": jnp.zeros(())}

    def train_step(params, opt_state, batch_data, lr, weights, key):
        def loss_fn(p):
            return ((p["w"] * batch_data["x"] - batch_data["y"]) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = adam_update(grads, opt_state, params, lr)
        return params, opt_state, {"loss": loss}

    def make_batch(key, n):
        x = jax.random.normal(key, (n,))
        return {"x": x, "y": 2.0 * x}

    prefix = str(tmp_path / "val")
    cfg = TrainerConfig(
        prefix=prefix,
        checkpoint_examples=[64],
        total_batch_size=8,
        examples_per_snapshot=64,
        examples_per_sample_output=None,
        examples_per_validation=16,
        log_every_seconds=0.0,  # log every step so validation rows are visible
        random_seed=7,
    )
    trainer = Trainer(
        cfg,
        init_params=init_params,
        init_opt_state=adam_init,
        train_step=train_step,
        make_batch=make_batch,
        lr_fn=lambda e: 0.1,
        validation_fn=validation_fn,
    )
    trainer.train(64)

    seen = [c[0] for c in calls]
    assert seen == [16, 32, 48, 64], seen
    # dedicated validation seed, identical across firings (reference
    # ValidationProtocol owns its own seed)
    assert len({tuple(c[1]) for c in calls}) == 1
    rows = [json.loads(l) for l in open(os.path.join(prefix, "log", "scalars.jsonl"))]
    vrows = [r for r in rows if "validation_loss" in r]
    assert [r["examples_seen"] for r in vrows] == [16, 32, 48, 64]


def test_validation_cadence_chunked(tmp_path):
    """Same contract through the fused-chunk path: chunks must not straddle a
    validation boundary."""
    from tha4_tpu.distiller.recipes import adam_init, adam_update

    calls = []

    def validation_fn(params, vkey, examples_seen):
        calls.append(examples_seen)
        return {"loss": 1.0}

    def init_params(key):
        return {"w": jnp.zeros(())}

    def train_chunk(params, opt_state, chunk_key, examples_seen, lr, weights, n_steps):
        def body(carry, i):
            p, o = carry
            x = jax.random.normal(jax.random.fold_in(chunk_key, i), (8,))
            loss, grads = jax.value_and_grad(lambda q: ((q["w"] * x - 2 * x) ** 2).mean())(p)
            p, o = adam_update(grads, o, p, lr)
            return (p, o), loss

        (params, opt_state), losses_ = jax.lax.scan(body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, {"loss": losses_[-1]}

    prefix = str(tmp_path / "valchunk")
    cfg = TrainerConfig(
        prefix=prefix,
        checkpoint_examples=[96],
        total_batch_size=8,
        examples_per_snapshot=96,
        examples_per_sample_output=None,
        examples_per_validation=32,
        random_seed=7,
    )
    trainer = Trainer(
        cfg,
        init_params=init_params,
        init_opt_state=adam_init,
        train_chunk=train_chunk,
        lr_fn=lambda e: 0.1,
        validation_fn=validation_fn,
    )
    trainer.train(96)
    assert calls == [32, 64, 96], calls


def test_mouth_span_constant_pinned_to_schema():
    """The procedural sampler's mouth one-hot span (26, 32) must track the
    canonical 45-dim schema (VERDICT round-1 weak #11)."""
    from tha4_tpu.distiller import pose_dataset
    from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters

    pp = get_pose_parameters()
    shapes = ["mouth_aaa", "mouth_iii", "mouth_uuu", "mouth_eee", "mouth_ooo", "mouth_delta"]
    indices = [pp.get_parameter_index(n) for n in shapes]
    assert indices == list(range(indices[0], indices[0] + 6)), "mouth shapes must be contiguous"
    assert pose_dataset._MOUTH_SHAPES == (indices[0], indices[-1] + 1)
    eyebrow_groups = [g for g in pp.get_pose_parameter_groups() if g.get_group_name().startswith("eyebrow")]
    assert pose_dataset._EYEBROW == (
        min(g.parameter_index for g in eyebrow_groups),
        max(g.parameter_index + g.arity for g in eyebrow_groups),
    )


def test_get_least_greater_multiple():
    assert get_least_greater_multiple(0, 10) == 10
    assert get_least_greater_multiple(9, 10) == 10
    assert get_least_greater_multiple(10, 10) == 20


def test_pose_source_procedural():
    from tha4_tpu.distiller.pose_dataset import PoseSource, sample_poses

    key = jax.random.PRNGKey(0)
    poses = np.asarray(sample_poses(key, 64))
    assert poses.shape == (64, 45)
    # ranges respected
    assert poses[:, :35].min() >= 0.0
    assert poses[:, 35:42].min() >= -1.0 and poses[:, 35:42].max() <= 1.0
    # mouth-shape sparsity: at most one of the 6 shapes nonzero per row
    mouth = poses[:, 26:32]
    assert ((mouth > 0).sum(axis=1) <= 1).all()
    # deterministic
    poses2 = np.asarray(sample_poses(key, 64))
    np.testing.assert_array_equal(poses, poses2)

    src = PoseSource(None)
    b = src.batch(key, 4)
    assert b.shape == (4, 45)


def test_plan_chunk_sizes_matches_loop(tmp_path):
    """plan_chunk_sizes must predict exactly the chunk sizes train()
    dispatches (same boundary + power-of-two quantization math) — it is the
    contract the compile-ahead machinery relies on."""
    from tha4_tpu.distiller.recipes import adam_init, adam_update

    dispatched = []

    def init_params(key):
        return {"w": jnp.zeros(())}

    def train_chunk(params, opt_state, chunk_key, examples_seen, lr, weights, n_steps):
        dispatched.append(n_steps)

        def body(carry, i):
            p, o = carry
            x = jax.random.normal(jax.random.fold_in(chunk_key, i), (4,))
            loss, grads = jax.value_and_grad(lambda q: ((q["w"] * x - x) ** 2).mean())(p)
            p, o = adam_update(grads, o, p, lr)
            return (p, o), loss

        (params, opt_state), losses_ = jax.lax.scan(body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, {"loss": losses_[-1]}

    def sample_fn(params, examples_seen):
        pass

    cfg = TrainerConfig(
        prefix=str(tmp_path / "plan"),
        checkpoint_examples=[400, 1000],
        total_batch_size=4,
        examples_per_snapshot=100,
        examples_per_sample_output=250,
        examples_per_validation=None,
        random_seed=3,
        max_chunk_steps=16,
        precompile_chunks=False,  # exercise the jit path; we only record sizes
    )
    trainer = Trainer(
        cfg,
        init_params=init_params,
        init_opt_state=adam_init,
        train_chunk=train_chunk,
        lr_fn=lambda e: 0.1,
        sample_output_fn=sample_fn,
        schedule_boundaries=[300],
    )
    planned = trainer.plan_chunk_sizes(0, 1000)
    trainer.train(1000)
    # Same distinct sizes, same first-need order.
    first_need = []
    for n in dispatched:
        if n not in first_need:
            first_need.append(n)
    assert planned == first_need, (planned, first_need)


def test_compile_ahead_equivalence(tmp_path):
    """With a chunk_compiler, the loop runs AOT-compiled programs for every
    planned size and produces the exact same final params as the jit path."""
    from tha4_tpu.distiller.recipes import adam_init, adam_update

    compiled_sizes = []

    def init_params(key):
        return {"w": jnp.zeros(())}

    @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0, 1))
    def chunk(params, opt_state, chunk_key, lr, n_steps):
        def body(carry, i):
            p, o = carry
            x = jax.random.normal(jax.random.fold_in(chunk_key, i), (4,))
            loss, grads = jax.value_and_grad(lambda q: ((q["w"] * x - 3 * x) ** 2).mean())(p)
            p, o = adam_update(grads, o, p, lr)
            return (p, o), loss

        (params, opt_state), losses_ = jax.lax.scan(body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, {"loss": losses_[-1]}

    def train_chunk(params, opt_state, chunk_key, examples_seen, lr, weights, n_steps):
        return chunk(params, opt_state, chunk_key, jnp.float32(lr), n_steps=n_steps)

    def chunk_compiler(n_steps, params, opt_state, chunk_key, examples_seen, lr, weights):
        compiled_sizes.append(n_steps)
        compiled = chunk.lower(params, opt_state, chunk_key, jnp.float32(lr), n_steps=n_steps).compile()

        def call(params, opt_state, chunk_key, examples_seen, lr, weights):
            return compiled(params, opt_state, chunk_key, jnp.float32(lr))

        return call

    def make_cfg(prefix, precompile):
        return TrainerConfig(
            prefix=prefix,
            checkpoint_examples=[480],
            total_batch_size=4,
            examples_per_snapshot=120,
            examples_per_sample_output=None,
            random_seed=3,
            max_chunk_steps=16,
            precompile_chunks=precompile,
        )

    out_aot = Trainer(
        make_cfg(str(tmp_path / "aot"), True),
        init_params=init_params,
        init_opt_state=adam_init,
        train_chunk=train_chunk,
        chunk_compiler=chunk_compiler,
        lr_fn=lambda e: 0.1,
    ).train(480)
    out_jit = Trainer(
        make_cfg(str(tmp_path / "jit"), False),
        init_params=init_params,
        init_opt_state=adam_init,
        train_chunk=train_chunk,
        lr_fn=lambda e: 0.1,
    ).train(480)

    assert sorted(compiled_sizes) == sorted(set(compiled_sizes))  # one compile per size
    assert set(compiled_sizes) == set(
        Trainer(
            make_cfg(str(tmp_path / "plan2"), False),
            init_params=init_params,
            init_opt_state=adam_init,
            train_chunk=train_chunk,
            lr_fn=lambda e: 0.1,
        ).plan_chunk_sizes(0, 480)
    )
    np.testing.assert_array_equal(
        np.asarray(out_aot["params"]["w"]), np.asarray(out_jit["params"]["w"])
    )
    assert out_aot["examples_seen"] == out_jit["examples_seen"] == 480
