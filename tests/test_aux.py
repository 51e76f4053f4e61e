"""Aux subsystems: datasets, task runner, indexed tasks, two-network step,
profiling utils, extra losses/norms."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tha4_tpu.core import datasets
from tha4_tpu.tasks import indexed
from tha4_tpu.tasks.workspace import Workspace, file_task


def test_lazy_tensor_dataset_npy(tmp_path):
    path = str(tmp_path / "poses.npy")
    data = np.random.default_rng(0).uniform(0, 1, (10, 45)).astype(np.float32)
    np.save(path, data)
    ds = datasets.LazyTensorDataset(path)
    assert len(ds) == 10
    np.testing.assert_array_equal(ds[3], data[3])


def test_xformed_and_gather(tmp_path):
    path = str(tmp_path / "poses.npy")
    np.save(path, np.arange(20, dtype=np.float32).reshape(10, 2))
    ds = datasets.XformedDataset(datasets.LazyTensorDataset(path), lambda r: r * 2)
    batch = datasets.gather_batch(ds, [0, 2, 4])
    np.testing.assert_array_equal(batch[0], np.asarray([[0, 2], [8, 10], [16, 18]], np.float32))


def test_image_poses_dataset_memoizes():
    calls = []

    def image():
        calls.append(1)
        return np.zeros((4, 4, 4))

    ds = datasets.ImagePosesAndOtherImagesDataset(image, np.arange(5))
    _ = ds[0]
    _ = ds[1]
    assert len(calls) == 1
    item = ds[2]
    assert item[1] == 2


def test_workspace_file_task_semantics(tmp_path):
    ws = Workspace()
    out1 = str(tmp_path / "a.txt")
    out2 = str(tmp_path / "b.txt")
    runs = []

    @file_task(ws, out1, [])
    def make_a():
        runs.append("a")
        open(out1, "w").write("a")

    @file_task(ws, out2, [out1])
    def make_b():
        runs.append("b")
        open(out2, "w").write(open(out1).read() + "b")

    ws.run(out2)
    assert runs == ["a", "b"]
    # second run: everything up to date
    ws.start_session()
    ws.run(out2)
    assert runs == ["a", "b"]
    # touch a -> b stale
    os.utime(out1, (os.path.getmtime(out1) + 10, os.path.getmtime(out1) + 10))
    ws.start_session()
    ws.run(out2)
    assert runs == ["a", "b", "b"]


def test_task_selector_tree_and_interactive(tmp_path, monkeypatch, capsys):
    """tha4-tasks --tree/--interactive: the TaskSelectorUi equivalent
    (reference src/tha4/pytasuku/task_selector_ui.py:1-113) — path-segment
    tree with status markers; interactive selection by number or name runs
    the task."""
    from tha4_tpu.apps import tasks_cli

    ws = Workspace()
    out1 = str(tmp_path / "j" / "a.txt")
    os.makedirs(tmp_path / "j")
    runs = []

    @file_task(ws, out1, [])
    def make_a():
        runs.append("a")
        open(out1, "w").write("a")

    ws.create_command_task(str(tmp_path / "j" / "all"), [out1])

    lines, order = tasks_cli._render_tree(ws, numbered=True)
    text = "\n".join(lines)
    assert "a.txt" in text and "(STALE)" in text and "all" in text
    assert order and out1 in order

    # interactive: select the file task by its number, then quit
    idx = order.index(out1) + 1
    answers = iter([str(idx), "q"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))
    assert tasks_cli._interactive_loop(ws) == 0
    assert runs == ["a"]
    # tree re-rendered after the run shows it up to date
    lines2, _ = tasks_cli._render_tree(ws, numbered=False)
    assert any("a.txt  (up to date)" in ln for ln in lines2)


def test_indexed_tasks(tmp_path):
    ws = Workspace()
    done = []
    names = indexed.define_indexed_file_tasks(
        ws,
        name_func=lambda i: str(tmp_path / f"f{i:02d}.txt"),
        dependencies_func=lambda i: [],
        run_func=lambda i: (done.append(i), open(tmp_path / f"f{i:02d}.txt", "w").write(str(i))),
        count=3,
        umbrella_name="all",
    )
    ws.run("all")
    assert done == [0, 1, 2]
    assert len(names) == 3


def test_two_network_step():
    from tha4_tpu.training.two_networks import init_two_network_state, make_two_network_step

    # A fits y=2x, B fits y=A(x)+1 — checks alternating updates both move.
    def loss_a(pa, pb, batch):
        pred = pa["w"] * batch["x"]
        return ((pred - batch["y"]) ** 2).mean(), {}

    def loss_b(pa, pb, batch):
        pred = pb["w"] * (pa["w"] * batch["x"])
        return ((pred - (batch["y"] + 1.0)) ** 2).mean(), {}

    step = make_two_network_step(loss_a, loss_b)
    pa = {"w": jnp.zeros(())}
    pb = {"w": jnp.zeros(())}
    oa, ob = init_two_network_state(pa, pb)
    key = jax.random.PRNGKey(0)
    for i in range(200):
        x = jax.random.normal(jax.random.fold_in(key, i), (16,))
        batch = {"x": x, "y": 2.0 * x}
        pa, oa, pb, ob, metrics = step(pa, oa, pb, ob, batch, 0.05, 0.05)
    assert abs(float(pa["w"]) - 2.0) < 0.2
    assert float(metrics["loss_b"]) < 1.5


def test_extra_losses():
    from tha4_tpu.training import losses

    e = jnp.ones((4, 4))
    a = jnp.zeros((4, 4))
    assert float(losses.l2(e, a)) == 1.0
    assert float(losses.computed_scaled_l2(e, a, jnp.asarray(3.0))) == 3.0
    assert float(losses.time_dependently_weighted(losses.l1(e, a), 0.5)) == 0.5
    assert float(losses.list_l1([e, e], [a, a])) == 2.0


def test_extra_norms(rng):
    import torch

    from tha4_tpu.ops import norms_extra

    x = rng.standard_normal((2, 6, 6, 8)).astype(np.float32)
    # LayerNorm2d vs torch.layer_norm over (C,H,W)
    params = {"scale": jnp.ones((1,)), "bias": jnp.zeros((1,))}
    ours = np.asarray(norms_extra.layer_norm_2d(None, jnp.asarray(x)))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = torch.layer_norm(t, t.shape[1:]).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # PixelNorm
    ours = np.asarray(norms_extra.pixel_norm(jnp.asarray(x)))
    denom = np.sqrt((x ** 2).mean(axis=-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(ours, x / denom, atol=1e-5)

    # BatchNorm eval vs torch
    bn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 1)
        bn.running_var.uniform_(0.5, 2)
    params = {
        "scale": jnp.ones((8,)),
        "bias": jnp.zeros((8,)),
        "running_mean": jnp.asarray(bn.running_mean.numpy()),
        "running_var": jnp.asarray(bn.running_var.numpy()),
    }
    ours, _ = norms_extra.batch_norm(params, jnp.asarray(x), training=False)
    theirs = bn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_spectral_norm_power_iteration(rng):
    from tha4_tpu.ops import spectral_norm

    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32))
    u = spectral_norm.init_spectral_state(jax.random.PRNGKey(0), w)
    for _ in range(50):
        w_n, u = spectral_norm.spectral_normalize(w, u)
    # largest singular value of the normalized matrix ~ 1
    m = np.asarray(w_n).reshape(-1, 16).T
    s = np.linalg.svd(m, compute_uv=False)[0]
    assert abs(s - 1.0) < 1e-2


def test_profiling_utils():
    from tha4_tpu.utils import profiling

    timer = profiling.FrameTimer(window=10)
    f = jax.jit(lambda x: x * 2)
    for _ in range(5):
        timer.measure(f, jnp.ones((8, 8)))
    assert timer.last_ms is not None and timer.last_ms >= 0
    assert timer.fps is None or timer.fps > 0

    dt = profiling.device_timeit(lambda x: (x * 2,), jnp.ones((128, 128)), iters=5)
    assert dt > 0


def test_resize_nchw_matches_nhwc(rng):
    from tha4_tpu.ops.resize import resize_bilinear, resize_bilinear_nchw

    x = rng.standard_normal((2, 5, 16, 16)).astype(np.float32)  # NCHW
    a = np.asarray(resize_bilinear_nchw(jnp.asarray(x), (32, 32)))
    b = np.asarray(resize_bilinear(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), (32, 32)))
    np.testing.assert_allclose(a, np.transpose(b, (0, 3, 1, 2)), atol=1e-5)


def test_persistent_compile_cache_enabled(tmp_path, monkeypatch):
    """Importing tha4_tpu enables the persistent XLA compile cache (and the
    helper honors the opt-out / redirect env vars without re-latching)."""
    import jax

    from tha4_tpu.utils import compile_cache

    # Enablement normally happens at `import tha4_tpu` time (this module's
    # own import header), but the suite may run with THA4_COMPILE_CACHE=0 —
    # so enable explicitly here with the env forced on, rather than relying
    # on ambient import-time state.
    original = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("THA4_COMPILE_CACHE", "1")
    try:
        monkeypatch.setattr(compile_cache, "_enabled", False)
        assert compile_cache.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir
        assert compile_cache.enable_persistent_cache()  # idempotent

        # Opt-out is only consulted before first enablement.
        monkeypatch.setattr(compile_cache, "_enabled", False)
        monkeypatch.setenv("THA4_COMPILE_CACHE", "0")
        assert not compile_cache.enable_persistent_cache()

        monkeypatch.setenv("THA4_COMPILE_CACHE", "1")
        monkeypatch.setenv("THA4_COMPILE_CACHE_DIR", str(tmp_path / "xla"))
        assert compile_cache.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    finally:
        # Never leave the process-global cache dir pointed at the deleted
        # tmp_path, even when an assert above fails.
        jax.config.update("jax_compilation_cache_dir", original)


def test_run_report_phase_rollup(tmp_path):
    """tools/run_report.py --phases: per-phase sustained ms/step and loss
    trajectory, resume-aware (elapsed resets split segments so restart gaps
    never count as training time)."""
    import importlib.util
    import json

    import pytest

    spec = importlib.util.spec_from_file_location(
        "run_report", os.path.join(os.path.dirname(__file__), "..", "tools", "run_report.py"))
    rr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rr)

    logdir = tmp_path / "body_morpher" / "log"
    os.makedirs(logdir)
    rows = []
    # phase 1 spans [0, 200): 100 examples per 2 s  (B8 -> 160 ms/step)
    for i in range(3):
        rows.append({"examples_seen": i * 100, "elapsed": i * 2.0, "loss": 1.0 - 0.1 * i, "lr": 1e-4})
    # kill/restart: elapsed resets; phase 2 [200, 1000): slower steps
    for j in range(5):
        rows.append({"examples_seen": 400 + j * 100, "elapsed": j * 4.0, "loss": 0.5 - 0.05 * j, "lr": 3e-5})
    with open(logdir / "scalars.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    out = rr.report_phases("body", str(tmp_path), batch=8, boundaries=[200, 1000])
    assert [r["phase"] for r in out] == [1, 2]
    p1, p2 = out
    assert p1["ms_per_step"] == pytest.approx(160.0)   # 2 s / (100/8) steps
    assert p2["ms_per_step"] == pytest.approx(320.0)
    assert 1e-4 in p1["lrs_observed"]
    assert 3e-5 in p2["lrs_observed"]
    assert p1["entry_loss"] == pytest.approx(1.0) and p2["exit_loss"] == pytest.approx(0.3)
    # restart gap (elapsed reset between segments) contributed no time
    assert p1["examples_covered"] + p2["examples_covered"] == 600
