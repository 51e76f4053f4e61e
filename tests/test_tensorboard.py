"""TensorBoard event-file writer: framing, CRCs, round-trip, trainer wiring.

The reference logs TB scalars (reference distributed_trainer.py:171-182);
our writer must produce files TensorBoard itself would accept, so the tests
validate the TFRecord framing (masked CRC32C) against known vectors and
round-trip through an independent decoder.
"""

import glob
import os

import numpy as np

from tha4_tpu.training import tensorboard as tb


def test_crc32c_known_vectors():
    # RFC 3720 / crc32c reference vectors
    assert tb.crc32c(b"") == 0x00000000
    assert tb.crc32c(b"a") == 0xC1D04330
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_varint_encoding():
    assert tb._varint(0) == b"\x00"
    assert tb._varint(1) == b"\x01"
    assert tb._varint(127) == b"\x7f"
    assert tb._varint(128) == b"\x80\x01"
    assert tb._varint(300) == b"\xac\x02"


def test_writer_roundtrip(tmp_path):
    w = tb.SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, step=100, wall_time=123.0)
    w.add_scalars({"a": 1.5, "b": -2.0}, step=200, wall_time=124.0)
    w.close()

    events = tb.read_events(w.path, validate_crc=True)
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 100
    assert events[1]["scalars"] == {"loss": 0.5}
    assert events[1]["wall_time"] == 123.0
    assert events[2]["step"] == 200
    assert events[2]["scalars"]["a"] == 1.5
    assert events[2]["scalars"]["b"] == -2.0


def test_jsonl_converter(tmp_path):
    jsonl = tmp_path / "scalars.jsonl"
    jsonl.write_text(
        '{"loss": 0.9, "examples_seen": 8, "lr": 0.0001}\n'
        '{"loss": 0.4, "examples_seen": 16, "lr": 0.0001}\n'
    )
    path = tb.jsonl_to_tensorboard(str(jsonl), str(tmp_path / "tb"))
    events = tb.read_events(path)
    steps = [e["step"] for e in events if e["scalars"]]
    assert steps == [8, 16]
    assert events[1]["scalars"]["loss"] == np.float32(0.9)


def test_trainer_writes_tensorboard(tmp_path):
    import jax
    import jax.numpy as jnp

    from tha4_tpu.distiller.recipes import adam_init, adam_update
    from tha4_tpu.training.trainer import Trainer, TrainerConfig

    def train_step(params, opt_state, batch, lr, weights, key):
        loss, grads = jax.value_and_grad(lambda p: (p["w"] ** 2).sum())(params)
        params, opt_state = adam_update(grads, opt_state, params, lr)
        return params, opt_state, {"loss": loss}

    prefix = str(tmp_path / "run")
    cfg = TrainerConfig(
        prefix=prefix,
        checkpoint_examples=[32],
        total_batch_size=8,
        examples_per_snapshot=32,
        examples_per_sample_output=None,
        log_every_seconds=0.0,
        random_seed=3,
    )
    Trainer(
        cfg,
        init_params=lambda k: {"w": jnp.ones(3)},
        init_opt_state=adam_init,
        train_step=train_step,
        make_batch=lambda k, n: {},
        lr_fn=lambda e: 0.01,
    ).train(32)

    files = glob.glob(os.path.join(prefix, "log", "events.out.tfevents.*"))
    assert len(files) == 1
    events = tb.read_events(files[0])
    scalar_events = [e for e in events if e["scalars"]]
    assert scalar_events, "no scalar events written"
    assert any("training_module_loss_loss" in e["scalars"] for e in scalar_events)
    assert all("learning_rate" in e["scalars"] for e in scalar_events)
