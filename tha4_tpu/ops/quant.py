"""Post-training int8 quantization for the FROZEN teacher pipeline.

Why this exists: the distillation step's cost center is the frozen teacher
forward (~100 ms of the 154 ms single-chip body step; docs/perf.md).  The
v5e MXU runs int8 at ~2x the bf16 rate and int8 activations halve HBM
traffic, and a frozen network is the textbook PTQ target — measured on the
real chip, an int8 3x3 conv with on-the-fly activation quantization beats
the bf16 conv at every teacher U-Net shape (0.66 ms vs 0.80 at 512px/f4,
0.13 vs 0.20 at 128px/128ch; tools/int8_probe.py).

Design (all decisions measured, see docs/perf.md):

* **Weights**: symmetric per-output-channel int8, quantized IN-GRAPH from
  the bf16/f32 param tree (round(w/s), s = maxabs/127).  Weights are loop
  invariant in the chunked trainer, so XLA hoists the quantization out of
  the step scan — it costs one pass per dispatch, not per step.  This also
  composes with the lane-packed conv formulation for free: the packed
  kernel's structural zeros quantize to exact 0 and each packed output
  channel is a tap-copy of an original channel, so per-channel scales on
  the packed weight ARE the original per-channel scales tiled.
* **Activations**: static per-call-site scales from a one-time calibration
  pass (eager forward over a handful of poses recording max|x| per conv).
  Measured: dynamic max-abs scales cost a full extra activation read and
  lose to bf16 at the 512px shape (0.81 vs 0.80 ms) while static scales win
  (0.66 ms) — so scales must be compile-time constants.
* **Call-site matching is positional**: XLA traces the teacher forward as
  straight-line code, so the Nth eligible conv at trace time is the Nth
  eligible conv during calibration.  Every consume asserts a structural
  signature (spatial shape, kernel shape, stride) so any drift between the
  calibrated and traced program fails loudly instead of silently mis-scaling.
* **Eligibility**: stride-1 convs with min(Cin, Cout) >= 16.  This keeps the
  zero-init grid-change/alpha/color heads (cout <= 8) and the 4..8-channel
  first convs in bf16 automatically — exactly the layers whose output
  precision the warp/composite chain is sensitive to.

The context is consumed by ``ops.nn.conv2d`` (the single chokepoint every
teacher conv routes through), so NO model code changes: wrap the teacher
call in ``with quant.apply_scales(scales):`` inside the traced step.

Reference semantics preserved: the quantized program computes the same
convolutions as src/tha4/nn/common/unet.py:154-239 /
src/tha4/nn/common/poser_encoder_decoder_00.py:43-121 — int8 is a precision
choice of this framework, gated by measured PSNR vs the bf16 production
path (tests/test_quant.py, docs/perf.md).
"""

from __future__ import annotations

import dataclasses
import json
from contextlib import contextmanager
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Module-level current context (trace-time only; JAX tracing is
# single-threaded per trace, and calibration is explicitly eager).
_CURRENT: Optional[object] = None

MIN_QUANT_CHANNELS = 16


def _signature(x_shape, w_shape, stride: int) -> Tuple:
    # Batch excluded: calibration may run at a smaller batch than training.
    return (tuple(x_shape[1:]), tuple(w_shape), int(stride))


def eligible(x_shape, w_shape, stride: int) -> bool:
    cin, cout = int(w_shape[2]), int(w_shape[3])
    return stride == 1 and min(cin, cout) >= MIN_QUANT_CHANNELS


@dataclasses.dataclass
class _CalibRecord:
    sig: Tuple
    maxabs: object  # device scalar during the pass; float after finalize


class Calibration:
    """Records per-eligible-conv max|x| during an eager forward."""

    def __init__(self):
        self.records: List[_CalibRecord] = []

    def observe(self, x, w, stride: int) -> None:
        self.records.append(
            _CalibRecord(
                sig=_signature(x.shape, w.shape, stride),
                maxabs=jnp.max(jnp.abs(x.astype(jnp.float32))),
            )
        )

    def finalize(self, margin: float = 1.1) -> List[dict]:
        """Device fetch happens here (async dispatches pipeline until now)."""
        out = []
        for r in self.records:
            m = float(r.maxabs) * margin
            out.append({"sig": list(map(list, r.sig[:2])) + [r.sig[2]], "scale": max(m, 1e-8) / 127.0})
        return out

    @staticmethod
    def merge(runs: List[List[dict]]) -> List[dict]:
        """Max-merge several calibration runs (e.g. different pose draws)."""
        base = [dict(e) for e in runs[0]]
        for run in runs[1:]:
            if len(run) != len(base):
                raise ValueError("calibration runs disagree on conv count")
            for b, e in zip(base, run):
                if b["sig"] != e["sig"]:
                    raise ValueError(f"calibration runs disagree on signature: {b['sig']} vs {e['sig']}")
                b["scale"] = max(b["scale"], e["scale"])
        return base


class _Apply:
    def __init__(self, scales: List[dict]):
        self.scales = scales
        self.idx = 0

    def next_scale(self, x, w, stride: int) -> float:
        if self.idx >= len(self.scales):
            raise RuntimeError(
                f"int8 teacher: traced program has more eligible convs ({self.idx + 1}+) "
                f"than the calibration recorded ({len(self.scales)}) — recalibrate"
            )
        entry = self.scales[self.idx]
        want = _signature(x.shape, w.shape, stride)
        got = (tuple(entry["sig"][0]), tuple(entry["sig"][1]), int(entry["sig"][2]))
        if want != got:
            raise RuntimeError(
                f"int8 teacher: conv #{self.idx} signature mismatch — traced {want}, "
                f"calibrated {got}; the calibrated program does not match this one"
            )
        self.idx += 1
        return float(entry["scale"])


@contextmanager
def calibrate():
    """Calibration scope: run the teacher forward inside (eager or traced)."""
    global _CURRENT
    prev, _CURRENT = _CURRENT, Calibration()
    try:
        yield _CURRENT
    finally:
        _CURRENT = prev


def run_calibration(fn, *args, margin: float = 1.1) -> List[dict]:
    """One-shot calibration of ``fn(*args)`` as a single compiled program.

    The Calibration context collects the traced max|x| scalars during jit
    tracing; the wrapper returns them as outputs, so calibration costs one
    compile + one device run instead of an eager per-op dispatch storm
    (measured: eager through the axon tunnel pays ~30 ms per dispatch).
    ``margin`` head-rooms the observed maxima; round/clip at +-127 absorbs
    anything beyond it gracefully.
    """
    import numpy as np

    sigs: List[Tuple] = []

    def wrapped(*a):
        sigs.clear()  # retrace-safe
        with calibrate() as rec:
            fn(*a)
        sigs.extend(r.sig for r in rec.records)
        if not rec.records:
            return jnp.zeros((0,), jnp.float32)
        return jnp.stack([r.maxabs for r in rec.records])

    maxima = np.asarray(jax.jit(wrapped)(*args))
    return [
        {"sig": [list(s[0]), list(s[1]), int(s[2])], "scale": max(float(v) * margin, 1e-8) / 127.0}
        for s, v in zip(sigs, maxima)
    ]


@contextmanager
def apply_scales(scales: Optional[List[dict]]):
    """Trace-time scope: every eligible conv2d inside runs int8.

    ``scales=None`` is a no-op (keeps call sites unconditional)."""
    global _CURRENT
    if scales is None:
        yield None
        return
    ctx = _Apply(scales)
    prev, _CURRENT = _CURRENT, ctx
    ok = False
    try:
        yield ctx
        ok = True
    finally:
        _CURRENT = prev
        # Only check consumption on clean exit — never mask an in-flight
        # exception (e.g. a signature mismatch) with the count error.
        if ok and ctx.idx != len(scales):
            raise RuntimeError(
                f"int8 teacher: program consumed {ctx.idx} of {len(scales)} calibrated "
                f"convs — the calibrated program does not match this one"
            )


def current():
    return _CURRENT


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(kh, kw, Ci, Co) bf16/f32 -> (int8 weights, per-Co f32 scale)."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return w8, s


def conv2d_int8(x: jnp.ndarray, w: jnp.ndarray, x_scale: float, padding: int) -> jnp.ndarray:
    """Stride-1 int8 conv: quantize x with the static scale, conv in int8 on
    the MXU (int32 accumulate), dequantize per output channel.  Output dtype
    matches x (the bf16 flow)."""
    w8, w_s = quantize_weight(w)
    inv = jnp.float32(1.0 / x_scale)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq,
        w8,
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (jnp.float32(x_scale) * w_s)).astype(x.dtype)


def save_scales(path: str, scales: List[dict]) -> None:
    with open(path, "w") as f:
        json.dump({"format": "tha4-int8-scales-v1", "scales": scales}, f)


def load_scales(path: str) -> List[dict]:
    with open(path) as f:
        blob = json.load(f)
    if blob.get("format") != "tha4-int8-scales-v1":
        raise ValueError(f"{path}: not a tha4 int8 scales file")
    return blob["scales"]
