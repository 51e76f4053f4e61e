"""Recorded-stream replay (--source file:<trace.jsonl>): the full
capture->convert->render app loop without hardware (reference loop being
emulated: src/tha4/app/character_model_mediapipe_puppeteer.py:410-427)."""

import json
import os

import numpy as np
import pytest

from tests.conftest import reference_available
from tha4_tpu.apps import puppeteer

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
MP_TRACE = os.path.join(FIXTURES, "mediapipe_trace.jsonl")
IFM_TRACE = os.path.join(FIXTURES, "ifacialmocap_trace.jsonl")


def test_trace_sniffing():
    assert puppeteer.trace_is_mediapipe(MP_TRACE) is True
    assert puppeteer.trace_is_mediapipe(IFM_TRACE) is False


def test_file_pose_stream_mediapipe():
    from tha4_tpu.mocap.mediapipe_face_pose import MediaPipeFacePose

    frames = list(puppeteer.file_pose_stream(MP_TRACE, frames=5))
    assert len(frames) == 5
    assert all(isinstance(f, MediaPipeFacePose) for f in frames)
    assert frames[0].xform_matrix.shape == (4, 4)
    # The trace is animated: the jaw moves between frames.
    assert frames[0].blendshape_params["jawOpen"] != frames[3].blendshape_params["jawOpen"]


def test_file_pose_stream_ifacialmocap_completes_partials():
    """Partial records are overlaid on the default pose like partial UDP
    packets: every blendshape/bone key present after replay."""
    from tha4_tpu.mocap import ifacialmocap_constants as C

    frames = list(puppeteer.file_pose_stream(IFM_TRACE, frames=3))
    assert len(frames) == 3
    for f in frames:
        for name in C.BLENDSHAPE_NAMES:
            assert name in f
        assert C.HEAD_BONE_QUAT in f  # not in the trace -> default-completed
    assert frames[2][C.JAW_OPEN] != frames[0][C.JAW_OPEN]


def test_file_pose_stream_whole_file():
    assert len(list(puppeteer.file_pose_stream(IFM_TRACE))) == 90


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
@pytest.mark.parametrize("trace", [MP_TRACE, IFM_TRACE], ids=["mediapipe", "ifacialmocap"])
def test_replay_puppeteer_end_to_end(tmp_path, trace):
    """tha4-puppeteer --source file:<trace> drives the real converter and the
    real student poser frame by frame and writes PNGs — the full app loop,
    no camera or iOS device needed."""
    outdir = tmp_path / "frames"
    outdir.mkdir()
    rc = puppeteer.main(
        [
            "--model", "/root/reference/data/character_models/lambda_00/character_model.yaml",
            "--source", f"file:{trace}",
            "--frames", "3",
            "--f32",
            "--output-dir", str(outdir),
        ]
    )
    assert rc == 0
    pngs = sorted(outdir.glob("*.png"))
    assert len(pngs) == 3


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_replay_mediapipe_head_calibration(tmp_path):
    """--calibrate-head works on a replayed mediapipe trace exactly like a
    live landmarker: the first frame's head orientation becomes neutral and
    the effective calibration is saved."""
    calfile = tmp_path / "cal.json"
    rc = puppeteer.main(
        [
            "--model", "/root/reference/data/character_models/lambda_00/character_model.yaml",
            "--source", f"file:{MP_TRACE}",
            "--frames", "2",
            "--f32",
            "--calibrate-head",
            "--save-calibration", str(calfile),
        ]
    )
    assert rc == 0
    saved = json.loads(calfile.read_text())
    assert saved["kind"] == "MediaPipeFacePoseConverterArgs"
