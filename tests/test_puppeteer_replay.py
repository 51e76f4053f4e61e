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


def _mediapipe_ready():
    """True iff the optional real-capture deps exist: the mediapipe package
    AND a FaceLandmarker task bundle (no egress here, so it must be local)."""
    try:
        import mediapipe  # noqa: F401
    except ImportError:
        return False
    task = os.environ.get("THA4_FACE_LANDMARKER_TASK", "face_landmarker.task")
    return os.path.isfile(task)


@pytest.mark.skipif(not _mediapipe_ready(),
                    reason="mediapipe package / face_landmarker.task not available")
def test_real_mediapipe_landmarker_branch():
    """Drives the REAL FaceLandmarker (reference
    character_model_mediapipe_puppeteer.py:410-418) with synthetic camera
    frames — executes the actual package-integration glue, not the stub.
    A blank frame has no face, so the landmarker must return None (the
    no-face branch); the pipeline construction itself is the thing under
    test.  Runs only where the optional package + task bundle exist."""
    import numpy as np

    from tha4_tpu.apps import puppeteer

    class SyntheticCamera:
        def __init__(self):
            self.n = 0

        def read(self):
            self.n += 1
            if self.n > 3:
                return False, None
            frame = np.full((240, 320, 3), 128, np.uint8)  # BGR, faceless
            return True, frame

    landmarker = puppeteer.make_mediapipe_landmarker(camera=SyntheticCamera())
    poses = list(puppeteer.mediapipe_face_pose_stream(3, landmarker=landmarker))
    assert poses == []  # no face in a flat gray frame — and nothing crashed


def test_mediapipe_missing_package_error_is_actionable(monkeypatch):
    """Without the optional package, --source mediapipe fails with a message
    pointing at the replay alternative instead of a bare ImportError."""
    import builtins

    from tha4_tpu.apps import puppeteer

    real_import = builtins.__import__

    def no_mediapipe(name, *a, **k):
        if name.startswith("mediapipe"):
            raise ImportError("No module named 'mediapipe'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_mediapipe)
    with pytest.raises(ImportError, match="file:<trace"):
        puppeteer.make_mediapipe_landmarker()


def test_mediapipe_missing_task_bundle_error(tmp_path, monkeypatch):
    """With the package but no task bundle, the error names the env var."""
    pytest.importorskip("mediapipe")
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("THA4_FACE_LANDMARKER_TASK", raising=False)
    from tha4_tpu.apps import puppeteer

    with pytest.raises(FileNotFoundError, match="THA4_FACE_LANDMARKER_TASK"):
        puppeteer.make_mediapipe_landmarker()
