"""Calibration files + the mediapipe puppeteer path behind a stub landmarker.

Round-1 VERDICT gaps: the reference's wx calibration panels
(reference: src/tha4/mocap/ifacialmocap_pose_converter_25.py:188-345,
mediapipe_face_pose_converter_00.py:385-391) had no headless equivalent, and
the mediapipe puppeteer source was never executed anywhere.
"""

import json
import math

import numpy as np
import pytest

from tests.conftest import reference_available
from tha4_tpu.mocap import calibration as cal
from tha4_tpu.mocap.ifacialmocap_pose_converter import (
    EyebrowDownMode,
    IFacialMocapPoseConverterArgs,
    WinkMode,
)
from tha4_tpu.mocap.mediapipe_face_pose import MediaPipeFacePose
from tha4_tpu.mocap.mediapipe_face_pose_converter import (
    MediaPipeFacePoseConverter,
    MediaPipeFacePoseConverterArgs,
)


def test_calibration_roundtrip_ifacialmocap(tmp_path):
    args = IFacialMocapPoseConverterArgs(
        smile_threshold_min=0.3,
        eyebrow_down_mode=EyebrowDownMode.SERIOUS,
        wink_mode=WinkMode.RELAXED,
        iris_small_left=0.25,
        breathing_frequency=12.0,
    )
    path = str(tmp_path / "calib.json")
    cal.save_calibration(args, path)
    loaded = cal.load_calibration(path)
    assert isinstance(loaded, IFacialMocapPoseConverterArgs)
    assert loaded.smile_threshold_min == 0.3
    assert loaded.eyebrow_down_mode is EyebrowDownMode.SERIOUS
    assert loaded.wink_mode is WinkMode.RELAXED
    assert loaded.iris_small_left == 0.25
    assert loaded.breathing_frequency == 12.0


def test_calibration_roundtrip_mediapipe(tmp_path):
    args = MediaPipeFacePoseConverterArgs(head_x_offset=0.1, head_y_offset=-0.05, head_z_offset=0.2)
    path = str(tmp_path / "calib_mp.json")
    cal.save_calibration(args, path)
    loaded = cal.load_calibration(path)
    assert isinstance(loaded, MediaPipeFacePoseConverterArgs)
    assert loaded.head_x_offset == pytest.approx(0.1)
    assert loaded.head_z_offset == pytest.approx(0.2)


def test_apply_overrides_and_unknown_key():
    args = IFacialMocapPoseConverterArgs()
    cal.apply_overrides(args, ["smile_threshold_min=0.35", "wink_mode=relaxed", "eyebrow_down_mode=troubled"])
    assert args.smile_threshold_min == 0.35
    assert args.wink_mode is WinkMode.RELAXED
    assert args.eyebrow_down_mode is EyebrowDownMode.TROUBLED
    with pytest.raises(KeyError):
        cal.apply_overrides(args, ["not_a_param=1"])
    with pytest.raises(ValueError):
        cal.apply_overrides(args, ["smile_threshold_min"])


def _rot_x(a):
    m = np.eye(4)
    m[1, 1] = math.cos(a); m[1, 2] = -math.sin(a)
    m[2, 1] = math.sin(a); m[2, 2] = math.cos(a)
    return m


def _stub_landmarker(timestamp_ms):
    """Deterministic FaceLandmarker stand-in: like the REAL landmarker, the
    blendshape dict carries ONLY the 52 ARKit scores (no bone keys — a
    production result has none; the converter must tolerate that)."""
    from tha4_tpu.mocap.ifacialmocap_constants import BLENDSHAPE_NAMES, JAW_OPEN

    blend = {name: 0.0 for name in BLENDSHAPE_NAMES}
    blend[JAW_OPEN] = min(1.0, timestamp_ms / 100.0)
    return MediaPipeFacePose(blend, _rot_x(0.2))


def test_mediapipe_convert_blendshapes_only():
    """A real FaceLandmarker result has no bone entries; conversion must not
    KeyError on the shared blendshape math's bone reads (head rotation comes
    from the transform matrix)."""
    conv = MediaPipeFacePoseConverter()
    pose = conv.convert(_stub_landmarker(50))
    idx = conv._idx
    assert abs(pose[idx["head_x"]]) > 0.5  # from the matrix, not bone keys
    assert pose[idx["mouth_aaa"]] > 0.0  # jawOpen propagated


def test_head_calibration_zeroes_neutral_pose():
    """calibrate() on the current frame must null the head rotation exactly
    (reference Calibrate button, mediapipe_face_pose_converter_00.py:385-391)."""
    conv = MediaPipeFacePoseConverter()
    face = _stub_landmarker(0)
    pose_before = conv.convert(face)
    conv.calibrate(face)
    pose_after = conv.convert(face)
    idx = conv._idx
    assert abs(pose_before[idx["head_x"]]) > 0.5
    assert pose_after[idx["head_x"]] == pytest.approx(0.0, abs=1e-6)
    assert pose_after[idx["body_y"]] == pytest.approx(0.0, abs=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_mediapipe_puppeteer_with_stub(tmp_path):
    """End-to-end: the mediapipe puppeteer source runs (stub landmarker, no
    mediapipe package), calibrates the head from frame 1, writes frames and
    the effective calibration file."""
    from tha4_tpu.apps import puppeteer

    outdir = tmp_path / "frames"
    outdir.mkdir()
    calfile = tmp_path / "mp_calib.json"
    rc = puppeteer.main(
        [
            "--model", "/root/reference/data/character_models/lambda_00/character_model.yaml",
            "--source", "mediapipe",
            "--frames", "3",
            "--f32",
            "--calibrate-head",
            "--save-calibration", str(calfile),
            "--output-dir", str(outdir),
        ],
        mediapipe_landmarker=_stub_landmarker,
    )
    assert rc == 0
    saved = json.loads(calfile.read_text())
    assert saved["kind"] == "MediaPipeFacePoseConverterArgs"
    assert saved["head_x_offset"] == pytest.approx(0.2, abs=1e-6)
    pngs = sorted(outdir.glob("*.png"))
    assert len(pngs) == 3


def test_web_puppeteer_calibration_panel(tmp_path):
    """The --web calibration panel (the reference's wx calibration UI as a
    browser panel): GET /calib exposes the live converter's parameters and
    enum choices, POST /calib mutates them for the NEXT frame, POST /save
    writes a calibration JSON loadable via --calibration, /frame.png serves
    the rendered stream, and a bad parameter returns 400 (not a crash)."""
    import json
    import threading
    import time
    import urllib.error
    import urllib.request

    import numpy as np

    from tha4_tpu.apps import puppeteer
    from tha4_tpu.mocap import calibration as cal
    from tha4_tpu.mocap.ifacialmocap_pose_converter import (
        IFacialMocapPoseConverter,
        IFacialMocapPoseConverterArgs,
        WinkMode,
    )

    class FakePoser:
        def pose(self, image, pose):
            return np.zeros((1, 8, 8, 4), np.float32)

    conv = IFacialMocapPoseConverter(IFacialMocapPoseConverterArgs())
    stream = puppeteer.synthetic_blendshape_stream(1_000_000)
    server, state, render_thread = puppeteer._make_web_server(
        0, FakePoser(), np.zeros((8, 8, 4), np.float32), conv, lambda: next(stream), False,
        save_dir=str(tmp_path),
    )
    port = server.server_address[1]
    render_thread.start()
    serve_thread = threading.Thread(target=server.serve_forever, daemon=True)
    serve_thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        meta = json.loads(urllib.request.urlopen(base + "/calib", timeout=10).read())
        assert meta["kind"] == "IFacialMocapPoseConverterArgs"
        assert "smile_threshold_min" in meta["values"]
        assert "RELAXED" in meta["enums"]["wink_mode"]

        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"calibration" in page

        req = urllib.request.Request(
            base + "/calib",
            data=json.dumps({"smile_threshold_min": 0.31, "wink_mode": "RELAXED"}).encode(),
            method="POST",
        )
        assert urllib.request.urlopen(req, timeout=10).status == 200
        assert abs(conv.args.smile_threshold_min - 0.31) < 1e-9
        assert conv.args.wink_mode == WinkMode.RELAXED

        req = urllib.request.Request(
            base + "/save", data=json.dumps({"path": "c.json"}).encode(), method="POST"
        )
        assert urllib.request.urlopen(req, timeout=10).status == 200
        loaded = cal.load_calibration(str(tmp_path / "c.json"))
        assert abs(loaded.smile_threshold_min - 0.31) < 1e-9
        assert loaded.wink_mode == WinkMode.RELAXED

        # /save is confined to save_dir: path components and non-.json names
        # are rejected, so a network peer cannot write arbitrary host paths.
        for bad in ("../evil.json", "/tmp/evil.json", "c.txt"):
            req = urllib.request.Request(
                base + "/save", data=json.dumps({"path": bad}).encode(), method="POST"
            )
            try:
                urllib.request.urlopen(req, timeout=10)
                raise AssertionError(f"expected 400 for {bad}")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        assert not (tmp_path / "evil.json").exists()

        deadline = time.time() + 20
        png = b""
        while time.time() < deadline:
            try:
                png = urllib.request.urlopen(base + "/frame.png", timeout=10).read()
                break
            except urllib.error.HTTPError:
                time.sleep(0.2)
        assert png.startswith(b"\x89PNG")

        req = urllib.request.Request(
            base + "/calib", data=json.dumps({"not_a_param": 1}).encode(), method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        state["stop"] = True
        server.shutdown()
