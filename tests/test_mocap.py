"""Mocap layer: protocol parsers, pose converter math, viseme solver, Euler.

The reference converter module imports wx at module scope, so it cannot be
used as an oracle here; instead the converter math is checked against
hand-computed expectations from the reference formulas
(ifacialmocap_pose_converter_25.py:397-607), the viseme solver against the
scipy optimizer it replaces, and the Euler extraction against scipy Rotation.
"""

import math

import numpy as np
import pytest

from tha4_tpu.mocap import ifacialmocap_constants as C
from tha4_tpu.mocap.ifacialmocap import (
    create_default_ifacialmocap_pose,
    parse_ifacialmocap_v1_pose,
    parse_ifacialmocap_v2_pose,
)
from tha4_tpu.mocap.ifacialmocap_pose_converter import (
    IFacialMocapPoseConverter,
    IFacialMocapPoseConverterArgs,
    solve_viseme_decomposition,
    VISEME_MATRIX,
)
from tha4_tpu.poser.modes.pose_parameters import get_pose_parameters

PP = get_pose_parameters()


def idx(name):
    return PP.get_parameter_index(name)


def test_parse_v2():
    text = "mouthSmile_L&55.5|mouthSmile_R&44.5|browInnerUp&10|=head#12.0,-6.0,3.0,0,0,0|rightEye#1,2,3|leftEye#4,5,6|"
    pose = parse_ifacialmocap_v2_pose(text)
    assert pose[C.MOUTH_SMILE_LEFT] == pytest.approx(0.555)
    assert pose[C.MOUTH_SMILE_RIGHT] == pytest.approx(0.445)
    assert pose[C.BROW_INNER_UP] == pytest.approx(0.1)
    assert pose[C.HEAD_BONE_X] == pytest.approx(12.0 * math.pi / 180)
    assert pose[C.HEAD_BONE_Y] == pytest.approx(-6.0 * math.pi / 180)
    assert pose[C.RIGHT_EYE_BONE_Z] == pytest.approx(3 * math.pi / 180)
    assert pose[C.LEFT_EYE_BONE_X] == pytest.approx(4 * math.pi / 180)
    assert pose[C.HEAD_BONE_QUAT] == [0.0, 0.0, 0.0, 1.0]


def test_parse_v1():
    text = "mouthSmile_L-30|=head#0,0,15,0,0,0"
    pose = parse_ifacialmocap_v1_pose(text)
    assert pose[C.MOUTH_SMILE_LEFT] == pytest.approx(0.3)
    assert pose[C.HEAD_BONE_Z] == pytest.approx(15 * math.pi / 180)


def test_parse_dispatch_v1_vs_v2():
    """parse_ifacialmocap_pose dispatches on the pair separator: 'key&value'
    packets go to the v2 parser, legacy 'key-value' packets to v1 — a v1
    packet must NOT silently lose all its blendshapes to the v2 grammar."""
    from tha4_tpu.mocap.ifacialmocap import parse_ifacialmocap_pose

    v1 = parse_ifacialmocap_pose("mouthSmile_L-30|=head#0,0,15,0,0,0")
    assert v1[C.MOUTH_SMILE_LEFT] == pytest.approx(0.3)
    assert v1[C.HEAD_BONE_Z] == pytest.approx(15 * math.pi / 180)
    v2 = parse_ifacialmocap_pose("mouthSmile_L&55.5|=head#0,0,15,0,0,0")
    assert v2[C.MOUTH_SMILE_LEFT] == pytest.approx(0.555)


def test_default_pose_complete():
    pose = create_default_ifacialmocap_pose()
    for name in C.BLENDSHAPE_NAMES:
        assert pose[name] == 0.0
    assert pose[C.HEAD_BONE_QUAT] == [0.0, 0.0, 0.0, 1.0]


def test_converter_neutral():
    conv = IFacialMocapPoseConverter()
    pose = conv.convert(create_default_ifacialmocap_pose())
    assert len(pose) == 45
    # jaw closed -> mouth_aaa 0; head zero; frown zeroed (mouth_frown_max>0 branch)
    assert pose[idx("mouth_aaa")] == 0.0
    assert pose[idx("head_x")] == 0.0
    assert pose[idx("mouth_lowered_corner_left")] == 0.0


def test_converter_head_clamping():
    conv = IFacialMocapPoseConverter()
    blend = create_default_ifacialmocap_pose()
    blend[C.HEAD_BONE_X] = -30 * math.pi / 180  # clamps at 15 deg -> +1.0
    blend[C.HEAD_BONE_Y] = -5 * math.pi / 180  # 5/10 -> 0.5 with body coupling
    blend[C.HEAD_BONE_Z] = 7.5 * math.pi / 180  # 7.5/15 -> 0.5
    pose = conv.convert(blend)
    assert pose[idx("head_x")] == pytest.approx(1.0)
    assert pose[idx("head_y")] == pytest.approx(0.5)
    assert pose[idx("body_y")] == pytest.approx(0.5)
    assert pose[idx("neck_z")] == pytest.approx(0.5)
    assert pose[idx("body_z")] == pytest.approx(0.5)


def test_converter_smile_gating_and_wink():
    conv = IFacialMocapPoseConverter()
    blend = create_default_ifacialmocap_pose()
    blend[C.MOUTH_SMILE_LEFT] = blend[C.MOUTH_SMILE_RIGHT] = 0.8  # smile_value 0.8 > max -> degree 1
    blend[C.EYE_BLINK_LEFT] = 0.8  # /0.8 -> 1.0
    pose = conv.convert(blend)
    # full smile routes blink to happy wink
    assert pose[idx("eye_wink_left")] == 0.0
    assert pose[idx("eye_happy_wink_left")] == pytest.approx(1.0)
    assert pose[idx("eyebrow_happy_left")] == pytest.approx(0.8)
    assert pose[idx("mouth_raised_corner_left")] == pytest.approx(0.8)


def test_converter_eyebrow_down_modes():
    from tha4_tpu.mocap.ifacialmocap_pose_converter import EyebrowDownMode

    for mode, group in [
        (EyebrowDownMode.ANGRY, "eyebrow_angry"),
        (EyebrowDownMode.TROUBLED, "eyebrow_troubled"),
        (EyebrowDownMode.LOWERED, "eyebrow_lowered"),
        (EyebrowDownMode.SERIOUS, "eyebrow_serious"),
    ]:
        conv = IFacialMocapPoseConverter(IFacialMocapPoseConverterArgs(eyebrow_down_mode=mode))
        blend = create_default_ifacialmocap_pose()
        blend[C.BROW_DOWN_LEFT] = 0.4  # /0.4 -> 1.0
        pose = conv.convert(blend)
        assert pose[idx(group + "_left")] == pytest.approx(1.0), group


def test_viseme_solver_matches_scipy():
    import scipy.optimize

    rng = np.random.default_rng(1)
    for _ in range(12):
        p = rng.uniform(0, 1, 4)

        def loss(d):
            return np.linalg.norm(d @ VISEME_MATRIX - p) + 0.01 * np.linalg.norm(d, ord=1)

        ref = scipy.optimize.minimize(loss, np.zeros(4), bounds=[(0.0, 1.0)] * 4)["x"]
        ours = solve_viseme_decomposition(p)
        # Same objective value (solutions may differ along flat directions)
        assert loss(ours) <= loss(ref) + 5e-3, (p, ours, ref, loss(ours), loss(ref))


def test_converter_open_mouth_visemes():
    conv = IFacialMocapPoseConverter()
    blend = create_default_ifacialmocap_pose()
    blend[C.JAW_OPEN] = 0.4  # fully open per default calibration
    pose = conv.convert(blend)
    # mouth point (1, 0, 0, 0): scipy's solution is aaa~0.149, ooo-mix~0.464
    # (verified against the reference objective); ours must land nearby.
    assert pose[idx("mouth_aaa")] == pytest.approx(0.149, abs=0.03)
    assert pose[idx("mouth_iii")] == pytest.approx(0.0, abs=0.01)
    # uo_value ~0.46 routed to uuu (funnel 0 -> ooo_alpha 0)
    assert pose[idx("mouth_uuu")] == pytest.approx(0.46, abs=0.05)
    assert pose[idx("mouth_ooo")] == pytest.approx(0.0, abs=0.01)


def test_euler_extraction_matches_scipy():
    from scipy.spatial.transform import Rotation

    from tha4_tpu.mocap.mediapipe_face_pose_converter import matrix_to_euler_xyz

    rng = np.random.default_rng(5)
    for _ in range(20):
        quat = rng.standard_normal(4)
        quat /= np.linalg.norm(quat)
        rot = Rotation.from_quat(quat)
        expected = rot.as_euler("xyz", degrees=False)
        ours = matrix_to_euler_xyz(rot.as_matrix())
        np.testing.assert_allclose(ours, expected, atol=1e-9)


def test_mediapipe_converter_and_calibration(tmp_path):
    from scipy.spatial.transform import Rotation

    from tha4_tpu.mocap.mediapipe_face_pose import MediaPipeFacePose
    from tha4_tpu.mocap.mediapipe_face_pose_converter import MediaPipeFacePoseConverter

    conv = MediaPipeFacePoseConverter()
    blend = create_default_ifacialmocap_pose()

    xform = np.eye(4)
    xform[0:3, 0:3] = Rotation.from_euler("xyz", [-10 * math.pi / 180, 0, 0]).as_matrix()
    fp = MediaPipeFacePose(blend, xform)
    pose = conv.convert(fp)
    assert pose[idx("head_x")] == pytest.approx(10.0 / 15.0, abs=1e-6)

    # calibration zeroes the neutral offset
    conv.calibrate(fp)
    pose = conv.convert(fp)
    assert pose[idx("head_x")] == pytest.approx(0.0, abs=1e-6)

    # json round trip
    path = str(tmp_path / "pose.json")
    fp.save(path)
    fp2 = MediaPipeFacePose.load(path)
    np.testing.assert_allclose(fp2.xform_matrix, xform)


@pytest.mark.parametrize("use_native", [True, False])
def test_receiver_udp_roundtrip(use_native):
    """Real UDP round-trip through IFacialMocapReceiver, on both the native
    drain-thread path (tha4_tpu/native/mocap_receiver.cpp, skipped when the
    toolchain is absent) and the reference-style nonblocking-socket fallback.
    Semantics pinned: freshest packet wins, None when nothing NEW arrived."""
    import socket as socketlib
    import time

    from tha4_tpu.mocap.ifacialmocap import IFacialMocapReceiver

    if use_native:
        from tha4_tpu.native.loader import get_mocap_library

        if get_mocap_library() is None:
            pytest.skip("native toolchain unavailable")

    port = 49310 + (1 if use_native else 0)
    rx = IFacialMocapReceiver(port=port, use_native=use_native)
    rx.start()
    if use_native:
        assert rx._native_handle is not None, "native path did not engage"
    try:
        tx = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_DGRAM)
        try:
            stale = "mouthSmile_L&35|=head#1.0,2.0,3.0,0,0,0|".encode()
            fresh = "mouthSmile_L&70|jawOpen&50|=head#4.0,5.0,6.0,0,0,0|".encode()
            tx.sendto(stale, ("127.0.0.1", port))
            tx.sendto(fresh, ("127.0.0.1", port))

            # Poll until the FRESHEST packet is observed (the native thread
            # may expose the stale one briefly between the two datagrams).
            pose = None
            deadline = time.time() + 5.0
            while time.time() < deadline:
                p = rx.read_pose()
                if p is not None:
                    pose = p
                    if abs(p["mouthSmileLeft"] - 0.70) < 1e-9:
                        break
                time.sleep(0.01)
            assert pose is not None, "no packet received"
            assert abs(pose["mouthSmileLeft"] - 0.70) < 1e-9
            assert abs(pose["jawOpen"] - 0.50) < 1e-9
            # The sent packets are PARTIAL: blendshapes they omit must come
            # back defaulted, not missing (the converter reads every key).
            assert pose["eyeBlinkLeft"] == 0.0
            assert pose["headBoneQuat"] == [0.0, 0.0, 0.0, 1.0]
            assert abs(pose["headBoneX"] - 4.0 * 3.14159265 / 180) < 1e-6

            # Nothing new arrived -> None (not a stale re-parse).
            assert rx.read_pose() is None
        finally:
            tx.close()
    finally:
        rx.close()
