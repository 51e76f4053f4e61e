"""Regenerate the recorded-stream replay fixtures (JSONL blendshape traces).

Run from the repo root:  python tests/fixtures/make_traces.py

The traces are synthetic-but-realistic stand-ins for a capture recording
(reference loop being emulated:
src/tha4/app/character_model_mediapipe_puppeteer.py:410-427): ~3 seconds at
30 fps of blinking, talking, smiling, and head sway, in the exact record
shapes ``tha4_tpu.apps.puppeteer.file_pose_stream`` replays:

  mediapipe_trace.jsonl     — MediaPipeFacePose.get_json() records (ARKit
                              blendshapes + 4x4 facial transform matrix)
  ifacialmocap_trace.jsonl  — partial iFacialMocap pose dicts (completed on
                              replay like partial UDP packets)

Values are rounded to 4 decimals to keep the committed files small; the
generator is committed so the fixtures are reproducible, not magic blobs.
"""

import json
import math
import os

import numpy as np

from tha4_tpu.mocap.ifacialmocap import create_default_ifacialmocap_pose
from tha4_tpu.mocap.ifacialmocap_constants import (
    BLENDSHAPE_NAMES,
    EYE_BLINK_LEFT,
    EYE_BLINK_RIGHT,
    HEAD_BONE_X,
    HEAD_BONE_Y,
    HEAD_BONE_Z,
    JAW_OPEN,
    MOUTH_SMILE_LEFT,
    MOUTH_SMILE_RIGHT,
)

N_FRAMES = 90
FPS = 30.0


def animated_blendshapes(i: int):
    t = i / FPS
    pose = create_default_ifacialmocap_pose()
    blink = min(1.0, max(0.0, math.sin(2 * math.pi * t / 2.5) * 9 - 8))
    pose[EYE_BLINK_LEFT] = pose[EYE_BLINK_RIGHT] = blink
    pose[JAW_OPEN] = 0.3 + 0.28 * math.sin(2 * math.pi * t * 2.1)
    pose[MOUTH_SMILE_LEFT] = pose[MOUTH_SMILE_RIGHT] = 0.35 + 0.3 * math.sin(2 * math.pi * t / 4.0)
    rx = 0.12 * math.sin(2 * math.pi * t / 3.5)
    ry = 0.15 * math.sin(2 * math.pi * t / 5.0)
    rz = 0.08 * math.sin(2 * math.pi * t / 6.0)
    return pose, (rx, ry, rz), t


def rot_matrix(rx, ry, rz):
    """Intrinsic x-y-z rotation as a 4x4 facial transform matrix."""
    cx, sx = math.cos(rx), math.sin(rx)
    cy, sy = math.cos(ry), math.sin(ry)
    cz, sz = math.cos(rz), math.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    m = np.eye(4)
    m[:3, :3] = mx @ my @ mz
    return m


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))

    with open(os.path.join(here, "mediapipe_trace.jsonl"), "wt") as f:
        for i in range(N_FRAMES):
            pose, (rx, ry, rz), t = animated_blendshapes(i)
            blend = {k: round(float(pose[k]), 4) for k in BLENDSHAPE_NAMES}
            rec = {
                "t": round(t, 4),
                "blendshape_params": blend,
                "xform_matrix": [[round(v, 6) for v in row] for row in rot_matrix(rx, ry, rz)],
            }
            f.write(json.dumps(rec) + "\n")

    with open(os.path.join(here, "ifacialmocap_trace.jsonl"), "wt") as f:
        for i in range(N_FRAMES):
            pose, (rx, ry, rz), t = animated_blendshapes(i)
            # Partial record: only the animated keys, like a lossy capture;
            # replay completes the rest with defaults.
            partial = {
                k: round(float(pose[k]), 4)
                for k in (EYE_BLINK_LEFT, EYE_BLINK_RIGHT, JAW_OPEN,
                          MOUTH_SMILE_LEFT, MOUTH_SMILE_RIGHT)
            }
            partial[HEAD_BONE_X] = round(rx, 4)
            partial[HEAD_BONE_Y] = round(ry, 4)
            partial[HEAD_BONE_Z] = round(rz, 4)
            f.write(json.dumps({"t": round(t, 4), "ifacialmocap_pose": partial}) + "\n")

    print(f"wrote {N_FRAMES}-frame traces to {here}")


if __name__ == "__main__":
    main()
