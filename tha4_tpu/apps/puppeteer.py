"""puppeteer — real-time student inference from a blendshape stream.

Headless equivalent of the reference puppeteer apps
(reference: src/tha4/app/character_model_ifacialmocap_puppeteer.py and
character_model_mediapipe_puppeteer.py): receive blendshapes, convert to a
45-dim pose, render the student frame, repeat.  Keeps the reference's
pose-equality short-circuit (:311-313) and rolling-100-frame FPS meter
(:28-42).

Sources:
  udp        — iFacialMocap UDP packets on port 49983
  synthetic  — generated blendshape stream (testing/benchmarking without a
               capture device)
  mediapipe  — webcam + MediaPipe FaceLandmarker (needs the 'mediapipe'
               package and a camera; gated at runtime)

Examples:
  tha4-puppeteer --model .../character_model.yaml --source synthetic --frames 200 --benchmark
  tha4-puppeteer --model .../character_model.yaml --source udp
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from collections import deque
from typing import Iterator, Optional


class FpsMeter:
    """Rolling-average FPS over the last 100 frames
    (reference character_model_ifacialmocap_puppeteer.py:28-42)."""

    def __init__(self, maxlen: int = 100):
        self.times = deque(maxlen=maxlen)

    def tick(self) -> Optional[float]:
        self.times.append(time.perf_counter())
        if len(self.times) < 2:
            return None
        return (len(self.times) - 1) / (self.times[-1] - self.times[0])


def synthetic_blendshape_stream(frames: int) -> Iterator[dict]:
    """A deterministic animated stream: blinking, talking, head sway."""
    from tha4_tpu.mocap.ifacialmocap import create_default_ifacialmocap_pose
    from tha4_tpu.mocap.ifacialmocap_constants import (
        EYE_BLINK_LEFT, EYE_BLINK_RIGHT, HEAD_BONE_X, HEAD_BONE_Y, HEAD_BONE_Z,
        JAW_OPEN, MOUTH_SMILE_LEFT, MOUTH_SMILE_RIGHT,
    )

    for i in range(frames):
        t = i / 30.0
        pose = create_default_ifacialmocap_pose()
        blink = max(0.0, math.sin(2 * math.pi * t / 3.0) * 8 - 7)
        pose[EYE_BLINK_LEFT] = pose[EYE_BLINK_RIGHT] = min(1.0, blink)
        pose[JAW_OPEN] = 0.3 + 0.25 * math.sin(2 * math.pi * t * 2.0)
        pose[MOUTH_SMILE_LEFT] = pose[MOUTH_SMILE_RIGHT] = 0.3 + 0.3 * math.sin(2 * math.pi * t / 5.0)
        pose[HEAD_BONE_X] = 0.1 * math.sin(2 * math.pi * t / 4.0)
        pose[HEAD_BONE_Y] = 0.12 * math.sin(2 * math.pi * t / 6.0)
        pose[HEAD_BONE_Z] = 0.08 * math.sin(2 * math.pi * t / 7.0)
        yield pose


def mediapipe_face_pose_stream(frames: int, landmarker=None, camera=None) -> Iterator:
    """Webcam + FaceLandmarker -> MediaPipeFacePose stream (reference
    character_model_mediapipe_puppeteer.py:410-418 loop).

    ``landmarker``/``camera`` are injectable for tests (a stub landmarker
    exercises the full puppeteer path without the mediapipe package or a
    camera).  The production default builds MediaPipe FaceLandmarker in VIDEO
    mode with blendshapes + the facial transform matrix, reading cv2
    VideoCapture(0).
    """
    from tha4_tpu.mocap.mediapipe_face_pose import MediaPipeFacePose

    if landmarker is None:
        import cv2
        import mediapipe as mp
        from mediapipe.tasks.python import BaseOptions, vision

        options = vision.FaceLandmarkerOptions(
            base_options=BaseOptions(model_asset_path="face_landmarker.task"),
            running_mode=vision.RunningMode.VIDEO,
            output_face_blendshapes=True,
            output_facial_transformation_matrixes=True,
            num_faces=1,
        )
        real_landmarker = vision.FaceLandmarker.create_from_options(options)
        cap = camera or cv2.VideoCapture(0)

        def landmarker(timestamp_ms):
            ok, frame_bgr = cap.read()
            if not ok:
                return None
            rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
            mp_image = mp.Image(image_format=mp.ImageFormat.SRGB, data=rgb)
            result = real_landmarker.detect_for_video(mp_image, timestamp_ms)
            if not result.face_blendshapes:
                return None
            blend = {c.category_name: c.score for c in result.face_blendshapes[0]}
            xform = result.facial_transformation_matrixes[0]
            return MediaPipeFacePose(blend, xform)

    for i in range(frames):
        pose = landmarker(int(i * 33.3))
        if pose is not None:
            yield pose


def main(argv=None, mediapipe_landmarker=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", required=True, help="character_model.yaml")
    parser.add_argument("--source", choices=["udp", "synthetic", "mediapipe"], default="synthetic")
    parser.add_argument("--frames", type=int, default=0, help="stop after N frames (0 = forever)")
    parser.add_argument("--output-dir", default=None, help="save rendered frames as PNGs")
    parser.add_argument("--benchmark", action="store_true", help="print FPS stats and exit")
    parser.add_argument("--capture-address", default=None, help="iOS device IP for UDP source")
    parser.add_argument("--f32", action="store_true", help="float32 compute (default bfloat16)")
    parser.add_argument("--breathing-bpm", type=float, default=0.0)
    parser.add_argument("--calibration", default=None,
                        help="calibration JSON (mocap.calibration format) for the pose converter")
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="override a calibration parameter (e.g. --set smile_threshold_min=0.3 --set wink_mode=relaxed); repeatable")
    parser.add_argument("--save-calibration", default=None,
                        help="write the effective calibration (file + overrides + head calibration) to this JSON and continue")
    parser.add_argument("--calibrate-head", action="store_true",
                        help="mediapipe: set the neutral head orientation from the first captured frame (the reference's Calibrate button)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.core import imagecodec
    from tha4_tpu.mocap import calibration as cal
    from tha4_tpu.mocap.ifacialmocap_pose_converter import (
        IFacialMocapPoseConverter,
        IFacialMocapPoseConverterArgs,
    )
    from tha4_tpu.mocap.mediapipe_face_pose_converter import (
        MediaPipeFacePoseConverter,
        MediaPipeFacePoseConverterArgs,
    )

    model = CharacterModel.load(args.model)
    poser = model.get_poser(compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16)
    image = jnp.asarray(model.get_character_image())

    if args.calibration is not None:
        conv_args = cal.load_calibration(args.calibration)
    elif args.source == "mediapipe":
        conv_args = MediaPipeFacePoseConverterArgs()
    else:
        conv_args = IFacialMocapPoseConverterArgs()
    if args.breathing_bpm:
        conv_args.breathing_frequency = args.breathing_bpm
    if args.overrides:
        cal.apply_overrides(conv_args, args.overrides)

    if args.source == "mediapipe":
        if not isinstance(conv_args, MediaPipeFacePoseConverterArgs):
            raise SystemExit("--calibration file is not a mediapipe calibration")
        converter = MediaPipeFacePoseConverter(conv_args)
    else:
        converter = IFacialMocapPoseConverter(conv_args)

    receiver = None
    mp_stream = None
    if args.source == "udp":
        from tha4_tpu.mocap.ifacialmocap import IFacialMocapReceiver

        receiver = IFacialMocapReceiver(capture_address=args.capture_address)
        receiver.start()
        print("Listening for iFacialMocap packets on UDP 49983...")
    elif args.source == "mediapipe":
        if mediapipe_landmarker is None:
            try:
                import mediapipe  # noqa: F401
            except ImportError:
                print("ERROR: mediapipe not installed in this environment", file=sys.stderr)
                return 2
        mp_stream = mediapipe_face_pose_stream(
            args.frames or 1_000_000_000, landmarker=mediapipe_landmarker
        )

    if args.save_calibration is not None and args.source != "mediapipe":
        cal.save_calibration(conv_args, args.save_calibration)

    synthetic = synthetic_blendshape_stream(args.frames or 1_000_000_000)
    fps_meter = FpsMeter()
    last_pose = None
    last_frame = None
    frame_count = 0
    latencies = []

    # Warm up compilation before timing.
    warm_blend = next(synthetic_blendshape_stream(1))
    if args.source == "mediapipe":
        from tha4_tpu.mocap.mediapipe_face_pose import MediaPipeFacePose

        warm = converter.convert(MediaPipeFacePose(warm_blend, None))
    else:
        warm = converter.convert(warm_blend)
    poser.pose(image, np.asarray(warm, np.float32)).block_until_ready()

    calibrated = False
    try:
        while args.frames == 0 or frame_count < args.frames:
            if args.source == "udp":
                blend = receiver.read_pose()
                if blend is None:
                    time.sleep(0.005)
                    continue
            elif args.source == "mediapipe":
                try:
                    blend = next(mp_stream)  # a MediaPipeFacePose
                except StopIteration:
                    break
                if args.calibrate_head and not calibrated:
                    converter.calibrate(blend)
                    calibrated = True
                    if args.save_calibration is not None:
                        from tha4_tpu.mocap import calibration as cal

                        cal.save_calibration(converter.args, args.save_calibration)
            else:
                try:
                    blend = next(synthetic)
                except StopIteration:
                    break

            pose = converter.convert(blend)
            if last_pose is not None and pose == last_pose:
                frame = last_frame  # pose-equality short-circuit
            else:
                t0 = time.perf_counter()
                frame = poser.pose(image, np.asarray(pose, np.float32))
                # A value fetch is the only true completion barrier: on
                # tunneled backends block_until_ready can return before the
                # device finishes, under-reporting latency ~100x.  One pixel
                # keeps the copy itself negligible while forcing the frame.
                float(frame[0, 0, 0, 0])
                latencies.append(time.perf_counter() - t0)
            last_pose, last_frame = pose, frame
            frame_count += 1

            fps = fps_meter.tick()
            if args.output_dir is not None:
                imagecodec.save_image_hwc(np.asarray(frame[0]), f"{args.output_dir}/frame_{frame_count:06d}.png")
            if not args.benchmark and fps is not None and frame_count % 100 == 0:
                print(f"frame {frame_count}: {fps:.1f} fps")
    except KeyboardInterrupt:
        pass
    finally:
        if receiver is not None:
            receiver.close()

    if args.benchmark and latencies:
        lat = np.asarray(latencies[1:]) * 1000.0
        print(
            f"frames={frame_count} mean={lat.mean():.2f}ms p50={np.percentile(lat, 50):.2f}ms "
            f"p99={np.percentile(lat, 99):.2f}ms fps={1000.0 / lat.mean():.1f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
