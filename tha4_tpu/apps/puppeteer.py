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


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", required=True, help="character_model.yaml")
    parser.add_argument("--source", choices=["udp", "synthetic", "mediapipe"], default="synthetic")
    parser.add_argument("--frames", type=int, default=0, help="stop after N frames (0 = forever)")
    parser.add_argument("--output-dir", default=None, help="save rendered frames as PNGs")
    parser.add_argument("--benchmark", action="store_true", help="print FPS stats and exit")
    parser.add_argument("--capture-address", default=None, help="iOS device IP for UDP source")
    parser.add_argument("--f32", action="store_true", help="float32 compute (default bfloat16)")
    parser.add_argument("--breathing-bpm", type=float, default=0.0)
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.core import imagecodec
    from tha4_tpu.mocap.ifacialmocap_pose_converter import (
        IFacialMocapPoseConverter,
        IFacialMocapPoseConverterArgs,
    )

    model = CharacterModel.load(args.model)
    poser = model.get_poser(compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16)
    image = jnp.asarray(model.get_character_image())
    converter = IFacialMocapPoseConverter(
        IFacialMocapPoseConverterArgs(breathing_frequency=args.breathing_bpm)
    )

    receiver = None
    if args.source == "udp":
        from tha4_tpu.mocap.ifacialmocap import IFacialMocapReceiver

        receiver = IFacialMocapReceiver(capture_address=args.capture_address)
        receiver.start()
        print("Listening for iFacialMocap packets on UDP 49983...")
    elif args.source == "mediapipe":
        print("mediapipe source requires the 'mediapipe' package and a webcam", file=sys.stderr)
        try:
            import mediapipe  # noqa: F401
        except ImportError:
            print("ERROR: mediapipe not installed in this environment", file=sys.stderr)
            return 2

    synthetic = synthetic_blendshape_stream(args.frames or 1_000_000_000)
    fps_meter = FpsMeter()
    last_pose = None
    last_frame = None
    frame_count = 0
    latencies = []

    # Warm up compilation before timing.
    warm = converter.convert(next(synthetic_blendshape_stream(1)))
    poser.pose(image, np.asarray(warm, np.float32)).block_until_ready()

    try:
        while args.frames == 0 or frame_count < args.frames:
            if args.source == "udp":
                blend = receiver.read_pose()
                if blend is None:
                    time.sleep(0.005)
                    continue
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
                frame.block_until_ready()
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
