"""puppeteer — real-time student inference from a blendshape stream.

Headless equivalent of the reference puppeteer apps
(reference: src/tha4/app/character_model_ifacialmocap_puppeteer.py and
character_model_mediapipe_puppeteer.py): receive blendshapes, convert to a
45-dim pose, render the student frame, repeat.  Keeps the reference's
pose-equality short-circuit (:311-313) and rolling-100-frame FPS meter
(:28-42).

Sources:
  udp         — iFacialMocap UDP packets on port 49983
  synthetic   — generated blendshape stream (testing/benchmarking without a
                capture device)
  mediapipe   — webcam + MediaPipe FaceLandmarker (needs the 'mediapipe'
                package and a camera; gated at runtime)
  file:<path> — replay a recorded JSONL blendshape trace (mediapipe or
                iFacialMocap records, sniffed from the first line), so the
                full capture->convert->render loop runs end to end without
                hardware.  See docs/puppeteer_mediapipe.md and
                tests/fixtures/mediapipe_trace.jsonl.

Examples:
  tha4-puppeteer --model .../character_model.yaml --source synthetic --frames 200 --benchmark
  tha4-puppeteer --model .../character_model.yaml --source udp
  tha4-puppeteer --model .../character_model.yaml --source file:tests/fixtures/mediapipe_trace.jsonl
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


def make_mediapipe_landmarker(camera=None, model_asset_path: str | None = None):
    """Build the REAL FaceLandmarker pipeline (reference
    character_model_mediapipe_puppeteer.py:410-418): VIDEO running mode,
    blendshapes + facial transformation matrix, frames from ``camera``
    (any object with ``read() -> (ok, bgr_hwc_uint8)``; default
    cv2.VideoCapture(0) — cv2 is imported only for that default, so an
    injected camera needs just the ``mediapipe`` package).

    ``model_asset_path`` defaults to $THA4_FACE_LANDMARKER_TASK or
    ``face_landmarker.task`` in the CWD (Google's downloadable task bundle;
    this environment has no egress, so the path must be user-supplied).
    Raises ImportError/FileNotFoundError with actionable messages — callers
    fall back to ``--source file:<trace>`` replay.
    """
    import os

    import numpy as np

    try:
        import mediapipe as mp
        from mediapipe.tasks.python import BaseOptions, vision
    except ImportError as e:
        raise ImportError(
            "--source mediapipe needs the optional 'mediapipe' package "
            "(pip install mediapipe); use --source file:<trace.jsonl> for "
            "replay without it"
        ) from e

    from tha4_tpu.mocap.mediapipe_face_pose import MediaPipeFacePose

    task = model_asset_path or os.environ.get(
        "THA4_FACE_LANDMARKER_TASK", "face_landmarker.task")
    if not os.path.isfile(task):
        raise FileNotFoundError(
            f"FaceLandmarker task bundle not found: {task!r} (download "
            "face_landmarker.task from MediaPipe and point "
            "$THA4_FACE_LANDMARKER_TASK at it)")
    options = vision.FaceLandmarkerOptions(
        base_options=BaseOptions(model_asset_path=task),
        running_mode=vision.RunningMode.VIDEO,
        output_face_blendshapes=True,
        output_facial_transformation_matrixes=True,
        num_faces=1,
    )
    real_landmarker = vision.FaceLandmarker.create_from_options(options)
    if camera is None:
        import cv2

        camera = cv2.VideoCapture(0)

    def landmarker(timestamp_ms):
        ok, frame_bgr = camera.read()
        if not ok:
            return None
        rgb = np.ascontiguousarray(np.asarray(frame_bgr)[..., ::-1])  # BGR->RGB
        mp_image = mp.Image(image_format=mp.ImageFormat.SRGB, data=rgb)
        result = real_landmarker.detect_for_video(mp_image, timestamp_ms)
        if not result.face_blendshapes:
            return None
        blend = {c.category_name: c.score for c in result.face_blendshapes[0]}
        xform = result.facial_transformation_matrixes[0]
        return MediaPipeFacePose(blend, xform)

    return landmarker


def mediapipe_face_pose_stream(frames: int, landmarker=None, camera=None) -> Iterator:
    """Webcam + FaceLandmarker -> MediaPipeFacePose stream (reference
    character_model_mediapipe_puppeteer.py:410-418 loop).

    ``landmarker``/``camera`` are injectable for tests (a stub landmarker
    exercises the full puppeteer path without the mediapipe package or a
    camera); the production default is the real pipeline from
    make_mediapipe_landmarker.
    """
    if landmarker is None:
        landmarker = make_mediapipe_landmarker(camera=camera)

    for i in range(frames):
        pose = landmarker(int(i * 33.3))
        if pose is not None:
            yield pose


def trace_is_mediapipe(path: str) -> bool:
    """Sniff a JSONL trace: mediapipe records carry an ``xform_matrix``
    (MediaPipeFacePose.get_json()), iFacialMocap records do not."""
    import json

    with open(path, "rt") as fin:
        for line in fin:
            line = line.strip()
            if line:
                return "xform_matrix" in json.loads(line)
    raise ValueError(f"empty trace file {path}")


def file_pose_stream(path: str, frames: int = 0, realtime: bool = False) -> Iterator:
    """Replay a recorded JSONL blendshape trace — the reference app loop
    (character_model_mediapipe_puppeteer.py:410-427 /
    character_model_ifacialmocap_puppeteer.py:93-121) with a file standing in
    for the landmarker/receiver, so tests and demos exercise the real
    capture->convert->render path without a camera or an iOS device.

    One JSON object per line.  Two record shapes:
      mediapipe    — MediaPipeFacePose.get_json(): {"blendshape_params":
                     {...}, "xform_matrix": [[...4x4...]]} -> yields
                     MediaPipeFacePose
      iFacialMocap — {"ifacialmocap_pose": {partial blendshape/bone dict}}
                     -> yields a completed pose dict (missing keys filled
                     with defaults, like the UDP receiver's partial-packet
                     overlay)
    Either may carry "t" (seconds since trace start); with ``realtime`` the
    replay sleeps to honor those timestamps, otherwise it runs flat out."""
    import json

    from tha4_tpu.mocap.ifacialmocap import IFacialMocapReceiver
    from tha4_tpu.mocap.mediapipe_face_pose import MediaPipeFacePose

    import numpy as np

    start = time.perf_counter()
    count = 0
    with open(path, "rt") as fin:
        for line in fin:
            line = line.strip()
            if not line:
                continue
            if frames and count >= frames:
                break
            rec = json.loads(line)
            if realtime and "t" in rec:
                lag = rec["t"] - (time.perf_counter() - start)
                if lag > 0:
                    time.sleep(lag)
            if "xform_matrix" in rec:
                yield MediaPipeFacePose(
                    rec.get("blendshape_params"), np.array(rec["xform_matrix"])
                )
            else:
                yield IFacialMocapReceiver._complete(rec["ifacialmocap_pose"])
            count += 1


_WEB_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>tha4 puppeteer</title>
<style>
 body { font-family: sans-serif; display: flex; gap: 16px; margin: 12px; background:#fafafa; }
 #panel { width: 380px; max-height: 95vh; overflow-y: auto; }
 label { display: inline-block; width: 215px; font-size: 12px; }
 input[type=number] { width: 90px; } select { width: 96px; }
 #frame { border: 1px solid #ccc; background:
   repeating-conic-gradient(#eee 0% 25%, #fff 0% 50%) 0 0/24px 24px; }
 #status { font-size: 12px; color: #666; } .row { margin: 3px 0; }
 h3 { margin: 8px 0 4px; font-size: 14px; }
</style></head>
<body>
<div id="panel">
  <h3>calibration <span id="status"></span></h3>
  <div id="fields"></div>
  <div class="row"><input id="savepath" value="calibration.json" style="width:200px">
    <button onclick="saveCal()">save calibration</button></div>
  <div class="row" id="headrow" style="display:none">
    <button onclick="calHead()">calibrate head (neutral)</button></div>
</div>
<img id="frame" width="512" height="512">
<script>
async function setParam(k, v) {
  await fetch('calib', {method:'POST', body: JSON.stringify({[k]: v})});
  document.getElementById('status').textContent = k + ' set';
}
async function saveCal() {
  const p = document.getElementById('savepath').value;
  const r = await fetch('save', {method:'POST', body: JSON.stringify({path: p})});
  document.getElementById('status').textContent = await r.text();
}
async function calHead() {
  const r = await fetch('calibrate-head', {method:'POST'});
  document.getElementById('status').textContent = await r.text();
}
async function init() {
  const meta = await (await fetch('calib')).json();
  const div = document.getElementById('fields');
  if (meta.kind === 'MediaPipeFacePoseConverterArgs')
    document.getElementById('headrow').style.display = '';
  for (const [k, v] of Object.entries(meta.values)) {
    const row = document.createElement('div'); row.className = 'row';
    const lab = document.createElement('label'); lab.textContent = k; row.appendChild(lab);
    let inp;
    if (meta.enums[k]) {
      inp = document.createElement('select');
      for (const o of meta.enums[k]) {
        const opt = document.createElement('option');
        opt.value = o; opt.textContent = o.toLowerCase(); inp.appendChild(opt);
      }
      inp.value = v;
      inp.onchange = () => setParam(k, inp.value);
    } else if (typeof v === 'boolean') {
      inp = document.createElement('input'); inp.type = 'checkbox'; inp.checked = v;
      inp.onchange = () => setParam(k, inp.checked);
    } else {
      inp = document.createElement('input'); inp.type = 'number';
      inp.step = Math.abs(v) >= 10 ? '1' : '0.01'; inp.value = v;
      inp.onchange = () => setParam(k, parseFloat(inp.value));
    }
    row.appendChild(inp); div.appendChild(row);
  }
  tick();
}
function tick() {
  const img = document.getElementById('frame');
  img.onload = () => setTimeout(tick, 66);
  img.onerror = () => setTimeout(tick, 500);
  img.src = 'frame.png?t=' + Date.now();
}
init();
</script></body></html>
"""


def _make_web_server(port, poser, image, converter, next_blend, is_mediapipe: bool,
                     host: str = "127.0.0.1", save_dir: Optional[str] = None):
    """Build the web-puppeteer server + render thread (separated from
    serve_forever so tests can drive the endpoints on an ephemeral port).
    Returns (server, state, render_thread); caller starts/stops both.

    Binds loopback by default (pass --host to expose on a LAN) and confines
    POST /save to ``save_dir`` (default: the working directory): the client
    supplies only a .json *filename*, never a path, so a network peer cannot
    create or overwrite arbitrary files on the host."""
    import json
    import os
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np

    from tha4_tpu.mocap import calibration as cal

    state = {"png": b"", "fps": None, "last_blend": None, "stop": False}
    lock = threading.Lock()

    def render_loop():
        import io

        import jax
        import PIL.Image

        from tha4_tpu.core import imagecodec

        # Display encode on device: fetch uint8 (1 MB), not float (4 MB).
        encode_u8 = jax.jit(imagecodec.encode_display_u8)
        meter = FpsMeter()
        last_pose = None
        while not state["stop"]:
            blend = next_blend()
            if blend is None:
                time.sleep(0.005)
                continue
            state["last_blend"] = blend
            pose = converter.convert(blend)
            if pose != last_pose:
                out = np.asarray(encode_u8(poser.pose(image, np.asarray(pose, np.float32))))[0]
                pil = PIL.Image.fromarray(out, "RGBA")
                buf = io.BytesIO()
                pil.save(buf, format="PNG")
                with lock:
                    state["png"] = buf.getvalue()
                last_pose = pose
            state["fps"] = meter.tick()

    thread = threading.Thread(target=render_loop, daemon=True)

    enums = {k: [m.name for m in e] for k, e in cal._ENUM_FIELDS.items()}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            pass

        def _send(self, code, body, ctype="text/plain"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                with lock:
                    png = state["png"]
                if not png:
                    self._send(503, b"warming up")
                    return
                self._send(200, png, "image/png")
            elif self.path.startswith("/calib"):
                d = cal.calibration_to_dict(converter.args)
                kind = d.pop("kind")
                body = json.dumps({"kind": kind, "values": d, "enums": enums}).encode()
                self._send(200, body, "application/json")
            else:
                self._send(200, _WEB_PAGE.encode(), "text/html")

        def do_POST(self):
            data = self.rfile.read(int(self.headers.get("Content-Length", 0)) or 0)
            try:
                if self.path.startswith("/calib"):
                    cal._assign(converter.args, json.loads(data))
                    self._send(200, b"ok")
                elif self.path.startswith("/save"):
                    requested = json.loads(data)["path"]
                    name = os.path.basename(requested)
                    if name != requested or not name.endswith(".json"):
                        self._send(400, b"save path must be a bare .json filename")
                    else:
                        path = os.path.join(save_dir or os.getcwd(), name)
                        cal.save_calibration(converter.args, path)
                        self._send(200, f"saved {path}".encode())
                elif self.path.startswith("/calibrate-head"):
                    if not is_mediapipe:
                        self._send(400, b"only meaningful for --source mediapipe")
                    elif state["last_blend"] is None:
                        self._send(503, b"no frame captured yet")
                    else:
                        converter.calibrate(state["last_blend"])
                        self._send(200, b"neutral head set from current frame")
                else:
                    self._send(404, b"?")
            except Exception as e:  # surfaced to the panel, not a crash
                self._send(400, f"{type(e).__name__}: {e}".encode())

    server = ThreadingHTTPServer((host, port), Handler)
    return server, state, thread


def _run_web(args, poser, image, converter, next_blend, is_mediapipe: bool) -> int:
    """Live web puppeteer with an interactive calibration panel — the
    reference's wx calibration UI (ifacialmocap_pose_converter_25.py:188-345,
    mediapipe_face_pose_converter_00.py:385-391 'Calibrate') as a browser
    panel over the running converter: edits apply to the next frame, 'save'
    writes a mocap.calibration JSON reusable via --calibration."""
    import os

    save_dir = (
        os.path.dirname(os.path.abspath(args.save_calibration))
        if args.save_calibration else None
    )
    server, state, thread = _make_web_server(
        args.port, poser, image, converter, next_blend, is_mediapipe,
        host=args.host, save_dir=save_dir,
    )
    thread.start()
    print(f"tha4 web puppeteer on http://{args.host}:{args.port}  (Ctrl-C to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        state["stop"] = True
    return 0


def main(argv=None, mediapipe_landmarker=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", required=True, help="character_model.yaml")
    parser.add_argument("--source", default="synthetic",
                        help="udp | synthetic | mediapipe | file:<trace.jsonl> (recorded-stream replay)")
    parser.add_argument("--realtime", action="store_true",
                        help="file source: honor the trace's 't' timestamps instead of replaying flat out")
    parser.add_argument("--frames", type=int, default=0, help="stop after N frames (0 = forever)")
    parser.add_argument("--output-dir", default=None, help="save rendered frames as PNGs")
    parser.add_argument("--benchmark", action="store_true", help="print FPS stats and exit")
    parser.add_argument(
        "--no-pipeline",
        action="store_true",
        help="disable frame pipelining: fetch each frame to the host before "
        "dispatching the next pose. Default is a depth-4 pipeline whose "
        "frame fetches run concurrently in a thread pool — the fetch round "
        "trip, not device compute, is the interactive bottleneck, and "
        "concurrent fetches of distinct frames multiplex on the device "
        "link. Raises throughput ~2.5x at ~2x per-frame latency.",
    )
    parser.add_argument("--capture-address", default=None, help="iOS device IP for UDP source")
    parser.add_argument(
        "--dtype", choices=("f32", "bf16", "exact"), default="f32",
        help="compute path (tools/precision_sweep.py measured ladder): "
        "f32 = float32 storage with 1-pass MXU matmuls — visually lossless "
        "(66 dB PSNR / SSIM 1.0000 vs the exact render) at ~85%% of bf16's "
        "fps [default]; bf16 = fastest (31.9 dB / SSIM 0.976); "
        "exact = float32 storage + 6-pass matmuls, bit-faithful parity path",
    )
    parser.add_argument("--f32", action="store_true", help=argparse.SUPPRESS)  # legacy alias of --dtype exact
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
    parser.add_argument("--web", action="store_true",
                        help="serve a live browser view with an interactive calibration panel (the reference's wx calibration UI)")
    parser.add_argument("--port", type=int, default=8766, help="--web port")
    parser.add_argument("--host", default="127.0.0.1",
                        help="--web bind address (default loopback; set e.g. 0.0.0.0 to expose on the LAN)")
    args = parser.parse_args(argv)

    import jax
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

    if args.source not in ("udp", "synthetic", "mediapipe") and not args.source.startswith("file:"):
        raise SystemExit(f"unknown --source {args.source!r} (udp | synthetic | mediapipe | file:<path>)")

    trace_path = args.source[5:] if args.source.startswith("file:") else None
    # is_mediapipe selects the converter family + head-calibration support;
    # a replayed trace keeps the semantics of whatever capture produced it.
    is_mediapipe = args.source == "mediapipe" or (
        trace_path is not None and trace_is_mediapipe(trace_path)
    )

    model = CharacterModel.load(args.model)
    dtype_mode = "exact" if args.f32 else args.dtype
    poser = model.get_poser(
        compute_dtype=jnp.bfloat16 if dtype_mode == "bf16" else jnp.float32,
        # f32 storage + the MXU's native 1-pass multiply: visually lossless
        # and nearly bf16-fast ("exact" leaves the poser's 6-pass default).
        matmul_precision="default" if dtype_mode == "f32" else None,
    )
    image = jnp.asarray(model.get_character_image())

    if args.calibration is not None:
        conv_args = cal.load_calibration(args.calibration)
    elif is_mediapipe:
        conv_args = MediaPipeFacePoseConverterArgs()
    else:
        conv_args = IFacialMocapPoseConverterArgs()
    if args.breathing_bpm:
        conv_args.breathing_frequency = args.breathing_bpm
    if args.overrides:
        cal.apply_overrides(conv_args, args.overrides)

    if is_mediapipe:
        if not isinstance(conv_args, MediaPipeFacePoseConverterArgs):
            raise SystemExit("--calibration file is not a mediapipe calibration")
        converter = MediaPipeFacePoseConverter(conv_args)
    else:
        converter = IFacialMocapPoseConverter(conv_args)

    receiver = None
    mp_stream = None
    file_stream = None
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
    elif trace_path is not None:
        file_stream = file_pose_stream(trace_path, args.frames, realtime=args.realtime)
        if is_mediapipe:
            mp_stream = file_stream  # yields MediaPipeFacePose records

    if args.save_calibration is not None:
        # Write the effective calibration (file + overrides) up front for
        # every source and mode, as the flag's help text promises; the
        # mediapipe --calibrate-head branch re-saves once the neutral head
        # orientation has been captured.
        cal.save_calibration(conv_args, args.save_calibration)

    synthetic = synthetic_blendshape_stream(args.frames or 1_000_000_000)

    if args.web:
        def next_blend():
            if args.source == "udp":
                return receiver.read_pose()
            stream = mp_stream if mp_stream is not None else (file_stream or synthetic)
            try:
                return next(stream)
            except StopIteration:
                return None

        try:
            return _run_web(args, poser, image, converter, next_blend, is_mediapipe)
        finally:
            if receiver is not None:
                receiver.close()

    from collections import deque as _deque
    from concurrent.futures import ThreadPoolExecutor

    fps_meter = FpsMeter()
    last_pose = None
    last_frame = None  # last fetched frame, numpy HWC (batch stripped)
    frame_count = 0
    fetched_count = 0
    latencies = []
    # Pipelined frame fetches (the reference loop is serial,
    # character_model_ifacialmocap_puppeteer.py:308-373).  On this workload
    # device compute is ~3 ms/frame while the host<->device round-trip of
    # the 1 MB frame fetch is ~60 ms, so the FETCH is the serial bottleneck
    # — plain double-buffering (overlap fetch with compute) buys nothing.
    # What does overlap is the transfers themselves: concurrent np.asarray
    # fetches of distinct device buffers multiplex on the link (measured
    # 62 -> 25 ms/frame aggregate at 4 threads on the tunnel-attached
    # chip), so the pipeline runs `depth` fetches in a thread pool.
    # Dispatch stays on the main thread (async, ~2 ms).
    depth = 1 if args.no_pipeline else 4
    inflight = _deque()  # (ndarray-future | device buffer, t_dispatch, index)
    fetch_pool = ThreadPoolExecutor(max_workers=depth) if depth > 1 else None

    # Display encode (straight alpha + linear->sRGB + uint8 pack) runs ON
    # DEVICE so the per-frame fetch is 1 MB of bytes, not 4 MB of floats —
    # the interactive path is fetch-bandwidth-bound on a tunnel-attached
    # chip.  Same placement as the reference's GPU postprocess
    # (character_model_ifacialmocap_puppeteer.py:325-349).  The batch dim is
    # stripped inside the jitted program so the fetch is exactly the frame.
    encode_u8 = jax.jit(lambda x: imagecodec.encode_display_u8(x)[0])

    def _dispatch(pose, index):
        dev = encode_u8(poser.pose(image, np.asarray(pose, np.float32)))
        t0 = time.perf_counter()
        # The full-frame fetch is both the completion barrier and the real
        # consumer cost (a display client reads every pixel); on tunneled
        # backends block_until_ready can return before the device finishes,
        # under-reporting latency ~100x.
        item = fetch_pool.submit(np.asarray, dev) if fetch_pool is not None else dev
        inflight.append((item, t0, index))

    def _consume():
        nonlocal last_frame, fetched_count
        item, t0, index = inflight.popleft()
        last_frame = item.result() if fetch_pool is not None else np.asarray(item)
        latencies.append(time.perf_counter() - t0)
        fetched_count += 1
        if args.output_dir is not None:
            imagecodec.save_image_u8_hwc(last_frame, f"{args.output_dir}/frame_{index:06d}.png")

    # Warm up compilation before timing.
    warm_blend = next(synthetic_blendshape_stream(1))
    if is_mediapipe:
        from tha4_tpu.mocap.mediapipe_face_pose import MediaPipeFacePose

        warm = converter.convert(MediaPipeFacePose(warm_blend, None))
    else:
        warm = converter.convert(warm_blend)
    encode_u8(poser.pose(image, np.asarray(warm, np.float32))).block_until_ready()

    calibrated = False
    t_loop_start = time.perf_counter()
    try:
        while args.frames == 0 or frame_count < args.frames:
            if args.source == "udp":
                blend = receiver.read_pose()
                if blend is None:
                    time.sleep(0.005)
                    continue
            elif mp_stream is not None:
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
                    blend = next(file_stream if file_stream is not None else synthetic)
                except StopIteration:
                    break

            frame_count += 1
            pose = converter.convert(blend)
            if last_pose is None or pose != last_pose:
                _dispatch(pose, frame_count)
                last_pose = pose
            # else: pose-equality short-circuit (reference :311-313) — no
            # new dispatch; the display keeps showing last_frame.
            while len(inflight) >= depth:
                _consume()

            fps = fps_meter.tick()
            if not args.benchmark and fps is not None and frame_count % 100 == 0:
                print(f"frame {frame_count}: {fps:.1f} fps")
        while inflight:  # drain the pipeline
            _consume()
    except KeyboardInterrupt:
        pass
    finally:
        if fetch_pool is not None:
            fetch_pool.shutdown(wait=False)
        if receiver is not None:
            receiver.close()

    if args.benchmark and latencies:
        wall = time.perf_counter() - t_loop_start
        lat = np.asarray(latencies[1:]) * 1000.0
        print(
            f"frames={frame_count} rendered={fetched_count} "
            f"latency mean={lat.mean():.2f}ms p50={np.percentile(lat, 50):.2f}ms "
            f"p99={np.percentile(lat, 99):.2f}ms "
            f"throughput={fetched_count / wall:.1f} fps "
            f"(pipeline depth {depth})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
