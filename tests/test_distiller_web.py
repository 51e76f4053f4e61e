"""tha4-distill-config --web: the wx distiller editor as a browser form.

Covers the reference editor's behaviors (src/tha4/distiller/ui/
distiller_ui_main_frame.py): field metadata with the help corpus, validate-
and-save writing <prefix>/config.yaml, RUN starting run_config in-process,
and validation errors surfaced as 400s rather than crashes.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import pytest
import yaml

from tests.conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

CHARACTER = "/root/reference/data/character_models/lambda_00/character.png"
MASK = "/root/reference/data/images/lambda_00_face_mask.png"


@pytest.fixture()
def web_editor():
    from tha4_tpu.apps import distiller_ui

    server, train_state = distiller_ui._make_web_server(0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", train_state
    finally:
        server.shutdown()


def _page_token(base):
    """Extract the per-launch CSRF token from the served page, exactly as the
    in-page JS receives it."""
    page = urllib.request.urlopen(base + "/", timeout=10).read().decode()
    marker = "const TOKEN = '"
    start = page.index(marker) + len(marker)
    return page[start : page.index("'", start)]


def _post(url, payload, token=None, headers=None):
    base = url.rsplit("/", 1)[0]
    req = urllib.request.Request(url, data=json.dumps(payload).encode(), method="POST")
    req.add_header("X-Tha4-Token", token if token is not None else _page_token(base))
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    return urllib.request.urlopen(req, timeout=10)


def test_meta_and_page(web_editor):
    base, _ = web_editor
    page = urllib.request.urlopen(base + "/", timeout=10).read()
    assert b"distiller config" in page

    meta = json.loads(urllib.request.urlopen(base + "/meta", timeout=10).read())
    names = [f["name"] for f in meta["fields"]]
    assert "prefix" in names and "num_gpus" in names
    by_name = {f["name"]: f for f in meta["fields"]}
    # Help corpus wired through (the reference's per-param HTML pages).
    assert "512" in by_name["character_image_file_name"]["help"]
    # Cadence combobox choices (reference main_frame.py:504-529).
    assert by_name["face_morpher_num_training_examples_per_sample_output"]["choices"] == [
        10_000, 100_000, 1_000_000, None]
    # Seed fields flagged for the Randomize button (reference :359-473).
    assert by_name["face_morpher_random_seed_0"]["seed"]
    # Required path fields start blank; numeric defaults are the dataclass's.
    assert by_name["prefix"]["value"] == ""
    assert by_name["face_morpher_batch_size"]["value"] == 8


def test_save_validates_and_writes_yaml(web_editor, tmp_path):
    base, _ = web_editor
    prefix = tmp_path / "job"
    values = {
        "prefix": str(prefix),
        "character_image_file_name": CHARACTER,
        "face_mask_image_file_name": MASK,
        "face_morpher_random_seed_0": "42",
        "body_morpher_batch_size": "4",
        "face_morpher_num_training_examples_per_sample_output": "100000",
        "body_morpher_num_training_examples_per_sample_output": "null",
    }
    resp = _post(base + "/save", values)
    assert resp.status == 200
    path = json.loads(resp.read())["path"]
    with open(path) as f:
        conf = yaml.safe_load(f)
    assert conf["prefix"] == str(prefix)
    assert conf["face_morpher_random_seed_0"] == 42
    assert conf["body_morpher_batch_size"] == 4
    assert conf["face_morpher_num_training_examples_per_sample_output"] == 100_000
    assert conf["body_morpher_num_training_examples_per_sample_output"] is None
    # The yaml round-trips through the strict loader (check() passes).
    from tha4_tpu.distiller.config import DistillerConfig

    DistillerConfig.load(path)


def test_save_absent_cadence_keeps_default(web_editor, tmp_path):
    """A payload without the cadence fields keeps the dataclass default
    (10,000), not null/disabled."""
    base, _ = web_editor
    resp = _post(base + "/save", {
        "prefix": str(tmp_path),
        "character_image_file_name": CHARACTER,
        "face_mask_image_file_name": MASK,
    })
    with open(json.loads(resp.read())["path"]) as f:
        conf = yaml.safe_load(f)
    assert conf["face_morpher_num_training_examples_per_sample_output"] == 10_000
    assert conf["body_morpher_num_training_examples_per_sample_output"] == 10_000


@pytest.mark.parametrize(
    "overrides",
    [
        {"prefix": ""},  # required
        {"character_image_file_name": MASK},  # RGB where RGBA required
        {"face_morpher_batch_size": "99"},  # out of [1, 8]
        {"face_morpher_batch_size": "not-an-int"},
        {"face_morpher_random_seed_0": "-1"},
    ],
)
def test_save_rejects_bad_values(web_editor, tmp_path, overrides):
    base, _ = web_editor
    values = {
        "prefix": str(tmp_path),
        "character_image_file_name": CHARACTER,
        "face_mask_image_file_name": MASK,
    }
    values.update(overrides)
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(base + "/save", values)
    assert exc_info.value.code == 400
    assert json.loads(exc_info.value.read())["error"]


def test_train_runs_config_in_process(web_editor, tmp_path, monkeypatch):
    """RUN = save + run_config in a thread (reference distiller_ui.py:10-13);
    /state reports progress and a second RUN while active is rejected."""
    from tha4_tpu.distiller import pipeline

    base, train_state = web_editor
    started = threading.Event()
    release = threading.Event()
    seen = {}

    def fake_run_config(config):
        seen["prefix"] = config.prefix
        started.set()
        release.wait(timeout=30)

    monkeypatch.setattr(pipeline, "run_config", fake_run_config)
    values = {
        "prefix": str(tmp_path / "job"),
        "character_image_file_name": CHARACTER,
        "face_mask_image_file_name": MASK,
    }
    assert _post(base + "/train", values).status == 200
    assert started.wait(timeout=10)
    assert seen["prefix"] == str(tmp_path / "job")

    state = json.loads(urllib.request.urlopen(base + "/state", timeout=10).read())
    assert state["running"] and not state["done"]

    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(base + "/train", values)
    assert exc_info.value.code == 400
    assert "already active" in json.loads(exc_info.value.read())["error"]

    release.set()
    deadline = time.time() + 10
    while time.time() < deadline:
        state = json.loads(urllib.request.urlopen(base + "/state", timeout=10).read())
        if state["done"]:
            break
        time.sleep(0.1)
    assert state["done"] and state["error"] is None


def test_post_without_token_rejected(web_editor, tmp_path):
    """CSRF defense: a cross-origin 'simple' JSON POST (no custom header, no
    token) must be rejected — loopback binding alone does not stop a
    malicious page in the user's browser from driving /save or /train."""
    base, _ = web_editor
    values = {
        "prefix": str(tmp_path / "evil"),
        "character_image_file_name": CHARACTER,
        "face_mask_image_file_name": MASK,
    }
    for endpoint in ("/save", "/train"):
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(base + endpoint, values, token="")
        assert exc_info.value.code == 403
    assert not (tmp_path / "evil").exists()  # nothing written

    # A stale/guessed token fails too.
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(base + "/save", values, token="0" * 32)
    assert exc_info.value.code == 403


def test_cross_origin_post_rejected_even_with_token(web_editor, tmp_path):
    base, _ = web_editor
    values = {
        "prefix": str(tmp_path / "evil2"),
        "character_image_file_name": CHARACTER,
        "face_mask_image_file_name": MASK,
    }
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(base + "/save", values, headers={"Origin": "http://evil.example"})
    assert exc_info.value.code == 403
    # Our own origin (matching Host) passes.
    resp = _post(base + "/save", values, headers={"Origin": base})
    assert resp.status == 200


def test_meta_serializes_big_seeds_as_strings(web_editor, tmp_path):
    """The 64-bit default seeds exceed JS Number precision (2^53); /meta must
    send them as strings so saving an untouched form round-trips the exact
    dataclass defaults instead of the browser's rounded doubles."""
    from tha4_tpu.distiller.config import DistillerConfig

    base, _ = web_editor
    meta = json.loads(urllib.request.urlopen(base + "/meta", timeout=10).read())
    by_name = {f["name"]: f for f in meta["fields"]}
    default = DistillerConfig.__dataclass_fields__["face_morpher_random_seed_0"].default
    assert default > 2**53  # the hazard this guards is real for the defaults
    assert by_name["face_morpher_random_seed_0"]["value"] == str(default)
    # Small ints stay numbers (the form shows them unquoted either way).
    assert by_name["face_morpher_batch_size"]["value"] == 8

    # Round-trip: save the meta values verbatim (an untouched form).
    values = {f["name"]: f["value"] for f in meta["fields"]}
    values.update({
        "prefix": str(tmp_path / "rt"),
        "character_image_file_name": CHARACTER,
        "face_mask_image_file_name": MASK,
    })
    resp = _post(base + "/save", values)
    with open(json.loads(resp.read())["path"]) as f:
        conf = yaml.safe_load(f)
    assert conf["face_morpher_random_seed_0"] == default


def test_save_oserror_returns_json_500(web_editor, tmp_path, monkeypatch):
    """An OSError from config.save (read-only prefix, disk full) must come
    back as a parseable JSON error, not a dropped connection."""
    from tha4_tpu.distiller.config import DistillerConfig

    def boom(self, path):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(DistillerConfig, "save", boom)
    base, _ = web_editor
    values = {
        "prefix": str(tmp_path / "full"),
        "character_image_file_name": CHARACTER,
        "face_mask_image_file_name": MASK,
    }
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(base + "/save", values)
    assert exc_info.value.code == 500
    assert "No space left" in json.loads(exc_info.value.read())["error"]
