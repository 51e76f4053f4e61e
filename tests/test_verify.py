"""tha4-verify end-to-end with reduced-size random-weight stand-ins.

The command is the "when the real data/tha4/*.pt files appear, verify
everything" path (VERDICT round-2 item 5); CI can't have the real weights,
so this drives the identical code path on a temp data dir populated with
small reference torch modules saved in the reference's own state-dict
format (the same stand-in strategy as tests/test_teacher_poser_parity.py).
"""

import dataclasses
import json
import os
import shutil

import numpy as np
import pytest
import torch

from tests.conftest import add_reference_to_path, reference_available

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not reference_available(), reason="reference not mounted")]  # slow: tha4-verify end-to-end harness (teacher forwards)

LAMBDA_00 = "/root/reference/data/character_models/lambda_00"

START = 8
MAXCH = 32
NBOT = 1


def _small_teacher_cfg():
    from tha4_tpu.models import body_morpher as bm
    from tha4_tpu.models import eyebrow as eb
    from tha4_tpu.models import face_morpher as fm
    from tha4_tpu.models import unet
    from tha4_tpu.models import upscaler as up
    from tha4_tpu.poser.modes import mode_07

    small_unet = unet.UnetConfig(
        in_channels=4, out_channels=7, model_channels=8,
        level_channel_multipliers=(1, 2, 2), level_use_attention=(False, False, True),
        num_res_blocks_per_level=1, num_middle_res_blocks=2,
        time_embedding_channels=None, cond_input_channels=6, cond_internal_channels=16,
        attention=unet.AttentionConfig(num_heads=2, use_new_attention_order=True),
        dropout_prob=0.0,
    )
    return mode_07.TeacherConfig(
        eyebrow_decomposer=eb.EyebrowDecomposerConfig(
            start_channels=START, num_bottleneck_blocks=NBOT, max_channels=MAXCH),
        eyebrow_combiner=eb.EyebrowCombinerConfig(
            start_channels=START, num_bottleneck_blocks=NBOT, max_channels=MAXCH),
        face_morpher=fm.FaceMorpherConfig(
            start_channels=START, num_bottleneck_blocks=NBOT, max_channels=MAXCH),
        body_morpher=dataclasses.replace(bm.BodyMorpherConfig(), unet=small_unet),
        upscaler=dataclasses.replace(up.UpscalerConfig(), unet=small_unet),
    )


@pytest.fixture(scope="module")
def standin_data_dir(tmp_path_factory):
    """A reference-layout data dir: small random teacher .pt files (written
    through the REFERENCE module classes so the state-dict format is
    authentic), a pose_dataset.pt, images, and the shipped student model."""
    add_reference_to_path()
    data_dir = tmp_path_factory.mktemp("data")
    (data_dir / "tha4").mkdir()
    (data_dir / "images").mkdir()

    from tha4_tpu.apps import verify
    from tha4_tpu.poser.modes import mode_07

    cfg = _small_teacher_cfg()
    torch.manual_seed(7)
    files = {
        key: str(data_dir / "tha4" / os.path.basename(path))
        for key, path in mode_07.DEFAULT_TEACHER_FILES.items()
    }

    # Build the modules through the command's OWN args mapping (so the
    # mapping itself is under test), damp the grid/color heads to the
    # realistic small regime (see test_teacher_poser_parity.py), and save
    # authentic reference-format state dicts.
    modules = verify._construct_reference_modules(cfg)
    with torch.no_grad():
        modules["eyebrow_morphing_combiner"].morphed_eyebrow_layer_grid_change.weight.normal_(0, 0.02)
        modules["face_morpher"].iris_mouth_grid_change.weight.normal_(0, 0.02)
        for name in ("body_morpher", "upscaler"):
            modules[name].body.last[2].weight.normal_(0, 0.01)
            modules[name].body.last[2].bias.normal_(0, 0.01)
        modules["upscaler"].coarse_image_conv.weight.normal_(0, 0.05)
        modules["upscaler"].coarse_image_conv.bias.normal_(0, 0.05)

    for key, path in files.items():
        torch.save(modules[key].state_dict(), path)  # KEY_* == loader names

    # pose_dataset.pt: 64 schema-valid rows in the reference file format.
    from tha4_tpu.utils import fidelity

    torch.save(torch.from_numpy(fidelity.random_pose_suite(64, seed=5)),
               str(data_dir / "pose_dataset.pt"))

    # Images + the shipped student character model.
    shutil.copytree(LAMBDA_00, data_dir / "character_models" / "lambda_00")
    shutil.copy("/root/reference/data/images/lambda_00_face_mask.png", data_dir / "images")
    return data_dir, cfg


def test_verify_all_checks_pass(standin_data_dir, capsys):
    from tha4_tpu.apps import verify

    data_dir, cfg = standin_data_dir
    rc = verify.main(
        ["--data-dir", str(data_dir), "--poses", "2", "--examples", "64",
         "--int8-cal-poses", "2"],
        teacher_cfg=cfg,
    )
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    checks = summary["checks"]
    assert rc == 0, checks
    assert checks["teacher weight conversion"]["status"] == "ok"
    assert checks["golden render (mode_07 vs torch reference)"]["status"] == "ok"
    assert checks["int8 teacher fidelity"]["status"] == "ok"
    assert checks["int8 teacher fidelity"]["recommend"] in ("on", "off")
    assert checks["int8 teacher fidelity"]["convs_quantized"] > 0
    assert checks["pose dataset"]["status"] == "ok"
    assert checks["pose dataset"]["rows"] == 64
    assert checks["distill smoke (loss decrease)"]["status"] == "ok"
    assert (checks["distill smoke (loss decrease)"]["loss_after"]
            < checks["distill smoke (loss decrease)"]["loss_before"])
    assert checks["student fidelity eval (tha4-eval)"]["status"] == "ok"
    assert checks["student fidelity eval (tha4-eval)"]["psnr_min"] > 60.0


def test_verify_reports_missing_files(tmp_path, capsys):
    """Placeholder bundle (no real .pt files): exit 2 + per-file report."""
    from tha4_tpu.apps import verify

    (tmp_path / "tha4").mkdir()
    rc = verify.main(["--data-dir", str(tmp_path), "--skip-distill"])
    assert rc == 2
    out = capsys.readouterr().out
    assert "MISSING" in out


def test_verify_detects_unloadable_file(tmp_path, capsys):
    from tha4_tpu.apps import verify

    (tmp_path / "tha4").mkdir()
    for name in ("eyebrow_decomposer", "eyebrow_morphing_combiner", "face_morpher",
                 "body_morpher", "upscaler"):
        (tmp_path / "tha4" / f"{name}.pt").write_bytes(b"placeholder")
    rc = verify.main(["--data-dir", str(tmp_path), "--skip-distill"])
    assert rc == 2
    report = verify.check_torch_files(str(tmp_path))
    assert all("unloadable" in v["status"] for v in report.values())
