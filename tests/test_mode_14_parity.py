"""Golden parity: student pipeline vs the reference torch implementation,
using the shipped lambda_00 weights and character art."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

LAMBDA_00 = "/root/reference/data/character_models/lambda_00"

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


@pytest.fixture(scope="module")
def reference_modules():
    add_reference_to_path()
    from tha4.poser.modes.mode_14 import load_body_morpher, load_face_morpher

    face = load_face_morpher(f"{LAMBDA_00}/face_morpher.pt")
    body = load_body_morpher(f"{LAMBDA_00}/body_morpher.pt")
    face.eval()
    body.eval()
    return face, body


@pytest.fixture(scope="module")
def character_image():
    from tha4_tpu.core import imagecodec

    return imagecodec.load_image_hwc(f"{LAMBDA_00}/character.png")


def _random_pose(rng, n=1):
    pose = rng.uniform(0.0, 1.0, size=(n, 45)).astype(np.float32)
    pose[:, 35:42] = rng.uniform(-1.0, 1.0, size=(n, 7))
    return pose


def test_siren_face_morpher_parity(rng, reference_modules):
    import jax.numpy as jnp
    import torch

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import siren

    face_ref, _ = reference_modules
    pose = _random_pose(rng)[:, 0:39]

    params = tw.convert_siren_face_morpher(tw.load_torch_state_dict(f"{LAMBDA_00}/face_morpher.pt"))
    cfg = siren.SirenFaceMorpherConfig()
    ours = np.asarray(siren.siren_face_morpher_apply(cfg, params, jnp.asarray(pose)))

    with torch.no_grad():
        theirs = face_ref(torch.from_numpy(pose)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_siren_body_morpher_parity(rng, reference_modules, character_image):
    import jax.numpy as jnp
    import torch

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import siren

    _, body_ref = reference_modules
    pose = _random_pose(rng)
    image = character_image[None]  # (1, 512, 512, 4)

    params = tw.convert_siren_morpher(tw.load_torch_state_dict(f"{LAMBDA_00}/body_morpher.pt"))
    cfg = siren.SirenMorpherConfig()
    ours = siren.siren_morpher_apply(cfg, params, jnp.asarray(image), jnp.asarray(pose))

    with torch.no_grad():
        t_img = torch.from_numpy(image).permute(0, 3, 1, 2)
        theirs = body_ref(t_img, torch.from_numpy(pose))

    # Warp amplifies ~1e-4 grid differences across image edges into ~1e-3
    # pixel differences at isolated pixels; PSNR is the right lens there.
    for idx, name, atol in [
        (0, "blended", 2e-3),
        (1, "alpha", 1e-4),
        (2, "color_change", 2e-4),
        (3, "warped", 3e-3),
        (4, "grid_change", 1e-5),
    ]:
        o = np.asarray(ours[idx])
        t = theirs[idx].permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(o, t, atol=atol, err_msg=name)
        mse = float(np.mean((o - t) ** 2))
        if mse > 0:
            psnr = 10 * np.log10(4.0 / mse)
            assert psnr > 90.0, f"{name} PSNR {psnr}"


def test_mode_14_full_pipeline_parity(rng, reference_modules, character_image):
    """End-to-end: crop/paste + both students, vs reference
    TwoStepPoserComputationProtocol semantics (mode_14.py:52-91)."""
    import torch

    from tha4_tpu.poser.modes import mode_14

    face_ref, body_ref = reference_modules
    pose = _random_pose(rng)
    image = character_image[None]

    poser = mode_14.create_poser(
        module_file_names={
            mode_14.KEY_FACE_MORPHER: f"{LAMBDA_00}/face_morpher.pt",
            mode_14.KEY_BODY_MORPHER: f"{LAMBDA_00}/body_morpher.pt",
        }
    )
    assert poser.get_output_length() == 6
    assert poser.get_num_parameters() == 45
    outputs = poser.get_posing_outputs(image, pose)
    assert len(outputs) == 6

    with torch.no_grad():
        t_img = torch.from_numpy(image).permute(0, 3, 1, 2)
        t_pose = torch.from_numpy(pose)
        face_out = face_ref(t_pose[:, 0:39])
        body_in = t_img.clone()
        body_in[:, :, 80:208, 192:320] = face_out
        body_out = body_ref(body_in, t_pose)

    ref_frame = body_out[0].permute(0, 2, 3, 1).numpy()
    our_frame = np.asarray(outputs[0])
    np.testing.assert_allclose(our_frame, ref_frame, atol=2e-3)

    ref_face = face_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(outputs[5]), ref_face, atol=2e-4)

    # PSNR as a robustness metric (BASELINE.md fidelity target)
    mse = float(np.mean((our_frame - ref_frame) ** 2))
    psnr = 10 * np.log10(4.0 / mse)  # signal range [-1, 1]
    assert psnr > 60.0, f"PSNR {psnr}"


def test_bfloat16_production_path_golden(rng, character_image):
    """Numerically lock the PRODUCTION fast path: mode_14 at
    compute_dtype=bfloat16 on the shipped lambda_00 weights vs the f32
    render (itself locked to the torch reference at >60 dB above).

    Measured reality this floor comes from: ~30.5-30.8 dB on the CPU backend
    (bf16 storage rounding), 32.05 dB on the real v5e chip (single-pass bf16
    MXU multiplies; f32 storage at 'default' precision measures the SAME
    32.05 dB, so the error is the MXU input rounding, not storage).  The
    floor sits ~2.5 dB under the weakest measurement; a kernel regression
    that further degrades bf16 numerics fails here.  README quotes the fps
    table against these PSNRs."""
    import jax.numpy as jnp

    from tha4_tpu.charmodel import CharacterModel
    from tha4_tpu.utils import fidelity

    cm = CharacterModel.load(f"{LAMBDA_00}/character_model.yaml")
    poser_f32 = cm.get_poser()
    poser_bf16 = cm.get_poser(compute_dtype=jnp.bfloat16)
    assert poser_f32 is not poser_bf16  # the dtype cache bug regression check

    psnrs, ssims = [], []
    for pose in _random_pose(rng, 3):
        fa = np.asarray(poser_f32.pose(character_image, pose))[0]
        fb = np.asarray(poser_bf16.pose(character_image, pose))[0]
        psnrs.append(fidelity.psnr(fa, fb))
        ssims.append(fidelity.ssim(fa, fb))
    assert min(psnrs) > 28.0, psnrs
    assert min(ssims) > 0.95, ssims


def test_nhwc_and_channels_first_apply_agree(rng, character_image):
    """The training (NHWC) and inference (channels-first) student forwards
    are independent implementations; they must stay numerically equivalent
    (the loss optimizes one, deployment runs the other)."""
    import jax.numpy as jnp

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import siren

    params = tw.convert_siren_morpher(tw.load_torch_state_dict(f"{LAMBDA_00}/body_morpher.pt"))
    cfg = siren.SirenMorpherConfig()
    pose = _random_pose(rng, 2)
    image = np.broadcast_to(character_image[None], (2,) + character_image.shape)

    a = siren.siren_morpher_apply(cfg, params, jnp.asarray(image), jnp.asarray(pose))
    b = siren.siren_morpher_apply_nhwc(cfg, params, jnp.asarray(image), jnp.asarray(pose))
    # The two paths reassociate f32 sums differently (the NHWC path splits
    # each level's first matmul as x@Wx + pos@Wpos + pose@Wpose,
    # models/siren.py _first_sine_linear_split), and the omega0=30 sine chain
    # amplifies the ~1e-7 seed chaotically: a handful of pixels per million
    # land near 1e-3 while the bulk agrees to <2e-4 (an f64 oracle shows BOTH
    # f32 paths sit ~1e-2 from true values on adversarial weights — max-abs
    # across paths is the wrong contract here).  Assert the distribution:
    # tight at the 99.99th percentile, loose on the absolute max.
    for idx in range(5):
        d = np.abs(np.asarray(a[idx], np.float32) - np.asarray(b[idx], np.float32))
        assert np.quantile(d, 0.9999) < 2e-4, f"output {idx}: p99.99 {np.quantile(d, 0.9999)}"
        assert d.max() < 5e-3, f"output {idx}: max {d.max()}"


def test_character_model_load():
    from tha4_tpu.charmodel import CharacterModel

    cm = CharacterModel.load(f"{LAMBDA_00}/character_model.yaml")
    img = cm.get_character_image()
    assert img.shape == (512, 512, 4)
