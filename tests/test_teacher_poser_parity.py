"""End-to-end teacher pipeline parity: our jitted mode_07/mode_12 vs the
reference FiveStepPoserComputationProtocol, using small random teachers
(shipped teacher weights are not bundled).

This is the test that locks the crop tables, paste coordinates, resize hops
and the 33-output ordering (SURVEY.md section 3.1).
"""

import dataclasses

import numpy as np
import pytest
import torch

from tests.conftest import add_reference_to_path, reference_available

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not reference_available(), reason="reference not mounted")]  # slow: torch-oracle full-poser parity

START = 8
MAXCH = 32
NBOT = 2


@pytest.fixture(scope="module", autouse=True)
def _refpath():
    # The oracle is the reference verbatim — no patching.  (Round 1 shimmed
    # reference qkv_attention's .view with .reshape out of contiguity
    # caution; verified unnecessary under this torch: `q * scale`
    # materializes a contiguous tensor, so the .view always succeeds.)
    add_reference_to_path()


def _block_args():
    from tha4.nn.nonlinearity_factory import ReLUFactory
    from tha4.nn.normalization import InstanceNorm2dFactory
    from tha4.nn.util import BlockArgs

    return BlockArgs(
        initialization_method="he",
        use_spectral_norm=False,
        normalization_layer_factory=InstanceNorm2dFactory(),
        nonlinearity_factory=ReLUFactory(inplace=True),
    )


def _small_unet_args():
    from tha4.nn.common.unet import AttentionBlockArgs, UnetArgs

    return UnetArgs(
        in_channels=4, out_channels=7, model_channels=8,
        level_channel_multipliers=[1, 2, 2], level_use_attention=[False, False, True],
        num_res_blocks_per_level=1, num_middle_res_blocks=2,
        time_embedding_channels=None, cond_input_channels=6, cond_internal_channels=16,
        attention_block_args=AttentionBlockArgs(num_heads=2, use_new_attention_order=True),
        dropout_prob=0.0,
    )


def _small_unet_cfg():
    from tha4_tpu.models import unet

    return unet.UnetConfig(
        in_channels=4, out_channels=7, model_channels=8,
        level_channel_multipliers=(1, 2, 2), level_use_attention=(False, False, True),
        num_res_blocks_per_level=1, num_middle_res_blocks=2,
        time_embedding_channels=None, cond_input_channels=6, cond_internal_channels=16,
        attention=unet.AttentionConfig(num_heads=2, use_new_attention_order=True),
        dropout_prob=0.0,
    )


@pytest.fixture(scope="module")
def small_torch_teacher():
    """The five reference modules at reduced width (full image geometry)."""
    from tha4.nn.common.unet import UnetArgs
    from tha4.nn.eyebrow_decomposer.eyebrow_decomposer_00 import (
        EyebrowDecomposer00, EyebrowDecomposer00Args,
    )
    from tha4.nn.eyebrow_morphing_combiner.eyebrow_morphing_combiner_00 import (
        EyebrowMorphingCombiner00, EyebrowMorphingCombiner00Args,
    )
    from tha4.nn.face_morpher.face_morpher_08 import FaceMorpher08, FaceMorpher08Args
    from tha4.nn.morpher.morpher_00 import Morpher00, Morpher00Args
    from tha4.nn.upscaler.upscaler_02 import Upscaler02, Upscaler02Args

    torch.manual_seed(7)
    ba = _block_args()
    dec = EyebrowDecomposer00(EyebrowDecomposer00Args(
        image_size=128, image_channels=4, start_channels=START, bottleneck_image_size=16,
        num_bottleneck_blocks=NBOT, max_channels=MAXCH, block_args=ba))
    comb = EyebrowMorphingCombiner00(EyebrowMorphingCombiner00Args(
        image_size=128, image_channels=4, num_pose_params=12, start_channels=START,
        bottleneck_image_size=16, num_bottleneck_blocks=NBOT, max_channels=MAXCH, block_args=ba))
    face = FaceMorpher08(FaceMorpher08Args(
        image_size=192, image_channels=4, num_expression_params=27, start_channels=START,
        bottleneck_image_size=24, num_bottleneck_blocks=NBOT, max_channels=MAXCH,
        block_args=_block_args(), output_iris_mouth_grid_change=True))
    body = Morpher00(Morpher00Args(
        image_size=256, image_channels=4, num_pose_parameters=6, unet_args=_small_unet_args()))
    ups = Upscaler02(Upscaler02Args(
        image_size=512, image_channels=4, num_pose_parameters=6, unet_args=_small_unet_args()))
    with torch.no_grad():
        comb.morphed_eyebrow_layer_grid_change.weight.normal_(0, 0.02)
        face.iris_mouth_grid_change.weight.normal_(0, 0.02)
        for m in (body, ups):
            m.body.last[2].weight.normal_(0, 0.01)
            m.body.last[2].bias.normal_(0, 0.01)
        ups.coarse_image_conv.weight.normal_(0, 0.05)
        ups.coarse_image_conv.bias.normal_(0, 0.05)
    for m in (dec, comb, face, body, ups):
        m.eval()
    return dec, comb, face, body, ups


@pytest.fixture(scope="module")
def our_cfg_params(small_torch_teacher):
    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import body_morpher as bm
    from tha4_tpu.models import eyebrow as eb
    from tha4_tpu.models import face_morpher as fm
    from tha4_tpu.models import upscaler as up
    from tha4_tpu.poser.modes import mode_07

    dec, comb, face, body, ups = small_torch_teacher
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}

    cfg = mode_07.TeacherConfig(
        eyebrow_decomposer=eb.EyebrowDecomposerConfig(
            start_channels=START, num_bottleneck_blocks=NBOT, max_channels=MAXCH),
        eyebrow_combiner=eb.EyebrowCombinerConfig(
            start_channels=START, num_bottleneck_blocks=NBOT, max_channels=MAXCH),
        face_morpher=fm.FaceMorpherConfig(
            start_channels=START, num_bottleneck_blocks=NBOT, max_channels=MAXCH),
        body_morpher=dataclasses.replace(bm.BodyMorpherConfig(), unet=_small_unet_cfg()),
        upscaler=dataclasses.replace(up.UpscalerConfig(), unet=_small_unet_cfg()),
    )
    params = {
        mode_07.KEY_EYEBROW_DECOMPOSER: tw.convert_eyebrow_decomposer(sd(dec)),
        mode_07.KEY_EYEBROW_MORPHING_COMBINER: tw.convert_eyebrow_morphing_combiner(sd(comb)),
        mode_07.KEY_FACE_MORPHER: tw.convert_face_morpher_08(sd(face)),
        mode_07.KEY_BODY_MORPHER: tw.convert_morpher_00(sd(body), cfg.body_morpher.unet),
        mode_07.KEY_UPSCALER: tw.convert_upscaler_02(sd(ups), cfg.upscaler.unet),
    }
    return cfg, params


def test_mode_07_full_pipeline_parity(rng, small_torch_teacher, our_cfg_params):
    from tha4.poser.general_poser_02 import GeneralPoser02
    from tha4.poser.modes.mode_07 import FiveStepPoserComputationProtocol
    from tha4.poser.modes.pose_parameters import get_pose_parameters as ref_get_pp

    from tha4_tpu.poser.modes import mode_07

    dec, comb, face, body, ups = small_torch_teacher
    ref_poser = GeneralPoser02(
        image_size=512,
        module_loaders={
            "eyebrow_decomposer": lambda: dec,
            "eyebrow_morphing_combiner": lambda: comb,
            "face_morpher": lambda: face,
            "body_morpher": lambda: body,
            "upscaler": lambda: ups,
        },
        pose_parameters=ref_get_pp().get_pose_parameter_groups(),
        output_list_func=FiveStepPoserComputationProtocol(2).compute_func(),
        subrect=None,
        device=torch.device("cpu"),
        output_length=33,
    )

    cfg, params = our_cfg_params
    our_poser = mode_07.create_poser(params=params, cfg=cfg)
    assert our_poser.get_output_length() == 33

    from tha4_tpu.core import imagecodec

    image = imagecodec.load_image_hwc(
        "/root/reference/data/character_models/lambda_00/character.png"
    )[None]
    pose = rng.uniform(0, 1, (1, 45)).astype(np.float32)
    pose[:, 35:42] = rng.uniform(-1, 1, (1, 7))

    ours = our_poser.get_posing_outputs(image, pose)
    with torch.no_grad():
        theirs = ref_poser.get_posing_outputs(
            torch.from_numpy(np.transpose(image[0], (2, 0, 1))), torch.from_numpy(pose[0])
        )
    assert len(ours) == len(theirs) == 33
    # With *random* teacher weights, untrained InstanceNorm nets are chaotic:
    # ~1e-5 fp32 differences amplify multiplicatively through the 5-network
    # chain, and random grid fields warp across image edges.  Stage-local
    # parity is covered at <=1e-4 by test_teacher_nets.py; here we lock the
    # DAG wiring (crops, pastes, resizes, output order) with stage-appropriate
    # PSNR floors.  The U-Net grid/color heads are damped to sigma=0.01 in the
    # fixture (the shipped heads are zero-init + training, so small heads are
    # the realistic regime), which keeps the warp from amplifying float noise
    # across texel edges: the five user-facing final outputs then measure
    # 48-105 dB (floors at 40, ~8 dB of seed margin), vs 28-dB floors when
    # the heads were sigma=0.05 (round-1 review: weakest-locked tensors).
    floors = [40.0] * 5 + [65.0] * 6 + [58.0] * 8 + [80.0] * 8 + [100.0] * 6
    psnrs = []
    for i, (o, t) in enumerate(zip(ours, theirs)):
        o = np.asarray(o)
        t = t.permute(0, 2, 3, 1).numpy()
        assert o.shape == t.shape, f"output {i}: {o.shape} vs {t.shape}"
        d = np.abs(o - t)
        mse = float((d * d).mean())
        psnr = 10 * np.log10(4.0 / mse) if mse > 0 else 200.0
        psnrs.append(psnr)
    print("PSNR profile:", [round(p, 1) for p in psnrs])
    for i, psnr in enumerate(psnrs):
        assert psnr > floors[i], f"output {i}: psnr {psnr:.1f}"
    assert np.mean(psnrs) > 85.0


def test_mode_12_face_pipeline_parity(rng, small_torch_teacher, our_cfg_params):
    from tha4.poser.general_poser_02 import GeneralPoser02
    from tha4.poser.modes.mode_12 import FiveStepPoserComputationProtocol as FaceProtocol
    from tha4.poser.modes.pose_parameters import get_pose_parameters as ref_get_pp

    from tha4_tpu.poser.modes import mode_07 as m07
    from tha4_tpu.poser.modes import mode_12

    dec, comb, face, _, _ = small_torch_teacher
    ref_poser = GeneralPoser02(
        image_size=512,
        module_loaders={
            "eyebrow_decomposer": lambda: dec,
            "eyebrow_morphing_combiner": lambda: comb,
            "face_morpher": lambda: face,
        },
        pose_parameters=ref_get_pp().get_pose_parameter_groups(),
        output_list_func=FaceProtocol(2).compute_func(),
        subrect=None,
        device=torch.device("cpu"),
        output_length=22,
    )

    cfg7, params7 = our_cfg_params
    cfg = mode_12.FaceTeacherConfig(
        eyebrow_decomposer=cfg7.eyebrow_decomposer,
        eyebrow_combiner=cfg7.eyebrow_combiner,
        face_morpher=cfg7.face_morpher,
    )
    params = {k: params7[k] for k in (m07.KEY_EYEBROW_DECOMPOSER, m07.KEY_EYEBROW_MORPHING_COMBINER, m07.KEY_FACE_MORPHER)}
    our_poser = mode_12.create_poser(params=params, cfg=cfg)
    assert our_poser.get_output_length() == 22

    from tha4_tpu.core import imagecodec

    image = imagecodec.load_image_hwc(
        "/root/reference/data/character_models/lambda_00/character.png"
    )[None]
    pose = rng.uniform(0, 1, (1, 45)).astype(np.float32)

    ours = our_poser.get_posing_outputs(image, pose)
    with torch.no_grad():
        theirs = ref_poser.get_posing_outputs(
            torch.from_numpy(np.transpose(image[0], (2, 0, 1))), torch.from_numpy(pose[0])
        )
    assert len(ours) == len(theirs) == 22
    floors = [50.0] * 8 + [70.0] * 8 + [90.0] * 6  # see mode_07 test comment
    for i, (o, t) in enumerate(zip(ours, theirs)):
        o = np.asarray(o)
        t = t.permute(0, 2, 3, 1).numpy()
        d = np.abs(o - t)
        mse = float((d * d).mean())
        psnr = 10 * np.log10(4.0 / mse) if mse > 0 else 200.0
        assert psnr > floors[i], f"output {i}: psnr {psnr:.1f}, max {d.max():.2e}"


def test_mode_07_prologue_cache_equals_fresh_compute(rng, our_cfg_params):
    """The image-keyed eyebrow-decomposer cache (reference mode_07.py:54-70)
    must be outcome-invisible: posing twice with the same image object (cache
    hit on frame 2) gives bit-identical outputs to a fresh poser, and the
    prologue runs once."""
    from tha4_tpu.core import imagecodec
    from tha4_tpu.poser.modes import mode_07

    cfg, params = our_cfg_params
    image = imagecodec.load_image_hwc(
        "/root/reference/data/character_models/lambda_00/character.png"
    )[None]
    pose_a = rng.uniform(0, 1, (1, 45)).astype(np.float32)
    pose_b = rng.uniform(0, 1, (1, 45)).astype(np.float32)

    poser = mode_07.create_poser(params=params, cfg=cfg)
    out_a = poser.get_posing_outputs(image, pose_a)
    out_b = poser.get_posing_outputs(image, pose_b)  # cache hit
    assert poser.prologue_cache_misses == 1

    fresh = mode_07.create_poser(params=params, cfg=cfg)
    out_b_fresh = fresh.get_posing_outputs(image, pose_b)
    for i, (x, y) in enumerate(zip(out_b, out_b_fresh)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=f"output {i}")
    # And the decomposer outputs (tail 6) reflect the image, not garbage.
    assert np.isfinite(np.asarray(out_a[-6])).all()


def test_mode_07_subrect_parity_vs_reference(rng, small_torch_teacher, our_cfg_params):
    """GeneralPoser subrect == reference GeneralPoser02 subrect
    (reference general_poser_02.py:63-79): pose a 512x512 sub-rectangle of a
    bigger canvas; both frameworks must pick the same pixels."""
    from tha4.poser.general_poser_02 import GeneralPoser02
    from tha4.poser.modes.mode_07 import FiveStepPoserComputationProtocol
    from tha4.poser.modes.pose_parameters import get_pose_parameters as ref_get_pp

    from tha4_tpu.core import imagecodec
    from tha4_tpu.poser.modes import mode_07

    dec, comb, face, body, ups = small_torch_teacher
    subrect = ((100, 612), (37, 549))
    ref_poser = GeneralPoser02(
        image_size=512,
        module_loaders={
            "eyebrow_decomposer": lambda: dec,
            "eyebrow_morphing_combiner": lambda: comb,
            "face_morpher": lambda: face,
            "body_morpher": lambda: body,
            "upscaler": lambda: ups,
        },
        pose_parameters=ref_get_pp().get_pose_parameter_groups(),
        output_list_func=FiveStepPoserComputationProtocol(2).compute_func(),
        subrect=subrect,
        device=torch.device("cpu"),
        output_length=33,
    )
    cfg, params = our_cfg_params
    our_poser = mode_07.create_poser(params=params, cfg=cfg, subrect=subrect)

    char = imagecodec.load_image_hwc(
        "/root/reference/data/character_models/lambda_00/character.png"
    )
    # 768x768 canvas with the character pasted at the subrect origin.
    canvas = np.tile(rng.uniform(-1, 1, (1, 1, 4)).astype(np.float32), (768, 768, 1))
    canvas[100:612, 37:549] = char
    pose = rng.uniform(0, 1, (1, 45)).astype(np.float32)
    pose[:, 35:42] = rng.uniform(-1, 1, (1, 7))

    ours = our_poser.get_posing_outputs(canvas[None], pose)
    with torch.no_grad():
        theirs = ref_poser.get_posing_outputs(
            torch.from_numpy(np.transpose(canvas, (2, 0, 1))), torch.from_numpy(pose[0])
        )
    assert len(ours) == len(theirs) == 33
    # Same stage-appropriate floors as the full-pipeline parity test.
    floors = [40.0] * 5 + [65.0] * 6 + [58.0] * 8 + [80.0] * 8 + [100.0] * 6
    for i, (o, t) in enumerate(zip(ours, theirs)):
        o = np.asarray(o)
        t = t.permute(0, 2, 3, 1).numpy()
        assert o.shape == t.shape, f"output {i}: {o.shape} vs {t.shape}"
        mse = float(((o - t) ** 2).mean())
        psnr = 10 * np.log10(4.0 / mse) if mse > 0 else 200.0
        assert psnr > floors[i], f"output {i}: psnr {psnr:.1f}"
    # And identical to posing the hand-cropped canvas without subrect.
    plain = mode_07.create_poser(params=params, cfg=cfg)
    direct = plain.get_posing_outputs(np.ascontiguousarray(canvas[100:612, 37:549])[None], pose)
    for i, (x, y) in enumerate(zip(ours, direct)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=f"output {i}")
