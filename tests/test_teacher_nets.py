"""Teacher network parity vs the reference torch implementation.

The shipped teacher weights (data/tha4/*.pt) are not in the bundle, so these
tests instantiate the reference modules with random weights (small configs
for speed), convert the state dict, and compare outputs numerically.
"""

import numpy as np
import pytest
import torch

from tests.conftest import add_reference_to_path, reference_available

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not reference_available(), reason="reference not mounted")]  # slow: torch-oracle teacher parity sweeps


@pytest.fixture(scope="module", autouse=True)
def _refpath():
    add_reference_to_path()
    # The reference targets torch 1.13, where `(q * scale).view(...)` on a
    # chunked tensor produced a contiguous result; torch 2.x keeps the view
    # non-contiguous and .view raises. Patch the oracle with the equivalent
    # .reshape formulation (identical values).
    import math

    import tha4.nn.common.unet as refunet

    def qkv_attention_fixed(qkv, num_heads):
        B, W, L = qkv.shape
        H = num_heads
        C = W // (3 * H)
        q, k, v = qkv.chunk(3, dim=1)
        scale = 1.0 / math.sqrt(math.sqrt(C))
        weight = torch.einsum(
            "bct,bcs->bts", (q * scale).reshape(B * H, C, L), (k * scale).reshape(B * H, C, L)
        )
        weight = torch.softmax(weight, dim=-1)
        output = torch.einsum("bts,bcs->bct", weight, v.reshape(B * H, C, L))
        return output.reshape(B, H * C, L)

    refunet.qkv_attention = qkv_attention_fixed


def _small_block_args():
    from tha4.nn.nonlinearity_factory import ReLUFactory
    from tha4.nn.normalization import InstanceNorm2dFactory
    from tha4.nn.util import BlockArgs

    return BlockArgs(
        initialization_method="he",
        use_spectral_norm=False,
        normalization_layer_factory=InstanceNorm2dFactory(),
        nonlinearity_factory=ReLUFactory(inplace=True),
    )


def test_eyebrow_decomposer_parity(rng):
    import jax.numpy as jnp

    from tha4.nn.eyebrow_decomposer.eyebrow_decomposer_00 import (
        EyebrowDecomposer00,
        EyebrowDecomposer00Args,
    )

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import eyebrow

    torch.manual_seed(0)
    ref = EyebrowDecomposer00(
        EyebrowDecomposer00Args(
            image_size=32, image_channels=4, start_channels=8, bottleneck_image_size=8,
            num_bottleneck_blocks=3, max_channels=32, block_args=_small_block_args(),
        )
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tw.convert_eyebrow_decomposer(sd)
    cfg = eyebrow.EyebrowDecomposerConfig(
        image_size=32, start_channels=8, bottleneck_image_size=8, num_bottleneck_blocks=3, max_channels=32
    )

    x = rng.standard_normal((2, 32, 32, 4)).astype(np.float32)
    ours = eyebrow.eyebrow_decomposer_apply(cfg, params, jnp.asarray(x))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(ours) == len(theirs) == 6
    for i, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(np.asarray(o), t.permute(0, 2, 3, 1).numpy(), atol=2e-5, err_msg=f"out {i}")


def test_eyebrow_combiner_parity(rng):
    import jax.numpy as jnp

    from tha4.nn.eyebrow_morphing_combiner.eyebrow_morphing_combiner_00 import (
        EyebrowMorphingCombiner00,
        EyebrowMorphingCombiner00Args,
    )

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import eyebrow

    torch.manual_seed(1)
    ref = EyebrowMorphingCombiner00(
        EyebrowMorphingCombiner00Args(
            image_size=32, image_channels=4, num_pose_params=12, start_channels=8,
            bottleneck_image_size=8, num_bottleneck_blocks=3, max_channels=32,
            block_args=_small_block_args(),
        )
    ).eval()
    # The grid-change head is zero-init; give it real values so the warp path
    # is actually exercised.
    with torch.no_grad():
        ref.morphed_eyebrow_layer_grid_change.weight.normal_(0, 0.02)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tw.convert_eyebrow_morphing_combiner(sd)
    cfg = eyebrow.EyebrowCombinerConfig(
        image_size=32, start_channels=8, bottleneck_image_size=8, num_bottleneck_blocks=3, max_channels=32
    )

    bg = rng.standard_normal((2, 32, 32, 4)).astype(np.float32)
    eb = rng.standard_normal((2, 32, 32, 4)).astype(np.float32)
    pose = rng.uniform(0, 1, (2, 12)).astype(np.float32)
    ours = eyebrow.eyebrow_combiner_apply(cfg, params, jnp.asarray(bg), jnp.asarray(eb), jnp.asarray(pose))
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(bg).permute(0, 3, 1, 2),
            torch.from_numpy(eb).permute(0, 3, 1, 2),
            torch.from_numpy(pose),
        )
    assert len(ours) == len(theirs) == 8
    for i, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(np.asarray(o), t.permute(0, 2, 3, 1).numpy(), atol=5e-5, err_msg=f"out {i}")


def test_face_morpher_parity(rng):
    import jax.numpy as jnp

    from tha4.nn.face_morpher.face_morpher_08 import FaceMorpher08, FaceMorpher08Args

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import face_morpher

    torch.manual_seed(2)
    ref = FaceMorpher08(
        FaceMorpher08Args(
            image_size=48, image_channels=4, num_expression_params=27, start_channels=8,
            bottleneck_image_size=6, num_bottleneck_blocks=3, max_channels=32,
            block_args=_small_block_args(), output_iris_mouth_grid_change=True,
        )
    ).eval()
    with torch.no_grad():
        ref.iris_mouth_grid_change.weight.normal_(0, 0.02)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tw.convert_face_morpher_08(sd)
    cfg = face_morpher.FaceMorpherConfig(
        image_size=48, start_channels=8, bottleneck_image_size=6, num_bottleneck_blocks=3, max_channels=32
    )

    x = rng.standard_normal((2, 48, 48, 4)).astype(np.float32)
    pose = rng.uniform(0, 1, (2, 27)).astype(np.float32)
    ours = face_morpher.apply(cfg, params, jnp.asarray(x), jnp.asarray(pose))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(pose))
    assert len(ours) == len(theirs) == 8
    for i, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(np.asarray(o), t.permute(0, 2, 3, 1).numpy(), atol=2e-4, err_msg=f"out {i}")


def _small_unet_args(use_new_attention_order=True):
    from tha4.nn.common.unet import AttentionBlockArgs, UnetArgs

    return UnetArgs(
        in_channels=4,
        out_channels=7,
        model_channels=8,
        level_channel_multipliers=[1, 2, 2],
        level_use_attention=[False, False, True],
        num_res_blocks_per_level=1,
        num_middle_res_blocks=2,
        time_embedding_channels=None,
        cond_input_channels=6,
        cond_internal_channels=16,
        attention_block_args=AttentionBlockArgs(num_heads=2, use_new_attention_order=use_new_attention_order),
        dropout_prob=0.0,
    )


def _small_unet_cfg():
    from tha4_tpu.models import unet

    return unet.UnetConfig(
        in_channels=4,
        out_channels=7,
        model_channels=8,
        level_channel_multipliers=(1, 2, 2),
        level_use_attention=(False, False, True),
        num_res_blocks_per_level=1,
        num_middle_res_blocks=2,
        time_embedding_channels=None,
        cond_input_channels=6,
        cond_internal_channels=16,
        attention=unet.AttentionConfig(num_heads=2, use_new_attention_order=True),
        dropout_prob=0.0,
    )


@pytest.mark.parametrize("packed_flow", [False, True])
@pytest.mark.parametrize("new_order", [True, False])
def test_unet_parity(rng, new_order, packed_flow, monkeypatch):
    """Against the torch oracle, for both the plain NHWC path and the
    end-to-end lane-packed flow (the TPU production formulation)."""
    import dataclasses

    import jax.numpy as jnp

    from tha4.nn.common.unet import Unet

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import unet

    monkeypatch.setenv("THA4_PACKED_FLOW", "force" if packed_flow else "0")
    torch.manual_seed(3)
    ref = Unet(_small_unet_args(new_order)).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = _small_unet_cfg()
    cfg = dataclasses.replace(
        cfg, attention=unet.AttentionConfig(num_heads=2, use_new_attention_order=new_order)
    )
    params = tw.convert_unet(sd, cfg)

    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    t = np.zeros((2, 1), np.float32)
    pose = rng.uniform(-1, 1, (2, 6)).astype(np.float32)
    ours = np.asarray(unet.apply(cfg, params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(pose)))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t), torch.from_numpy(pose))
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), atol=5e-5)


def test_unet_nonzero_t_parity(rng):
    """The vestigial time path still matches for t != 0."""
    import jax.numpy as jnp

    from tha4.nn.common.unet import Unet

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import unet

    torch.manual_seed(4)
    ref = Unet(_small_unet_args()).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = _small_unet_cfg()
    params = tw.convert_unet(sd, cfg)

    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    t = np.full((1, 1), 3.7, np.float32)
    pose = rng.uniform(-1, 1, (1, 6)).astype(np.float32)
    ours = np.asarray(unet.apply(cfg, params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(pose)))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t), torch.from_numpy(pose))
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), atol=5e-5)


def test_morpher_00_parity(rng):
    import jax.numpy as jnp

    from tha4.nn.common.unet import UnetArgs
    from tha4.nn.morpher.morpher_00 import Morpher00, Morpher00Args

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import body_morpher

    torch.manual_seed(5)
    ref = Morpher00(
        Morpher00Args(image_size=16, image_channels=4, num_pose_parameters=6, unet_args=_small_unet_args())
    ).eval()
    # last conv is zero-init -> all outputs would be trivial; randomize it
    with torch.no_grad():
        ref.body.last[2].weight.normal_(0, 0.05)
        ref.body.last[2].bias.normal_(0, 0.05)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    import dataclasses

    cfg = dataclasses.replace(body_morpher.BodyMorpherConfig(), image_size=16, unet=_small_unet_cfg())
    params = tw.convert_morpher_00(sd, cfg.unet)

    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    pose = rng.uniform(-1, 1, (2, 6)).astype(np.float32)
    ours = body_morpher.apply(cfg, params, jnp.asarray(x), jnp.asarray(pose))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(pose))
    assert len(ours) == len(theirs) == 5
    for i, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(np.asarray(o), t.permute(0, 2, 3, 1).numpy(), atol=1e-4, err_msg=f"out {i}")


def test_upscaler_02_parity(rng):
    import dataclasses

    import jax.numpy as jnp

    from tha4.nn.upscaler.upscaler_02 import Upscaler02, Upscaler02Args

    from tha4_tpu.convert import torch_weights as tw
    from tha4_tpu.models import upscaler

    torch.manual_seed(6)
    ref = Upscaler02(
        Upscaler02Args(image_size=16, image_channels=4, num_pose_parameters=6, unet_args=_small_unet_args())
    ).eval()
    with torch.no_grad():
        ref.body.last[2].weight.normal_(0, 0.05)
        ref.body.last[2].bias.normal_(0, 0.05)
        ref.coarse_image_conv.weight.normal_(0, 0.05)
        ref.coarse_image_conv.bias.normal_(0, 0.05)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = dataclasses.replace(upscaler.UpscalerConfig(), image_size=16, unet=_small_unet_cfg())
    params = tw.convert_upscaler_02(sd, cfg.unet)

    rest = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    coarse = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    coarse_grid = (0.1 * rng.standard_normal((1, 16, 16, 2))).astype(np.float32)
    pose = rng.uniform(-1, 1, (1, 6)).astype(np.float32)
    ours = upscaler.apply(
        cfg, params, jnp.asarray(rest), jnp.asarray(coarse), jnp.asarray(coarse_grid), jnp.asarray(pose)
    )
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(rest).permute(0, 3, 1, 2),
            torch.from_numpy(coarse).permute(0, 3, 1, 2),
            torch.from_numpy(np.transpose(coarse_grid, (0, 3, 1, 2))),
            torch.from_numpy(pose),
        )
    assert len(ours) == len(theirs) == 5
    for i, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(np.asarray(o), t.permute(0, 2, 3, 1).numpy(), atol=1e-4, err_msg=f"out {i}")
