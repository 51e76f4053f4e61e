"""Block-factory parity vs the reference torch modules.

Covers the §2.3 items the round-1 VERDICT flagged as partial: spectral-norm
plumbed through block configs, the learned-scale and 1x1 ResnetBlock
variants, ConvBlockFactory routing (separable + spectral), and the
ResizeConvUNet trunk (reference: src/tha4/nn/common/resize_conv_unet.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.conftest import add_reference_to_path, reference_available
from tests.test_nn_ops import torch_conv_to_hwio
from tha4_tpu.models import resize_conv
from tha4_tpu.ops import blocks as B

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


@pytest.fixture(scope="module", autouse=True)
def _refpath():
    add_reference_to_path()


def _block_args(use_spectral_norm=False):
    from tha4.nn.nonlinearity_factory import ReLUFactory
    from tha4.nn.normalization import InstanceNorm2dFactory
    from tha4.nn.util import BlockArgs

    return BlockArgs(
        initialization_method="he",
        use_spectral_norm=use_spectral_norm,
        normalization_layer_factory=InstanceNorm2dFactory(),
        nonlinearity_factory=ReLUFactory(inplace=False),
    )


def _norm_params(norm):
    with torch.no_grad():
        norm.weight.uniform_(0.5, 1.5)
        norm.bias.uniform_(-0.5, 0.5)
    return {
        "scale": jnp.asarray(norm.weight.detach().numpy()),
        "bias": jnp.asarray(norm.bias.detach().numpy()),
    }


def _sn_conv_params(conv):
    """Params for a torch spectral_norm-wrapped conv: weight_orig + weight_u.
    Copying u before the forward makes one torch train-mode forward and one
    of our applications run the identical power-iteration arithmetic (sigma
    is invariant to the OIHW-vs-HWIO column permutation of the weight
    matrix).

    The .copy() on weight_u is load-bearing: jnp.asarray on the CPU backend
    can alias the numpy view of the torch buffer, and torch's train-mode
    forward updates weight_u IN PLACE (out= kwargs), which would silently
    rewrite our 'captured' u."""
    p = {"w": jnp.asarray(torch_conv_to_hwio(conv.weight_orig).copy())}
    if conv.bias is not None:
        p["b"] = jnp.asarray(conv.bias.detach().numpy().copy())
    p["sn_u"] = jnp.asarray(conv.weight_u.detach().numpy().copy())
    return p


def _nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def _to_torch(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def test_conv3_block_spectral_norm_parity(rng):
    """create_conv3_block_from_block_args(use_spectral_norm=True): the flag
    must actually normalize the weight (reference conv.py:104-114)."""
    from tha4.nn.conv import create_conv3_block_from_block_args

    blk = create_conv3_block_from_block_args(6, 8, _block_args(use_spectral_norm=True))
    conv, norm = blk[0], blk[1]
    cfg = B.BlockConfig(use_spectral_norm=True)
    params = {"conv": _sn_conv_params(conv), "norm": _norm_params(norm)}

    x = rng.standard_normal((2, 16, 16, 6)).astype(np.float32)
    ours = np.asarray(B.apply_conv_block(cfg, params, jnp.asarray(x)))
    blk.train()
    theirs = _nhwc(blk(_to_torch(jnp.asarray(x))))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    # The flag must matter at the conv level.  (At the BLOCK level instance
    # norm cancels the scalar sigma division, so the block output is the
    # same either way — true of the reference too.)
    raw_sn = np.asarray(B.apply_conv3(params["conv"], jnp.asarray(x)))
    params_no_sn = {k: v for k, v in params["conv"].items() if k != "sn_u"}
    raw_plain = np.asarray(B.apply_conv3(params_no_sn, jnp.asarray(x)))
    assert not np.allclose(raw_plain, raw_sn, atol=1e-3)


def test_advance_spectral_matches_torch_second_forward(rng):
    """Two torch train-mode forwards advance u twice; apply + advance_spectral
    + apply must track them."""
    from tha4.nn.conv import create_conv3

    conv = create_conv3(4, 4, bias=False, initialization_method="he", use_spectral_norm=True)
    params = {"conv": _sn_conv_params(conv), }
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    xt = _to_torch(jnp.asarray(x))

    conv.train()
    _ = conv(xt)  # advances u in place
    theirs2 = _nhwc(conv(xt))

    cfg = B.BlockConfig(use_spectral_norm=True)
    params = B.advance_spectral(params)
    ours2 = np.asarray(B.apply_conv3(params["conv"], jnp.asarray(x)))
    np.testing.assert_allclose(ours2, theirs2, atol=2e-5)


def test_resnet_block_learned_scale_parity(rng):
    """ResnetBlock(use_scale_parameters=True): out = x + scale * path(x)
    (reference resnet_block.py:63-67)."""
    from tha4.nn.resnet_block import ResnetBlock

    c = 8
    blk = ResnetBlock.create(c, is1x1=False, use_scale_parameters=True, block_args=_block_args())
    with torch.no_grad():
        blk.scale.fill_(0.7)  # zero-init would make the test trivial
    path = blk.resnet_path
    cfg = B.BlockConfig()
    params = {
        "conv0": {"w": jnp.asarray(torch_conv_to_hwio(path[0].weight))},
        "norm0": _norm_params(path[1]),
        "conv1": {"w": jnp.asarray(torch_conv_to_hwio(path[3].weight))},
        "norm1": _norm_params(path[4]),
        "scale": jnp.asarray(blk.scale.detach().numpy()),
    }
    x = rng.standard_normal((2, 12, 12, c)).astype(np.float32)
    ours = np.asarray(B.apply_resnet_block(cfg, params, jnp.asarray(x)))
    theirs = _nhwc(blk(_to_torch(jnp.asarray(x))))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_resnet_block_1x1_parity(rng):
    """is1x1: conv1(bias) -> nonlin -> conv1(bias), NO norms
    (reference resnet_block.py:44-51)."""
    from tha4.nn.resnet_block import ResnetBlock

    c = 6
    blk = ResnetBlock.create(c, is1x1=True, block_args=_block_args())
    path = blk.resnet_path
    cfg = B.BlockConfig()
    params = {
        "conv0": {
            "w": jnp.asarray(torch_conv_to_hwio(path[0].weight)),
            "b": jnp.asarray(path[0].bias.detach().numpy()),
        },
        "conv1": {
            "w": jnp.asarray(torch_conv_to_hwio(path[2].weight)),
            "b": jnp.asarray(path[2].bias.detach().numpy()),
        },
    }
    x = rng.standard_normal((2, 10, 10, c)).astype(np.float32)
    ours = np.asarray(B.apply_resnet_block(cfg, params, jnp.asarray(x), is_1x1=True))
    theirs = _nhwc(blk(_to_torch(jnp.asarray(x))))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_downsample_block_output_1x1_parity(rng):
    """is_output_1x1=True skips the norm (reference conv.py:133-140)."""
    from tha4.nn.conv import create_downsample_block_from_block_args

    blk = create_downsample_block_from_block_args(4, 8, is_output_1x1=True, block_args=_block_args())
    cfg = B.BlockConfig()
    params = {"conv": {"w": jnp.asarray(torch_conv_to_hwio(blk[0].weight))}}
    x = rng.standard_normal((2, 2, 2, 4)).astype(np.float32)
    ours = np.asarray(B.apply_downsample_block(cfg, params, jnp.asarray(x)))
    theirs = _nhwc(blk(_to_torch(jnp.asarray(x))))
    assert ours.shape == (2, 1, 1, 8)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def _convert_conv3_block(blk):
    return {"conv": {"w": jnp.asarray(torch_conv_to_hwio(blk[0].weight))}, "norm": _norm_params(blk[1])}


def _convert_resnet(blk):
    path = blk.resnet_path
    return {
        "conv0": {"w": jnp.asarray(torch_conv_to_hwio(path[0].weight))},
        "norm0": _norm_params(path[1]),
        "conv1": {"w": jnp.asarray(torch_conv_to_hwio(path[3].weight))},
        "norm1": _norm_params(path[4]),
    }


@pytest.mark.parametrize("upsample_mode", ["bilinear", "nearest"])
def test_resize_conv_unet_parity(rng, upsample_mode):
    """Full ResizeConvUNet forward vs the reference, all levels
    (reference resize_conv_unet.py:40-107)."""
    from tha4.nn.common.resize_conv_unet import ResizeConvUNet, ResizeConvUNetArgs

    args = ResizeConvUNetArgs(
        image_size=32, input_channels=4, start_channels=4,
        bottleneck_image_size=8, num_bottleneck_blocks=2, max_channels=8,
        upsample_mode=upsample_mode, block_args=_block_args(),
    )
    ref = ResizeConvUNet(args)
    cfg = resize_conv.ResizeConvUNetConfig(
        image_size=32, input_channels=4, start_channels=4,
        bottleneck_image_size=8, num_bottleneck_blocks=2, max_channels=8,
        upsample_mode=upsample_mode,
    )
    params = {
        "downsample_blocks": [_convert_conv3_block(ref.downsample_blocks[0])]
        + [
            {"conv": {"w": jnp.asarray(torch_conv_to_hwio(b[0].weight))}, "norm": _norm_params(b[1])}
            for b in list(ref.downsample_blocks)[1:]
        ],
        "bottleneck_blocks": [_convert_resnet(b) for b in ref.bottleneck_blocks],
        "upsample_blocks": [_convert_conv3_block(b) for b in ref.upsample_blocks],
    }
    x = rng.standard_normal((2, 32, 32, 4)).astype(np.float32)
    ours = resize_conv.unet_apply(cfg, params, jnp.asarray(x))
    theirs = ref(_to_torch(jnp.asarray(x)))
    assert len(ours) == len(theirs) == 3
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), _nhwc(t), atol=3e-5)


def test_separable_conv_block_spectral_parity(rng):
    """ConvBlockFactory separable routing with spectral norm on BOTH halves
    (reference separable_conv.py:40-54)."""
    from tha4.nn.separable_conv import create_separable_conv3_block

    blk = create_separable_conv3_block(6, 8, _block_args(use_spectral_norm=True))
    dw, pw, norm = blk[0], blk[1], blk[2]
    cfg = B.BlockConfig(use_spectral_norm=True, separable=True)
    params = {
        "conv": {"depthwise": _sn_conv_params(dw), "pointwise": _sn_conv_params(pw)},
        "norm": _norm_params(norm),
    }
    x = rng.standard_normal((2, 16, 16, 6)).astype(np.float32)
    ours = np.asarray(B.apply_conv_block(cfg, params, jnp.asarray(x)))
    blk.train()
    theirs = _nhwc(blk(_to_torch(jnp.asarray(x))))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
