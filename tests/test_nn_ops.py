"""Conv / norm primitive parity with torch."""

import jax.numpy as jnp
import numpy as np
import torch

from tha4_tpu.ops import nn as tnn


def torch_conv_to_hwio(weight):
    return np.transpose(weight.detach().numpy(), (2, 3, 1, 0))


def torch_convT_to_hwio(weight):
    """torch ConvTranspose2d (I, O, kh, kw) -> equivalent-forward-conv HWIO."""
    w = weight.detach().numpy()[:, :, ::-1, ::-1]  # flip spatial
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def test_conv3_same(rng):
    m = torch.nn.Conv2d(5, 7, 3, padding=1, bias=True)
    x = rng.standard_normal((2, 11, 13, 5)).astype(np.float32)
    params = {"w": jnp.asarray(torch_conv_to_hwio(m.weight)), "b": jnp.asarray(m.bias.detach().numpy())}
    ours = np.asarray(tnn.conv2d(params, jnp.asarray(x)))
    theirs = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv4_stride2(rng):
    m = torch.nn.Conv2d(3, 6, 4, stride=2, padding=1, bias=False)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    params = {"w": jnp.asarray(torch_conv_to_hwio(m.weight))}
    ours = np.asarray(tnn.conv2d(params, jnp.asarray(x), stride=2, padding=1))
    theirs = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv_transpose_4x4_s2(rng):
    m = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=False)
    x = rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    params = {"w": jnp.asarray(torch_convT_to_hwio(m.weight))}
    ours = np.asarray(tnn.conv_transpose2d_s2(params, jnp.asarray(x)))
    theirs = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    assert ours.shape == theirs.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_instance_norm(rng):
    c = 5
    m = torch.nn.InstanceNorm2d(c, affine=True)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    x = rng.standard_normal((2, 9, 9, c)).astype(np.float32)
    params = {"scale": jnp.asarray(m.weight.detach().numpy()), "bias": jnp.asarray(m.bias.detach().numpy())}
    ours = np.asarray(tnn.instance_norm(params, jnp.asarray(x)))
    theirs = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_group_norm32(rng):
    c = 64
    m = torch.nn.GroupNorm(min(32, c), c)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    x = rng.standard_normal((2, 6, 6, c)).astype(np.float32)
    params = {"scale": jnp.asarray(m.weight.detach().numpy()), "bias": jnp.asarray(m.bias.detach().numpy())}
    ours = np.asarray(tnn.group_norm(params, jnp.asarray(x), num_groups=min(32, c)))
    theirs = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resnet_block_matches_torch_composition(rng):
    """conv3-norm-relu-conv3-norm + skip (reference resnet_block.py:50-67)."""
    c = 8
    conv0 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
    conv1 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
    n0 = torch.nn.InstanceNorm2d(c, affine=True)
    n1 = torch.nn.InstanceNorm2d(c, affine=True)
    for nm in (n0, n1):
        with torch.no_grad():
            nm.weight.uniform_(0.5, 1.5)
            nm.bias.uniform_(-0.5, 0.5)
    x = rng.standard_normal((1, 12, 12, c)).astype(np.float32)

    params = {
        "conv0": {"w": jnp.asarray(torch_conv_to_hwio(conv0.weight))},
        "norm0": {"scale": jnp.asarray(n0.weight.detach().numpy()), "bias": jnp.asarray(n0.bias.detach().numpy())},
        "conv1": {"w": jnp.asarray(torch_conv_to_hwio(conv1.weight))},
        "norm1": {"scale": jnp.asarray(n1.weight.detach().numpy()), "bias": jnp.asarray(n1.bias.detach().numpy())},
    }
    ours = np.asarray(tnn.resnet_block(params, jnp.asarray(x)))

    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    h = torch.relu(n0(conv0(t)))
    h = n1(conv1(h))
    theirs = (t + h).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_init_statistics():
    import jax

    key = jax.random.PRNGKey(0)
    w = tnn.init_conv_weight(key, 3, 3, 64, 128, "he")
    # he: std = sqrt(2 / (3*3*64))
    expected = np.sqrt(2.0 / (9 * 64))
    assert abs(np.std(np.asarray(w)) - expected) < 0.05 * expected
    z = tnn.init_conv_weight(key, 3, 3, 4, 2, "zero")
    assert np.all(np.asarray(z) == 0)
