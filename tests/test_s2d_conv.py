"""S2DConv: the space-to-depth strided stem conv is numerically exact.

The 7x7/s2 (and 5x5/s2) stem convs are rewritten via 2x2 space-to-depth
for MXU utilization (models/common.py S2DConv). Same param tree, same
weights — these tests pin output and gradient equality against the plain
strided conv, plus the odd-size fallback, at f32 on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfmnext_tpu.models.common import S2DConv


def _plain_conv(x, kern, stride=2):
    pad = kern.shape[0] // 2
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kern, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn,
    )


@pytest.mark.parametrize("k,c,o,h,w", [
    (7, 3, 64, 32, 48),   # resnet stem geometry
    (7, 6, 16, 32, 48),   # posecnn conv0 (2-frame stack)
    (5, 16, 32, 16, 24),  # posecnn conv1
    (3, 8, 8, 16, 24),    # generic small kernel
])
def test_s2d_conv_matches_plain(k, c, o, h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    m = S2DConv(o, k)
    variables = m.init(jax.random.PRNGKey(0), x)
    kern = variables["params"]["kernel"]
    assert kern.shape == (k, k, c, o)

    got = m.apply(variables, x)
    want = _plain_conv(x, kern)
    assert got.shape == want.shape == (2, h // 2, w // 2, o)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_s2d_conv_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 24, 3).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 8, 12, 8).astype(np.float32))
    m = S2DConv(8, 7)
    variables = m.init(jax.random.PRNGKey(0), x)

    def f_s2d(kern, x):
        return (m.apply({"params": {"kernel": kern}}, x) * cot).sum()

    def f_plain(kern, x):
        return (_plain_conv(x, kern) * cot).sum()

    kern = variables["params"]["kernel"]
    gk1, gx1 = jax.grad(f_s2d, argnums=(0, 1))(kern, x)
    gk2, gx2 = jax.grad(f_plain, argnums=(0, 1))(kern, x)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-5)


def test_s2d_conv_odd_size_fallback():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 15, 23, 3).astype(np.float32))
    m = S2DConv(7, 7)
    variables = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(variables, x)
    want = _plain_conv(x, variables["params"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_resnet_stem_tree_unchanged():
    """conv1 keeps the bare {kernel} tree the torchvision port expects."""
    from sfmnext_tpu.models.resnet import ResNetEncoder

    enc = ResNetEncoder(num_layers=18, train=False)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    assert set(v["params"]["conv1"].keys()) == {"kernel"}
    assert v["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)


def test_pose_cnn_tree_unchanged():
    from sfmnext_tpu.models.pose_cnn import PoseCNN

    m = PoseCNN(num_input_frames=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 6)))
    for i in range(7):
        node = v["params"][f"conv{i}"]["Conv_0"]
        assert set(node.keys()) == {"kernel", "bias"}, f"conv{i}"
