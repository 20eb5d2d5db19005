"""Golden parity tests for image ops against torch CPU.

The reference pipeline is torch; these tests pin our NHWC JAX ops to the
exact torch semantics the reference relies on (F.interpolate, F.grid_sample,
AvgPool-based SSIM with k=7 reflection pad).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sfmnext_tpu.ops import image as jimage
from sfmnext_tpu.ops import warp as jwarp


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape_pair", [((6, 10), (12, 20)), ((7, 9), (14, 18)), ((16, 24), (5, 7))])
def test_resize_bilinear_matches_torch(align_corners, shape_pair):
    (h, w), (oh, ow) = shape_pair
    rng = np.random.RandomState(0)
    x = rng.rand(2, h, w, 3).astype(np.float32)

    ours = np.asarray(jimage.resize_bilinear(jnp.asarray(x), (oh, ow), align_corners))
    theirs = to_nhwc(
        F.interpolate(nchw(x), size=(oh, ow), mode="bilinear", align_corners=align_corners)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_resize_nearest_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 6, 8, 3).astype(np.float32)
    ours = np.asarray(jimage.resize_nearest(jnp.asarray(x), (12, 16)))
    theirs = to_nhwc(F.interpolate(nchw(x), size=(12, 16), mode="nearest"))
    np.testing.assert_allclose(ours, theirs)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    rng = np.random.RandomState(2)
    x = rng.rand(2, 9, 13, 3).astype(np.float32)
    # grid with out-of-bounds coords to exercise padding
    grid = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.6 - 1.3)

    ours = np.asarray(
        jwarp.grid_sample(jnp.asarray(x), jnp.asarray(grid), padding_mode, align_corners)
    )
    theirs = to_nhwc(
        F.grid_sample(
            nchw(x), torch.from_numpy(grid),
            mode="bilinear", padding_mode=padding_mode, align_corners=align_corners,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_ssim_matches_reference_formula():
    """Torch re-derivation of the reference SSIM (layers.py:13-46, k=7)."""
    rng = np.random.RandomState(3)
    x = rng.rand(2, 16, 20, 3).astype(np.float32)
    y = np.clip(x + rng.randn(2, 16, 20, 3).astype(np.float32) * 0.1, 0, 1)

    k, c1, c2 = 7, 0.01 ** 2, 0.03 ** 2
    refl = torch.nn.ReflectionPad2d(k // 2)
    pool = torch.nn.AvgPool2d(k, 1)
    tx, ty = refl(nchw(x)), refl(nchw(y))
    mu_x, mu_y = pool(tx), pool(ty)
    sigma_x = pool(tx ** 2) - mu_x ** 2
    sigma_y = pool(ty ** 2) - mu_y ** 2
    sigma_xy = pool(tx * ty) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    theirs = to_nhwc(torch.clamp((1 - n / d) / 2, 0, 1))

    ours = np.asarray(jimage.ssim(jnp.asarray(x), jnp.asarray(y)))
    assert ours.shape == x.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_reflection_pad_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.rand(1, 5, 6, 2).astype(np.float32)
    ours = np.asarray(jimage.reflection_pad_2d(jnp.asarray(x), 2))
    theirs = to_nhwc(torch.nn.ReflectionPad2d(2)(nchw(x)))
    np.testing.assert_allclose(ours, theirs)


def test_ssim_multi_matches_per_pair_ssim():
    """The channel-stacked shared-target-stats SSIM equals N independent
    ssim() calls (the training hot-path restructure must be a pure
    reformulation)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    target = rng.rand(2, 16, 24, 3).astype(np.float32)
    preds = [rng.rand(2, 16, 24, 3).astype(np.float32) for _ in range(3)]

    stats = jimage.ssim_target_stats(jnp.asarray(target))
    stacked = jnp.concatenate([jnp.asarray(p) for p in preds], axis=-1)
    got = np.asarray(jimage.ssim_multi(stacked, stats))

    for i, p in enumerate(preds):
        ref = np.asarray(jimage.ssim(jnp.asarray(p), jnp.asarray(target)))
        np.testing.assert_allclose(
            got[..., 3 * i : 3 * i + 3], ref, rtol=1e-5, atol=1e-6
        )


def test_reprojection_losses_stacked_matches_loop():
    import jax.numpy as jnp

    from sfmnext_tpu.ops import losses as L

    rng = np.random.RandomState(8)
    target = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    preds = [
        jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32)) for _ in range(4)
    ]
    got = np.asarray(L.reprojection_losses_stacked(preds, target))
    for i, p in enumerate(preds):
        ref = np.asarray(L.reprojection_loss(p, target))[..., 0]
        np.testing.assert_allclose(got[..., i], ref, rtol=1e-5, atol=1e-6)
