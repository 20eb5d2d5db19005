"""Pallas warp kernel vs XLA grid_sample (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfmnext_tpu.ops.warp import grid_sample


def _near_identity_grid(b, h, w, max_dx_px=30, max_dy_px=4, seed=0):
    rng = np.random.RandomState(seed)
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    base = np.stack([gx, gy], -1)[None].repeat(b, 0)
    disp = (rng.rand(b, h, w, 2) - 0.5) * 2
    disp[..., 0] *= 2 * max_dx_px / (w - 1)
    disp[..., 1] *= 2 * max_dy_px / (h - 1)
    return jnp.asarray((base + disp).astype(np.float32))


@pytest.mark.parametrize("shape", [(2, 32, 128, 3), (1, 16, 256, 1)])
def test_pallas_warp_matches_xla(shape):
    from jax.experimental.pallas import tpu as pltpu

    from sfmnext_tpu.ops.pallas.warp_kernel import grid_sample_pallas

    b, h, w, c = shape
    img = jnp.asarray(np.random.RandomState(1).rand(b, h, w, c), jnp.float32)
    grid = _near_identity_grid(b, h, w)

    expect = grid_sample(img, grid, "border", True)
    with pltpu.force_tpu_interpret_mode():
        got = grid_sample_pallas(img, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_pallas_warp_gradients_match_xla():
    from jax.experimental.pallas import tpu as pltpu

    from sfmnext_tpu.ops.pallas.warp_kernel import grid_sample_pallas

    b, h, w, c = 1, 16, 128, 2
    img = jnp.asarray(np.random.RandomState(2).rand(b, h, w, c), jnp.float32)
    grid = _near_identity_grid(b, h, w, max_dx_px=10, max_dy_px=3, seed=3)

    def loss_x(g):
        return (grid_sample(img, g, "border", True) ** 2).mean()

    def loss_p(g):
        return (grid_sample_pallas(img, g) ** 2).mean()

    gx = jax.grad(loss_x)(grid)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p)(grid)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-6)


def test_band_assumption_at_flagship_resolution():
    """The kernel clamps when one output row's source-y spread exceeds
    BAND-2 rows (warp_kernel._y_window). Verify real SSL training warps
    at 320x1024 stay inside the band: poses at the PoseCNN output scale
    (0.01 * unit-normal, pose_cnn.py:47) with mean-inv-depth-scaled
    translation (trainer.py:412-421) over KITTI-like depth."""
    from sfmnext_tpu.ops import geometry
    from sfmnext_tpu.ops.pallas.warp_kernel import BAND

    h, w = 320, 1024
    K = np.array(
        [[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32,
    )
    inv_K = np.linalg.inv(K).astype(np.float32)
    rng = np.random.RandomState(0)
    # KITTI-ish depth: 4..60m with structure
    depth = (10 + 20 * np.linspace(0, 1, h)[::-1, None] ** 2).repeat(w, 1)
    depth = depth + rng.rand(h, w) * 5
    depth = jnp.asarray(depth[None, ..., None], jnp.float32)

    worst = 0.0
    for seed in range(8):
        r = np.random.RandomState(seed)
        aa = jnp.asarray(0.01 * r.randn(1, 3), jnp.float32)
        t = jnp.asarray(0.01 * r.randn(1, 3), jnp.float32)
        mean_inv_depth = float((1.0 / depth).mean())
        T = geometry.transformation_from_parameters(
            aa, t * mean_inv_depth, invert=bool(seed % 2)
        )
        cam = geometry.backproject_depth(depth, jnp.asarray(inv_K[None]))
        pix = geometry.project_3d(cam, jnp.asarray(K[None]), T, h, w)
        # source y in pixels per output row
        fy = (np.asarray(pix[..., 1]) + 1) * 0.5 * (h - 1)
        fy = np.clip(fy, 0, h - 1)
        spread = (fy.max(axis=2) - fy.min(axis=2)).max()
        worst = max(worst, float(spread))
    assert worst < BAND - 2, (
        f"per-row source spread {worst:.1f} rows exceeds the Pallas band "
        f"({BAND - 2}); training would silently clamp - raise BAND"
    )


def test_xwindow_assumption_at_flagship_resolution():
    """The kernel also clamps when a sample's horizontal displacement
    leaves the static XWIN window around its slab (warp_kernel._x_window:
    guaranteed coverage dx in [-128, +126] at XWIN=384). Verify
    flagship-scale SSL warps fit."""
    from sfmnext_tpu.ops import geometry
    from sfmnext_tpu.ops.pallas.warp_kernel import LANES, XWIN

    h, w = 320, 1024
    K = np.array(
        [[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32,
    )
    inv_K = np.linalg.inv(K).astype(np.float32)
    rng = np.random.RandomState(0)
    depth = (10 + 20 * np.linspace(0, 1, h)[::-1, None] ** 2).repeat(w, 1)
    depth = depth + rng.rand(h, w) * 5
    depth = jnp.asarray(depth[None, ..., None], jnp.float32)

    worst = 0.0
    for seed in range(8):
        r = np.random.RandomState(seed)
        aa = jnp.asarray(0.01 * r.randn(1, 3), jnp.float32)
        t = jnp.asarray(0.01 * r.randn(1, 3), jnp.float32)
        mean_inv_depth = float((1.0 / depth).mean())
        T = geometry.transformation_from_parameters(
            aa, t * mean_inv_depth, invert=bool(seed % 2)
        )
        cam = geometry.backproject_depth(depth, jnp.asarray(inv_K[None]))
        pix = geometry.project_3d(cam, jnp.asarray(K[None]), T, h, w)
        fx = (np.asarray(pix[..., 0]) + 1) * 0.5 * (w - 1)
        fx = np.clip(fx, 0, w - 1)
        dx = np.abs(fx - np.arange(w)[None, None, :]).max()
        worst = max(worst, float(dx))
    assert worst < (XWIN - LANES) // 2 - 2, (
        f"horizontal displacement {worst:.1f} px exceeds the Pallas "
        f"x-window guarantee ({(XWIN - LANES) // 2 - 2}); raise XWIN"
    )


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_pallas_full_grad_matches_xla(padding):
    """warp_sample_pallas: forward + image AND coordinate gradients vs
    the XLA grid_sample, both padding modes (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from sfmnext_tpu.ops.pallas.warp_kernel import grid_sample_pallas

    b, h, w, c = 1, 16, 128, 2
    img = jnp.asarray(np.random.RandomState(5).rand(b, h, w, c), jnp.float32)
    grid = _near_identity_grid(b, h, w, max_dx_px=12, max_dy_px=3, seed=6)
    # push some samples out of the image so zeros mode is exercised
    grid = grid * 1.08

    def loss_x(im, g):
        return (grid_sample(im, g, padding, True) ** 2).mean()

    def loss_p(im, g):
        return (
            grid_sample_pallas(im, g, True, padding, image_grad=True) ** 2
        ).mean()

    fx_val = loss_x(img, grid)
    gx_im, gx_gr = jax.grad(loss_x, argnums=(0, 1))(img, grid)
    with pltpu.force_tpu_interpret_mode():
        fp_val = loss_p(img, grid)
        gp_im, gp_gr = jax.grad(loss_p, argnums=(0, 1))(img, grid)

    np.testing.assert_allclose(float(fp_val), float(fx_val), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gp_im), np.asarray(gx_im), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gp_gr), np.asarray(gx_gr), atol=1e-5
    )


def test_rectify_rotation_assumption_at_indoor_resolution():
    """The zeros-mode Pallas path's only live consumer is the indoor
    rectify rotation warp (training/indoor.py). Samples whose
    displacement exceeds the BAND/XWIN windows silently contribute 0 and
    drop gradients, so pin the safe envelope: RectifyNet rotations with
    every component up to |0.1| rad (far beyond handheld shake; the net's
    pitch output is zeroed, models/rectify.py) must keep NYU-scale
    (288x384, fixed normalized K, data/nyu.py:21-22) warps inside both
    windows. A mid-training rotation beyond this envelope would clamp —
    raise BAND/XWIN if the envelope ever needs to grow."""
    from sfmnext_tpu.ops import geometry
    from sfmnext_tpu.ops.pallas.warp_kernel import BAND, LANES, XWIN

    h, w = 288, 384
    K3 = np.array(
        [[0.8107 * w, 0, 0.5087 * w],
         [0, 1.0822 * h, 0.5286 * h],
         [0, 0, 1]], np.float32,
    )[None]

    # RectifyNet's decoder zeroes the third euler component
    # (models/rectify.py RotDecoder, reference rectify_net.py:66), so the
    # live rotation space is (rx, ry, 0) — in-plane roll, the one motion
    # that tilts rows across the band, cannot occur.
    worst_dx, worst_spread = 0.0, 0.0
    corners = [
        (sx * 0.1, sy * 0.1, 0.0) for sx in (-1, 0, 1) for sy in (-1, 0, 1)
    ]
    for rot in corners:
        r = jnp.asarray(np.array([rot], np.float32))
        R = geometry.euler_to_mat(r)  # [1,3,3]
        P = np.asarray(jnp.matmul(jnp.asarray(K3), R))[0]
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pts = np.linalg.inv(K3[0]) @ np.stack(
            [xs.ravel(), ys.ravel(), np.ones(h * w)], 0
        )
        cam = P @ pts
        fx = (cam[0] / (cam[2] + 1e-7)).reshape(h, w)
        fy = (cam[1] / (cam[2] + 1e-7)).reshape(h, w)
        fx = np.clip(fx, 0, w - 1)
        fy = np.clip(fy, 0, h - 1)
        worst_dx = max(worst_dx, float(np.abs(fx - xs).max()))
        worst_spread = max(
            worst_spread, float((fy.max(axis=1) - fy.min(axis=1)).max())
        )
    assert worst_dx < (XWIN - LANES) // 2 - 2, (
        f"indoor rotation dx {worst_dx:.1f}px exceeds the x-window "
        f"guarantee ({(XWIN - LANES) // 2 - 2}); raise XWIN"
    )
    assert worst_spread < BAND - 2, (
        f"indoor rotation per-row y-spread {worst_spread:.1f} exceeds the "
        f"band ({BAND - 2}); raise BAND"
    )


def test_border_nchw_layout_matches_default():
    """Channel-first in/out (fused loss path) must be a pure relayout."""
    from jax.experimental.pallas import tpu as pltpu
    from sfmnext_tpu.ops.pallas import warp_kernel as wk

    rng = np.random.RandomState(40)
    b, h, w, c = 2, 16, 128, 3
    img = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    gy = jnp.asarray((rng.rand(b, h, w) * 2 - 1).astype(np.float32)) * 0.05
    gx = jnp.asarray((rng.rand(b, h, w) * 2 - 1).astype(np.float32)) * 0.05
    iy = jnp.broadcast_to(jnp.linspace(-1, 1, h)[None, :, None], (b, h, w))
    ix = jnp.broadcast_to(jnp.linspace(-1, 1, w)[None, None, :], (b, h, w))
    grid = jnp.stack([ix + gx, iy + gy], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        ref = wk.grid_sample_pallas(img, grid)
        out = wk.grid_sample_pallas(
            jnp.transpose(img, (0, 3, 1, 2)), grid, nchw=True
        )
    np.testing.assert_array_equal(
        np.asarray(ref), np.asarray(jnp.transpose(out, (0, 2, 3, 1)))
    )

    def loss_ref(g):
        return (wk.grid_sample_pallas(img, g) ** 2).sum()

    def loss_nchw(g):
        return (wk.grid_sample_pallas(
            jnp.transpose(img, (0, 3, 1, 2)), g, nchw=True
        ) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_ref)(grid)
        g2 = jax.grad(loss_nchw)(grid)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
