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
