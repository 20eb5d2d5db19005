"""Fused SSIM+L1 Pallas kernel vs the XLA path (interpreter mode on CPU).

The kernel (ops/pallas/ssim_kernel.py) must match
ops.losses.reprojection_losses_stacked on bf16 inputs — forward map and
the gradient to the predictions. Both paths use the same integer band
matrices and bf16 matmuls with f32 accumulation, so tolerances are a
few bf16 ulps of O(1) values.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from sfmnext_tpu.ops import losses as L
from sfmnext_tpu.ops.pallas import ssim_kernel

B, H, W = 2, 16, 128


def _data(seed=0, n=2):
    rng = np.random.RandomState(seed)
    preds = [
        jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        for _ in range(n)
    ]
    target = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    return preds, target


def _xla(preds, target):
    return L.reprojection_losses_stacked(
        [p.astype(jnp.bfloat16) for p in preds],
        target.astype(jnp.bfloat16),
    )


def test_forward_matches_xla():
    preds, target = _data()
    expect = _xla(preds, target)
    with pltpu.force_tpu_interpret_mode():
        got = ssim_kernel.reprojection_losses_pallas(preds, target)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), atol=2e-2
    )


def test_forward_three_sources():
    preds, target = _data(1, n=3)
    expect = _xla(preds, target)
    with pltpu.force_tpu_interpret_mode():
        got = ssim_kernel.reprojection_losses_pallas(preds, target)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), atol=2e-2
    )


def test_grad_matches_xla():
    preds, target = _data(2)

    def loss_x(a, b):
        return (_xla([a, b], target) ** 2).mean()

    def loss_p(a, b):
        return (
            ssim_kernel.reprojection_losses_pallas([a, b], target) ** 2
        ).mean()

    gx = jax.grad(loss_x, argnums=(0, 1))(*preds)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1))(*preds)
    for a, e in zip(gp, gx):
        scale = max(1e-4, float(jnp.abs(e).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(e) / scale, atol=5e-2
        )


def test_fwd_only_matches_grad_path():
    preds, target = _data(5)
    with pltpu.force_tpu_interpret_mode():
        full = ssim_kernel.reprojection_losses_pallas(preds, target)
        lean = ssim_kernel.reprojection_losses_pallas(
            preds, target, need_grad=False
        )
    np.testing.assert_array_equal(np.asarray(lean), np.asarray(full))


def test_target_gets_zero_gradient():
    preds, target = _data(3)

    def loss_p(t):
        return ssim_kernel.reprojection_losses_pallas(preds, t).mean()

    with pltpu.force_tpu_interpret_mode():
        gt = jax.grad(loss_p)(target)
    np.testing.assert_array_equal(np.asarray(gt), 0.0)


def test_supports_gate():
    assert ssim_kernel.supports(320, 1024, 2)
    assert not ssim_kernel.supports(321, 1024, 2)
    assert not ssim_kernel.supports(320, 1000, 2)


def _xla_min(preds, idents, target, noise):
    reproj = _xla(preds, target)
    ident = _xla(idents, target)
    if noise is not None:
        ident = ident + noise
    combined = jnp.concatenate([ident, reproj], axis=-1)
    to_opt = combined.min(axis=-1)
    idxs = combined.argmin(axis=-1)
    automask = (idxs >= ident.shape[-1]).astype(jnp.float32)
    return to_opt, automask


def test_min_fused_forward_matches_xla():
    preds, target = _data(7)
    idents, _ = _data(8)
    rngn = np.random.RandomState(9)
    noise = jnp.asarray(rngn.randn(1, H, W, 2).astype(np.float32) * 1e-2)
    expect, emask = _xla_min(preds, idents, target, noise)
    with pltpu.force_tpu_interpret_mode():
        got, gmask = ssim_kernel.reprojection_min_pallas(
            preds, idents, target, noise
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-2)
    # masks may differ only where the two best sources are within kernel
    # tolerance of each other
    diff = np.asarray(gmask) != np.asarray(emask)
    assert diff.mean() < 0.02


def test_min_fused_no_noise():
    preds, target = _data(10)
    idents, _ = _data(11)
    expect, _ = _xla_min(preds, idents, target, None)
    with pltpu.force_tpu_interpret_mode():
        got, _ = ssim_kernel.reprojection_min_pallas(
            preds, idents, target, None
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-2)


def test_min_fused_grad_matches_xla():
    preds, target = _data(12)
    idents, _ = _data(13)
    rngn = np.random.RandomState(14)
    # large noise separates the min winners so both paths agree on routing
    noise = jnp.asarray(rngn.randn(1, H, W, 2).astype(np.float32) * 0.3)

    def loss_x(a, b):
        to_opt, _ = _xla_min(
            [a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)],
            [i.astype(jnp.bfloat16) for i in idents],
            target.astype(jnp.bfloat16), noise,
        )
        return (to_opt ** 2).mean()

    def loss_p(a, b):
        to_opt, _ = ssim_kernel.reprojection_min_pallas(
            [a, b], idents, target, noise
        )
        return (to_opt ** 2).mean()

    gx = jax.grad(loss_x, argnums=(0, 1))(*preds)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1))(*preds)
    for a, e in zip(gp, gx):
        scale = max(1e-4, float(jnp.abs(e).max()))
        got_n = np.asarray(a) / scale
        exp_n = np.asarray(e) / scale
        # winners can flip where two sources are within bf16 tolerance;
        # compare where both paths agree (>99% of pixels)
        agree = np.isclose(got_n, exp_n, atol=5e-2)
        assert agree.mean() > 0.97


def test_min_fused_idents_and_target_zero_grad():
    preds, target = _data(15)
    idents, _ = _data(16)

    def loss_p(i0, t):
        to_opt, _ = ssim_kernel.reprojection_min_pallas(
            preds, [i0, idents[1]], t, None
        )
        return to_opt.mean()

    with pltpu.force_tpu_interpret_mode():
        gi, gt = jax.grad(loss_p, argnums=(0, 1))(idents[0], target)
    np.testing.assert_array_equal(np.asarray(gi), 0.0)
    np.testing.assert_array_equal(np.asarray(gt), 0.0)


def test_min_fused_channel_first_matches():
    preds, target = _data(20)
    idents, _ = _data(21)
    rngn = np.random.RandomState(22)
    noise = jnp.asarray(rngn.randn(1, H, W, 2).astype(np.float32) * 1e-2)
    with pltpu.force_tpu_interpret_mode():
        ref, rmask = ssim_kernel.reprojection_min_pallas(
            preds, idents, target, noise
        )
        cf, cmask = ssim_kernel.reprojection_min_pallas(
            [jnp.transpose(p, (0, 3, 1, 2)) for p in preds],
            [jnp.transpose(s, (0, 3, 1, 2)) for s in idents],
            jnp.transpose(target, (0, 3, 1, 2)),
            noise, channel_first=True,
        )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(cf))
    np.testing.assert_array_equal(np.asarray(rmask), np.asarray(cmask))


def test_min_fused_channel_first_grad():
    preds, target = _data(23)
    idents, _ = _data(24)

    def loss_nhwc(a, b):
        to_opt, _ = ssim_kernel.reprojection_min_pallas(
            [a, b], idents, target, None
        )
        return (to_opt ** 2).mean()

    def loss_cf(a, b):
        to_opt, _ = ssim_kernel.reprojection_min_pallas(
            [jnp.transpose(a, (0, 3, 1, 2)), jnp.transpose(b, (0, 3, 1, 2))],
            [jnp.transpose(s, (0, 3, 1, 2)) for s in idents],
            jnp.transpose(target, (0, 3, 1, 2)),
            None, channel_first=True,
        )
        return (to_opt ** 2).mean()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_nhwc, argnums=(0, 1))(*preds)
        g2 = jax.grad(loss_cf, argnums=(0, 1))(*preds)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
