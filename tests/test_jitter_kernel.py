"""Fused ColorJitter Pallas kernel vs the XLA path (interpret mode on CPU).

The kernel must reproduce data/augment.py's torchvision-semantics jitter
bit-for-bit up to reduction order (the contrast grayscale mean), for every
op order and for the do_jit=False passthrough.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sfmnext_tpu.data.augment import (
    augment_batch,
    color_jitter_single,
    jitter_params,
)
from sfmnext_tpu.ops.pallas import jitter_kernel

B, F, H, W = 3, 2, 32, 128


def _rand_color(seed, b=B):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(b, F, H, W, 3).astype(np.float32))


def test_jitter_kernel_matches_xla_path():
    color = _rand_color(0)
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    order, factors = jax.vmap(jitter_params)(keys)
    do_jit = jnp.asarray([True, True, False])

    ref = jax.vmap(
        lambda img, k, en: jnp.where(en, color_jitter_single(img, k), img)
    )(color, keys, do_jit)

    with pltpu.force_tpu_interpret_mode():
        out = jitter_kernel.color_jitter_pallas(color, order, factors, do_jit)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
    # do_jit=False passthrough is bit-exact
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(color[2]))


@pytest.mark.parametrize("perm", [(0, 1, 2, 3), (3, 2, 1, 0), (1, 3, 0, 2)])
def test_jitter_kernel_every_op_order(perm):
    color = _rand_color(1, b=1)
    order = jnp.asarray([perm], jnp.int32)
    factors = jnp.asarray([[1.15, 0.85, 1.2, -0.07]], jnp.float32)
    do_jit = jnp.asarray([True])

    # reference: apply ops sequentially in `perm` order with these factors
    from sfmnext_tpu.data import augment as A

    img = color[0]
    ops = [
        lambda x: A.adjust_brightness(x, 1.15),
        lambda x: A.adjust_contrast(x, 0.85),
        lambda x: A.adjust_saturation(x, 1.2),
        lambda x: A.adjust_hue(x, -0.07),
    ]
    for o in perm:
        img = ops[o](img)

    with pltpu.force_tpu_interpret_mode():
        out = jitter_kernel.color_jitter_pallas(color, order, factors, do_jit)

    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img), atol=2e-6)


def test_augment_batch_pallas_flag_cpu_fallback():
    """On CPU use_pallas=True must silently take the XLA path (same rng)."""
    batch = {"color": _rand_color(2)}
    rng = jax.random.PRNGKey(3)
    a = augment_batch(batch, rng, use_pallas=False)
    b = augment_batch(batch, rng, use_pallas=True)  # no TPU here
    np.testing.assert_array_equal(
        np.asarray(a["color_aug"]), np.asarray(b["color_aug"])
    )
