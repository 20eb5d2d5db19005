"""Pure-function property tests for backbone building blocks (fast, CPU).

These cover the pieces where a silent transpose/rounding mistake would
still produce the right output *shape*: the MobileViT patch unfold/fold,
the anti-aliasing blur pool, ECA kernel sizing and timm channel rounding.
"""

import numpy as np

import jax.numpy as jnp


def test_mobilevit_unfold_fold_roundtrip():
    from sfmnext_tpu.models.mobilevit import _fold, _unfold

    rng = np.random.RandomState(0)
    for h, w in [(8, 12), (5, 7), (2, 3)]:  # odd sizes exercise the pad
        x = jnp.asarray(rng.rand(2, h, w, 5), jnp.float32)
        t = _unfold(x)
        y = _fold(t, h, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_mobilevit_unfold_token_layout():
    """Token n indexes the patch (raster order), token-dim p the pixel
    within the 2x2 patch — the attention groups pixels of equal offset
    across patches (MobileViT fig. 2)."""
    from sfmnext_tpu.models.mobilevit import _unfold

    h, w = 4, 6
    x = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
    t = np.asarray(_unfold(jnp.asarray(x)))  # [1, N=6, P=4, 1]
    assert t.shape == (1, 6, 4, 1)
    # patch 0 = rows 0-1, cols 0-1; within-patch order row-major
    np.testing.assert_allclose(t[0, 0, :, 0], [0, 1, 6, 7])
    # patch 1 = rows 0-1, cols 2-3
    np.testing.assert_allclose(t[0, 1, :, 0], [2, 3, 8, 9])
    # patch 3 = rows 2-3, cols 0-1 (raster order over the patch grid)
    np.testing.assert_allclose(t[0, 3, :, 0], [12, 13, 18, 19])


def test_blur_pool_matches_naive():
    from sfmnext_tpu.models.resnet import blur_pool

    rng = np.random.RandomState(1)
    x = rng.rand(1, 6, 8, 3).astype(np.float32)
    y = np.asarray(blur_pool(jnp.asarray(x)))
    # naive: binomial [1,2,1]^T[1,2,1]/16, pad 1 (zeros), stride 2
    k = np.outer([1, 2, 1], [1, 2, 1]) / 16.0
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    expect = np.zeros_like(y)
    for i in range(y.shape[1]):
        for j in range(y.shape[2]):
            win = xp[0, 2 * i: 2 * i + 3, 2 * j: 2 * j + 3, :]
            expect[0, i, j, :] = np.einsum("hwc,hw->c", win, k)
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-6)


def test_eca_kernel_size_table():
    """ECA adaptive kernel (gamma=2, b=1) — spot values from the paper."""
    import math

    def k_for(c):
        t = int(abs((math.log2(c) + 1.0) / 2.0))
        return max(t if t % 2 else t + 1, 3)

    assert k_for(64) == 3
    assert k_for(256) == 5  # t=4 -> odd-up 5
    assert k_for(512) == 5
    assert k_for(1024) == 5  # t=5


def test_make_divisible_matches_timm():
    from sfmnext_tpu.models.mobile_builder import make_divisible

    # reference values of timm's make_divisible(v, 8)
    cases = {8: 8, 10: 16, 12: 16, 16: 16, 24: 24, 36: 40, 2.0: 8,
             19.2: 24, 115.2: 112}
    for v, want in cases.items():
        assert make_divisible(v) == want, (v, make_divisible(v), want)
