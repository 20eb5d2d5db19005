"""Flash-SQL Pallas kernels vs the XLA path (interpreter mode on CPU).

The kernels (ops/pallas/sql_kernel.py) must match ops/sql_attention.py:
  * flash_full_query == sql_full_query's summary output,
  * flash_bins_depth == sql_bins_to_depth over the recomputed energy,
both forward and for every gradient (feats, queries, W, b, centers).
Tolerances reflect the shared bf16 matmul precision of both paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sfmnext_tpu.ops import sql_attention
from sfmnext_tpu.ops.pallas import sql_kernel

# N = H*W = 2048 -> tile 1024, 2 tiles per batch (exercises the online
# softmax merge and the cross-tile accumulators)
B, H, W, E, Q, D = 2, 16, 128, 32, 16, 24


def _data(seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, H, W, E).astype(np.float32))
    queries = jnp.asarray(rng.randn(B, Q, E).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(Q, D).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)
    centers = jnp.asarray(
        np.sort(1.0 + 79.0 * rng.rand(B, D).astype(np.float32), axis=1)
    )
    return feats, queries, w, b, centers


def _xla_summary(feats, queries):
    _, summary = sql_attention.sql_full_query(
        feats.astype(jnp.bfloat16), queries.astype(jnp.bfloat16)
    )
    return summary


def _xla_depth(feats, queries, w, b, centers):
    energy, _ = sql_attention.sql_full_query(
        feats.astype(jnp.bfloat16), queries.astype(jnp.bfloat16)
    )
    return sql_attention.sql_bins_to_depth(
        energy, w, b, centers, compute_dtype=jnp.bfloat16
    )


def test_summary_matches_xla():
    feats, queries, *_ = _data()
    expect = _xla_summary(feats, queries)
    with pltpu.force_tpu_interpret_mode():
        got = sql_kernel.sql_summary(feats, queries)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=0, atol=2e-2
    )


def test_depth_matches_xla():
    feats, queries, w, b, centers = _data(1)
    expect = _xla_depth(feats, queries, w, b, centers)
    with pltpu.force_tpu_interpret_mode():
        got = sql_kernel.sql_depth(feats, queries, w, b, centers)
    # depth values are O(1..80); bf16 logits shared by both paths
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=2e-2, atol=2e-2
    )


def test_summary_gradients_match_xla():
    feats, queries, *_ = _data(2)

    def loss_x(f, q):
        return (_xla_summary(f, q).astype(jnp.float32) ** 2).mean()

    def loss_p(f, q):
        return (sql_kernel.sql_summary(f, q).astype(jnp.float32) ** 2).mean()

    gx = jax.grad(loss_x, argnums=(0, 1))(feats, queries)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1))(feats, queries)
    for a, e in zip(gp, gx):
        scale = max(1e-3, float(jnp.abs(e).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(e) / scale, atol=3e-2
        )


@pytest.mark.parametrize("argnum", [0, 1, 2, 3, 4])
def test_depth_gradients_match_xla(argnum):
    args = _data(3)

    def loss_x(*a):
        return (_xla_depth(*a).astype(jnp.float32) ** 2).mean()

    def loss_p(*a):
        return (
            sql_kernel.sql_depth(*a).astype(jnp.float32) ** 2
        ).mean()

    gx = jax.grad(loss_x, argnums=argnum)(*args)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=argnum)(*args)
    scale = max(1e-3, float(jnp.abs(gx).max()))
    np.testing.assert_allclose(
        np.asarray(gp) / scale, np.asarray(gx) / scale, atol=3e-2
    )


def test_decoder_fused_matches_unfused():
    """SQLDecoder(use_pallas=True) output == the XLA decoder, same params."""
    from sfmnext_tpu.models.sql_decoder import SQLDecoder

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 40, 64, 32).astype(np.float32))
    kw = dict(
        embedding_dim=32, patch_size=8, query_nums=32, dim_out=64,
        deterministic=True, dtype=jnp.bfloat16,
    )
    ref = SQLDecoder(use_pallas=False, **kw)
    fused = SQLDecoder(use_pallas=True, **kw)
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    out_ref = ref.apply({"params": params}, x)["disp0"]
    with pltpu.force_tpu_interpret_mode():
        out_fused = fused.apply({"params": params}, x)["disp0"]
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=2e-2, atol=5e-2
    )


def test_supports_gate():
    assert sql_kernel.supports(81920)
    assert sql_kernel.supports(30720)
    assert not sql_kernel.supports(81920 + 8)
