#!/usr/bin/env python
"""Per-stage encoder/decoder timing: where do the 63 ms of encdec go?

profile_bwd.py (r4) attributed 63.3 of the 94 ms full grad (bs8,
320x1024) to "encoder+decoder" fwd+bwd — which is really THREE parts:
the ResNet-50 pyramid, the DecoderBN(512) U-decoder (~330 GFLOP fwd at
bs8, MORE than the ResNet), and the SQL decoder. This times each part
and the ResNet stage prefixes (XLA DCEs unused suffixes), plus
fwd-vs-fwd+bwd and XLA cost analysis, to locate the fat precisely.

NOTE: every printed time includes the ~4.5 ms axon per-dispatch floor
(tools/micro_bench.py `floor` op) — subtract it from absolutes; deltas
between rows are floor-free. Floor-corrected r4 baseline: resnet fwd
5.6 ms (38% MFU), resnet fwd+bwd 20 ms, DecoderBN fwd+bwd 13.3 ms,
SQL decoder fwd+bwd 12.7 ms (of which attention+bins 6.5 — the flash
kernels cut that to <1).
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sfmnext_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import make_batch
from sfmnext_tpu.models.decoder_bn import DecoderBN
from sfmnext_tpu.models.resnet import ResNetEncoder
from sfmnext_tpu.training.builder import build_models, init_params

BS = 8
H, W = 320, 1024


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<44} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def flops_of(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def report(name, flops, dt):
    print(f"{name}: {flops / 1e9:.0f} GFLOP, {flops / dt / 1e12:.1f} TF/s "
          f"({flops / dt / 197e12 * 100:.1f}% MFU)")


def main():
    opt = Options(
        backbone="resnet", num_layers=50, num_features=512, model_dim=32,
        patch_size=20, query_nums=128, dim_out=128, height=H, width=W,
        batch_size=BS,
    ).validate()
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(BS, H, W))
    img = batch["color_aug"][:, 0]
    rng = jax.random.PRNGKey(0)

    # params["encoder"] is ResnetEncoderDecoder: {"encoder": resnet,
    # "decoder": DecoderBN}; models.depth is the SQL decoder.
    resnet = ResNetEncoder(num_layers=50, train=True, dtype=jnp.bfloat16)
    p_res, s_res = params["encoder"]["encoder"], stats["encoder"]["encoder"]
    dec = DecoderBN(512, 32, train=True, dtype=jnp.bfloat16)
    p_dec, s_dec = params["encoder"]["decoder"], stats["encoder"]["decoder"]

    def res_prefix(k):
        @jax.jit
        def f(p, s, x):
            feats, _ = resnet.apply(
                {"params": p, "batch_stats": s}, x, mutable=["batch_stats"]
            )
            return feats[k].astype(jnp.float32).sum()
        return f

    print(f"== ResNet-50 fwd prefixes (bs{BS} {H}x{W}, train BN) ==")
    ts = []
    for k in range(5):
        t = timeit(f"resnet fwd -> features[{k}]", res_prefix(k),
                   p_res, s_res, img)
        ts.append(t)
    print("stage deltas (ms): stem {:.1f} | l1 {:.1f} | l2 {:.1f} | "
          "l3 {:.1f} | l4 {:.1f}".format(
              ts[0] * 1e3, *[(ts[i] - ts[i - 1]) * 1e3 for i in range(1, 5)]))

    @jax.jit
    def res_grad(p, s, x):
        def f(p):
            feats, _ = resnet.apply(
                {"params": p, "batch_stats": s}, x, mutable=["batch_stats"]
            )
            return sum(f_.astype(jnp.float32).sum() for f_ in feats)
        g = jax.grad(f)(p)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    t_rg = timeit("resnet fwd+bwd (all taps)", res_grad, p_res, s_res, img)

    feats_val = resnet.apply(
        {"params": p_res, "batch_stats": s_res}, img, mutable=["batch_stats"]
    )[0]
    feats_val = [jax.lax.stop_gradient(f) for f in feats_val]

    @jax.jit
    def dec_fwd(p, s, feats):
        out, _ = dec.apply(
            {"params": p, "batch_stats": s}, feats, mutable=["batch_stats"]
        )
        return out.astype(jnp.float32).sum()

    @jax.jit
    def dec_grad(p, s, feats):
        def f(p):
            out, _ = dec.apply(
                {"params": p, "batch_stats": s}, feats,
                mutable=["batch_stats"],
            )
            return out.astype(jnp.float32).sum()
        g = jax.grad(f)(p)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    t_df = timeit("DecoderBN fwd", dec_fwd, p_dec, s_dec, feats_val)
    t_dg = timeit("DecoderBN fwd+bwd", dec_grad, p_dec, s_dec, feats_val)

    # SQL decoder on the DecoderBN output
    half = dec.apply(
        {"params": p_dec, "batch_stats": s_dec}, feats_val,
        mutable=["batch_stats"],
    )[0]
    half = jax.lax.stop_gradient(half)

    @jax.jit
    def sql_fwd(p, x, rng):
        out = models.depth.apply({"params": p}, x, rngs={"dropout": rng})
        return out["disp0"].astype(jnp.float32).sum()

    @jax.jit
    def sql_grad(p, x, rng):
        g = jax.grad(
            lambda p: models.depth.apply(
                {"params": p}, x, rngs={"dropout": rng}
            )["disp0"].astype(jnp.float32).sum()
        )(p)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(g))

    t_sf = timeit("SQL decoder fwd", sql_fwd, params["depth"], half, rng)
    t_sg = timeit("SQL decoder fwd+bwd", sql_grad, params["depth"], half, rng)

    print()
    f_res = flops_of(
        lambda p, s, x: resnet.apply(
            {"params": p, "batch_stats": s}, x, mutable=["batch_stats"]
        )[0][4].astype(jnp.float32).sum(),
        p_res, s_res, img,
    )
    f_rg = flops_of(res_grad.__wrapped__, p_res, s_res, img)
    f_df = flops_of(dec_fwd.__wrapped__, p_dec, s_dec, feats_val)
    f_dg = flops_of(dec_grad.__wrapped__, p_dec, s_dec, feats_val)
    f_sg = flops_of(sql_grad.__wrapped__, params["depth"], half, rng)
    report("resnet fwd", f_res, ts[4])
    report("resnet fwd+bwd", f_rg, t_rg)
    report("DecoderBN fwd", f_df, t_df)
    report("DecoderBN fwd+bwd", f_dg, t_dg)
    report("SQL fwd+bwd", f_sg, t_sg)


if __name__ == "__main__":
    main()
