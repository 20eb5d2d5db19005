#!/usr/bin/env python
"""Decompose the train-step BACKWARD by ablation.

profile_step.py showed (r3 baseline, bs8 320x1024): fwd 40 ms, backward
93 ms. This times jax.grad of the full pipeline with pieces knocked out
(stop_gradient / flags) — the deltas attribute the backward milliseconds.

NOTE: absolutes include the ~4.5 ms axon per-dispatch floor (see
tools/micro_bench.py `floor`); the printed deltas are floor-free.
r4 numbers (bs8 320x1024, pre-flash-SQL): full 94.1 (≈89.6 real),
encdec-only 63.3 (≈58.8 real), loss-chain total 30.7, of which pose 4.0,
ssim-vs-l1 4.9, ident-stack 1.6, smoothness ~0 — leaving ~20 ms of
warp/geometry/resize/min-combine.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sfmnext_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import make_batch
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.training.pipeline import forward

BS = 8
H, W = 320, 1024


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<44} {dt * 1e3:8.2f} ms", flush=True)
    return dt


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
    batch.pop("depth_gt", None)
    rng = jax.random.PRNGKey(0)

    def grad_of(o, params_subset=None, freeze=()):
        def f(p):
            p2 = dict(p)
            for k in freeze:
                p2[k] = jax.tree_util.tree_map(jax.lax.stop_gradient, p2[k])
            total, _ = forward(models, p2, stats, batch, rng, o)
            return total

        def g(p):
            grads = jax.grad(f)(p)
            keys = params_subset or list(grads)
            return sum(
                gl.sum()
                for k in keys
                for gl in jax.tree_util.tree_leaves(grads[k])
            )

        return jax.jit(g)

    t_full = timeit("grad: full", grad_of(opt), params)
    t_nopose = timeit(
        "grad: pose frozen", grad_of(opt, freeze=("pose",)), params
    )
    no_smooth = dataclasses.replace(opt, disparity_smoothness=0.0)
    t_nosm = timeit("grad: no smoothness", grad_of(no_smooth), params)
    no_mask = dataclasses.replace(opt, disable_automasking=True)
    t_nomask = timeit("grad: no automask/ident", grad_of(no_mask), params)
    no_ssim = dataclasses.replace(opt, no_ssim=True)
    t_nossim = timeit("grad: no ssim (L1 only)", grad_of(no_ssim), params)

    @jax.jit
    def encdec_grad(p):
        def f(p):
            feats = models.encoder.apply(
                {"params": p["encoder"], "batch_stats": stats["encoder"]},
                batch["color_aug"][:, 0], mutable=["batch_stats"],
            )[0]
            out = models.depth.apply(
                {"params": p["depth"]}, feats,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return out["disp0"].sum()

        grads = jax.grad(f)({"encoder": p["encoder"], "depth": p["depth"]})
        return sum(g.sum() for g in jax.tree_util.tree_leaves(grads))

    t_encdec = timeit(
        "grad: encoder+decoder only (sum disp)", encdec_grad, params
    )

    print(
        f"\ndeltas: pose-chain {1e3 * (t_full - t_nopose):.1f} ms, "
        f"smoothness {1e3 * (t_full - t_nosm):.1f} ms, "
        f"ident-stack {1e3 * (t_full - t_nomask):.1f} ms, "
        f"ssim-vs-l1 {1e3 * (t_full - t_nossim):.1f} ms, "
        f"loss-chain-total {1e3 * (t_full - t_encdec):.1f} ms"
    )


if __name__ == "__main__":
    main()
