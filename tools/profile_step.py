#!/usr/bin/env python
"""Decompose train-step time: encoder / decoder / loss / backward.

Times each stage with host-transfer sync (block_until_ready is unreliable
through the axon tunnel). Also dumps XLA cost analysis (flops/bytes) per
stage for MFU estimation.
"""

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
from sfmnext_tpu.training.step import TrainState, make_optimizer, make_train_step

BS = 8
H, W = 320, 1024


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # compile+sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<28} {dt * 1e3:8.2f} ms   {BS / dt:7.1f} imgs/s", flush=True)
    return dt


def main():
    opt = Options(
        backbone="resnet", num_layers=50, num_features=512, model_dim=32,
        patch_size=20, query_nums=128, dim_out=128, height=H, width=W,
        batch_size=BS,
    ).validate()
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    tx = make_optimizer(opt, 1000)
    state = TrainState.create(variables, tx)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(BS, H, W))
    batch.pop("depth_gt", None)
    rng = jax.random.PRNGKey(0)
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def encoder_only(params, stats, img):
        return models.encoder.apply(
            {"params": params["encoder"], "batch_stats": stats["encoder"]},
            img, mutable=["batch_stats"],
        )[0]

    @jax.jit
    def enc_dec(params, stats, img, rng):
        feats, _ = models.encoder.apply(
            {"params": params["encoder"], "batch_stats": stats["encoder"]},
            img, mutable=["batch_stats"],
        )
        return models.depth.apply(
            {"params": params["depth"]}, feats, rngs={"dropout": rng}
        )["disp0"]

    @jax.jit
    def loss_fwd(params, stats, batch, rng):
        total, aux = forward(models, params, stats, batch, rng, opt)
        return total

    @jax.jit
    def loss_grad(params, stats, batch, rng):
        def f(p):
            total, aux = forward(models, p, stats, batch, rng, opt)
            return total

        # consume every grad leaf — returning a single leaf lets XLA
        # dead-code-eliminate most of the conv backward, which silently
        # shifted ~80 ms of backward into the "optimizer" row
        grads = jax.grad(f)(params)
        return sum(g.sum() for g in jax.tree_util.tree_leaves(grads))

    img = batch["color_aug"][:, 0]
    t_enc = timeit("encoder fwd", encoder_only, params, stats, img)
    t_ed = timeit("encoder+decoder fwd", enc_dec, params, stats, img, rng)
    t_loss = timeit("full loss fwd", loss_fwd, params, stats, batch, rng)
    t_grad = timeit("loss + grad", loss_grad, params, stats, batch, rng)

    step_fn = make_train_step(opt, models, tx, donate=False)
    t_step = timeit("train step (grad+adam)", step_fn, state, batch, rng)

    # cost analysis for MFU
    try:
        comp = jax.jit(loss_grad).lower(params, stats, batch, rng).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops", float("nan"))
        print(f"\nXLA flops/step (loss+grad): {flops / 1e12:.2f} TF")
        print(f"MFU @197TF/s bf16: {flops / 1e12 / (t_grad * 197) * 100:.1f}%")
    except Exception as e:
        print("cost_analysis failed:", e)

    print(f"\ndecoder ~= {1e3 * (t_ed - t_enc):.1f} ms; "
          f"loss ops ~= {1e3 * (t_loss - t_ed):.1f} ms; "
          f"backward ~= {1e3 * (t_grad - t_loss):.1f} ms; "
          f"optimizer ~= {1e3 * (t_step - t_grad):.1f} ms")


if __name__ == "__main__":
    main()
