#!/usr/bin/env python
"""Cumulative ablation INSIDE the composed loss forward.

profile_step.py showed the loss section at ~57 ms (bs8) while the sum of
isolated micro-benches is ~12 ms — the cost lives in the composition, so
each stage here re-runs the real pipeline code up to a cut point, inside
one jit, on the same batch the step sees. Deltas between rows attribute
the composed cost. Host-transfer sync; ~4.5 ms dispatch floor per row.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sfmnext_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import make_batch
from sfmnext_tpu.ops import geometry, losses as L
from sfmnext_tpu.ops.image import resize_bilinear
from sfmnext_tpu.ops.warp import warp_frame
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.training.pipeline import predict_poses

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
    print(f"{name:<40} {dt * 1e3:8.2f} ms", flush=True)
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
    frame_ids = opt.all_frame_ids

    def upto(stage):
        def fn(params, stats, batch, rng):
            rng_drop, rng_noise = jax.random.split(rng)
            b, f, h, w, _ = batch["color"].shape
            feats, _ = models.encoder.apply(
                {"params": params["encoder"], "batch_stats": stats["encoder"]},
                batch["color_aug"][:, 0], mutable=["batch_stats"],
            )
            dec_out = models.depth.apply(
                {"params": params["depth"]}, feats, rngs={"dropout": rng_drop}
            )
            depth_half = dec_out["disp0"]
            depth = resize_bilinear(depth_half, (h, w), align_corners=False)
            if stage == "encdec":
                return depth.sum()

            new_stats = dict(stats)
            poses = predict_poses(
                models, params, batch, frame_ids, new_stats, opt=opt
            )
            if stage == "poses":
                return depth.sum() + sum(
                    aa.sum() + t.sum() for aa, t, _ in poses.values()
                )

            inv_depth = 1.0 / depth
            mean_inv_depth = inv_depth.mean(axis=(1, 2, 3))
            K, inv_K = batch["K"], batch["inv_K"]
            target = batch["color"][:, 0]
            ldt = jnp.bfloat16
            warped_srcs, ident_srcs = [], []
            for idx, f_i in enumerate(frame_ids[1:], start=1):
                aa, t, inv = poses[f_i]
                t = t * mean_inv_depth[:, None]
                T = geometry.transformation_from_parameters(aa, t, invert=inv)
                src = batch["color"][:, idx]
                warped, _ = warp_frame(
                    src, depth, inv_K, K, T,
                    use_pallas=jax.default_backend() == "tpu",
                )
                warped_srcs.append(warped)
                ident_srcs.append(src)
            if stage == "warps":
                return sum(x.sum() for x in warped_srcs)

            from sfmnext_tpu.ops.pallas import ssim_kernel

            target_l = target.astype(ldt)
            noise = L._tiebreak_noise(
                rng_noise, (1, h, w, len(ident_srcs)), jnp.float32
            )
            to_optimise, automask = ssim_kernel.reprojection_min_pallas(
                [x.astype(ldt) for x in warped_srcs],
                [s.astype(ldt) for s in ident_srcs],
                target_l, noise, opt.ssim_weight,
            )
            loss = to_optimise.mean()
            if stage == "reproj":
                return loss

            mean_d = depth.mean(axis=(1, 2, 3), keepdims=True)
            smooth = L.edge_aware_smoothness(
                depth / (mean_d + 1e-7), target, compute_dtype=ldt
            )
            return loss + opt.disparity_smoothness * smooth

        return jax.jit(fn)

    for stage in ("encdec", "poses", "warps", "reproj", "total"):
        timeit(f"fwd upto {stage}", upto(stage), params, stats, batch, rng)


if __name__ == "__main__":
    main()
