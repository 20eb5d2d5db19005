#!/usr/bin/env python
"""Decompose the loss-section time: warps, SSIM stacks, combine, smoothness.

Companion to profile_step.py — times each loss component in isolation
(fwd and, where it matters, fwd+bwd) so optimization effort lands where
the milliseconds actually are. Host-transfer sync (see profile_step.py).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sfmnext_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sfmnext_tpu.ops import losses as L
from sfmnext_tpu.ops.image import resize_bilinear, ssim_target_stats
from sfmnext_tpu.ops.warp import warp_frame
from sfmnext_tpu.data.augment import augment_batch

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
    print(f"{name:<36} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.rand(BS, H, W, 3), jnp.float32)
    srcs = [jnp.asarray(rng.rand(BS, H, W, 3), jnp.float32) for _ in range(2)]
    depth = jnp.asarray(1.0 + 5.0 * rng.rand(BS, H, W, 1), jnp.float32)
    depth_half = jnp.asarray(
        1.0 + 5.0 * rng.rand(BS, H // 2, W // 2, 1), jnp.float32
    )
    K = jnp.broadcast_to(
        jnp.asarray(
            [[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32
        ), (BS, 4, 4),
    )
    inv_K = jnp.linalg.inv(K)
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (BS, 4, 4))
    T = T.at[:, 0, 3].set(0.05)

    # --- warps ---
    @jax.jit
    def warp_pallas(src, depth, T):
        return warp_frame(src, depth, inv_K, K, T, use_pallas=True)[0]

    @jax.jit
    def warp_xla(src, depth, T):
        return warp_frame(src, depth, inv_K, K, T, use_pallas=False)[0]

    @jax.jit
    def warp_pallas_grad(src, depth, T):
        def f(d):
            return warp_pallas(src, d, T).sum()
        return jax.grad(f)(depth)

    timeit("warp fwd (pallas)", warp_pallas, srcs[0], depth, T)
    timeit("warp fwd (xla gather)", warp_xla, srcs[0], depth, T)
    timeit("warp fwd+bwd->depth (pallas)", warp_pallas_grad, srcs[0], depth, T)

    # --- SSIM / reprojection stacks ---
    @jax.jit
    def reproj_fwd(srcs, target):
        ts = ssim_target_stats(target)
        return L.reprojection_losses_stacked(srcs, target, 0.85, True, ts)

    @jax.jit
    def reproj_grad(srcs, target):
        def f(ss):
            ts = ssim_target_stats(target)
            return L.reprojection_losses_stacked(
                ss, target, 0.85, True, ts
            ).mean()
        return jax.grad(f)(srcs)

    timeit("reproj stack fwd (2 preds)", reproj_fwd, srcs, target)
    timeit("reproj stack fwd+bwd (2 preds)", reproj_grad, srcs, target)

    # --- combine + smoothness + resize ---
    reproj = reproj_fwd(srcs, target)
    ident = reproj_fwd(srcs[::-1], target)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def combine(reproj, ident):
        out, mask = L.min_reprojection_loss([reproj], [ident], rng=key)
        return out.mean()

    @jax.jit
    def smooth_grad(depth, target):
        def f(d):
            m = d.mean(axis=(1, 2, 3), keepdims=True)
            return L.edge_aware_smoothness(d / (m + 1e-7), target)
        return jax.grad(f)(depth)

    @jax.jit
    def resize_grad(dh):
        def f(d):
            return resize_bilinear(d, (H, W), align_corners=False).sum()
        return jax.grad(f)(dh)

    timeit("min-combine + mean", combine, reproj, ident)
    timeit("smoothness fwd+bwd", smooth_grad, depth, target)
    timeit("depth resize fwd+bwd", resize_grad, depth_half)

    # --- augmentation (in the bench step, not in profile_step) ---
    batch = {
        "color": jnp.stack([target] + srcs, 1),
        "color_aug": jnp.stack([target] + srcs, 1),
        "K": K,
        "inv_K": inv_K,
    }

    @jax.jit
    def aug(batch):
        return augment_batch(batch, key)["color_aug"]

    timeit("augment_batch (flip+jitter)", aug, batch)


if __name__ == "__main__":
    main()
