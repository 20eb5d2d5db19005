#!/usr/bin/env python
"""Micro-benchmarks for the train-step hot ops, each as its OWN small jit.

Rationale: the full-pipeline ablation (profile_bwd.py) needs six giant
XLA programs; through the axon remote-compile tunnel that is ~an hour of
compiles. Each op here compiles in seconds-to-a-minute and pins the
backward fat directly. Sync via host transfer (block_until_ready does not
block through the tunnel).

Usage: python tools/micro_bench.py [op ...]
ops: warp warp_bwd ssim ssim_bwd smooth resize pose encdec encdec_bwd all

IMPORTANT (r4 finding, `floor` op): every jit dispatch through the axon
tunnel costs ~4.5 ms and dispatches do NOT pipeline — every number this
tool prints is the true device time PLUS ~4.5 ms. Deltas between rows
are floor-free; absolute values are not. Sync on scalars only: fetching
a whole output array drags it through the ~0.5 GB/s tunnel.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sfmnext_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BS = 8
H, W = 320, 1024


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<36} {dt * 1e3:8.2f} ms   (compile {compile_s:5.1f}s)",
          flush=True)
    return dt


def main(ops):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BS, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(BS, H, W, 3).astype(np.float32))
    depth = jnp.asarray(1.0 + 9.0 * rng.rand(BS, H, W, 1).astype(np.float32))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.58 * W, 1.92 * H, 0.5 * W, 0.5 * H
    K = jnp.asarray(np.tile(K, (BS, 1, 1)))
    inv_K = jnp.linalg.inv(K)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.02
    T = jnp.asarray(np.tile(T, (BS, 1, 1)))

    from sfmnext_tpu.ops import losses as L
    from sfmnext_tpu.ops.image import resize_bilinear
    from sfmnext_tpu.ops.warp import warp_frame

    if "warp" in ops:
        f = jax.jit(lambda s, d: warp_frame(s, d, inv_K, K, T,
                                            use_pallas=True)[0].sum())
        timeit("pallas warp fwd", f, img, depth)

    if "warp_bwd" in ops:
        def loss(d):
            w, _ = warp_frame(img, d, inv_K, K, T, use_pallas=True)
            return (w * img2).sum()

        g = jax.jit(lambda d: jax.grad(loss)(d).sum())
        timeit("pallas warp fwd+bwd (d-depth)", g, depth)

    if "ssim" in ops:
        def ssim_stack(a, b, tgt):
            ts = L.reprojection_losses_stacked([a, b], tgt)
            return ts.sum()

        f = jax.jit(ssim_stack)
        timeit("ssim 2-stack fwd", f, img, img2, img)

    if "ssim_bwd" in ops:
        def ssim_loss(a, b):
            return L.reprojection_losses_stacked([a, b], img).sum()

        g = jax.jit(lambda a, b: sum(
            x.sum() for x in jax.grad(ssim_loss, argnums=(0, 1))(a, b)
        ))
        timeit("ssim 2-stack fwd+bwd", g, img, img2)

    if "ssim_bf16" in ops:
        ib, i2b = img.astype(jnp.bfloat16), img2.astype(jnp.bfloat16)

        def ssim_loss16(a, b):
            ts = L.ssim_target_stats(ib)
            return L.reprojection_losses_stacked(
                [a, b], ib, target_stats=ts
            ).astype(jnp.float32).sum()

        g = jax.jit(lambda a, b: sum(
            x.sum() for x in jax.grad(ssim_loss16, argnums=(0, 1))(a, b)
        ).astype(jnp.float32))
        timeit("ssim 2-stack bf16 fwd+bwd", g, ib, i2b)

    if "smooth" in ops:
        def sm(d):
            mean_d = d.mean(axis=(1, 2, 3), keepdims=True)
            return L.edge_aware_smoothness(d / (mean_d + 1e-7), img)

        g = jax.jit(lambda d: jax.grad(sm)(d).sum())
        timeit("smoothness fwd+bwd", g, depth)

    if "resize" in ops:
        half = jnp.asarray(
            rng.rand(BS, H // 2, W // 2, 1).astype(np.float32)
        )

        def rz(d):
            return resize_bilinear(d, (H, W), align_corners=False).sum()

        g = jax.jit(lambda d: jax.grad(rz)(d).sum())
        timeit("resize half->full fwd+bwd", g, half)

    if "augment" in ops:
        from sfmnext_tpu.data.augment import augment_batch

        stack = jnp.stack([img, img, img2], axis=1)  # [B,F,H,W,3]
        key = jax.random.PRNGKey(0)

        @jax.jit
        def aug(c, k):
            out = augment_batch({"color": c}, k)
            return out["color_aug"].sum() + out["color"].sum()

        timeit("augment flip+jitter", aug, stack, key)

        @jax.jit
        def aug_pallas(c, k):
            out = augment_batch({"color": c}, k, use_pallas=True)
            return out["color_aug"].sum() + out["color"].sum()

        timeit("augment flip+jitter pallas", aug_pallas, stack, key)

    if "reproj_kernel" in ops:
        # the fused Pallas reproj kernels (A/B SFMNEXT_SSIM_BOX=shift|matmul)
        from sfmnext_tpu.ops.pallas import ssim_kernel

        ib = img.astype(jnp.bfloat16)
        i2b = img2.astype(jnp.bfloat16)
        tb = (0.5 * (img + img2)).astype(jnp.bfloat16)

        def k_loss(a, b):
            return ssim_kernel.reprojection_losses_pallas([a, b], tb).sum()

        g = jax.jit(lambda a, b: sum(
            x.sum() for x in jax.grad(k_loss, argnums=(0, 1))(a, b)
        ).astype(jnp.float32))
        timeit("reproj kernel 2-src fwd+bwd", g, ib, i2b)

        f = jax.jit(lambda a, b: ssim_kernel.reprojection_losses_pallas(
            [a, b], tb, need_grad=False).sum())
        timeit("reproj kernel 2-src fwd-only", f, ib, i2b)

        def m_loss(a, b):
            to_opt, _ = ssim_kernel.reprojection_min_pallas(
                [a, b], [ib, i2b], tb, None
            )
            return to_opt.sum()

        gm = jax.jit(lambda a, b: sum(
            x.sum() for x in jax.grad(m_loss, argnums=(0, 1))(a, b)
        ).astype(jnp.float32))
        timeit("reproj min-fused 4-src fwd+bwd", gm, ib, i2b)

    if "pose" in ops:
        from sfmnext_tpu.models.pose_cnn import PoseCNN

        m = PoseCNN(num_input_frames=2, dtype=jnp.bfloat16)  # builder dtype
        pair = jnp.concatenate([img, img2], axis=-1)
        pair2 = jnp.concatenate([pair, pair], axis=0)  # batched 2 pairs
        params = m.init(jax.random.PRNGKey(0), pair2)["params"]

        def pf(p):
            aa, t = m.apply({"params": p}, pair2)
            return (aa.sum() + t.sum())

        g = jax.jit(lambda p: sum(
            x.sum() for x in jax.tree_util.tree_leaves(jax.grad(pf)(p))
        ))
        timeit("posecnn batched-pairs fwd+bwd", g, params)

    if "encdec" in ops or "encdec_bwd" in ops or "sql" in ops:
        from sfmnext_tpu.config import Options
        from sfmnext_tpu.training.builder import build_models, init_params

        opt = Options(
            backbone="resnet", num_layers=50, num_features=512, model_dim=32,
            patch_size=20, query_nums=128, dim_out=128, height=H, width=W,
            batch_size=BS,
        ).validate()
        models = build_models(opt, train=True)
        variables = init_params(opt, models, jax.random.PRNGKey(0))
        params, stats = variables["params"], variables["batch_stats"]

        if "encdec" in ops:
            @jax.jit
            def ed(p, x):
                feats, _ = models.encoder.apply(
                    {"params": p["encoder"], "batch_stats": stats["encoder"]},
                    x, mutable=["batch_stats"],
                )
                return models.depth.apply(
                    {"params": p["depth"]}, feats,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )["disp0"].sum()

            timeit("encoder+decoder fwd", ed, params, img)

        if "sql" in ops:
            # SQL decoder (DecoderBN + flash summary/bins + heads) alone,
            # on precomputed encoder features
            feats, _ = jax.jit(
                lambda p, x: models.encoder.apply(
                    {"params": p["encoder"], "batch_stats": stats["encoder"]},
                    x, mutable=["batch_stats"],
                )
            )(params, img)
            feats = jax.tree_util.tree_map(jnp.asarray, feats)

            @jax.jit
            def sq(p, f):
                return models.depth.apply(
                    {"params": p["depth"]}, f,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )["disp0"].sum()

            timeit("sql decoder fwd", sq, params, feats)

            @jax.jit
            def sqg(p, f):
                def loss(p):
                    return models.depth.apply(
                        {"params": p}, f,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                    )["disp0"].sum()

                return sum(
                    g.sum()
                    for g in jax.tree_util.tree_leaves(
                        jax.grad(loss)(p["depth"])
                    )
                )

            timeit("sql decoder fwd+bwd", sqg, params, feats)

        if "encdec_bwd" in ops:
            @jax.jit
            def edg(p, x):
                def f(p):
                    feats, _ = models.encoder.apply(
                        {"params": p["encoder"],
                         "batch_stats": stats["encoder"]},
                        x, mutable=["batch_stats"],
                    )
                    out = models.depth.apply(
                        {"params": p["depth"]}, feats,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                    )
                    return out["disp0"].sum()

                grads = jax.grad(f)(
                    {"encoder": p["encoder"], "depth": p["depth"]}
                )
                return sum(
                    g.sum() for g in jax.tree_util.tree_leaves(grads)
                )

            timeit("encoder+decoder fwd+bwd", edg, params, img)




def encoder_stages():
    """Time the ResNet-50 encoder stem/stages separately (train-mode BN),
    plus eval-mode BN and conv-only ablations, to locate the encoder fat."""
    import flax.linen as nn
    from sfmnext_tpu.models.common import BatchNorm, max_pool_3x3_s2
    from sfmnext_tpu.models.resnet import ResNetEncoder

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(BS, H, W, 3).astype(np.float32))

    for train_mode, tag in ((True, "train"), (False, "eval")):
        enc = ResNetEncoder(num_layers=50, train=train_mode,
                            dtype=jnp.bfloat16, normalize_input=False)
        variables = enc.init(jax.random.PRNGKey(0), img)

        def apply_enc(v, x):
            if train_mode:
                feats, _ = enc.apply(v, x, mutable=["batch_stats"])
            else:
                feats = enc.apply(v, x)
            return sum(f.astype(jnp.float32).sum() for f in feats)

        f = jax.jit(apply_enc)
        timeit(f"resnet50 encoder fwd ({tag} BN)", f, variables, img)

        def loss(p, bs, x):
            v = {"params": p, "batch_stats": bs}
            if train_mode:
                feats, _ = enc.apply(v, x, mutable=["batch_stats"])
            else:
                feats = enc.apply(v, x)
            return sum(f.astype(jnp.float32).sum() for f in feats)

        g = jax.jit(lambda p, bs, x: sum(
            q.sum() for q in jax.tree_util.tree_leaves(
                jax.grad(loss)(p, bs, x)
            )
        ).astype(jnp.float32))
        timeit(f"resnet50 encoder fwd+bwd ({tag} BN)", g,
               variables["params"], variables["batch_stats"], img)

    # stem alone: 7x7/s2 conv (+BN train +relu +maxpool)
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, dtype=jnp.bfloat16)(x)
            y = BatchNorm(False, dtype=jnp.bfloat16)(y)
            return max_pool_3x3_s2(nn.relu(y))

    stem = Stem()
    sv = stem.init(jax.random.PRNGKey(0), img)

    def stem_loss(v, x):
        y, _ = stem.apply(v, x, mutable=["batch_stats"])
        return y.astype(jnp.float32).sum()

    timeit("stem 7x7s2+bn+pool fwd", jax.jit(stem_loss), sv, img)
    g = jax.jit(lambda v, x: jax.grad(
        lambda p: stem_loss({"params": p,
                             "batch_stats": sv["batch_stats"]}, x)
    )(v["params"])["Conv_0"]["kernel"].sum().astype(jnp.float32))
    timeit("stem fwd+bwd", g, sv, img)

    # plain 3x3 conv at layer1 geometry (the MXU reference point)
    x1 = jnp.asarray(
        rng.rand(BS, H // 4, W // 4, 256).astype(np.float32)
    ).astype(jnp.bfloat16)
    k1 = jnp.asarray(
        rng.rand(3, 3, 256, 256).astype(np.float32)
    ).astype(jnp.bfloat16)

    @jax.jit
    def conv_ref(x, k):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn
        ).astype(jnp.float32).sum()

    timeit("3x3 conv 256ch @80x256 fwd", conv_ref, x1, k1)

def decoder_split(sql_only=False):
    """DecoderBN vs SQL-decoder cost at bs8 320x1024 (train mode)."""
    from sfmnext_tpu.models.decoder_bn import DecoderBN
    from sfmnext_tpu.models.sql_decoder import SQLDecoder

    rng = np.random.RandomState(0)
    shapes = [
        (BS, H // 2, W // 2, 64),
        (BS, H // 4, W // 4, 256),
        (BS, H // 8, W // 8, 512),
        (BS, H // 16, W // 16, 1024),
        (BS, H // 32, W // 32, 2048),
    ]
    feats = [
        jnp.asarray(rng.rand(*s).astype(np.float32)).astype(jnp.bfloat16)
        for s in shapes
    ]
    if not sql_only:
        _decoder_bn_bench(feats)
    _sql_bench(rng)


def _decoder_bn_bench(feats):
    from sfmnext_tpu.models.decoder_bn import DecoderBN

    dec = DecoderBN(512, 32, train=True, dtype=jnp.bfloat16)
    dv = dec.init(jax.random.PRNGKey(0), feats)

    def dloss(p, feats):
        y, _ = dec.apply(
            {"params": p, "batch_stats": dv["batch_stats"]}, feats,
            mutable=["batch_stats"],
        )
        return y.astype(jnp.float32).sum()

    timeit("decoder_bn fwd", jax.jit(dloss), dv["params"], feats)
    g = jax.jit(lambda p, f: sum(
        q.sum() for q in jax.tree_util.tree_leaves(jax.grad(dloss)(p, f))
    ).astype(jnp.float32))
    timeit("decoder_bn fwd+bwd", g, dv["params"], feats)



def _sql_bench(rng):
    from sfmnext_tpu.models.sql_decoder import (
        SQLDecoder,
        TransformerEncoderLayer,
    )

    x = jnp.asarray(
        rng.rand(BS, H // 2, W // 2, 32).astype(np.float32)
    ).astype(jnp.bfloat16)
    for use_pallas in (False, True):
        sql = SQLDecoder(
            embedding_dim=32, patch_size=20, query_nums=128, dim_out=128,
            deterministic=False, dtype=jnp.bfloat16, use_pallas=use_pallas,
        )
        sv = sql.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x,
        )
        tag = "pallas" if use_pallas else "xla"

        def sloss(p, x):
            out = sql.apply(
                {"params": p}, x, rngs={"dropout": jax.random.PRNGKey(0)}
            )
            return out["disp0"].astype(jnp.float32).sum()

        timeit(f"sql decoder fwd ({tag})", jax.jit(sloss), sv["params"], x)
        g2 = jax.jit(lambda p, x: sum(
            q.sum() for q in jax.tree_util.tree_leaves(jax.grad(sloss)(p, x))
        ).astype(jnp.float32))
        timeit(f"sql decoder fwd+bwd ({tag})", g2, sv["params"], x)

    # transformer stack alone ([B,400,32] tokens, 4 layers)
    tokens = jnp.asarray(
        rng.rand(BS, 400, 32).astype(np.float32)
    ).astype(jnp.bfloat16)

    class TF4(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, y):
            for i in range(4):
                y = TransformerEncoderLayer(
                    32, 4, 1024, deterministic=False, dtype=jnp.bfloat16,
                    name=f"tf_layer{i}",
                )(y)
            return y

    tf4 = TF4()
    tv = tf4.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tokens,
    )

    def tloss(p, t):
        return tf4.apply(
            {"params": p}, t, rngs={"dropout": jax.random.PRNGKey(0)}
        ).astype(jnp.float32).sum()

    timeit("tf4 stack fwd", jax.jit(tloss), tv["params"], tokens)
    gt = jax.jit(lambda p, t: sum(
        q.sum() for q in jax.tree_util.tree_leaves(jax.grad(tloss)(p, t))
    ).astype(jnp.float32))
    timeit("tf4 stack fwd+bwd", gt, tv["params"], tokens)


def sql_parts():
    """Split the SQL decoder: patchify+transformer | full_query | bins head.

    r4 profile_encoder.py put the whole SQL decoder at 17.2 ms fwd+bwd
    (bs8 320x1024) for only 138 GFLOP — 4% MFU. The suspected fat is HBM
    traffic on the [B, 81920, 128] energy/logits volumes; these pieces
    confirm which stage pays it.
    """
    from sfmnext_tpu.ops import sql_attention

    rng = np.random.RandomState(0)
    feats = jnp.asarray(
        rng.rand(BS, H // 2, W // 2, 32).astype(np.float32)
    ).astype(jnp.bfloat16)
    queries = jnp.asarray(
        rng.rand(BS, 128, 32).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.rand(128, 128).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.rand(128).astype(np.float32) * 0.05)
    centers = jnp.asarray(1.0 + 79.0 * rng.rand(BS, 128).astype(np.float32))

    def fq(f, q):
        energy, summary = sql_attention.sql_full_query(f, q)
        return energy.astype(jnp.float32).sum() + summary.sum()

    def fq_sum_only(f, q):
        # energy unused downstream of the summary (XLA may DCE its store)
        _, summary = sql_attention.sql_full_query(f, q)
        return summary.sum()

    def bins(f, q, w, b, c):
        energy, _ = sql_attention.sql_full_query(f, q)
        return sql_attention.sql_bins_to_depth(
            energy, w, b, c, compute_dtype=jnp.bfloat16
        ).astype(jnp.float32).sum()

    timeit("full_query fwd (energy+summary)", jax.jit(fq), feats, queries)
    timeit("full_query fwd (summary only)", jax.jit(fq_sum_only), feats, queries)
    timeit(
        "full_query fwd+bwd",
        jax.jit(lambda f, q: sum(
            x.astype(jnp.float32).sum()
            for x in jax.grad(fq, argnums=(0, 1))(f, q)
        )),
        feats, queries,
    )
    timeit("energy->bins->depth fwd", jax.jit(bins), feats, queries, w, b, centers)
    timeit(
        "energy->bins->depth fwd+bwd",
        jax.jit(lambda *a: sum(
            x.astype(jnp.float32).sum()
            for x in jax.grad(bins, argnums=(0, 1, 2, 3, 4))(*a)
        )),
        feats, queries, w, b, centers,
    )


def floor_probe():
    """Per-jit-call dispatch floor through the axon tunnel.

    timeit() launches n back-to-back calls then syncs once; if the tunnel
    serializes dispatches, every micro number carries this floor. The
    copy row also bounds achievable HBM read+write bandwidth per call.
    """
    rng = np.random.RandomState(0)
    tiny = jnp.asarray(rng.rand(8, 8).astype(np.float32))
    big = jnp.asarray(rng.rand(8, 160, 512, 32).astype(np.float32)).astype(
        jnp.bfloat16
    )  # 67 MB — the SQL feature map

    # sync on scalars: fetching a full output array pulls it through the
    # tunnel (67 MB at ~0.5 GB/s network = 140 ms of pure transfer)
    f_tiny = jax.jit(lambda x: (x * 1.000001).sum())
    f_big = jax.jit(lambda x: (x * 1.000001).astype(jnp.float32).sum())
    t0 = timeit("dispatch floor (8x8 mul+sum)", f_tiny, tiny)
    t1 = timeit("mul+sum 67MB", f_big, big)
    print(f"implied hbm bw: {2 * big.size * 2 / max(t1 - t0, 1e-9) / 1e9:.0f}"
          f" GB/s (read+write, floor-corrected)")


def pack_conv():
    """Narrow-C_out conv vs horizontally-packed wide-C_out rewrite.

    A 3x3 s1 conv with C_out=32 uses <=25% of the MXU's 128 output
    lanes. Packing G=128//C_out adjacent output columns into channels
    (stride (1,G), kernel (3, G+2), weights placed at G offsets) costs
    (G+2)/3 x the FLOPs but fills the lanes. This measures whether the
    trade wins on v5e for DecoderBN's shapes (up4/conv3: 128->32 and
    32->32 at 160x512, bs8).
    """
    rng = np.random.RandomState(0)

    def plain(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def packed(x, k, g):
        kh, kw, cin, cout = k.shape
        wide = jnp.zeros((kh, kw + g - 1, cin, g * cout), k.dtype)
        for j in range(g):
            wide = wide.at[:, j:j + kw, :, j * cout:(j + 1) * cout].set(k)
        y = jax.lax.conv_general_dilated(
            x, wide, (1, g), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, h, wq, _ = y.shape
        return y.reshape(b, h, wq, g, cout).reshape(b, h, wq * g, cout)

    for cin, cout in ((128, 32), (32, 32), (64, 64)):
        g = 128 // cout
        x = jnp.asarray(
            rng.rand(BS, H // 2, W // 2, cin).astype(np.float32)
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            (rng.rand(3, 3, cin, cout).astype(np.float32) - 0.5) * 0.1
        ).astype(jnp.bfloat16)
        fp = jax.jit(lambda x, k: plain(x, k).astype(jnp.float32).sum())
        fk = jax.jit(
            lambda x, k, g=g: packed(x, k, g).astype(jnp.float32).sum()
        )
        err = float(jnp.abs(
            jax.jit(plain)(x, k).astype(jnp.float32)
            - jax.jit(lambda x, k: packed(x, k, g))(x, k).astype(jnp.float32)
        ).max())
        timeit(f"plain  3x3 {cin}->{cout} fwd", fp, x, k)
        timeit(f"packed 3x3 {cin}->{cout} fwd (g={g})", fk, x, k)
        gp = jax.jit(lambda x, k: jax.grad(
            lambda k: plain(x, k).astype(jnp.float32).sum()
        )(k).sum())
        gk = jax.jit(lambda x, k, g=g: jax.grad(
            lambda k: packed(x, k, g).astype(jnp.float32).sum()
        )(k).sum())
        timeit(f"plain  3x3 {cin}->{cout} dW", gp, x, k)
        timeit(f"packed 3x3 {cin}->{cout} dW (g={g})", gk, x, k)
        print(f"  packed-vs-plain max err: {err:.5f}")


def sql_flash():
    """Fused flash-SQL Pallas kernels vs the XLA path at bs8 320x1024."""
    from sfmnext_tpu.ops import sql_attention
    from sfmnext_tpu.ops.pallas import sql_kernel

    rng = np.random.RandomState(0)
    feats = jnp.asarray(
        rng.rand(BS, H // 2, W // 2, 32).astype(np.float32)
    ).astype(jnp.bfloat16)
    queries = jnp.asarray(
        rng.rand(BS, 128, 32).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.rand(128, 128).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.rand(128).astype(np.float32) * 0.05)
    centers = jnp.asarray(1.0 + 79.0 * rng.rand(BS, 128).astype(np.float32))

    def summary_p(f, q):
        return sql_kernel.sql_summary(f, q).sum()

    def depth_p(f, q, w, b, c):
        return sql_kernel.sql_depth(f, q, w, b, c).sum()

    timeit("flash summary fwd", jax.jit(summary_p), feats, queries)
    timeit(
        "flash summary fwd+bwd",
        jax.jit(lambda f, q: sum(
            x.astype(jnp.float32).sum()
            for x in jax.grad(summary_p, argnums=(0, 1))(f, q)
        )),
        feats, queries,
    )
    timeit("flash bins depth fwd", jax.jit(depth_p), feats, queries, w, b, centers)
    timeit(
        "flash bins depth fwd+bwd",
        jax.jit(lambda *a: sum(
            x.astype(jnp.float32).sum()
            for x in jax.grad(depth_p, argnums=(0, 1, 2, 3, 4))(*a)
        )),
        feats, queries, w, b, centers,
    )

    # numerics vs the XLA path on-device
    s_ref = sql_attention.sql_full_query(feats, queries)[1]
    s_got = jax.jit(sql_kernel.sql_summary)(feats, queries)
    err = float(jnp.abs(s_got - s_ref).max())
    print(f"summary max |pallas - xla| = {err:.4f}")


def pose_split():
    from sfmnext_tpu.models.pose_cnn import PoseCNN

    rng = np.random.RandomState(0)
    pair2 = jnp.asarray(rng.rand(2 * BS, H, W, 6).astype(np.float32))
    m = PoseCNN(num_input_frames=2)
    params = m.init(jax.random.PRNGKey(0), pair2)["params"]

    def pf(p, x):
        aa, t = m.apply({"params": p}, x)
        return aa.sum() + t.sum()

    timeit("posecnn fwd", jax.jit(pf), params, pair2)


if __name__ == "__main__":
    args = sys.argv[1:] or ["all"]
    if "stages" in args:
        encoder_stages()
        sys.exit(0)
    if "decoder" in args:
        decoder_split()
        pose_split()
        sys.exit(0)
    if "sqlpose" in args:
        decoder_split(sql_only=True)
        pose_split()
        sys.exit(0)
    if "sqlparts" in args:
        sql_parts()
        sys.exit(0)
    if "sqlflash" in args:
        sql_flash()
        sys.exit(0)
    if "floor" in args:
        floor_probe()
        sys.exit(0)
    if "packconv" in args:
        pack_conv()
        sys.exit(0)
    if "all" in args:
        args = ["warp", "warp_bwd", "ssim", "ssim_bwd", "ssim_bf16",
                "smooth", "resize", "pose", "encdec", "encdec_bwd"]
    main(args)