"""Bring-your-own-blocks ResNet variants ("ts"/"t" models) for the
timm-Unet backbones.

Covers ``resnet32ts / resnet33ts / seresnet33ts / eca_resnet33ts /
gcresnet33ts / resnext26ts / seresnext26ts / eca_resnext26ts /
gcresnext26ts / gcresnext50ts / gcresnet50t`` (networks/Unet.py:
330-340). Naming: ``t`` = tiered 3x3 stem, trailing ``s`` = SiLU act;
prefixes pick the attention (se / eca / gc = GCNet global-context,
Cao et al. ICCVW'19).

These are timm research models without a published paper config table;
the block plumbing (bottleneck ratio 0.25, group size 32 for the resnext
flavors, attention after the 3x3, optional 1280-ch final conv) follows
the timm byobnet recipe. No weight converter is shipped; the shape
contract is what the tests pin.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import (
    BatchNorm,
    eca_module,
    kaiming_normal_fanout,
    se_module,
)

# name -> (depths, channels, group_size, attn, final_ch, act)
BYOB_SPECS = {
    "resnet32ts": ((2, 3, 3, 2), (256, 512, 1536, 1536), 0, "", 0, "silu"),
    "resnet33ts": ((2, 3, 3, 2), (256, 512, 1536, 1536), 0, "", 1280, "silu"),
    "seresnet33ts": ((2, 3, 3, 2), (256, 512, 1536, 1536), 0, "se", 1280,
                     "silu"),
    "eca_resnet33ts": ((2, 3, 3, 2), (256, 512, 1536, 1536), 0, "eca", 1280,
                       "silu"),
    "gcresnet33ts": ((2, 3, 3, 2), (256, 512, 1536, 1536), 0, "gc", 1280,
                     "silu"),
    "resnext26ts": ((2, 2, 2, 2), (256, 512, 1024, 2048), 32, "", 0, "silu"),
    "seresnext26ts": ((2, 2, 2, 2), (256, 512, 1024, 2048), 32, "se", 0,
                      "silu"),
    "eca_resnext26ts": ((2, 2, 2, 2), (256, 512, 1024, 2048), 32, "eca", 0,
                        "silu"),
    "gcresnext26ts": ((2, 2, 2, 2), (256, 512, 1024, 2048), 32, "gc", 0,
                      "silu"),
    "gcresnext50ts": ((3, 4, 6, 3), (256, 512, 1024, 2048), 32, "gc", 0,
                      "silu"),
    "gcresnet50t": ((3, 4, 6, 3), (256, 512, 1024, 2048), 0, "gc", 0,
                    "relu"),
    "lambda_resnet26t": ((2, 2, 2, 2), (256, 512, 1024, 2048), 0, "", 0,
                         "relu"),
    "lambda_resnet50ts": ((3, 4, 6, 3), (256, 512, 1024, 2048), 0, "", 0,
                          "silu"),
}

# stages whose final block swaps the 3x3 for a LambdaLayer (placement is
# a documented best-effort for these timm research models — the layer
# math follows the paper exactly; see docs/backbone_fidelity.md tier 3)
LAMBDA_STAGES = {
    "lambda_resnet26t": (2, 3),
    "lambda_resnet50ts": (1, 2, 3),
}

# resnet51q/61q (timm byobnet "q" research models): quad stems at stride 4,
# mixed edge (fused 3x3->1x1) and bottleneck stages, SiLU, 2048 final conv.
# stage spec: (kind, depth, out_ch, group_size, bottle_ratio, extra_conv)
QRESNET_SPECS = {
    "resnet51q": (
        "quad2",
        (("edge", 3, 256, 32, 1.0, False),
         ("edge", 4, 512, 32, 1.0, False),
         ("bottle", 6, 1536, 32, 0.25, False),
         ("bottle", 4, 1536, 1, 0.25, False)),
    ),
    "resnet61q": (
        "quad",
        (("edge", 1, 256, 0, 1.0, False),
         ("bottle", 4, 256, 32, 0.25, True),
         ("bottle", 6, 1536, 32, 0.25, True),
         ("bottle", 4, 1536, 1, 0.25, True)),
    ),
}


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


def gc_module(x, dtype, train, name):
    """GCNet global-context block: softmax-pooled context -> 1x1/LN/relu/
    1x1 transform -> additive fusion."""
    b, h, w, c = x.shape
    attn = nn.Conv(1, (1, 1), dtype=dtype, name=f"{name}_attn")(x)
    attn = nn.softmax(attn.reshape(b, h * w, 1), axis=1)
    ctx = (x.reshape(b, h * w, c) * attn).sum(axis=1)[:, None, None, :]
    rd = max(1, c // 8)
    t = nn.Conv(rd, (1, 1), dtype=dtype, name=f"{name}_fc1")(ctx)
    t = nn.LayerNorm(dtype=dtype, name=f"{name}_ln")(t)
    t = nn.relu(t)
    t = nn.Conv(c, (1, 1), dtype=dtype, name=f"{name}_fc2")(t)
    return x + t


class QResNet(nn.Module):
    """resnet51q/61q: quad stem (stride 4), edge + bottleneck stages.

    Reconstructed from timm byobnet's public model cfgs (stem chs
    16/32/64/128 with strides 2/1/1/2; quad2 activates only the last two
    stem convs). Taps at r2 (pre-downsample stem) and the 4 stages
    (strides 1,2,2,2 after the stride-4 stem); the 2048 final conv+BN+act
    replaces the last tap, mirroring the other byob "ts" models.
    """

    variant: str = "resnet51q"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        stem_kind, stages = QRESNET_SPECS[self.variant]
        act = nn.silu
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = x
        stem_tap = None
        for i, (c, s) in enumerate(zip((16, 32, 64, 128), (2, 1, 1, 2))):
            if i == 3:
                stem_tap = y  # r2, pre the second stride-2 conv
            y = _conv(c, 3, s, name=f"stem{i}", dtype=self.dtype)(y)
            if stem_kind == "quad" or i >= 2:
                y = act(BatchNorm(not self.train, dtype=self.dtype,
                                  name=f"stem{i}_bn")(y))
        feats = [stem_tap]

        def norm_act(z, nm, do_act=True):
            z = BatchNorm(not self.train, dtype=self.dtype, name=nm)(z)
            return act(z) if do_act else z

        for si, (kind, depth, ch, gs, br, extra) in enumerate(stages):
            for bi in range(depth):
                stride = 2 if (bi == 0 and si > 0) else 1
                in_ch = y.shape[-1]
                mid = int(round(ch * br))
                groups = max(1, mid // gs) if gs else 1
                p = f"s{si}_b{bi}"
                shortcut = y
                if stride != 1 or in_ch != ch:
                    shortcut = _conv(ch, 1, stride, name=f"{p}_short",
                                     dtype=self.dtype)(y)
                    shortcut = BatchNorm(not self.train, dtype=self.dtype,
                                         name=f"{p}_short_bn")(shortcut)
                if kind == "edge":
                    z = _conv(mid, 3, stride, groups, name=f"{p}_c1",
                              dtype=self.dtype)(y)
                    z = norm_act(z, f"{p}_c1_bn")
                else:
                    z = _conv(mid, 1, name=f"{p}_c1", dtype=self.dtype)(y)
                    z = norm_act(z, f"{p}_c1_bn")
                    z = _conv(mid, 3, stride, groups, name=f"{p}_c2",
                              dtype=self.dtype)(z)
                    z = norm_act(z, f"{p}_c2_bn")
                    if extra:
                        z = _conv(mid, 3, 1, groups, name=f"{p}_c2b",
                                  dtype=self.dtype)(z)
                        z = norm_act(z, f"{p}_c2b_bn")
                z = _conv(ch, 1, name=f"{p}_c3", dtype=self.dtype)(z)
                z = norm_act(z, f"{p}_c3_bn", do_act=False)
                y = act(z + shortcut)
            feats.append(y)
        y = _conv(2048, 1, name="final", dtype=self.dtype)(y)
        feats[-1] = act(BatchNorm(not self.train, dtype=self.dtype,
                                  name="final_bn")(y))
        return feats


class ByobResNet(nn.Module):
    variant: str = "resnet33ts"
    train: bool = False
    dtype: object = None

    def _attn(self, y, kind, name):
        if kind == "se":
            return se_module(y, max(1, y.shape[-1] // 16), self.dtype, name)
        if kind == "eca":
            return eca_module(y, self.dtype, name)
        if kind == "gc":
            return gc_module(y, self.dtype, self.train, name)
        return y

    @nn.compact
    def __call__(self, x):
        if self.variant not in BYOB_SPECS:
            raise ValueError(f"unknown byob variant {self.variant!r}")
        depths, chans, gs, attn, final, actk = BYOB_SPECS[self.variant]
        act = nn.silu if actk == "silu" else nn.relu
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = x
        for i, (c, s) in enumerate(zip((24, 32, 64), (2, 1, 1))):
            y = _conv(c, 3, s, name=f"stem{i}", dtype=self.dtype)(y)
            y = act(BatchNorm(not self.train, dtype=self.dtype,
                              name=f"stem{i}_bn")(y))
        feats = [y]

        for si, (ch, n) in enumerate(zip(chans, depths)):
            for bi in range(n):
                stride = 2 if bi == 0 else 1
                in_ch = y.shape[-1]
                mid = ch // 4
                groups = max(1, mid // gs) if gs else 1
                p = f"s{si}_b{bi}"
                shortcut = y
                if stride != 1 or in_ch != ch:
                    shortcut = _conv(ch, 1, stride, name=f"{p}_short",
                                     dtype=self.dtype)(y)
                    shortcut = BatchNorm(not self.train, dtype=self.dtype,
                                         name=f"{p}_short_bn")(shortcut)
                z = _conv(mid, 1, name=f"{p}_c1", dtype=self.dtype)(y)
                z = act(BatchNorm(not self.train, dtype=self.dtype,
                                  name=f"{p}_c1_bn")(z))
                is_lambda = (
                    si in LAMBDA_STAGES.get(self.variant, ())
                    and bi == n - 1
                )
                if is_lambda:
                    z = LambdaLayer(
                        mid, train=self.train, dtype=self.dtype,
                        name=f"{p}_lambda",
                    )(z)
                    z = act(BatchNorm(not self.train, dtype=self.dtype,
                                      name=f"{p}_c2_bn")(z))
                else:
                    z = _conv(mid, 3, stride, groups, name=f"{p}_c2",
                              dtype=self.dtype)(z)
                    z = act(BatchNorm(not self.train, dtype=self.dtype,
                                      name=f"{p}_c2_bn")(z))
                z = self._attn(z, attn, f"{p}_attn")
                z = _conv(ch, 1, name=f"{p}_c3", dtype=self.dtype)(z)
                z = BatchNorm(not self.train, dtype=self.dtype,
                              name=f"{p}_c3_bn")(z)
                y = act(z + shortcut)
            feats.append(y)
        if final:
            y = _conv(final, 1, name="final", dtype=self.dtype)(y)
            y = act(BatchNorm(not self.train, dtype=self.dtype,
                              name="final_bn")(y))
            feats[-1] = y
        return feats


class LambdaLayer(nn.Module):
    """LambdaLayer (Bello, ICLR'21): content + local-position lambdas.

    q/k/v from 1x1 convs (BN on q and v per the paper); the content
    lambda is a softmax-over-context key/value outer product, the
    position lambdas a shared [r,r,k] embedding applied as a grouped
    spatial conv over the value map. Dense einsum/conv work only.
    """

    dim_out: int
    heads: int = 4
    dim_k: int = 16
    r: int = 9
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from jax import lax

        b, h, w, _ = x.shape
        n = h * w
        dim_v = self.dim_out // self.heads

        q = nn.Conv(self.heads * self.dim_k, (1, 1), use_bias=False,
                    dtype=self.dtype, name="q")(x)
        q = BatchNorm(not self.train, dtype=self.dtype, name="q_bn")(q)
        k = nn.Conv(self.dim_k, (1, 1), use_bias=False, dtype=self.dtype,
                    name="k")(x)
        v = nn.Conv(dim_v, (1, 1), use_bias=False, dtype=self.dtype,
                    name="v")(x)
        v = BatchNorm(not self.train, dtype=self.dtype, name="v_bn")(v)

        qf = q.reshape(b, n, self.heads, self.dim_k)
        kf = nn.softmax(k.reshape(b, n, self.dim_k), axis=1)
        vf = v.reshape(b, n, dim_v)

        lam_c = jnp.einsum("bnk,bnv->bkv", kf, vf)
        yc = jnp.einsum("bnhk,bkv->bnhv", qf, lam_c)

        # position lambdas: one [r,r,1,k] embedding shared across the v
        # channels -> grouped conv (group-major channels: [v, k])
        emb = self.param(
            "pos_emb", nn.initializers.normal(1.0 / self.dim_k),
            (self.r, self.r, 1, self.dim_k), jnp.float32,
        )
        kernel = jnp.tile(emb.astype(v.dtype), (1, 1, 1, dim_v))
        lam_p = lax.conv_general_dilated(
            v, kernel.reshape(self.r, self.r, 1, dim_v * self.dim_k),
            window_strides=(1, 1),
            padding=((self.r // 2,) * 2, (self.r // 2,) * 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=dim_v,
        )
        lam_p = lam_p.reshape(b, n, dim_v, self.dim_k)
        yp = jnp.einsum("bnhk,bnvk->bnhv", qf, lam_p)

        return (yc + yp).reshape(b, h, w, self.heads * dim_v)
