"""Pre-activation ResNetV2 / BiT ("Big Transfer") trunks for timm-Unet.

Covers the reference's ``resnetv2_*`` backbone names (networks/Unet.py:
356-361): the BN preact ``resnetv2_50/101``, the BiT transfer models
``resnetv2_{50,101,152}x{1,2,3,4}_bitm[_in21k]`` (GroupNorm-32 +
weight-standardized convs, Kolesnikov et al. ECCV'20), the
``bit_teacher``/``bit_distilled`` aliases, and the ``resnetv2_50d_gn`` /
``resnetv2_50d_evos`` deep-stem variants (EvoNorm-S0 for the latter,
Liu et al. NeurIPS'20).

Design notes (TPU): weight standardization is done on the kernel at call
time in f32 (a handful of FLOPs vs the conv itself; XLA constant-folds it
into the conv weights at inference). Preact stage sums are tapped raw, as
timm ``features_only`` does; the deepest tap gets the trunk's final
norm-act so the Unet decoder's first conv sees normalized activations
(same decision as models/densenet.py norm5).
"""

from __future__ import annotations

import re

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout

RESNETV2_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class WSConv(nn.Module):
    """Conv with weight standardization (BiT StdConv semantics)."""

    features: int
    kernel: int
    strides: int = 1
    train: bool = False  # unused; uniform signature
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", kaiming_normal_fanout,
            (self.kernel, self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        mu = k.mean(axis=(0, 1, 2), keepdims=True)
        var = k.var(axis=(0, 1, 2), keepdims=True)
        k = (k - mu) / jnp.sqrt(var + 1e-10)
        if self.dtype is not None:
            k = k.astype(self.dtype)
            x = x.astype(self.dtype)
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.strides, self.strides), padding="SAME",
            use_bias=False, dtype=self.dtype,
        ).apply({"params": {"kernel": k}}, x)


class _NormAct(nn.Module):
    """norm ('bn' | 'gn' | 'evos') followed by ReLU (evos is its own act)."""

    kind: str = "gn"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.kind == "bn":
            return nn.relu(
                BatchNorm(not self.train, dtype=self.dtype, name="norm")(x)
            )
        if self.kind == "gn":
            return nn.relu(
                nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name="norm")(x)
            )
        # EvoNorm-S0: x*sigmoid(v x) / group_std * gamma + beta
        c = x.shape[-1]
        v = self.param("v", nn.initializers.ones, (c,), jnp.float32)
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        groups = 32 if c % 32 == 0 else 1
        xf = x.astype(jnp.float32)
        num = xf * nn.sigmoid(v * xf)
        g = xf.reshape(*x.shape[:-1], groups, c // groups)
        std = jnp.sqrt(g.var(axis=(1, 2, 4), keepdims=True) + 1e-5)
        std = jnp.broadcast_to(std, g.shape).reshape(x.shape)
        y = num / std * gamma + beta
        return y.astype(x.dtype)


class PreactBottleneck(nn.Module):
    out_ch: int
    stride: int = 1
    norm: str = "gn"
    ws: bool = True
    avg_down: bool = False
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        conv = WSConv if self.ws else _PlainConv
        mid = self.out_ch // 4
        xp = _NormAct(self.norm, self.train, self.dtype, name="preact")(x)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            s = xp
            stride = self.stride
            if self.avg_down and stride != 1:
                from sfmnext_tpu.models.common import avg_pool_2x2_s2_ceil

                s, stride = avg_pool_2x2_s2_ceil(s), 1
            shortcut = conv(
                self.out_ch, 1, stride, dtype=self.dtype, name="down_conv"
            )(s)
        y = conv(mid, 1, dtype=self.dtype, name="conv1")(xp)
        y = _NormAct(self.norm, self.train, self.dtype, name="na1")(y)
        y = conv(mid, 3, self.stride, dtype=self.dtype, name="conv2")(y)
        y = _NormAct(self.norm, self.train, self.dtype, name="na2")(y)
        y = conv(self.out_ch, 1, dtype=self.dtype, name="conv3")(y)
        return y + shortcut


class _PlainConv(nn.Module):
    features: int
    kernel: int
    strides: int = 1
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # torch-style symmetric padding (the BN resnetv2 variants are
        # regular torch convs in timm; only BiT uses SAME)
        p = self.kernel // 2
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.strides, self.strides), padding=((p, p), (p, p)),
            use_bias=False, kernel_init=kaiming_normal_fanout,
            dtype=self.dtype, name="conv",
        )(x)


def resnetv2_cfg(variant: str):
    """Parse a resnetv2_* name -> (depths, width_factor, norm, ws, stem)."""
    name = variant
    for suf in ("_in21k", "_384"):
        if name.endswith(suf):
            name = name[: -len(suf)]
    if name == "resnetv2_50x1_bit_distilled":
        name = "resnetv2_50x1_bitm"
    if name == "resnetv2_152x2_bit_teacher":
        name = "resnetv2_152x2_bitm"

    m = re.fullmatch(r"resnetv2_(\d+)x(\d+)_bitm", name)
    if m:
        depth, wf = int(m.group(1)), int(m.group(2))
        return RESNETV2_DEPTHS[depth], wf, "gn", True, ""
    m = re.fullmatch(r"resnetv2_(\d+)", name)
    if m:
        return RESNETV2_DEPTHS[int(m.group(1))], 1, "bn", False, ""
    if name == "resnetv2_50d_gn":
        return RESNETV2_DEPTHS[50], 1, "gn", True, "deep"
    if name == "resnetv2_50d_evos":
        return RESNETV2_DEPTHS[50], 1, "evos", True, "deep"
    raise ValueError(f"unknown resnetv2 variant {variant!r}")


class ResNetV2(nn.Module):
    variant: str = "resnetv2_50x1_bitm"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        depths, wf, norm, ws, stem = resnetv2_cfg(self.variant)
        conv = WSConv if ws else _PlainConv
        avg_down = bool(stem)  # the 'd' variants also use avg-down
        if self.dtype is not None:
            x = x.astype(self.dtype)

        stem_ch = 64 * wf
        if stem == "deep":
            y = x
            for i, (c, s) in enumerate(
                zip((stem_ch // 2, stem_ch // 2, stem_ch), (2, 1, 1))
            ):
                y = conv(c, 3, s, dtype=self.dtype, name=f"stem{i}")(y)
        else:
            y = conv(stem_ch, 7, 2, dtype=self.dtype, name="stem")(x)
        feats = [y]

        if ws:
            # timm BiT uses SAME-padded pooling (MaxPool2dSame)
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        else:
            from sfmnext_tpu.models.common import max_pool_3x3_s2

            y = max_pool_3x3_s2(y)
        for si, (width, n) in enumerate(
            zip((256 * wf, 512 * wf, 1024 * wf, 2048 * wf), depths)
        ):
            for bi in range(n):
                y = PreactBottleneck(
                    width, 2 if (bi == 0 and si > 0) else 1, norm, ws,
                    avg_down, self.train, self.dtype,
                    name=f"stage{si}_block{bi}",
                )(y)
            feats.append(y)
        # final trunk norm-act folded into the deepest tap
        feats[-1] = _NormAct(norm, self.train, self.dtype, name="norm")(
            feats[-1]
        )
        return feats
