"""Normalizer-Free trunks (Brock et al. ICML'21) for the timm-Unet
backbones.

Covers ``dm_nfnet_f0..f6``, ``nfnet_l0``, ``eca_nfnet_l0/l1/l2`` and
``nf_resnet50`` (networks/Unet.py:342-344). No BatchNorm anywhere:
scaled-weight-standardized convs (learnable per-channel gain over a
variance-normalized kernel), gamma-corrected activations, and
variance-tracked residuals ``x + alpha * f(act(x) / beta)`` with
skip-init gain.

NFNet-F: 4-conv deep stem (16/32/64/128, ending at stride 4), stages
(256, 512, 1536, 1536) with double grouped 3x3s (group width 128) and
SE (rd 0.5, 2x-sigmoid gate); depth multiplier k+1 over (1,2,6,3) for
f_k. The L variants use single-depth recipes with ECA (eca_nfnet) or SE
(nfnet_l0) and SiLU. nf_resnet50 is the pre-act ResNet-50 topology with
a 7x7 stem.

Feature taps at reductions 2/4/8/16/32; the r2 tap of the F/L stem is the
pre-downsample stem conv activation.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import (
    eca_module,
    kaiming_normal_fanout,
    max_pool_3x3_s2,
)

_GAMMA_GELU = 1.7015043497085571
_GAMMA_RELU = 1.7139588594436646
_GAMMA_SILU = 1.7881293296813965


def _act(kind):
    if kind == "gelu":
        return lambda x: nn.gelu(x, approximate=False) * _GAMMA_GELU
    if kind == "silu":
        return lambda x: nn.silu(x) * _GAMMA_SILU
    return lambda x: nn.relu(x) * _GAMMA_RELU


class ScaledStdConv(nn.Module):
    features: int
    kernel: int
    strides: int = 1
    groups: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", kaiming_normal_fanout,
            (self.kernel, self.kernel, x.shape[-1] // self.groups,
             self.features), jnp.float32,
        )
        gain = self.param("gain", nn.initializers.ones,
                          (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        fan_in = self.kernel * self.kernel * k.shape[2]
        mu = k.mean(axis=(0, 1, 2), keepdims=True)
        var = k.var(axis=(0, 1, 2), keepdims=True)
        k = (k - mu) / jnp.sqrt(var * fan_in + 1e-10) * gain
        if self.dtype is not None:
            k = k.astype(self.dtype)
            x = x.astype(self.dtype)
            bias = bias.astype(self.dtype)
        y = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=self.kernel // 2, feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype,
        ).apply({"params": {"kernel": k}}, x)
        return y + bias


# variant -> (depths, channels, group_width, double_3x3, attn, act)
NFNET_SPECS = {}
for _i in range(7):
    NFNET_SPECS[f"dm_nfnet_f{_i}"] = (
        tuple(d * (_i + 1) for d in (1, 2, 6, 3)),
        (256, 512, 1536, 1536), 128, True, "se0.5", "gelu",
    )
NFNET_SPECS["nfnet_l0"] = (
    (1, 2, 6, 3), (256, 512, 1536, 1536), 64, False, "se0.25", "silu",
)
for _i, _d in enumerate(((1, 2, 6, 3), (2, 4, 12, 6), (3, 6, 18, 9))):
    NFNET_SPECS[f"eca_nfnet_l{_i}"] = (
        _d, (256, 512, 1536, 1536), 64, False, "eca", "silu",
    )


class NFBlock(nn.Module):
    out_ch: int
    stride: int
    beta: float
    alpha: float = 0.2
    group_width: int = 128
    double_3x3: bool = True
    attn: str = "se0.5"
    act: str = "gelu"
    bottle_ratio: float = 0.5
    reg: bool = False  # NF-RegNet: mid from in chs, SE mid after the 3x3
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        act = _act(self.act)
        base = x.shape[-1] if self.reg else self.out_ch
        mid = int(base * self.bottle_ratio)
        groups = max(1, mid // self.group_width) if self.group_width else 1
        mid = groups * self.group_width if self.group_width else mid

        y = act(x) * (1.0 / self.beta)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            s = y
            if self.stride != 1:
                s = nn.avg_pool(s, (2, 2), strides=(2, 2))
            shortcut = ScaledStdConv(self.out_ch, 1, dtype=self.dtype,
                                     name="down")(s)
        y = ScaledStdConv(mid, 1, dtype=self.dtype, name="conv1")(y)
        y = act(y)
        y = ScaledStdConv(mid, 3, self.stride, groups, dtype=self.dtype,
                          name="conv2")(y)
        y = act(y)
        if self.double_3x3:
            y = ScaledStdConv(mid, 3, 1, groups, dtype=self.dtype,
                              name="conv2b")(y)
            y = act(y)
        if self.reg and self.attn.startswith("se"):
            # NF-RegNet places SE on the expanded mid channels
            ratio = float(self.attn[2:])
            rd = max(1, int(mid * ratio))
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(rd, (1, 1), dtype=self.dtype, name="se_fc1")(s)
            s = nn.relu(s)
            s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_fc2")(s)
            y = y * (2.0 * nn.sigmoid(s))
        y = ScaledStdConv(self.out_ch, 1, dtype=self.dtype, name="conv3")(y)
        if self.reg:
            pass
        elif self.attn.startswith("se"):
            ratio = float(self.attn[2:])
            rd = max(1, int(self.out_ch * ratio))
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(rd, (1, 1), dtype=self.dtype, name="se_fc1")(s)
            s = nn.relu(s)
            s = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="se_fc2")(s)
            y = y * (2.0 * nn.sigmoid(s))
        elif self.attn == "eca":
            y = eca_module(y, self.dtype, "eca") * 2.0
        gain = self.param("skipinit_gain", nn.initializers.zeros, ())
        return shortcut + self.alpha * gain.astype(y.dtype) * y


class NFNet(nn.Module):
    variant: str = "dm_nfnet_f0"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        alpha = 0.2

        if self.variant == "nf_resnet50":
            act = _act("relu")
            y = ScaledStdConv(64, 7, 2, dtype=self.dtype, name="stem")(x)
            feats = [act(y)]
            y = max_pool_3x3_s2(y)
            expected_var = 1.0
            for si, (ch, n) in enumerate(
                zip((256, 512, 1024, 2048), (3, 4, 6, 3))
            ):
                for bi in range(n):
                    transition = bi == 0
                    beta = math.sqrt(expected_var)
                    y = NFBlock(
                        ch, 2 if (transition and si > 0) else 1, beta,
                        alpha, 0, False, "none", "relu", 0.25, reg=False,
                        train=self.train, dtype=self.dtype,
                        name=f"s{si}_b{bi}",
                    )(y)
                    expected_var = (
                        1.0 if transition else expected_var
                    ) + alpha ** 2
                feats.append(y)
            feats[-1] = act(feats[-1])
            return feats

        if self.variant == "nf_regnet_b1":
            # timm nfnet.py _nfreg_cfg(depths=(2,4,7,7)): RegNetY-B widths
            # (48,104,208,440) x width 0.75 (rounded /8), group size 8,
            # bottle 2.25 from in chs, SE(0.5) on mid, SiLU, 3x3 stem.
            act = _act("silu")
            y = ScaledStdConv(40, 3, 2, dtype=self.dtype, name="stem")(x)
            feats = [act(y)]
            expected_var = 1.0
            for si, (ch, n) in enumerate(
                zip((40, 80, 160, 328), (2, 4, 7, 7))
            ):
                for bi in range(n):
                    transition = bi == 0
                    beta = math.sqrt(expected_var)
                    y = NFBlock(
                        ch, 2 if transition else 1, beta, alpha, 8,
                        False, "se0.5", "silu", 2.25, reg=True,
                        train=self.train, dtype=self.dtype,
                        name=f"s{si}_b{bi}",
                    )(y)
                    expected_var = (
                        1.0 if transition else expected_var
                    ) + alpha ** 2
                feats.append(y)
            feats[-1] = act(feats[-1])
            return feats

        if self.variant not in NFNET_SPECS:
            raise ValueError(f"unknown nfnet variant {self.variant!r}")
        depths, chans, gw, dbl, attn, actk = NFNET_SPECS[self.variant]
        act = _act(actk)

        y = x
        for i, (c, s) in enumerate(zip((16, 32, 64, 128), (2, 1, 1, 2))):
            if i == 3:
                stem_tap = y  # r2, pre-downsample
            y = ScaledStdConv(c, 3, s, dtype=self.dtype, name=f"stem{i}")(y)
            if i < 3:
                y = act(y)
        feats = [stem_tap]

        expected_var = 1.0
        for si, (ch, n) in enumerate(zip(chans, depths)):
            for bi in range(n):
                transition = bi == 0
                beta = math.sqrt(expected_var)
                # NOTE keywords from here: a positional self.train once
                # landed in ``reg`` and silently built NF-RegNet topology
                # (SE-on-mid, mid from in_chs) for every train-mode build
                y = NFBlock(
                    ch, 2 if (transition and si > 0) else 1, beta, alpha,
                    gw, dbl, attn, actk, 0.5, reg=False,
                    train=self.train, dtype=self.dtype,
                    name=f"s{si}_b{bi}",
                )(y)
                expected_var = (
                    1.0 if transition else expected_var
                ) + alpha ** 2
            feats.append(y)
        feats[-1] = act(feats[-1])
        return feats
