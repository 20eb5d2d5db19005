"""RegNetX / RegNetY encoders (NHWC, Flax) for the generic U-Net.

Behavioral reference: the reference's ``Unet`` accepts timm regnet
backbones via ``timm.create_model(name, features_only=True)``
(/root/reference/networks/Unet.py:114-117; names ``regnetx_002`` ...
``regnety_320`` at :316-383). Topology per Radosavovic et al.,
"Designing Network Design Spaces" (CVPR 2020): 3x3/2 stem (32ch), four
stages of X-blocks — a ResNet-style bottleneck with bottleneck ratio 1
and grouped 3x3 — each stage stride 2. RegNetY inserts an SE module
(reduction computed from the block's INPUT width, ratio 0.25) between
the grouped 3x3 and the projection 1x1, matching timm's placement.

Feature taps follow timm's features_only convention for regnets:
[stem, s1, s2, s3, s4] at strides 2/4/8/16/32.

Per-variant (depths, widths, group width) are the published tables from
the paper (timm ships the same); weight porting is not wired for this
family (timm is not in this environment — contract-tested only).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout, se_module

# name -> (depths, widths, group_width, se) — paper Tables 17/18.
REGNET_CFG = {
    "regnetx_002": ((1, 1, 4, 7), (24, 56, 152, 368), 8, False),
    "regnetx_004": ((1, 2, 7, 12), (32, 64, 160, 384), 16, False),
    "regnetx_006": ((1, 3, 5, 7), (48, 96, 240, 528), 24, False),
    "regnetx_008": ((1, 3, 7, 5), (64, 128, 288, 672), 16, False),
    "regnetx_016": ((2, 4, 10, 2), (72, 168, 408, 912), 24, False),
    "regnetx_032": ((2, 6, 15, 2), (96, 192, 432, 1008), 48, False),
    "regnetx_040": ((2, 5, 14, 2), (80, 240, 560, 1360), 40, False),
    "regnetx_064": ((2, 4, 10, 1), (168, 392, 784, 1624), 56, False),
    "regnetx_080": ((2, 5, 15, 1), (80, 240, 720, 1920), 120, False),
    "regnetx_120": ((2, 5, 11, 1), (224, 448, 896, 2240), 112, False),
    "regnetx_160": ((2, 6, 13, 1), (256, 512, 896, 2048), 128, False),
    "regnetx_320": ((2, 7, 13, 1), (336, 672, 1344, 2520), 168, False),
    "regnety_002": ((1, 1, 4, 7), (24, 56, 152, 368), 8, True),
    "regnety_004": ((1, 3, 6, 6), (48, 104, 208, 440), 8, True),
    "regnety_006": ((1, 3, 7, 4), (48, 112, 256, 608), 16, True),
    "regnety_008": ((1, 3, 8, 2), (64, 128, 320, 768), 16, True),
    "regnety_016": ((2, 6, 17, 2), (48, 120, 336, 888), 24, True),
    "regnety_032": ((2, 5, 13, 1), (72, 216, 576, 1512), 24, True),
    "regnety_040": ((2, 6, 12, 2), (128, 192, 512, 1088), 64, True),
    "regnety_064": ((2, 7, 14, 2), (144, 288, 576, 1296), 72, True),
    "regnety_080": ((2, 4, 10, 1), (168, 448, 896, 2016), 56, True),
    "regnety_120": ((2, 5, 11, 1), (224, 448, 896, 2240), 112, True),
    "regnety_160": ((2, 4, 11, 1), (224, 448, 1232, 3024), 112, True),
    "regnety_320": ((2, 5, 12, 1), (232, 696, 1392, 3712), 232, True),
}


def _conv_bn(x, feat, k, s, train, dtype, name, groups=1, act=True):
    y = nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2, use_bias=False,
        feature_group_count=groups, kernel_init=kaiming_normal_fanout,
        dtype=dtype, name=f"{name}_conv",
    )(x)
    y = BatchNorm(not train, dtype=dtype, name=f"{name}_bn")(y)
    return nn.relu(y) if act else y


class RegNetBlock(nn.Module):
    """X/Y block: 1x1 -> grouped 3x3 (stride) [-> SE] -> 1x1, residual."""

    features: int
    group_width: int
    strides: int = 1
    se: bool = False
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        groups = max(1, self.features // self.group_width)
        y = _conv_bn(x, self.features, 1, 1, self.train, self.dtype, "conv1")
        y = _conv_bn(
            y, self.features, 3, self.strides, self.train, self.dtype,
            "conv2", groups=groups,
        )
        if self.se:
            # timm: reduction from the block INPUT width, ratio 0.25
            y = se_module(
                y, max(1, int(round(in_ch * 0.25))), self.dtype, "se"
            )
        y = _conv_bn(
            y, self.features, 1, 1, self.train, self.dtype, "conv3", act=False
        )
        if self.strides != 1 or in_ch != self.features:
            x = _conv_bn(
                x, self.features, 1, self.strides, self.train, self.dtype,
                "down", act=False,
            )
        return nn.relu(y + x)


class RegNet(nn.Module):
    """5-level RegNet feature pyramid (timm features_only stride taps)."""

    variant: str = "regnety_032"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in REGNET_CFG:
            raise ValueError(f"unknown regnet variant {self.variant!r}")
        depths, widths, gw, se = REGNET_CFG[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = _conv_bn(x, 32, 3, 2, self.train, self.dtype, "stem")
        feats = [y]
        for stage, (d, w) in enumerate(zip(depths, widths)):
            for i in range(d):
                y = RegNetBlock(
                    w, gw, 2 if i == 0 else 1, se, self.train, self.dtype,
                    name=f"s{stage + 1}_b{i}",
                )(y)
            feats.append(y)
        return feats
