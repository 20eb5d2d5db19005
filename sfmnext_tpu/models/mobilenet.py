"""MobileNetV2/V3-style encoders (NHWC, Flax) for the generic U-Net.

Behavioral reference: the reference's ``Unet`` accepts timm mobilenet
backbones via ``timm.create_model(name, features_only=True)``
(/root/reference/networks/Unet.py:114-117, names at :316-383).
MobileNetV2 topology (Sandler et al.): 3x3/2 stem, inverted-residual
bottlenecks (expand 1x1 -> depthwise 3x3 -> project 1x1, ReLU6, residual
when stride 1 and channels match), width-multiplier variants. Feature
taps follow timm's features_only convention: the last activation at each
stride (2/4/8/16/32), tapped at the expansion layer boundary.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout

# (t expansion, c channels, n repeats, s stride) — MobileNetV2 table 2
_V2_BLOCKS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
              (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

# width, depth multiplier, fixed (unscaled) stem — timm _gen_mobilenet_v2:
# the 'd' variants scale depth (ceil, first/last stage pinned) and keep
# the 32-ch stem
MOBILENET_WIDTHS = {
    "mobilenetv2_050": (0.5, 1.0, False),
    "mobilenetv2_100": (1.0, 1.0, False),
    "mobilenetv2_110d": (1.1, 1.2, True),
    "mobilenetv2_120d": (1.2, 1.4, True),
    "mobilenetv2_140": (1.4, 1.0, False),
}


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _conv_bn(x, feat, k, s, train, dtype, name, groups=1, act=True):
    y = nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2, use_bias=False,
        feature_group_count=groups, kernel_init=kaiming_normal_fanout,
        dtype=dtype, name=f"{name}_conv",
    )(x)
    y = BatchNorm(not train, dtype=dtype, name=f"{name}_bn")(y)
    return jnp.minimum(nn.relu(y), 6.0) if act else y


class InvertedResidual(nn.Module):
    features: int
    strides: int = 1
    expand: int = 6
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = _conv_bn(y, hidden, 1, 1, self.train, self.dtype, "expand")
        y = _conv_bn(
            y, hidden, 3, self.strides, self.train, self.dtype, "depthwise",
            groups=hidden,
        )
        y = _conv_bn(
            y, self.features, 1, 1, self.train, self.dtype, "project",
            act=False,
        )
        if self.strides == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """5-level MobileNetV2 pyramid (timm features_only stride taps)."""

    variant: str = "mobilenetv2_100"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in MOBILENET_WIDTHS:
            raise ValueError(f"unknown mobilenet variant {self.variant!r}")
        width, depth, fix_stem = MOBILENET_WIDTHS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = _conv_bn(
            x, 32 if fix_stem else _make_divisible(32 * width), 3, 2,
            self.train, self.dtype, "stem",
        )
        feats = []
        stride = 2
        bi = 0
        n_stages = len(_V2_BLOCKS)
        for si, (t, c, n, s) in enumerate(_V2_BLOCKS):
            ch = _make_divisible(c * width)
            if depth != 1.0 and si not in (0, n_stages - 1):
                n = int(math.ceil(n * depth))
            for i in range(n):
                blk_s = s if i == 0 else 1
                if blk_s == 2:
                    feats.append(y)  # last map at the previous stride
                    stride *= 2
                y = InvertedResidual(
                    ch, blk_s, t, self.train, self.dtype, name=f"block{bi}",
                )(y)
                bi += 1
        feats.append(y)  # stride-32 final map
        return feats
