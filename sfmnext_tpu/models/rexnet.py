"""ReXNet trunks (Han et al. CVPR'21) for the timm-Unet backbones.

Covers ``rexnet_100/130/150/200`` (networks/Unet.py:358). Linear
bottlenecks whose output width grows linearly block-to-block (16 -> 180
over 16 blocks at width 1.0), swish expand + ReLU6 depthwise activations,
SE (ratio 1/12) from the third stage on, and the signature partial
residual: only the first ``in_ch`` channels receive the shortcut.
"""

from __future__ import annotations

import math

import flax.linen as nn

from sfmnext_tpu.models.common import kaiming_normal_fanout
from sfmnext_tpu.models.mobile_builder import make_divisible

_LAYERS = (1, 2, 2, 3, 3, 5)
_STRIDES = (1, 2, 2, 2, 1, 2)


def rexnet_cfg(width_mult: float):
    strides = []
    for n, s in zip(_LAYERS, _STRIDES):
        strides += [s] + [1] * (n - 1)
    exp = [1] * _LAYERS[0] + [6] * (len(strides) - _LAYERS[0])
    use_se = [False] * (_LAYERS[0] + _LAYERS[1]) + [True] * (
        len(strides) - _LAYERS[0] - _LAYERS[1]
    )
    n_blocks = len(strides)
    base = 16.0 / width_mult if width_mult < 1.0 else 16.0
    chs = []
    for _ in range(n_blocks):
        chs.append(make_divisible(round(base * width_mult), 1))
        base += 180.0 / n_blocks
    # official clovaai/rexnet rexnetv1.py: stem_channel = 32/wm if wm < 1
    # else 32; out = round(stem_channel * wm) (no divisibility rounding)
    stem = int(round((32.0 / width_mult if width_mult < 1 else 32.0)
                     * width_mult))
    return stem, list(zip(chs, strides, exp, use_se))


class LinearBottleneck(nn.Module):
    out_ch: int
    stride: int
    expand: int
    use_se: bool
    train: bool = False
    dtype: object = None

    def _bn(self, x, name):
        return nn.BatchNorm(
            use_running_average=not self.train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )(x)

    def _conv(self, x, feat, k, s=1, groups=1, name=None):
        return nn.Conv(
            feat, (k, k), strides=(s, s), padding=k // 2,
            feature_group_count=groups, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype, name=name,
        )(x)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = x
        if self.expand != 1:
            mid = make_divisible(round(in_ch * self.expand), 1)
            y = self._conv(y, mid, 1, name="conv_exp")
            y = nn.silu(self._bn(y, "bn_exp"))
        else:
            mid = in_ch
        y = self._conv(y, mid, 3, self.stride, groups=mid, name="conv_dw")
        y = self._bn(y, "bn_dw")
        if self.use_se:
            # official ReXNet SE normalizes the squeezed vector (SEWithNorm,
            # clovaai rexnetv1.py SE: rd = channels // se_ratio with
            # se_ratio=12, no divisibility rounding — timm ch_div=1)
            rd = max(1, int(mid / 12))
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(rd, (1, 1), dtype=self.dtype, name="se_reduce")(s)
            s = self._bn(s, "se_bn")
            s = nn.relu(s)
            s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
            y = y * nn.sigmoid(s)
        y = nn.relu6(y)
        y = self._conv(y, self.out_ch, 1, name="conv_pwl")
        y = self._bn(y, "bn_pwl")
        if self.stride == 1 and in_ch <= self.out_ch:
            # partial residual on the leading in_ch channels
            y = y.at[..., :in_ch].add(x)
        return y


class ReXNet(nn.Module):
    variant: str = "rexnet_100"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if not self.variant.startswith("rexnet_"):
            raise ValueError(f"unknown rexnet variant {self.variant!r}")
        w = int(self.variant[len("rexnet_"):]) / 100.0
        stem, blocks = rexnet_cfg(w)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = nn.Conv(
            stem, (3, 3), strides=(2, 2), padding=1, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype,
            name="stem_conv",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not self.train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="stem_bn",
        )(y)
        y = nn.silu(y)

        reduction, last_at = 2, {2: y}
        for i, (ch, s, e, se) in enumerate(blocks):
            y = LinearBottleneck(
                ch, s, e, se, self.train, self.dtype, name=f"block{i}"
            )(y)
            if s == 2:
                reduction *= 2
            last_at[reduction] = y
        return [last_at[r] for r in (2, 4, 8, 16, 32)]
