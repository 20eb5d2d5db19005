"""GhostNet trunk (Han et al. CVPR'20) for the timm-Unet backbones.

Covers ``ghostnet_100`` (networks/Unet.py:345). Ghost modules make half
the channels with a 1x1 conv and the other half with a cheap depthwise
3x3 over those primary channels; blocks are inverted residuals built from
two ghost modules with optional SE (hard-sigmoid, rd 0.25).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout
from sfmnext_tpu.models.mobile_builder import make_divisible

# (kernel, exp, out, se_ratio, stride) — ghostnet paper table 1
GHOSTNET_CFG = [
    (3, 16, 16, 0.0, 1),
    (3, 48, 24, 0.0, 2),
    (3, 72, 24, 0.0, 1),
    (5, 72, 40, 0.25, 2),
    (5, 120, 40, 0.25, 1),
    (3, 240, 80, 0.0, 2),
    (3, 200, 80, 0.0, 1),
    (3, 184, 80, 0.0, 1),
    (3, 184, 80, 0.0, 1),
    (3, 480, 112, 0.25, 1),
    (3, 672, 112, 0.25, 1),
    (5, 672, 160, 0.25, 2),
    (5, 960, 160, 0.0, 1),
    (5, 960, 160, 0.25, 1),
    (5, 960, 160, 0.0, 1),
    (5, 960, 160, 0.25, 1),
]


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class GhostModule(nn.Module):
    out_ch: int
    relu: bool = True
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        init_ch = -(-self.out_ch // 2)  # ceil
        y1 = _conv(init_ch, 1, name="primary", dtype=self.dtype)(x)
        y1 = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y1)
        if self.relu:
            y1 = nn.relu(y1)
        y2 = _conv(init_ch, 3, groups=init_ch, name="cheap",
                   dtype=self.dtype)(y1)
        y2 = BatchNorm(not self.train, dtype=self.dtype, name="bn2")(y2)
        if self.relu:
            y2 = nn.relu(y2)
        return jnp.concatenate([y1, y2], axis=-1)[..., : self.out_ch]


class GhostBottleneck(nn.Module):
    kernel: int
    mid_ch: int
    out_ch: int
    se_ratio: float = 0.0
    stride: int = 1
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = GhostModule(self.mid_ch, True, self.train, self.dtype,
                        name="ghost1")(x)
        if self.stride > 1:
            y = _conv(self.mid_ch, self.kernel, self.stride,
                      groups=self.mid_ch, name="dw", dtype=self.dtype)(y)
            y = BatchNorm(not self.train, dtype=self.dtype, name="dw_bn")(y)
        if self.se_ratio > 0:
            rd = make_divisible(self.mid_ch * self.se_ratio, 4)
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(rd, (1, 1), dtype=self.dtype, name="se_reduce")(s)
            s = nn.relu(s)
            s = nn.Conv(self.mid_ch, (1, 1), dtype=self.dtype,
                        name="se_expand")(s)
            y = y * jnp.clip(s / 6.0 + 0.5, 0.0, 1.0)  # ghostnet hard gate
        y = GhostModule(self.out_ch, False, self.train, self.dtype,
                        name="ghost2")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            return y + x
        s = _conv(in_ch, self.kernel, self.stride, groups=in_ch,
                  name="short_dw", dtype=self.dtype)(x)
        s = BatchNorm(not self.train, dtype=self.dtype, name="short_dw_bn")(s)
        s = _conv(self.out_ch, 1, name="short_pw", dtype=self.dtype)(s)
        s = BatchNorm(not self.train, dtype=self.dtype, name="short_pw_bn")(s)
        return y + s


class GhostNet(nn.Module):
    variant: str = "ghostnet_100"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if not self.variant.startswith("ghostnet_"):
            raise ValueError(f"unknown ghostnet variant {self.variant!r}")
        w = int(self.variant[len("ghostnet_"):]) / 100.0
        if self.dtype is not None:
            x = x.astype(self.dtype)

        stem = make_divisible(16 * w, 4)
        y = _conv(stem, 3, 2, name="stem", dtype=self.dtype)(x)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="stem_bn")(y))
        reduction, last_at = 2, {2: y}
        for i, (k, e, c, se, s) in enumerate(GHOSTNET_CFG):
            y = GhostBottleneck(
                k, make_divisible(e * w, 4), make_divisible(c * w, 4), se,
                s, self.train, self.dtype, name=f"block{i}",
            )(y)
            if s == 2:
                reduction *= 2
            last_at[reduction] = y
        head = make_divisible(960 * w, 4)
        y = _conv(head, 1, name="head", dtype=self.dtype)(y)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="head_bn")(y))
        last_at[reduction] = y
        return [last_at[r] for r in (2, 4, 8, 16, 32)]
