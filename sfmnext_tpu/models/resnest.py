"""ResNeSt split-attention trunks (Zhang et al. '20) for the timm-Unet.

Covers the reference's ``resnest14d/26d/50d/101e/200e/269e`` and the
radix/cardinality ablations ``resnest50d_1s4x24d`` / ``resnest50d_4s2x40d``
(networks/Unet.py:356-357).

Topology per timm/resnest reference semantics: deep stem (width 32 for the
'd' models, 64 for the 'e' models) + avg-down shortcuts; bottleneck with a
split-attention 3x3 (radix groups, r-softmax channel gating) and an
AvgPool(3,2,1) taking the stride ("avd", pool after the split-attention
conv). The split-sum / gating math is expressed with reshapes + means so
XLA keeps everything dense on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import (
    BatchNorm,
    avg_pool_2x2_s2_ceil,
    kaiming_normal_fanout,
    max_pool_3x3_s2,
)

# variant -> (depths, stem_width, radix, cardinality, base_width)
RESNEST_SPECS = {
    "resnest14d": ((1, 1, 1, 1), 32, 2, 1, 64),
    "resnest26d": ((2, 2, 2, 2), 32, 2, 1, 64),
    "resnest50d": ((3, 4, 6, 3), 32, 2, 1, 64),
    "resnest101e": ((3, 4, 23, 3), 64, 2, 1, 64),
    "resnest200e": ((3, 24, 36, 3), 64, 2, 1, 64),
    "resnest269e": ((3, 30, 48, 8), 64, 2, 1, 64),
    "resnest50d_1s4x24d": ((3, 4, 6, 3), 32, 1, 4, 24),
    "resnest50d_4s2x40d": ((3, 4, 6, 3), 32, 4, 2, 40),
}


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class SplitAttnConv(nn.Module):
    """3x3 split-attention conv: radix-grouped conv + r-softmax gating."""

    channels: int  # output channels (per-path width * cardinality)
    radix: int = 2
    cardinality: int = 1
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        r, c = self.radix, self.channels
        y = _conv(c * r, 3, 1, groups=self.cardinality * r, name="conv",
                  dtype=self.dtype)(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn0")(y)
        y = nn.relu(y)
        b, h, w, _ = y.shape
        if r > 1:
            # [B,H,W,r,c]: radix splits are channel-major groups
            splits = y.reshape(b, h, w, r, c)
            gap = splits.sum(axis=3).mean(axis=(1, 2), keepdims=True)
        else:
            gap = y.mean(axis=(1, 2), keepdims=True)
        inter = max(c * r // 4, 32)
        a = nn.Conv(
            inter, (1, 1), feature_group_count=self.cardinality,
            use_bias=True, kernel_init=kaiming_normal_fanout,
            dtype=self.dtype, name="fc1",
        )(gap)
        a = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(a)
        a = nn.relu(a)
        a = nn.Conv(
            c * r, (1, 1), feature_group_count=self.cardinality,
            use_bias=True, dtype=self.dtype, name="fc2",
        )(a)
        if r > 1:
            att = nn.softmax(a.reshape(b, 1, 1, r, c), axis=3)
            return (splits * att).sum(axis=3)
        return y * nn.sigmoid(a)


class ResNeStBottleneck(nn.Module):
    planes: int  # base width (out = 4x)
    stride: int = 1
    radix: int = 2
    cardinality: int = 1
    base_width: int = 64
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        group_width = int(
            self.planes * (self.base_width / 64.0)
        ) * self.cardinality
        y = _conv(group_width, 1, name="conv1", dtype=self.dtype)(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = SplitAttnConv(
            group_width, self.radix, self.cardinality, self.train,
            self.dtype, name="conv2",
        )(y)
        if self.stride > 1:  # "avd": pool takes the stride, conv2 stays s1
            y = nn.avg_pool(y, (3, 3), strides=(2, 2), padding=((1, 1),) * 2,
                            count_include_pad=False)
        y = _conv(out_ch, 1, name="conv3", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn3")(y)

        identity = x
        if self.stride != 1 or x.shape[-1] != out_ch:
            s = x
            if self.stride != 1:
                s = avg_pool_2x2_s2_ceil(s)
            identity = _conv(out_ch, 1, name="down_conv", dtype=self.dtype)(s)
            identity = BatchNorm(not self.train, dtype=self.dtype,
                                 name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNeSt(nn.Module):
    variant: str = "resnest50d"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in RESNEST_SPECS:
            raise ValueError(f"unknown resnest variant {self.variant!r}")
        depths, stem_w, radix, card, base_w = RESNEST_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = x
        for i, (c, s) in enumerate(zip((stem_w, stem_w, stem_w * 2),
                                       (2, 1, 1))):
            y = _conv(c, 3, s, name=f"conv1_{i}", dtype=self.dtype)(y)
            y = BatchNorm(not self.train, dtype=self.dtype,
                          name=f"bn1_{i}")(y)
            y = nn.relu(y)
        feats = [y]

        y = max_pool_3x3_s2(y)
        for si, (planes, n) in enumerate(zip((64, 128, 256, 512), depths)):
            for bi in range(n):
                y = ResNeStBottleneck(
                    planes, 2 if (bi == 0 and si > 0) else 1, radix, card,
                    base_w, self.train, self.dtype,
                    name=f"layer{si + 1}_{bi}",
                )(y)
            feats.append(y)
        return feats
