"""Res2Net encoders (NHWC, Flax) for the generic U-Net.

Behavioral reference: the reference's ``Unet`` accepts timm res2net
backbones via ``timm.create_model(name, features_only=True)``
(/root/reference/networks/Unet.py:114-117; names ``res2net50_26w_4s``,
``res2net50_14w_8s``, ``res2net50_26w_6s``, ``res2net50_26w_8s``,
``res2net50_48w_2s``, ``res2net101_26w_4s``, ``res2next50`` at
:316-383). Topology per Gao et al., "Res2Net: A New Multi-scale
Backbone Architecture" (TPAMI 2021), following timm's Bottle2neck:

  - conv1 1x1 -> width*scale channels; split into `scale` chunks;
  - hierarchical 3x3 convs: sp_i = conv(sp_{i-1} + x_i) (cascade only in
    stride-1 non-first blocks; first block of a stage convs each chunk
    independently and 3x3/stride avg-pools the passthrough chunk);
  - last chunk passes through unchanged (scale > 1);
  - concat -> conv3 1x1 -> planes*4, ResNet residual wiring.

ResNet stem (7x7/2 + maxpool), monodepth2-style 5 feature taps at
strides 2/4/8/16/32. Weight porting is not wired for this family (timm
is not in this environment — contract-tested only).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout, max_pool_3x3_s2

# name -> (stage_sizes, base_width, scale, cardinality)
RES2NET_CFG = {
    "res2net50_26w_4s": ((3, 4, 6, 3), 26, 4, 1),
    "res2net50_14w_8s": ((3, 4, 6, 3), 14, 8, 1),
    "res2net50_26w_6s": ((3, 4, 6, 3), 26, 6, 1),
    "res2net50_26w_8s": ((3, 4, 6, 3), 26, 8, 1),
    "res2net50_48w_2s": ((3, 4, 6, 3), 48, 2, 1),
    "res2net101_26w_4s": ((3, 4, 23, 3), 26, 4, 1),
    "res2next50": ((3, 4, 6, 3), 4, 4, 8),
}


def _conv(x, feat, k, s, dtype, name, groups=1):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2, use_bias=False,
        feature_group_count=groups, kernel_init=kaiming_normal_fanout,
        dtype=dtype, name=name,
    )(x)


def _avg_pool_3x3(x, stride: int):
    return nn.avg_pool(
        x, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1))
    )


class Bottle2neck(nn.Module):
    """Res2Net bottleneck (timm Bottle2neck semantics), expansion 4."""

    planes: int
    base_width: int = 26
    scale: int = 4
    cardinality: int = 1
    strides: int = 1
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        is_first = self.strides > 1 or x.shape[-1] != out_ch
        identity = x

        y = _conv(x, width * self.scale, 1, 1, self.dtype, "conv1")
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)

        chunks = [
            y[..., i * width : (i + 1) * width] for i in range(self.scale)
        ]
        n_convs = self.scale if self.scale == 1 else self.scale - 1
        outs = []
        sp = None
        for i in range(n_convs):
            sp = chunks[i] if (i == 0 or is_first) else sp + chunks[i]
            sp = _conv(
                sp, width, 3, self.strides, self.dtype, f"conv2_{i}",
                groups=self.cardinality,
            )
            sp = BatchNorm(not self.train, dtype=self.dtype, name=f"bn2_{i}")(sp)
            sp = nn.relu(sp)
            outs.append(sp)
        if self.scale > 1:
            last = chunks[-1]
            outs.append(
                _avg_pool_3x3(last, self.strides) if is_first else last
            )
        y = jnp.concatenate(outs, axis=-1)

        y = _conv(y, out_ch, 1, 1, self.dtype, "conv3")
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn3")(y)
        if is_first:
            identity = _conv(x, out_ch, 1, self.strides, self.dtype, "down_conv")
            identity = BatchNorm(
                not self.train, dtype=self.dtype, name="down_bn"
            )(identity)
        return nn.relu(y + identity)


class Res2Net(nn.Module):
    """5-level Res2Net feature pyramid (monodepth2/timm stride taps)."""

    variant: str = "res2net50_26w_4s"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in RES2NET_CFG:
            raise ValueError(f"unknown res2net variant {self.variant!r}")
        stage_sizes, bw, scale, card = RES2NET_CFG[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = _conv(x, 64, 7, 2, self.dtype, "conv1")
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        feats = [y]

        y = max_pool_3x3_s2(y)
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), stage_sizes)
        ):
            for i in range(n_blocks):
                strides = 2 if (i == 0 and stage > 0) else 1
                y = Bottle2neck(
                    planes, bw, scale, card, strides, self.train, self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(y)
            feats.append(y)
        return feats
