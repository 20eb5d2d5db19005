"""Selective-Kernel networks (NHWC, Flax) for the generic U-Net.

Behavioral reference: the reference's ``Unet`` accepts timm sknet
backbones via ``timm.create_model(name, features_only=True)``
(/root/reference/networks/Unet.py:114-117; names ``skresnet18``,
``skresnet34``, ``skresnext50_32x4d`` at :316-383). Topology per Li et
al., "Selective Kernel Networks" (CVPR 2019), following timm:

  - SelectiveKernel conv: two 3x3 branches (dilation 1 and 2), shared
    stride; softmax attention over branches from a squeezed descriptor
    (global pool of the branch sum -> 1x1+BN+ReLU reduce -> 1x1 to
    paths*C -> softmax over paths); weighted branch sum.
  - skresnet18/34: BasicBlock with the FIRST 3x3 replaced by a
    SelectiveKernel (rd_ratio 1/8, split_input — each branch sees half
    the input channels).
  - skresnext50_32x4d: Bottleneck with the grouped 3x3 replaced by a
    SelectiveKernel (cardinality 32, base width 4, rd_ratio 1/16).

ResNet stem + monodepth2-style 5 feature taps at strides 2/4/8/16/32.
Weight porting is not wired for this family (timm is not in this
environment — contract-tested only).
"""

from __future__ import annotations

import flax.linen as nn

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout, max_pool_3x3_s2

SKNET_CFG = {
    # name -> (block kind, stage sizes, cardinality, base_width)
    "skresnet18": ("basic", (2, 2, 2, 2), 1, 64),
    "skresnet34": ("basic", (3, 4, 6, 3), 1, 64),
    "skresnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 32, 4),
}


def _conv(x, feat, k, s, dtype, name, groups=1, dilation=1):
    pad = dilation * (k // 2)
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=pad, use_bias=False,
        kernel_dilation=(dilation, dilation), feature_group_count=groups,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )(x)


class SelectiveKernel(nn.Module):
    """Two-branch selective-kernel conv with softmax branch attention."""

    features: int
    strides: int = 1
    groups: int = 1
    rd_ratio: float = 1.0 / 16
    split_input: bool = True
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        n_paths = 2
        if self.split_input:
            assert x.shape[-1] % n_paths == 0
            half = x.shape[-1] // n_paths
            inputs = [x[..., :half], x[..., half:]]
        else:
            inputs = [x, x]
        paths = []
        for p, (xin, dil) in enumerate(zip(inputs, (1, 2))):
            y = _conv(
                xin, self.features, 3, self.strides, self.dtype,
                f"path{p}_conv", groups=min(self.groups, xin.shape[-1]),
                dilation=dil,
            )
            y = BatchNorm(not self.train, dtype=self.dtype, name=f"path{p}_bn")(y)
            paths.append(nn.relu(y))

        rd = max(1, int(self.features * self.rd_ratio))
        s = (paths[0] + paths[1]).mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(
            rd, (1, 1), use_bias=False, dtype=self.dtype, name="attn_reduce",
        )(s)
        s = BatchNorm(not self.train, dtype=self.dtype, name="attn_bn")(s)
        s = nn.relu(s)
        s = nn.Conv(
            self.features * n_paths, (1, 1), use_bias=False,
            dtype=self.dtype, name="attn_select",
        )(s)  # [B,1,1,paths*C]
        attn = s.reshape(s.shape[0], 1, 1, n_paths, self.features)
        attn = nn.softmax(attn, axis=-2)
        return (
            paths[0] * attn[..., 0, :] + paths[1] * attn[..., 1, :]
        )


class SKBasicBlock(nn.Module):
    features: int
    strides: int = 1
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        identity = x
        y = SelectiveKernel(
            self.features, self.strides, rd_ratio=1.0 / 8, split_input=True,
            train=self.train, dtype=self.dtype, name="sk",
        )(x)
        y = _conv(y, self.features, 3, 1, self.dtype, "conv2")
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn2")(y)
        if self.strides != 1 or identity.shape[-1] != self.features:
            identity = _conv(x, self.features, 1, self.strides, self.dtype, "down_conv")
            identity = BatchNorm(not self.train, dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(y + identity)


class SKBottleneck(nn.Module):
    features: int
    strides: int = 1
    groups: int = 32
    base_width: int = 4
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        y = _conv(x, width, 1, 1, self.dtype, "conv1")
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = SelectiveKernel(
            width, self.strides, groups=self.groups, rd_ratio=1.0 / 16,
            split_input=False, train=self.train, dtype=self.dtype, name="sk",
        )(y)
        y = _conv(y, out_ch, 1, 1, self.dtype, "conv3")
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn3")(y)
        if self.strides != 1 or identity.shape[-1] != out_ch:
            identity = _conv(x, out_ch, 1, self.strides, self.dtype, "down_conv")
            identity = BatchNorm(not self.train, dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(y + identity)


class SKNet(nn.Module):
    """5-level selective-kernel feature pyramid (timm stride taps)."""

    variant: str = "skresnet18"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in SKNET_CFG:
            raise ValueError(f"unknown sknet variant {self.variant!r}")
        kind, stage_sizes, card, bw = SKNET_CFG[self.variant]
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
                if kind == "basic":
                    y = SKBasicBlock(
                        planes, strides, self.train, self.dtype,
                        name=f"layer{stage + 1}_{i}",
                    )(y)
                else:
                    y = SKBottleneck(
                        planes, strides, card, bw, self.train, self.dtype,
                        name=f"layer{stage + 1}_{i}",
                    )(y)
            feats.append(y)
        return feats
