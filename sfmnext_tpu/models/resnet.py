"""ResNet feature-pyramid encoder in Flax (NHWC).

Behavioral reference: /root/reference/networks/resnet_encoder.py:19-100
(torchvision ResNet-18/34/50/101/152 with the monodepth2 5-level feature
taps and the (x-0.45)/0.225 input normalization at :91). Multi-image input
variant (:19-41) stacks frames on channels.

TPU-first: NHWC convolutions, BatchNorm with global-batch statistics.
When ``dtype=bfloat16`` the convs run in bf16 on the MXU with f32 params.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn

from sfmnext_tpu.models.common import (
    BatchNorm,
    kaiming_normal_fanout,
    max_pool_3x3_s2,
    se_module,
)

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    26: ("bottleneck", (2, 2, 2, 2)),  # timm resnet26/seresnext26 family
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _conv(features, kernel, strides=1, name=None, dtype=None, groups=1):
    k = (kernel, kernel)
    pad = kernel // 2
    return nn.Conv(
        features,
        k,
        strides=(strides, strides),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        feature_group_count=groups,
        kernel_init=kaiming_normal_fanout,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    train: bool = False
    dtype: object = None
    se_reduction: int = 0  # >0: SE after bn2 (timm seresnet semantics)

    @nn.compact
    def __call__(self, x):
        identity = x
        y = _conv(self.features, 3, self.strides, name="conv1", dtype=self.dtype)(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, name="conv2", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn2")(y)
        if self.se_reduction:
            y = se_module(
                y, max(1, self.features // self.se_reduction), self.dtype, "se"
            )
        if self.strides != 1 or identity.shape[-1] != self.features:
            identity = _conv(self.features, 1, self.strides, name="down_conv", dtype=self.dtype)(x)
            identity = BatchNorm(not self.train, dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    train: bool = False
    dtype: object = None
    groups: int = 1       # resnext: grouped 3x3 (torchvision resnet.py)
    base_width: int = 64  # wide_resnet: 128; resnext50_32x4d: 4
    se_reduction: int = 0  # >0: SE after bn3 (timm seresnet/seresnext)

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        y = _conv(width, 1, 1, name="conv1", dtype=self.dtype)(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # torchvision puts the stride on the 3x3 (ResNet v1.5)
        y = _conv(
            width, 3, self.strides, name="conv2", dtype=self.dtype,
            groups=self.groups,
        )(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = _conv(out_ch, 1, 1, name="conv3", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn3")(y)
        if self.se_reduction:
            y = se_module(
                y, max(1, out_ch // self.se_reduction), self.dtype, "se"
            )
        if self.strides != 1 or identity.shape[-1] != out_ch:
            identity = _conv(out_ch, 1, self.strides, name="down_conv", dtype=self.dtype)(x)
            identity = BatchNorm(not self.train, dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """5-level feature pyramid: [stem_relu, layer1, layer2, layer3, layer4].

    Channel dims: [64,64,128,256,512] for 18/34; x4 on levels 1..4 for >=50
    (reference networks/resnet_encoder.py:70-87).

    Attributes:
      num_layers: one of 18/34/50/101/152.
      num_input_images: stacked input frames (channels = 3*n).
      normalize_input: apply the (x-0.45)/0.225 normalization (:91).
    """

    num_layers: int = 50
    num_input_images: int = 1
    normalize_input: bool = True
    train: bool = False
    dtype: object = None
    groups: int = 1       # resnext variants (torchvision resnet.py)
    base_width: int = 64  # wide_resnet variants
    se_reduction: int = 0  # seresnet/seresnext variants (timm, reduction 16)

    @nn.compact
    def __call__(self, x):
        block_kind, stage_sizes = RESNET_SPECS[self.num_layers]
        if block_kind == "basic":
            assert self.groups == 1 and self.base_width == 64, (
                "groups/base_width require bottleneck blocks (torchvision)"
            )
            block = functools.partial(
                BasicBlock, se_reduction=self.se_reduction
            )
        else:
            block = functools.partial(
                Bottleneck, groups=self.groups, base_width=self.base_width,
                se_reduction=self.se_reduction,
            )

        if self.normalize_input:
            x = (x - 0.45) / 0.225
        if self.dtype is not None:
            x = x.astype(self.dtype)

        features = []
        y = _conv(64, 7, 2, name="conv1", dtype=self.dtype)(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        features.append(y)

        y = max_pool_3x3_s2(y)
        for stage, (width, n_blocks) in enumerate(
            zip((64, 128, 256, 512), stage_sizes)
        ):
            for i in range(n_blocks):
                strides = 2 if (i == 0 and stage > 0) else 1
                y = block(
                    width, strides, self.train, self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(y)
            features.append(y)
        return features

    @staticmethod
    def feature_channels(num_layers: int) -> Sequence[int]:
        base = [64, 64, 128, 256, 512]
        if RESNET_SPECS[num_layers][0] == "bottleneck":
            return [base[0]] + [c * 4 for c in base[1:]]
        return base
