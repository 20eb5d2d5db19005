"""RepVGG feature trunk (Ding et al. CVPR'21) for the timm-Unet backbones.

Covers the reference's ``repvgg_a2 / repvgg_b0..b3 / repvgg_b1g4 /
repvgg_b2g4 / repvgg_b3g4`` names (networks/Unet.py:355). Training-form
topology: every layer is a 3x3 conv-BN + parallel 1x1 conv-BN + (identity
BN when shapes permit), summed then ReLU. We always build the training
form — the inference-time "re-parameterized" single-conv collapse is a
weight transform, not a different architecture, and XLA fuses the three
branches into a tight kernel anyway.

Feature taps: stem (stride 2) then one tap per stage (strides 4/8/16/32),
matching timm's 5-level ``features_only`` pyramid.
"""

from __future__ import annotations

import flax.linen as nn

from sfmnext_tpu.models.common import kaiming_normal_fanout

# (width_a [stages 1-3], width_b [stage 4], depths, group_every_other)
REPVGG_SPECS = {
    "repvgg_a2": (1.5, 2.75, (2, 4, 14, 1), 1),
    "repvgg_b0": (1.0, 2.5, (4, 6, 16, 1), 1),
    "repvgg_b1": (2.0, 4.0, (4, 6, 16, 1), 1),
    "repvgg_b1g4": (2.0, 4.0, (4, 6, 16, 1), 4),
    "repvgg_b2": (2.5, 5.0, (4, 6, 16, 1), 1),
    "repvgg_b2g4": (2.5, 5.0, (4, 6, 16, 1), 4),
    "repvgg_b3": (3.0, 5.0, (4, 6, 16, 1), 1),
    "repvgg_b3g4": (3.0, 5.0, (4, 6, 16, 1), 4),
}

# the original RepVGG "groupwise layers": overall layer indices (stem = 0)
# that use grouped 3x3 convs in the gN variants
_GROUP_LAYERS = frozenset(range(2, 27, 2))


class RepVGGBlock(nn.Module):
    features: int
    stride: int = 1
    groups: int = 1
    train: bool = False
    dtype: object = None

    def _bn(self, x, name):
        return nn.BatchNorm(
            use_running_average=not self.train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )(x)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y3 = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, feature_group_count=self.groups, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype,
            name="conv3",
        )(x)
        y3 = self._bn(y3, "bn3")
        y1 = nn.Conv(
            self.features, (1, 1), strides=(self.stride, self.stride),
            feature_group_count=self.groups, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype,
            name="conv1",
        )(x)
        y = y3 + self._bn(y1, "bn1")
        if self.stride == 1 and in_ch == self.features:
            y = y + self._bn(x, "bn_id")
        return nn.relu(y)


class RepVGG(nn.Module):
    variant: str = "repvgg_b0"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in REPVGG_SPECS:
            raise ValueError(f"unknown repvgg variant {self.variant!r}")
        wa, wb, depths, g = REPVGG_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        stage_ch = [int(64 * wa), int(128 * wa), int(256 * wa), int(512 * wb)]
        y = RepVGGBlock(
            min(64, int(64 * wa)), 2, train=self.train, dtype=self.dtype,
            name="stem",
        )(x)
        feats = [y]
        layer_idx = 1
        for si, (ch, depth) in enumerate(zip(stage_ch, depths)):
            for bi in range(depth):
                groups = g if (g > 1 and layer_idx in _GROUP_LAYERS) else 1
                y = RepVGGBlock(
                    ch, 2 if bi == 0 else 1, groups,
                    train=self.train, dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(y)
                layer_idx += 1
            feats.append(y)
        return feats
