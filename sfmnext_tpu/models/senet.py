"""SENet-154 trunk (Hu et al. CVPR'18, the ILSVRC'17 winner config) for
the timm-Unet backbones.

Covers ``legacy_senet154`` and ``gluon_senet154`` (networks/Unet.py:
349-350; the gluon name is a weight-source alias of the same topology).

Distinct from se-resnet/se-resnext: deep 3x3 stem (64/64/128), SE
bottlenecks with a doubled 1x1 (2*planes) into a grouped 3x3 (4*planes,
groups 64), SE reduction 16, and 3x3 projection shortcuts.
"""

from __future__ import annotations

import flax.linen as nn

from sfmnext_tpu.models.common import (
    BatchNorm,
    kaiming_normal_fanout,
    max_pool_3x3_s2,
    se_module,
)


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class SEBottleneck(nn.Module):
    planes: int  # out = 4x
    stride: int = 1
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        y = _conv(self.planes * 2, 1, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="bn1")(y))
        y = _conv(out_ch, 3, self.stride, groups=64, name="conv2",
                  dtype=self.dtype)(y)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="bn2")(y))
        y = _conv(out_ch, 1, name="conv3", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn3")(y)
        y = se_module(y, max(1, out_ch // 16), self.dtype, "se")
        identity = x
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = _conv(out_ch, 3, self.stride, name="down_conv",
                             dtype=self.dtype)(x)
            identity = BatchNorm(not self.train, dtype=self.dtype,
                                 name="down_bn")(identity)
        return nn.relu(y + identity)


class SENet154(nn.Module):
    variant: str = "legacy_senet154"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in ("legacy_senet154", "gluon_senet154"):
            raise ValueError(f"unknown senet variant {self.variant!r}")
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = x
        for i, (c, s) in enumerate(zip((64, 64, 128), (2, 1, 1))):
            y = _conv(c, 3, s, name=f"stem{i}", dtype=self.dtype)(y)
            y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                                  name=f"stem{i}_bn")(y))
        feats = [y]
        y = max_pool_3x3_s2(y)
        for si, (planes, n) in enumerate(
            zip((64, 128, 256, 512), (3, 8, 36, 3))
        ):
            for bi in range(n):
                y = SEBottleneck(
                    planes, 2 if (bi == 0 and si > 0) else 1,
                    self.train, self.dtype, name=f"layer{si + 1}_{bi}",
                )(y)
            feats.append(y)
        return feats
