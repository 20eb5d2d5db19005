"""Aligned Xception trunks (Chollet'17 / DeepLab aligned variant) for
the timm-Unet backbones.

Covers ``xception41/65/71``, the preact ``xception41p/65p``, and
``gluon_xception65`` (networks/Unet.py:368-371; the gluon variant shares
the 65-layer aligned topology — weight-source alias, noted here).

Structure: 2-conv stem (32, 64), entry modules downsampling to 1/16 at
728 channels, a middle flow of residual separable modules, and an exit
module to 2048. Each module = three [ReLU -> depthwise 3x3 -> pointwise
-> BN] separable convs (stride on the third) with a 1x1-BN projection
skip; 'p' variants pre-activate (norm-act before each separable conv,
un-normalized residual stream).
"""

from __future__ import annotations

import flax.linen as nn

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout

# variant -> (entry (out_chs, stride) list, middle repeats)
XCEPTION_SPECS = {
    "xception41": ([(128, 2), (256, 2), (728, 2)], 8),
    "xception65": ([(128, 2), (256, 2), (728, 2)], 16),
    "xception71": ([(128, 2), (256, 1), (256, 2), (728, 1), (728, 2)], 16),
}


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class XceptionModule(nn.Module):
    out_chs: tuple  # 3 pointwise widths
    stride: int = 1
    preact: bool = False
    no_skip: bool = False
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        skip = x
        if not self.no_skip and (self.stride != 1 or in_ch != self.out_chs[-1]):
            skip = _conv(self.out_chs[-1], 1, self.stride, name="down_conv",
                         dtype=self.dtype)(x)
            if not self.preact:
                skip = BatchNorm(not self.train, dtype=self.dtype,
                                 name="down_bn")(skip)
        y = x
        for i, ch in enumerate(self.out_chs):
            s = self.stride if i == 2 else 1
            if self.preact:
                y = BatchNorm(not self.train, dtype=self.dtype,
                              name=f"pre_bn{i}")(y)
            y = nn.relu(y)
            y = _conv(y.shape[-1], 3, s, groups=y.shape[-1],
                      name=f"dw{i}", dtype=self.dtype)(y)
            y = _conv(ch, 1, name=f"pw{i}", dtype=self.dtype)(y)
            if not self.preact:
                y = BatchNorm(not self.train, dtype=self.dtype,
                              name=f"bn{i}")(y)
        return y if self.no_skip else y + skip


class Xception(nn.Module):
    variant: str = "xception65"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        name = self.variant
        if name == "gluon_xception65":
            name = "xception65"
        preact = name.endswith("p")
        if preact:
            name = name[:-1]
        if name not in XCEPTION_SPECS:
            raise ValueError(f"unknown xception variant {self.variant!r}")
        entry, middle = XCEPTION_SPECS[name]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = _conv(32, 3, 2, name="stem0", dtype=self.dtype)(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="stem0_bn")(y)
        y = nn.relu(y)
        y = _conv(64, 3, 1, name="stem1", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="stem1_bn")(y)
        y = nn.relu(y)

        reduction, last_at = 2, {2: y}
        bi = 0
        for ch, s in entry:
            y = XceptionModule(
                (ch,) * 3, s, preact, train=self.train, dtype=self.dtype,
                name=f"block{bi}",
            )(y)
            bi += 1
            if s == 2:
                reduction *= 2
            last_at[reduction] = y
        for _ in range(middle):
            y = XceptionModule(
                (728,) * 3, 1, preact, train=self.train, dtype=self.dtype,
                name=f"block{bi}",
            )(y)
            bi += 1
            last_at[reduction] = y
        y = XceptionModule(
            (728, 1024, 1024), 2, preact, train=self.train,
            dtype=self.dtype, name=f"block{bi}",
        )(y)
        reduction *= 2
        y = XceptionModule(
            (1536, 1536, 2048), 1, preact, no_skip=True, train=self.train,
            dtype=self.dtype, name=f"block{bi + 1}",
        )(y)
        if preact:  # normalize the deepest tap (cf. resnetv2/densenet)
            y = BatchNorm(not self.train, dtype=self.dtype, name="norm")(y)
        y = nn.relu(y)
        last_at[reduction] = y
        return [last_at[r] for r in (2, 4, 8, 16, 32)]
