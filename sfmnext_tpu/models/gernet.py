"""GENet / "gernet" trunks (Lin et al. '20, GPU-efficient networks) for
the timm-Unet backbones.

Covers ``gernet_s / gernet_m / gernet_l`` (networks/Unet.py:345). Plain
conv stem, two basic-block stages, one classic bottleneck stage and two
inverted depthwise-bottleneck stages (expansion 3), with a wide 1x1
feature head.
"""

from __future__ import annotations

import flax.linen as nn

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout

# (type, depth, channels, stride, bottle_ratio, depthwise) per stage
GERNET_SPECS = {
    "gernet_s": (
        13, 1920,
        (("basic", 1, 48, 2, 1.0, False),
         ("basic", 3, 48, 2, 1.0, False),
         ("bottle", 7, 384, 2, 0.25, False),
         ("bottle", 2, 560, 2, 3.0, True),
         ("bottle", 1, 256, 1, 3.0, True)),
    ),
    "gernet_m": (
        32, 2560,
        (("basic", 1, 128, 2, 1.0, False),
         ("basic", 2, 192, 2, 1.0, False),
         ("bottle", 6, 640, 2, 0.25, False),
         ("bottle", 4, 640, 2, 3.0, True),
         ("bottle", 1, 640, 1, 3.0, True)),
    ),
    "gernet_l": (
        32, 2560,
        (("basic", 1, 128, 2, 1.0, False),
         ("basic", 2, 192, 2, 1.0, False),
         ("bottle", 6, 640, 2, 0.25, False),
         ("bottle", 5, 640, 2, 3.0, True),
         ("bottle", 4, 640, 1, 3.0, True)),
    ),
}


def _cbr(x, feat, k, s=1, groups=1, act=True, name="", train=False,
         dtype=None):
    x = nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype,
        name=f"{name}_conv",
    )(x)
    x = BatchNorm(not train, dtype=dtype, name=f"{name}_bn")(x)
    return nn.relu(x) if act else x


class GerNet(nn.Module):
    variant: str = "gernet_l"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in GERNET_SPECS:
            raise ValueError(f"unknown gernet variant {self.variant!r}")
        stem_ch, final_ch, stages = GERNET_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = _cbr(x, stem_ch, 3, 2, name="stem", train=self.train,
                 dtype=self.dtype)
        reduction, last_at = 2, {2: y}
        for si, (kind, d, ch, s0, br, dw) in enumerate(stages):
            for bi in range(d):
                s = s0 if bi == 0 else 1
                p = f"s{si}_b{bi}"
                in_ch = y.shape[-1]
                shortcut = y
                if s != 1 or in_ch != ch:
                    shortcut = _cbr(y, ch, 1, s, act=False,
                                    name=f"{p}_short", train=self.train,
                                    dtype=self.dtype)
                if kind == "basic":
                    z = _cbr(y, ch, 3, s, name=f"{p}_c1", train=self.train,
                             dtype=self.dtype)
                    z = _cbr(z, ch, 3, 1, act=False, name=f"{p}_c2",
                             train=self.train, dtype=self.dtype)
                else:
                    mid = int(round(ch * br))
                    z = _cbr(y, mid, 1, name=f"{p}_c1", train=self.train,
                             dtype=self.dtype)
                    z = _cbr(z, mid, 3, s, groups=mid if dw else 1,
                             name=f"{p}_c2", train=self.train,
                             dtype=self.dtype)
                    z = _cbr(z, ch, 1, act=False, name=f"{p}_c3",
                             train=self.train, dtype=self.dtype)
                y = nn.relu(z + shortcut)
                if s == 2:
                    reduction *= 2
                last_at[reduction] = y
        y = _cbr(y, final_ch, 1, name="final", train=self.train,
                 dtype=self.dtype)
        last_at[reduction] = y
        return [last_at[r] for r in (2, 4, 8, 16, 32)]
