"""RegNetZ / RegNetV trunks (timm byobnet research models) for the
timm-Unet backbones.

Covers ``regnetz_b16 / c16 / c16_evos / d32 / d8 / d8_evos / e8`` and the
preact ``regnetv_040 / regnetv_064`` (networks/Unet.py:362-367).

RegNetZ ("Fast and Accurate Model Scaling" Z-block lineage): SiLU
inverted bottlenecks — 1x1 expand (ratio x in), grouped 3x3 (group size
8/16/32) carrying the stride, SE (rd mid/4), linear 1x1 out — with
identity-only residuals (no projection shortcuts) and a wide 1x1 feature
head. The ``_evos`` flavors use EvoNorm-S0 instead of BN. RegNetV =
RegNetY (same stage configs as models/regnet.py) in pre-activation form
with SiLU.

These are timm research models without a published config table — block
plumbing follows the byobnet recipe; channel/depth tables are
reconstructed (docs/backbone_fidelity.md tier 3).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout
from sfmnext_tpu.models.regnet import REGNET_CFG
from sfmnext_tpu.models.resnetv2 import _NormAct

# (depths, channels, group_size, bottle_ratio, stem_chs, stem_type, head)
REGNETZ_SPECS = {
    "regnetz_b16": ((2, 6, 12, 2), (48, 96, 192, 288), 16, 3.0, 32, "", 1536),
    "regnetz_c16": ((2, 6, 12, 2), (48, 96, 192, 288), 16, 4.0, 32, "", 1536),
    "regnetz_d32": ((3, 6, 12, 3), (64, 128, 256, 384), 32, 4.0, 64,
                    "tiered", 1792),
    "regnetz_d8": ((3, 6, 12, 3), (64, 128, 256, 384), 8, 4.0, 64,
                   "tiered", 1792),
    "regnetz_e8": ((3, 8, 16, 3), (96, 192, 384, 512), 8, 4.0, 64,
                   "tiered", 2048),
    # regnetz_040/040h (timm regnet.py flavor): stage table generated from
    # the published RegNet width function (w0=48, wa=14.5, wm=2.226,
    # depth=28, q=8); 040h adds the 1536 hidden head conv, 040 has none.
    "regnetz_040": ((2, 6, 14, 6), (48, 104, 240, 528), 8, 4.0, 32, "", 0),
    "regnetz_040h": ((2, 6, 14, 6), (48, 104, 240, 528), 8, 4.0, 32, "",
                     1536),
}

# regnet.py-flavor z models compute the bottleneck width from the OUT
# channels (paper w_b = w*b); the byobnet "ts" flavors expand from the in
# channels. Only differs on the first block of each stage.
_MID_FROM_OUT = ("regnetz_040", "regnetz_040h")


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class _ZNorm(nn.Module):
    """BN+SiLU or EvoNorm-S0 (which is its own activation)."""

    evos: bool = False
    act: bool = True
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.evos:
            return _NormAct("evos", self.train, self.dtype, name="norm")(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn")(x)
        return nn.silu(y) if self.act else y


class RegNetZBlock(nn.Module):
    out_ch: int
    stride: int
    group_size: int
    bottle_ratio: float
    evos: bool = False
    mid_from_out: bool = False
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        base = self.out_ch if self.mid_from_out else in_ch
        mid = int(round(base * self.bottle_ratio / self.group_size)
                  ) * self.group_size
        y = _conv(mid, 1, name="conv1", dtype=self.dtype)(x)
        y = _ZNorm(self.evos, True, self.train, self.dtype, name="n1")(y)
        y = _conv(mid, 3, self.stride, groups=mid // self.group_size,
                  name="conv2", dtype=self.dtype)(y)
        y = _ZNorm(self.evos, True, self.train, self.dtype, name="n2")(y)
        s = y.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(max(1, mid // 4), (1, 1), dtype=self.dtype,
                    name="se_fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_fc2")(s)
        y = y * nn.sigmoid(s)
        y = _conv(self.out_ch, 1, name="conv3", dtype=self.dtype)(y)
        y = _ZNorm(self.evos, False, self.train, self.dtype, name="n3")(y)
        # identity-only residual (byob downsample='')
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class RegNetZ(nn.Module):
    variant: str = "regnetz_c16"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        name = self.variant
        evos = name.endswith("_evos")
        if evos:
            name = name[: -len("_evos")]
        if name not in REGNETZ_SPECS:
            raise ValueError(f"unknown regnetz variant {self.variant!r}")
        depths, chans, gs, br, stem_chs, stem_type, head = REGNETZ_SPECS[name]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        if stem_type == "tiered":
            y = x
            for i, (c, s) in enumerate(
                zip((3 * stem_chs // 8, stem_chs // 2, stem_chs), (2, 1, 1))
            ):
                y = _conv(c, 3, s, name=f"stem{i}", dtype=self.dtype)(y)
                y = _ZNorm(evos, True, self.train, self.dtype,
                           name=f"stem{i}_n")(y)
        else:
            y = _conv(stem_chs, 3, 2, name="stem", dtype=self.dtype)(x)
            y = _ZNorm(evos, True, self.train, self.dtype, name="stem_n")(y)
        feats = [y]

        for si, (ch, d) in enumerate(zip(chans, depths)):
            for bi in range(d):
                y = RegNetZBlock(
                    ch, 2 if bi == 0 else 1, gs, br, evos,
                    name in _MID_FROM_OUT, self.train,
                    self.dtype, name=f"s{si}_b{bi}",
                )(y)
            feats.append(y)
        if head:
            y = _conv(head, 1, name="final", dtype=self.dtype)(y)
            y = _ZNorm(evos, True, self.train, self.dtype, name="final_n")(y)
            feats[-1] = y
        return feats


class RegNetV(nn.Module):
    """Pre-activation RegNetY with SiLU (timm regnetv_040/064)."""

    variant: str = "regnetv_040"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        key = self.variant.replace("regnetv_", "regnety_")
        if key not in REGNET_CFG:
            raise ValueError(f"unknown regnetv variant {self.variant!r}")
        depths, widths, gw, _ = REGNET_CFG[key]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def norm_act(z, nm):
            z = BatchNorm(not self.train, dtype=self.dtype, name=nm)(z)
            return nn.silu(z)

        y = _conv(32, 3, 2, name="stem", dtype=self.dtype)(x)
        feats = [y]
        in_ch = 32
        for si, (w, d) in enumerate(zip(widths, depths)):
            for bi in range(d):
                stride = 2 if bi == 0 else 1
                p = f"s{si}_b{bi}"
                xp = norm_act(y, f"{p}_pre_bn")
                shortcut = y
                if stride != 1 or in_ch != w:
                    shortcut = _conv(w, 1, stride, name=f"{p}_down",
                                     dtype=self.dtype)(xp)
                z = _conv(w, 1, name=f"{p}_c1", dtype=self.dtype)(xp)
                z = norm_act(z, f"{p}_bn1")
                z = _conv(w, 3, stride, groups=w // gw, name=f"{p}_c2",
                          dtype=self.dtype)(z)
                z = norm_act(z, f"{p}_bn2")
                s = z.mean(axis=(1, 2), keepdims=True)
                s = nn.Conv(max(1, int(round(in_ch * 0.25))), (1, 1),
                            dtype=self.dtype, name=f"{p}_se_fc1")(s)
                s = nn.relu(s)
                s = nn.Conv(w, (1, 1), dtype=self.dtype,
                            name=f"{p}_se_fc2")(s)
                z = z * nn.sigmoid(s)
                z = _conv(w, 1, name=f"{p}_c3", dtype=self.dtype)(z)
                y = z + shortcut
                in_ch = w
            feats.append(y)
        feats[-1] = norm_act(feats[-1], "final_bn")
        return feats
