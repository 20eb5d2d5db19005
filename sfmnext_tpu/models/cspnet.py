"""DarkNet / Cross-Stage-Partial trunks for the timm-Unet backbones.

Covers ``darknet53 / darknetaa53 / cspdarknet53 / cspresnet50 /
cspresnext50`` (networks/Unet.py:331-339).

DarkNet-53 (YOLOv3, Redmon'18): 3x3/32 stem then five stages of
[3x3 s2 down -> n x (1x1 half, 3x3 full) residual blocks], LeakyReLU(0.1).
The 'aa' flavor takes the stride with an avg-pool after an s1 conv
(anti-aliased downsample). CSP stages (Wang et al. CVPR'20) split the
expanded stage input in two, run the blocks on one half, and re-join via
1x1 transitions — halving the dense-path compute.

CSP stage plumbing matches the published CSPNet recipe (expansion 2,
bottle ratio 0.5); per-stage ratio overrides of specific timm checkpoints
are not replicated (no pretrained-weight converter exists for these).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import (
    BatchNorm,
    kaiming_normal_fanout,
    max_pool_3x3_s2,
)

_leaky = functools.partial(nn.leaky_relu, negative_slope=0.1)


class _CBA(nn.Module):
    feat: int
    k: int
    s: int = 1
    groups: int = 1
    act: str = "leaky"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.feat, (self.k, self.k), strides=(self.s, self.s),
            padding=self.k // 2, feature_group_count=self.groups,
            use_bias=False, kernel_init=kaiming_normal_fanout,
            dtype=self.dtype, name="conv",
        )(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn")(y)
        if self.act == "leaky":
            return _leaky(y)
        return nn.silu(y) if self.act == "silu" else nn.relu(y)


class DarkBlock(nn.Module):
    channels: int
    act: str = "leaky"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = _CBA(self.channels // 2, 1, act=self.act, train=self.train,
                 dtype=self.dtype, name="c1")(x)
        y = _CBA(self.channels, 3, act=self.act, train=self.train,
                 dtype=self.dtype, name="c2")(y)
        return x + y if x.shape[-1] == self.channels else y


class ResBottleneckBlock(nn.Module):
    channels: int
    groups: int = 1
    base_width: int = 64
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        mid = int(self.channels // 2 * (self.base_width / 64.0)) * self.groups
        y = _CBA(mid, 1, act="relu", train=self.train, dtype=self.dtype,
                 name="c1")(x)
        y = _CBA(mid, 3, groups=self.groups, act="relu", train=self.train,
                 dtype=self.dtype, name="c2")(y)
        y = nn.Conv(
            self.channels, (1, 1), use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype, name="c3",
        )(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="c3_bn")(y)
        out = y + x if x.shape[-1] == self.channels else y
        return nn.relu(out)


class CrossStage(nn.Module):
    out_ch: int
    n_blocks: int
    block: object
    down_aa: bool = False
    act: str = "leaky"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        exp = self.out_ch * 2
        if self.down_aa:
            y = _CBA(self.out_ch, 3, 1, act=self.act, train=self.train,
                     dtype=self.dtype, name="down")(x)
            y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        else:
            y = _CBA(self.out_ch, 3, 2, act=self.act, train=self.train,
                     dtype=self.dtype, name="down")(x)
        y = _CBA(exp, 1, act=self.act, train=self.train, dtype=self.dtype,
                 name="exp")(y)
        xs, xb = y[..., : exp // 2], y[..., exp // 2:]
        for i in range(self.n_blocks):
            xb = self.block(exp // 2, name=f"block{i}")(xb)
        xb = _CBA(exp // 2, 1, act=self.act, train=self.train,
                  dtype=self.dtype, name="trans_b")(xb)
        return _CBA(
            self.out_ch, 1, act=self.act, train=self.train,
            dtype=self.dtype, name="trans",
        )(jnp.concatenate([xs, xb], axis=-1))


class DarkStage(nn.Module):
    out_ch: int
    n_blocks: int
    aa: bool = False
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.aa:
            y = _CBA(self.out_ch, 3, 1, train=self.train, dtype=self.dtype,
                     name="down")(x)
            y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        else:
            y = _CBA(self.out_ch, 3, 2, train=self.train, dtype=self.dtype,
                     name="down")(x)
        for i in range(self.n_blocks):
            y = DarkBlock(self.out_ch, train=self.train, dtype=self.dtype,
                          name=f"block{i}")(y)
        return y


class CSPNet(nn.Module):
    variant: str = "cspdarknet53"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        v = self.variant
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = []

        if v in ("darknet53", "darknetaa53", "cspdarknet53"):
            aa = v == "darknetaa53"
            y = _CBA(32, 3, 1, train=self.train, dtype=self.dtype,
                     name="stem")(x)
            for si, (ch, n) in enumerate(
                zip((64, 128, 256, 512, 1024), (1, 2, 8, 8, 4))
            ):
                if v == "cspdarknet53":
                    block = functools.partial(
                        DarkBlock, act="leaky", train=self.train,
                        dtype=self.dtype,
                    )
                    y = CrossStage(
                        ch, n, block, down_aa=False, train=self.train,
                        dtype=self.dtype, name=f"stage{si}",
                    )(y)
                else:
                    y = DarkStage(ch, n, aa, self.train, self.dtype,
                                  name=f"stage{si}")(y)
                feats.append(y)
        elif v in ("cspresnet50", "cspresnext50"):
            groups = 32 if v == "cspresnext50" else 1
            base_w = 4 if v == "cspresnext50" else 64
            chans = ((256, 512, 1024, 2048) if v == "cspresnext50"
                     else (128, 256, 512, 1024))
            y = _CBA(64, 7, 2, act="relu", train=self.train,
                     dtype=self.dtype, name="stem")(x)
            feats.append(y)
            y = max_pool_3x3_s2(y)
            block = functools.partial(
                ResBottleneckBlock, groups=groups, base_width=base_w,
                train=self.train, dtype=self.dtype,
            )
            for si, (ch, n) in enumerate(zip(chans, (3, 3, 5, 2))):
                if si == 0:
                    # first stage works at the pooled r4 resolution
                    y = _CBA(ch * 2, 1, act="relu", train=self.train,
                             dtype=self.dtype, name="stage0_exp")(y)
                    xs, xb = y[..., : ch], y[..., ch:]
                    for i in range(n):
                        xb = block(ch, name=f"stage0_block{i}")(xb)
                    xb = _CBA(ch, 1, act="relu", train=self.train,
                              dtype=self.dtype, name="stage0_trans_b")(xb)
                    y = _CBA(ch, 1, act="relu", train=self.train,
                             dtype=self.dtype, name="stage0_trans")(
                        jnp.concatenate([xs, xb], axis=-1))
                else:
                    y = CrossStage(
                        ch, n, block, act="relu", train=self.train,
                        dtype=self.dtype, name=f"stage{si}",
                    )(y)
                feats.append(y)
        else:
            raise ValueError(f"unknown cspnet variant {self.variant!r}")
        return feats


# ------------------------------------------------------------- cs3 (C3) --


# name -> (widths, depths, stem_ch, focus_stem, se, edge_blocks)
CS3_SPECS = {
    "cs3darknet_m": ((96, 192, 384, 768), (2, 4, 6, 2), 48, False, False,
                     False),
    "cs3darknet_l": ((128, 256, 512, 1024), (3, 6, 9, 3), 64, False, False,
                     False),
    "cs3darknet_x": ((160, 320, 640, 1280), (4, 8, 12, 4), 80, False, False,
                     False),
    "cs3darknet_focus_m": ((96, 192, 384, 768), (2, 4, 6, 2), 48, True,
                           False, False),
    "cs3darknet_focus_l": ((128, 256, 512, 1024), (3, 6, 9, 3), 64, True,
                           False, False),
    "cs3sedarknet_l": ((128, 256, 512, 1024), (3, 6, 9, 3), 64, False, True,
                       False),
    "cs3sedarknet_x": ((160, 320, 640, 1280), (4, 8, 12, 4), 80, False, True,
                       False),
    "cs3edgenet_x": ((160, 320, 640, 1280), (4, 8, 12, 4), 80, False, False,
                     True),
    "cs3se_edgenet_x": ((160, 320, 640, 1280), (4, 8, 12, 4), 80, False,
                        True, True),
}


class _CS3Bottleneck(nn.Module):
    """1x1 -> 3x3 residual bottleneck (YOLOv5 C3 inner block); the edge
    flavor uses a 3x3 expand -> 1x1 project instead."""

    channels: int
    se: bool = False
    edge: bool = False
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = self.channels
        if self.edge:
            y = _CBA(c * 2, 3, act="silu", train=self.train,
                     dtype=self.dtype, name="c1")(x)
            y = _CBA(c, 1, act="silu", train=self.train, dtype=self.dtype,
                     name="c2")(y)
        else:
            y = _CBA(c, 1, act="silu", train=self.train, dtype=self.dtype,
                     name="c1")(x)
            y = _CBA(c, 3, act="silu", train=self.train, dtype=self.dtype,
                     name="c2")(y)
        if self.se:
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.Conv(max(1, c // 16), (1, 1), dtype=self.dtype,
                        name="se_fc1")(s)
            s = nn.relu(s)
            s = nn.Conv(c, (1, 1), dtype=self.dtype, name="se_fc2")(s)
            y = y * nn.sigmoid(s)
        return x + y


class CS3Net(nn.Module):
    """CSP-v3 ("C3") darknet trunks — cs3darknet[_focus]_m/l/x,
    cs3sedarknet_l/x, cs3[se_]edgenet_x (timm cspnet research models;
    docs/backbone_fidelity.md tier 3). SiLU-family activation is
    approximated with the module-wide LeakyReLU(0.1) of the darknet
    lineage."""

    variant: str = "cs3darknet_l"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in CS3_SPECS:
            raise ValueError(f"unknown cs3 variant {self.variant!r}")
        widths, depths, stem_ch, focus, se, edge = CS3_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        if focus:
            # YOLOv5-v6 "focus" stem: one 6x6 stride-2 conv
            y = nn.Conv(
                stem_ch, (6, 6), strides=(2, 2), padding=2, use_bias=False,
                kernel_init=kaiming_normal_fanout, dtype=self.dtype,
                name="stem_conv",
            )(x)
            y = BatchNorm(not self.train, dtype=self.dtype, name="stem_bn")(y)
            y = _leaky(y)
        else:
            y = _CBA(stem_ch // 2, 3, 2, train=self.train, dtype=self.dtype,
                     name="stem0")(x)
            y = _CBA(stem_ch, 3, 1, train=self.train, dtype=self.dtype,
                     name="stem1")(y)
        feats = [y]

        for si, (ch, n) in enumerate(zip(widths, depths)):
            y = _CBA(ch, 3, 2, train=self.train, dtype=self.dtype,
                     name=f"s{si}_down")(y)
            half = ch // 2
            xa = _CBA(half, 1, train=self.train, dtype=self.dtype,
                      name=f"s{si}_csp_a")(y)
            xb = _CBA(half, 1, train=self.train, dtype=self.dtype,
                      name=f"s{si}_csp_b")(y)
            for bi in range(n):
                xa = _CS3Bottleneck(
                    half, se, edge, self.train, self.dtype,
                    name=f"s{si}_b{bi}",
                )(xa)
            y = _CBA(ch, 1, train=self.train, dtype=self.dtype,
                     name=f"s{si}_out")(
                jnp.concatenate([xa, xb], axis=-1))
            feats.append(y)
        return feats
