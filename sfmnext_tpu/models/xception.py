"""Aligned Xception trunks (Chollet'17 / DeepLab aligned variant) for
the timm-Unet backbones.

Covers ``xception41/65/71``, the preact ``xception41p/65p``, and
``gluon_xception65`` (networks/Unet.py:368-371; the gluon variant shares
the 65-layer aligned topology — weight-source alias, noted here).

Standard (non-preact) variants follow timm's ``xception_aligned.py``
feature-for-feature (Tier 1, golden-tested, convert_xception accepts the
timm state-dict naming):

- each separable conv is dw3x3 -> BN -> pw1x1 -> BN (``bn_dw``+``bn_pw``,
  BN eps 1e-3 per timm's norm_layer partial);
- modules with ``start_with_relu`` put ReLU *before* each separable conv
  and none inside; the final no-skip exit module instead activates inside
  (dw->BN->ReLU->pw->BN->ReLU);
- feature taps match timm's hooks: stride-2 modules tap at
  ``stack.act3`` — the ReLU'd output of the 2nd separable conv, *before*
  the downsampling 3rd conv and before the residual add — and the
  deepest tap is the last module's raw output (no final act).

Preact 'p' variants stay Tier 2: norm-act before each separable conv,
un-normalized residual stream, with the deepest tap normalized here
(timm's hook tap is pre-norm; cf. resnetv2/densenet harmonization).
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

_EPS = 1e-3  # timm xception_aligned: partial(nn.BatchNorm2d, eps=.001)


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class SeparableConv(nn.Module):
    """timm SeparableConv2d: dw->bn_dw->(act)->pw->bn_pw->(act)."""

    feat: int
    stride: int = 1
    act_inside: bool = False  # start_with_relu=False modules
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, y):
        y = _conv(y.shape[-1], 3, self.stride, groups=y.shape[-1],
                  name="conv_dw", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, eps=_EPS,
                      name="bn_dw")(y)
        if self.act_inside:
            y = nn.relu(y)
        y = _conv(self.feat, 1, name="conv_pw", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, eps=_EPS,
                      name="bn_pw")(y)
        if self.act_inside:
            y = nn.relu(y)
        return y


class XceptionModule(nn.Module):
    """timm XceptionModule. Returns (out, tap) — ``tap`` is the post-act3
    value (input of the 3rd separable conv) that timm's feature hooks
    expose for stride-2 modules; None when start_with_relu is off."""

    out_chs: tuple  # 3 pointwise widths
    stride: int = 1
    no_skip: bool = False
    start_with_relu: bool = True
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        skip = x
        if not self.no_skip and (self.stride != 1 or in_ch != self.out_chs[-1]):
            skip = _conv(self.out_chs[-1], 1, self.stride, name="down_conv",
                         dtype=self.dtype)(x)
            skip = BatchNorm(not self.train, dtype=self.dtype, eps=_EPS,
                             name="down_bn")(skip)
        y, tap = x, None
        for i, ch in enumerate(self.out_chs):
            s = self.stride if i == 2 else 1
            if self.start_with_relu:
                y = nn.relu(y)
                if i == 2:
                    tap = y  # timm hook 'stack.act3'
            y = SeparableConv(
                ch, s, act_inside=not self.start_with_relu,
                train=self.train, dtype=self.dtype, name=f"sep{i}",
            )(y)
        return (y if self.no_skip else y + skip), tap


class PreXceptionModule(nn.Module):
    """timm PreXceptionModule: norm-act first, shortcut conv (no BN) from
    the normalized stream, per-conv pre-norm inside the stack. Returns
    (out, tap) — tap is the 2nd separable conv output ('stack.conv2')."""

    out_chs: tuple
    stride: int = 1
    no_skip: bool = False
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = BatchNorm(not self.train, dtype=self.dtype, eps=_EPS,
                      name="norm")(x)
        y = nn.relu(y)
        skip = y
        in_ch = x.shape[-1]
        if self.no_skip:
            skip = None
        elif self.stride != 1 or in_ch != self.out_chs[-1]:
            skip = _conv(self.out_chs[-1], 1, self.stride, name="down_conv",
                         dtype=self.dtype)(skip)
        # else: identity skip over the normalized stream (timm forward
        # norms before saving skip)
        tap = None
        for i, ch in enumerate(self.out_chs):
            s = self.stride if i == 2 else 1
            if i > 0:
                y = BatchNorm(not self.train, dtype=self.dtype, eps=_EPS,
                              name=f"pre_bn{i}")(y)
                y = nn.relu(y)
            y = _conv(y.shape[-1], 3, s, groups=y.shape[-1],
                      name=f"dw{i}", dtype=self.dtype)(y)
            y = _conv(ch, 1, name=f"pw{i}", dtype=self.dtype)(y)
            if i == 1:
                tap = y  # timm hook 'stack.conv2'
        return (y if skip is None else y + skip), tap


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
        y = BatchNorm(not self.train, dtype=self.dtype, eps=_EPS,
                      name="stem0_bn")(y)
        y = nn.relu(y)
        if preact:
            # timm preact stem: bare conv, normalization deferred to the
            # first PreXceptionModule
            y = _conv(64, 3, 1, name="stem1", dtype=self.dtype)(y)
        else:
            y = _conv(64, 3, 1, name="stem1", dtype=self.dtype)(y)
            y = BatchNorm(not self.train, dtype=self.dtype, eps=_EPS,
                          name="stem1_bn")(y)
            y = nn.relu(y)

        mod = PreXceptionModule if preact else XceptionModule
        kw = dict(train=self.train, dtype=self.dtype)
        if not preact:
            kw["start_with_relu"] = True
        reduction, taps = 2, {}
        bi = 0
        for ch, s in entry:
            y, tap = mod((ch,) * 3, s, **kw, name=f"block{bi}")(y)
            bi += 1
            if s == 2:
                taps[reduction] = tap  # pre-downsample hook, cf. docstring
                reduction *= 2
        for _ in range(middle):
            y, _ = mod((728,) * 3, 1, **kw, name=f"block{bi}")(y)
            bi += 1
        y, tap = mod(
            (728, 1024, 1024), 2, **kw, name=f"block{bi}",
        )(y)
        taps[reduction] = tap
        reduction *= 2
        if preact:
            y, _ = mod(
                (1536, 1536, 2048), 1, no_skip=True, train=self.train,
                dtype=self.dtype, name=f"block{bi + 1}",
            )(y)
            # deepest tap normalized here (timm's hook is pre-norm);
            # documented deviation, cf. resnetv2/densenet
            y = BatchNorm(not self.train, dtype=self.dtype, eps=_EPS,
                          name="norm")(y)
            y = nn.relu(y)
        else:
            y, _ = XceptionModule(
                (1536, 1536, 2048), 1, no_skip=True, start_with_relu=False,
                train=self.train, dtype=self.dtype, name=f"block{bi + 1}",
            )(y)
        taps[reduction] = y
        return [taps[r] for r in (2, 4, 8, 16, 32)]
