"""EfficientNet-B5 encoder + BN decoder (the reference's ``eff_b5`` backbone).

Behavioral reference: networks/base_encoder.py — the torch.hub
``tf_efficientnet_b5_ap`` backbone (:91-94) with per-module feature taps;
the decoder consumes features[4,5,6,8,11] (:41), i.e. stage outputs at
strides 2/4/8/16 plus the 2048-ch conv_head at stride 32, and produces
``model_dim`` channels at 1/2 input resolution.

Architecture (B5 = width 1.6, depth 2.2 over the B0 recipe):
  stem conv3x3 s2 -> 48ch; 7 MBConv stages
  channels [24,40,64,128,176,304,512], repeats [3,5,5,7,7,9,3],
  kernels [3,3,5,3,5,5,3], strides [1,2,2,2,1,2,1], expand [1,6,6,6,6,6,6],
  SE ratio 0.25 (of block input), SiLU, BN eps 1e-3 ('tf_' variants);
  conv_head 1x1 -> 2048.

TF 'SAME' padding semantics (flax padding='SAME' matches TF).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import kaiming_normal_fanout
from sfmnext_tpu.models.decoder_bn import DecoderBN

B0_CHANNELS = (16, 24, 40, 80, 112, 192, 320)
B0_REPEATS = (1, 2, 2, 3, 3, 4, 1)
KERNELS = (3, 3, 5, 3, 5, 5, 3)
STRIDES = (1, 2, 2, 2, 1, 2, 1)
EXPAND = (1, 6, 6, 6, 6, 6, 6)

# (width_coefficient, depth_coefficient) per EfficientNet variant
EFFICIENTNET_COEFFS = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6),
    "efficientnet_b7": (2.0, 3.1),
    "efficientnet_b8": (2.2, 3.6),
    "efficientnet_l2": (4.3, 5.3),  # tf_efficientnet_l2_ns[_475]
}


def _round_channels(ch: float) -> int:
    """timm/TF channel rounding (divisor 8, never below 90% of target)."""
    new = max(8, (int(ch + 4) // 8) * 8)
    if new < 0.9 * ch:
        new += 8
    return new


def efficientnet_cfg(name: str):
    """Stage config for any efficientnet_b* / tf_efficientnet_b*[_ap/_ns]."""
    import math
    import re

    m = re.search(r"efficientnet_(b\d|l2)", name)
    if not m or f"efficientnet_{m.group(1)}" not in EFFICIENTNET_COEFFS:
        raise ValueError(f"unknown efficientnet variant {name!r}")
    w, d = EFFICIENTNET_COEFFS[f"efficientnet_{m.group(1)}"]
    return dict(
        stem=_round_channels(32 * w),
        channels=tuple(_round_channels(c * w) for c in B0_CHANNELS),
        repeats=tuple(int(math.ceil(d * r)) for r in B0_REPEATS),
        kernels=KERNELS,
        strides=STRIDES,
        expand=EXPAND,
    )


B5_STAGES = efficientnet_cfg("efficientnet_b5")


class _BN(nn.Module):
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
        )(x)


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat,
        (k, k),
        strides=(s, s),
        padding="SAME",
        feature_group_count=groups,
        use_bias=False,
        kernel_init=kaiming_normal_fanout,
        dtype=dtype,
        name=name,
    )


class MBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = _conv(mid, 1, name="expand_conv", dtype=self.dtype)(y)
            y = _BN(self.train, self.dtype, name="expand_bn")(y)
            y = nn.silu(y)
        y = _conv(mid, self.kernel, self.stride, groups=mid, name="dw_conv",
                  dtype=self.dtype)(y)
        y = _BN(self.train, self.dtype, name="dw_bn")(y)
        y = nn.silu(y)

        # squeeze-excite on the *input* channel count (timm convention)
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = y.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), name="se_reduce", dtype=self.dtype)(s)
        s = nn.silu(s)
        s = nn.Conv(mid, (1, 1), name="se_expand", dtype=self.dtype)(s)
        y = y * nn.sigmoid(s)

        y = _conv(self.out_ch, 1, name="project_conv", dtype=self.dtype)(y)
        y = _BN(self.train, self.dtype, name="project_bn")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class EfficientNet(nn.Module):
    """Config-driven EfficientNet trunk (any b0..b7 variant).

    Output modes:
      features_only=False (default): the reference eff_b5 decoder taps
        [stage0 1/2, stage1 1/4, stage2 1/8, stage4 1/16, conv_head 1/32]
        (base_encoder.py:41 taps features[4,5,6,8,11]).
      features_only=True: the 5 timm features_only stride taps
        [stage0, stage1, stage2, stage4, stage6] without conv_head — what
        the reference Unet consumes (networks/Unet.py:114-117).
    """

    variant: str = "efficientnet_b5"
    features_only: bool = False
    head_ch: int = 2048
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        cfg = efficientnet_cfg(self.variant)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = _conv(cfg["stem"], 3, 2, name="conv_stem", dtype=self.dtype)(x)
        y = _BN(self.train, self.dtype, name="bn1")(y)
        y = nn.silu(y)

        taps = {}
        for si in range(7):
            for bi in range(cfg["repeats"][si]):
                y = MBConv(
                    out_ch=cfg["channels"][si],
                    kernel=cfg["kernels"][si],
                    stride=cfg["strides"][si] if bi == 0 else 1,
                    expand=cfg["expand"][si],
                    train=self.train,
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(y)
            taps[si] = y

        if self.features_only:
            return [taps[0], taps[1], taps[2], taps[4], taps[6]]
        y = _conv(self.head_ch, 1, name="conv_head", dtype=self.dtype)(y)
        # reference taps features[11] = conv_head output pre-bn2
        return [taps[0], taps[1], taps[2], taps[4], y]


class EfficientNetB5(EfficientNet):
    """The reference's tf_efficientnet_b5_ap backbone (base_encoder.py:94).

    Subclass alias so existing call sites / converters keep their name; the
    dataclass field order differs from round 1 (use keyword args).
    """

    variant: str = "efficientnet_b5"


class BaseEncoderDecoder(nn.Module):
    """eff-b5 + DecoderBN (reference BaseEncoder.build, base_encoder.py:89-107)."""

    num_features: int = 2048
    model_dim: int = 32
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        feats = EfficientNetB5(
            train=self.train, dtype=self.dtype, name="encoder"
        )(x)
        return DecoderBN(
            self.num_features, self.model_dim, self.train, self.dtype,
            name="decoder",
        )(feats)
