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

B5_STAGES = dict(
    channels=(24, 40, 64, 128, 176, 304, 512),
    repeats=(3, 5, 5, 7, 7, 9, 3),
    kernels=(3, 3, 5, 3, 5, 5, 3),
    strides=(1, 2, 2, 2, 1, 2, 1),
    expand=(1, 6, 6, 6, 6, 6, 6),
)


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


class EfficientNetB5(nn.Module):
    """Returns the 5 decoder taps: [1/2(24), 1/4(40), 1/8(64), 1/16(176),
    1/32(2048)] matching reference base_encoder.py:41."""

    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = _conv(48, 3, 2, name="conv_stem", dtype=self.dtype)(x)
        y = _BN(self.train, self.dtype, name="bn1")(y)
        y = nn.silu(y)

        taps = {}
        cfg = B5_STAGES
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

        y = _conv(2048, 1, name="conv_head", dtype=self.dtype)(y)
        # reference taps features[11] = conv_head output pre-bn2
        return [taps[0], taps[1], taps[2], taps[4], y]


class BaseEncoderDecoder(nn.Module):
    """eff-b5 + DecoderBN (reference BaseEncoder.build, base_encoder.py:89-107)."""

    num_features: int = 2048
    model_dim: int = 32
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        feats = EfficientNetB5(self.train, self.dtype, name="encoder")(x)
        return DecoderBN(
            self.num_features, self.model_dim, self.train, self.dtype,
            name="decoder",
        )(feats)
