"""VoVNet-V2 trunks (Lee et al. '19/'20) for the timm-Unet backbones.

Covers ``ese_vovnet19b_dw`` and ``ese_vovnet39b`` (networks/Unet.py:345).
One-Shot-Aggregation (OSA) blocks: a chain of 3x3 convs whose outputs
(plus the block input) are concatenated once and fused by a 1x1 conv,
gated by eSE channel attention (pool -> 1x1 -> hard-sigmoid); V2 adds an
identity residual. The 19b_dw flavor uses depthwise-separable 3x3s.

Taps: stem conv2 (r2), stage1 (r4, pre-pool), stages 2-4 (r8/16/32).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import (
    BatchNorm,
    kaiming_normal_fanout,
    max_pool_3x3_s2,
)

# variant -> (stem chs, conv chs, out chs, layers/block, blocks/stage,
#             residual, depthwise)
VOVNET_SPECS = {
    "ese_vovnet19b_dw": (
        (64, 64, 64), (128, 160, 192, 224), (256, 512, 768, 1024),
        3, (1, 1, 1, 1), False, True,
    ),
    "ese_vovnet39b": (
        (64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024),
        5, (1, 1, 2, 2), True, False,
    ),
}


def _conv(feat, k, s=1, groups=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class OSABlock(nn.Module):
    conv_ch: int
    out_ch: int
    n_layers: int
    residual: bool = False
    depthwise: bool = False
    train: bool = False
    dtype: object = None

    def _cbr(self, x, feat, k, groups=1, name=""):
        x = _conv(feat, k, 1, groups, name=f"{name}_conv",
                  dtype=self.dtype)(x)
        x = BatchNorm(not self.train, dtype=self.dtype, name=f"{name}_bn")(x)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x):
        identity = x
        y = x
        if self.depthwise and x.shape[-1] != self.conv_ch:
            y = self._cbr(y, self.conv_ch, 1, name="reduce")
        # the one-shot concat starts with the ORIGINAL block input (the
        # reduction only feeds the cascade) — timm OsaBlock.forward
        outs = [x]
        for i in range(self.n_layers):
            if self.depthwise:
                y = _conv(y.shape[-1], 3, 1, groups=y.shape[-1],
                          name=f"l{i}_dw", dtype=self.dtype)(y)
                y = self._cbr(y, self.conv_ch, 1, name=f"l{i}_pw")
            else:
                y = self._cbr(y, self.conv_ch, 3, name=f"l{i}")
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        y = self._cbr(y, self.out_ch, 1, name="concat")
        # eSE: pool -> 1x1 (C->C) -> hard sigmoid gate
        s = y.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="ese_fc")(s)
        y = y * (nn.relu6(s + 3.0) / 6.0)
        if self.residual and identity.shape[-1] == self.out_ch:
            y = y + identity
        return y


class VoVNet(nn.Module):
    variant: str = "ese_vovnet39b"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in VOVNET_SPECS:
            raise ValueError(f"unknown vovnet variant {self.variant!r}")
        (stem_chs, conv_chs, out_chs, n_layers, n_blocks, residual,
         depthwise) = VOVNET_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = x
        for i, (c, s) in enumerate(zip(stem_chs, (2, 1, 2))):
            if depthwise and i == 2:  # 19b_dw stem conv3 is separable
                y = _conv(y.shape[-1], 3, s, groups=y.shape[-1],
                          name="stem2_dw", dtype=self.dtype)(y)
                y = _conv(c, 1, 1, name="stem2_pw", dtype=self.dtype)(y)
            else:
                y = _conv(c, 3, s, name=f"stem{i}", dtype=self.dtype)(y)
            y = BatchNorm(not self.train, dtype=self.dtype,
                          name=f"stem{i}_bn")(y)
            y = nn.relu(y)
            if i == 1:
                stem_tap = y
        feats = [stem_tap]

        for si in range(4):
            if si > 0:
                y = max_pool_3x3_s2(y)
            for bi in range(n_blocks[si]):
                y = OSABlock(
                    conv_chs[si], out_chs[si], n_layers, residual,
                    depthwise, self.train, self.dtype,
                    name=f"stage{si}_block{bi}",
                )(y)
            feats.append(y)
        return feats
