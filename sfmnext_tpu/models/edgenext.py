"""EdgeNeXt trunks (Maaz et al. ECCV-W'22) for the timm-Unet backbones.

Covers ``edgenext_xx_small / x_small / small / base`` and the timm
``edgenext_small_rw`` variant (networks/Unet.py:343; small_rw shares the
small-scale recipe — stem/downsample rounding differences of the rw
checkpoint are not replicated).

Four stages at strides 4/8/16/32 (convnext-style 4x4 patchify stem, 2x2
downsample convs). Each stage is ConvNeXt-style dw-conv/MLP blocks, with
one Split-Depthwise-Transpose-Attention (SDTA) block closing stages 2-4:
a res2net-ish cascade of depthwise 3x3s over channel splits followed by
cross-covariance attention (XCA — attention over the channel dim, linear
in token count) and an MLP.

Feature taps = the 4 stage outputs (timm features_only for edgenext),
consumed like the convnext family (decoder ends at 1/2 resolution).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import kaiming_normal_fanout

# variant -> (dims, depths, stage kernel sizes)
EDGENEXT_SPECS = {
    "edgenext_xx_small": ((24, 48, 88, 168), (2, 2, 6, 2), (3, 5, 7, 9)),
    "edgenext_x_small": ((32, 64, 100, 192), (3, 3, 9, 3), (3, 5, 7, 9)),
    "edgenext_small": ((48, 96, 160, 304), (3, 3, 9, 3), (3, 5, 7, 9)),
    "edgenext_small_rw": ((48, 96, 192, 384), (3, 3, 9, 3), (3, 5, 7, 9)),
    "edgenext_base": ((80, 160, 288, 584), (3, 3, 9, 3), (3, 5, 7, 9)),
}


class _ConvBlock(nn.Module):
    dim: int
    kernel: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (self.kernel, self.kernel), padding=self.kernel // 2,
            feature_group_count=self.dim, kernel_init=kaiming_normal_fanout,
            dtype=self.dtype, name="dw",
        )(x)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32
        )
        return x + y * gamma.astype(y.dtype)


class _XCA(nn.Module):
    """Cross-covariance attention: softmax over the channel-channel
    covariance of L2-normalized q/k — cost linear in token count."""

    dim: int
    heads: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        b, n, c = x.shape
        h = self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(b, n, h, c // h).transpose(0, 2, 3, 1)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)  # [B,h,d,N]
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
        temp = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        attn = nn.softmax(
            (q @ k.transpose(0, 1, 3, 2)) * temp.astype(q.dtype), axis=-1
        )
        y = (attn @ v).transpose(0, 3, 1, 2).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(y)


class _SDTABlock(nn.Module):
    dim: int
    scales: int = 2
    heads: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        # res2net-style cascaded depthwise 3x3 over the first scales-1
        # equal-width channel splits; the remainder passes through untouched
        # (official EdgeNeXt SDTAEncoder.forward)
        n = max(1, self.scales - 1)
        width = -(-c // self.scales)  # ceil
        outs, prev = [], None
        for i in range(n):
            sp = x[..., i * width: (i + 1) * width]
            if prev is not None:
                sp = sp + prev
            sp = nn.Conv(
                width, (3, 3), padding=1, feature_group_count=width,
                kernel_init=kaiming_normal_fanout, dtype=self.dtype,
                name=f"dw{i}",
            )(sp)
            prev = sp
            outs.append(sp)
        outs.append(x[..., n * width:])
        y = jnp.concatenate(outs, axis=-1)

        t = y.reshape(b, hh * ww, c)
        t = t + _XCA(c, self.heads, self.dtype, name="xca")(
            nn.LayerNorm(dtype=self.dtype, name="norm_xca")(t)
        )
        z = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")(t)
        z = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, dtype=self.dtype, name="fc2")(z)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (c,), jnp.float32
        )
        t = t + z * gamma.astype(z.dtype)
        return t.reshape(b, hh, ww, c) + x


class EdgeNeXt(nn.Module):
    variant: str = "edgenext_small"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in EDGENEXT_SPECS:
            raise ValueError(f"unknown edgenext variant {self.variant!r}")
        dims, depths, kernels = EDGENEXT_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = nn.Conv(
            dims[0], (4, 4), strides=(4, 4), kernel_init=kaiming_normal_fanout,
            dtype=self.dtype, name="stem",
        )(x)
        y = nn.LayerNorm(dtype=self.dtype, name="stem_norm")(y)

        feats = []
        for si in range(4):
            if si > 0:
                y = nn.LayerNorm(dtype=self.dtype, name=f"down{si}_norm")(y)
                y = nn.Conv(
                    dims[si], (2, 2), strides=(2, 2),
                    kernel_init=kaiming_normal_fanout, dtype=self.dtype,
                    name=f"down{si}",
                )(y)
            for bi in range(depths[si] - (1 if si > 0 else 0)):
                y = _ConvBlock(dims[si], kernels[si], self.dtype,
                               name=f"s{si}_b{bi}")(y)
            if si > 0:  # SDTA closes stages 2-4
                y = _SDTABlock(dims[si], scales=min(si + 1, 4),
                               dtype=self.dtype, name=f"s{si}_sdta")(y)
            feats.append(y)
        return feats
