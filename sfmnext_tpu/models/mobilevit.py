"""MobileViT v1/v2 trunks (Mehta & Rastegari, ICLR'22 / arXiv'22) for the
timm-Unet backbones.

Covers ``mobilevit_s/xs/xxs`` and ``mobilevitv2_050..200`` incl. the
``_in22ft1k`` / ``_384_in22ft1k`` weight-tag aliases
(networks/Unet.py:346-354).

v1 blocks: MV2 (inverted residual) stages with MobileViT attention blocks
at strides 8/16/32 — local conv rep, 2x2 patch unfold, a small ViT over
patch tokens, fold, fuse. v2 replaces MHA with separable (linear)
self-attention and drops the concat-fusion.

TPU notes: the patch unfold/fold is a reshape/transpose pair (no gathers);
attention is over <=O(HW/4) tokens of dim <=256 — small dense matmuls that
XLA maps straight onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout
from sfmnext_tpu.models.mobile_builder import make_divisible

# v1: (stage channels, transformer dims, transformer depths, expand, final)
MOBILEVIT_V1 = {
    "mobilevit_s": ((32, 64, 96, 128, 160), (144, 192, 240), (2, 4, 3), 4, 640),
    "mobilevit_xs": ((32, 48, 64, 80, 96), (96, 120, 144), (2, 4, 3), 4, 384),
    "mobilevit_xxs": ((16, 24, 48, 64, 80), (64, 80, 96), (2, 4, 3), 2, 320),
}


def _conv(feat, k, s=1, groups=1, bias=False, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2,
        feature_group_count=groups, use_bias=bias,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


class MV2Block(nn.Module):
    out_ch: int
    stride: int = 1
    expand: int = 4
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = make_divisible(in_ch * self.expand)
        y = _conv(mid, 1, name="pw_exp", dtype=self.dtype)(x)
        y = nn.silu(BatchNorm(not self.train, dtype=self.dtype,
                              name="bn1")(y))
        y = _conv(mid, 3, self.stride, groups=mid, name="dw",
                  dtype=self.dtype)(y)
        y = nn.silu(BatchNorm(not self.train, dtype=self.dtype,
                              name="bn2")(y))
        y = _conv(self.out_ch, 1, name="pw_proj", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn3")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


def _unfold(x, p=2):
    """[B,H,W,C] -> [B, (H/p)(W/p), p*p, C] patch tokens.

    Odd feature maps are edge-padded to a patch multiple first (the
    reference implementation bilinearly resizes; for a 1-px pad at 1/32
    resolution the difference is the boundary row only). `_fold` crops
    back via the caller passing the original h/w.
    """
    b, h, w, c = x.shape
    ph, pw = (-h) % p, (-w) % p
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        h, w = h + ph, w + pw
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p, c)


def _fold(x, h, w, p=2):
    b, _, _, c = x.shape
    hp, wp = h + (-h) % p, w + (-w) % p
    x = x.reshape(b, hp // p, wp // p, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, c)[:, :h, :w]


class _TransformerLayer(nn.Module):
    dim: int
    heads: int = 4
    mlp_ratio: float = 2.0
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype,
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.silu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class MobileViTBlock(nn.Module):
    dim: int
    depth: int
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h, w = x.shape[1:3]
        y = _conv(c, 3, name="local_conv", dtype=self.dtype)(x)
        y = nn.silu(BatchNorm(not self.train, dtype=self.dtype,
                              name="local_bn")(y))
        y = _conv(self.dim, 1, bias=True, name="proj_in", dtype=self.dtype)(y)

        t = _unfold(y)  # [B, N, P, dim]
        b, n, p, _ = t.shape
        # attend across patches holding the pixel index fixed (paper fig. 1)
        t = t.transpose(0, 2, 1, 3).reshape(b * p, n, self.dim)
        for i in range(self.depth):
            t = _TransformerLayer(self.dim, dtype=self.dtype,
                                  name=f"tr{i}")(t)
        t = nn.LayerNorm(dtype=self.dtype, name="norm")(t)
        t = t.reshape(b, p, n, self.dim).transpose(0, 2, 1, 3)
        y = _fold(t, h, w)

        y = _conv(c, 1, bias=True, name="proj_out", dtype=self.dtype)(y)
        y = jnp.concatenate([x, y], axis=-1)
        y = _conv(c, 3, name="fuse", dtype=self.dtype)(y)
        return nn.silu(BatchNorm(not self.train, dtype=self.dtype,
                                 name="fuse_bn")(y))


class _SeparableAttn(nn.Module):
    """MobileViTv2 separable self-attention (linear in token count)."""

    dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # [B*, N, d]
        qkv = nn.Dense(1 + 2 * self.dim, dtype=self.dtype, name="qkv")(x)
        scores = nn.softmax(qkv[..., :1], axis=-2)          # [B*, N, 1]
        k = qkv[..., 1: 1 + self.dim]
        v = nn.relu(qkv[..., 1 + self.dim:])
        ctx = (scores * k).sum(axis=-2, keepdims=True)       # [B*, 1, d]
        y = v * ctx
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(y)


class _V2TransformerLayer(nn.Module):
    dim: int
    mlp_ratio: float = 2.0
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + _SeparableAttn(self.dim, dtype=self.dtype)(y)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.silu(y)
        return x + nn.Dense(self.dim, dtype=self.dtype)(y)


class MobileViTV2Block(nn.Module):
    dim: int
    depth: int
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h, w = x.shape[1:3]
        y = _conv(c, 3, groups=c, name="local_dw", dtype=self.dtype)(x)
        y = nn.silu(BatchNorm(not self.train, dtype=self.dtype,
                              name="local_bn")(y))
        y = _conv(self.dim, 1, bias=True, name="proj_in", dtype=self.dtype)(y)
        t = _unfold(y)
        b, n, p, _ = t.shape
        t = t.transpose(0, 2, 1, 3).reshape(b * p, n, self.dim)
        for i in range(self.depth):
            t = _V2TransformerLayer(self.dim, dtype=self.dtype,
                                    name=f"tr{i}")(t)
        t = nn.LayerNorm(dtype=self.dtype, name="norm")(t)
        t = t.reshape(b, p, n, self.dim).transpose(0, 2, 1, 3)
        y = _fold(t, h, w)
        return _conv(c, 1, bias=True, name="proj_out", dtype=self.dtype)(y)


class MobileViT(nn.Module):
    variant: str = "mobilevit_s"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        name = self.variant
        for suf in ("_in22ft1k", "_384"):
            name = name.replace(suf, "")
        if self.dtype is not None:
            x = x.astype(self.dtype)

        if name in MOBILEVIT_V1:
            chs, dims, depths, e, final = MOBILEVIT_V1[name]
            y = _conv(16, 3, 2, name="stem", dtype=self.dtype)(x)
            y = nn.silu(BatchNorm(not self.train, dtype=self.dtype,
                                  name="stem_bn")(y))
            y = MV2Block(chs[0], 1, e, self.train, self.dtype, name="s0_b0")(y)
            feats = [y]
            for i in range(3):
                y = MV2Block(chs[1], 2 if i == 0 else 1, e, self.train,
                             self.dtype, name=f"s1_b{i}")(y)
            feats.append(y)
            for si in range(3):
                y = MV2Block(chs[2 + si], 2, e, self.train, self.dtype,
                             name=f"s{2 + si}_b0")(y)
                y = MobileViTBlock(dims[si], depths[si], self.train,
                                   self.dtype, name=f"s{2 + si}_vit")(y)
                feats.append(y)
            feats[-1] = nn.silu(BatchNorm(
                not self.train, dtype=self.dtype, name="final_bn",
            )(_conv(final, 1, name="final_conv", dtype=self.dtype)(feats[-1])))
            return feats

        if name.startswith("mobilevitv2_"):
            a = int(name[len("mobilevitv2_"):]) / 100.0
            chs = [make_divisible(c * a, 8) for c in (32, 64, 128, 256, 384, 512)]
            dims = [make_divisible(d * a, 8) for d in (128, 192, 256)]
            depths = (2, 4, 3)
            y = _conv(chs[0], 3, 2, name="stem", dtype=self.dtype)(x)
            y = nn.silu(BatchNorm(not self.train, dtype=self.dtype,
                                  name="stem_bn")(y))
            y = MV2Block(chs[1], 1, 2, self.train, self.dtype, name="s0_b0")(y)
            feats = [y]
            for i in range(2):
                y = MV2Block(chs[2], 2 if i == 0 else 1, 2, self.train,
                             self.dtype, name=f"s1_b{i}")(y)
            feats.append(y)
            for si in range(3):
                y = MV2Block(chs[3 + si], 2, 2, self.train, self.dtype,
                             name=f"s{2 + si}_b0")(y)
                y = MobileViTV2Block(dims[si], depths[si], self.train,
                                     self.dtype, name=f"s{2 + si}_vit")(y)
                feats.append(y)
            return feats

        raise ValueError(f"unknown mobilevit variant {self.variant!r}")
