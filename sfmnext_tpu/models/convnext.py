"""ConvNeXt feature encoder (timm ``convnext_*`` equivalents).

Behavioral reference: networks/Unet.py:114-117 uses
``timm.create_model(backbone, features_only=True)`` — for convnext that
yields 4 feature maps at strides 4/8/16/32 with the stage dims.

Architecture (Liu et al. 2022): stem 4x4 s4 conv + LayerNorm; stages of
blocks [dwconv7x7 -> LN -> pw 4x MLP (GELU) -> layer-scale gamma] with
2x2 s2 downsample (LN + conv) between stages.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

CONVNEXT_CFGS = {
    "convnext_atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "convnext_femto": ((2, 2, 6, 2), (48, 96, 192, 384)),
    "convnext_pico": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "convnext_nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
}


def convnext_cfg(name: str) -> Tuple[Sequence[int], Sequence[int]]:
    base = name.split(".")[0]
    for key in (base, "_".join(base.split("_")[:2])):
        if key in CONVNEXT_CFGS:
            return CONVNEXT_CFGS[key]
    raise ValueError(f"unknown convnext variant {name!r}")


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param(
            "gamma",
            lambda k, s: jnp.full(s, self.layer_scale_init, jnp.float32),
            (self.dim,),
        )
        return x + y * gamma.astype(y.dtype)


class ConvNeXt(nn.Module):
    """features_only encoder: 4 maps at strides 4/8/16/32."""

    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (192, 384, 768, 1536)
    train: bool = False  # (no BN; kept for interface symmetry)
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = []
        y = nn.Conv(
            self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
            name="stem_conv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(y)
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                y = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"down{si}_norm"
                )(y)
                y = nn.Conv(
                    dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                    name=f"down{si}_conv",
                )(y)
            for bi in range(depth):
                y = ConvNeXtBlock(
                    dim, dtype=self.dtype, name=f"stage{si}_block{bi}"
                )(y)
            feats.append(y)
        return feats
