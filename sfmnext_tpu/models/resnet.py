"""ResNet feature-pyramid encoder in Flax (NHWC).

Behavioral reference: /root/reference/networks/resnet_encoder.py:19-100
(torchvision ResNet-18/34/50/101/152 with the monodepth2 5-level feature
taps and the (x-0.45)/0.225 input normalization at :91). Multi-image input
variant (:19-41) stacks frames on channels.

TPU-first: NHWC convolutions, BatchNorm with global-batch statistics.
When ``dtype=bfloat16`` the convs run in bf16 on the MXU with f32 params.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn

from sfmnext_tpu.models.common import (
    BatchNorm,
    avg_pool_2x2_s2_ceil,
    eca_module,
    kaiming_normal_fanout,
    max_pool_3x3_s2,
    se_module,
)

RESNET_SPECS = {
    10: ("basic", (1, 1, 1, 1)),       # timm resnet10t
    14: ("bottleneck", (1, 1, 1, 1)),  # timm resnet14t
    18: ("basic", (2, 2, 2, 2)),
    26: ("bottleneck", (2, 2, 2, 2)),  # timm resnet26/seresnext26 family
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),  # timm resnet200d
    269: ("bottleneck", (3, 30, 48, 8)),  # timm ecaresnet269d
    -1: ("bottleneck", (1, 1, 11, 3)),    # timm ecaresnetlight
    270: ("bottleneck", (4, 29, 53, 4)),  # resnetrs270
    350: ("bottleneck", (4, 36, 72, 4)),  # resnetrs350
    420: ("bottleneck", (4, 44, 87, 4)),  # resnetrs420
}


def _conv(features, kernel, strides=1, name=None, dtype=None, groups=1):
    k = (kernel, kernel)
    pad = kernel // 2
    return nn.Conv(
        features,
        k,
        strides=(strides, strides),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        feature_group_count=groups,
        kernel_init=kaiming_normal_fanout,
        dtype=dtype,
        name=name,
    )


def _downsample(x, out_ch, strides, avg_down, train, dtype, norm="bn"):
    """Projection shortcut; ``avg_down`` = timm's ResNet-D variant
    (AvgPool(2,2,ceil) then 1x1 stride-1 conv instead of a strided 1x1)."""
    if avg_down and strides != 1:
        x = avg_pool_2x2_s2_ceil(x)
        strides = 1
    x = _conv(out_ch, 1, strides, name="down_conv", dtype=dtype)(x)
    return _norm(x, train, dtype, "down_bn", norm)


def _norm(x, train, dtype, name, kind="bn"):
    """BatchNorm (torch defaults) or GroupNorm-32 (timm resnet50_gn)."""
    if kind == "gn":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype,
                            name=name)(x)
    return BatchNorm(not train, dtype=dtype, name=name)(x)


def _attn(y, attn, se_reduction, out_ch, dtype):
    if se_reduction:
        y = se_module(y, max(1, out_ch // se_reduction), dtype, "se")
    if attn == "eca":
        y = eca_module(y, dtype, "eca")
    return y


def blur_pool(x, dtype=None):
    """Anti-aliased stride-2 downsample (Zhang ICML'19): fixed binomial
    [1,2,1]x[1,2,1]/16 depthwise filter, pad 1, stride 2 (timm BlurPool2d
    used by resnetblur*)."""
    import jax.numpy as jnp
    from jax import lax

    c = x.shape[-1]
    f1 = jnp.array([1.0, 2.0, 1.0])
    k = (f1[:, None] * f1[None, :]) / 16.0
    k = jnp.broadcast_to(k[:, :, None, None], (3, 3, 1, c))
    if dtype is not None:
        k = k.astype(dtype)
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def _aa_pool(x, aa, dtype):
    """Post-conv anti-aliased downsample: 'blur' (resnetblur*) or 'avg'
    (resnetaa* / seresnextaa*, timm aa_layer=AvgPool2d)."""
    if aa == "blur":
        return blur_pool(x, dtype)
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    train: bool = False
    dtype: object = None
    se_reduction: int = 0  # >0: SE after bn2 (timm seresnet semantics)
    avg_down: bool = False  # timm resnet*d/gluon-v1d shortcut pooling
    attn: str = ""  # "eca": ecaresnet* (after bn2, like SE)

    @nn.compact
    def __call__(self, x):
        identity = x
        y = _conv(self.features, 3, self.strides, name="conv1", dtype=self.dtype)(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, name="conv2", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn2")(y)
        y = _attn(y, self.attn, self.se_reduction, self.features, self.dtype)
        if self.strides != 1 or identity.shape[-1] != self.features:
            identity = _downsample(
                x, self.features, self.strides, self.avg_down, self.train,
                self.dtype,
            )
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    train: bool = False
    dtype: object = None
    groups: int = 1       # resnext: grouped 3x3 (torchvision resnet.py)
    base_width: int = 64  # wide_resnet: 128; resnext50_32x4d: 4
    se_reduction: int = 0  # >0: SE after bn3 (timm seresnet/seresnext)
    avg_down: bool = False  # timm resnet*d/gluon-v1d shortcut pooling
    attn: str = ""  # "eca": ecaresnet* (after bn3, like SE)
    aa: str = ""  # "blur"/"avg": anti-aliased stride (resnetblur*/[..]aa*)
    norm: str = "bn"  # "gn": GroupNorm-32 (timm resnet50_gn)

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        y = _conv(width, 1, 1, name="conv1", dtype=self.dtype)(x)
        y = _norm(y, self.train, self.dtype, "bn1", self.norm)
        y = nn.relu(y)
        # torchvision puts the stride on the 3x3 (ResNet v1.5); with aa the
        # 3x3 stays s1 and a blur/avg pool takes the stride after the act
        conv2_s = 1 if (self.aa and self.strides == 2) else self.strides
        y = _conv(
            width, 3, conv2_s, name="conv2", dtype=self.dtype,
            groups=self.groups,
        )(y)
        y = _norm(y, self.train, self.dtype, "bn2", self.norm)
        y = nn.relu(y)
        if self.aa and self.strides == 2:
            y = _aa_pool(y, self.aa, self.dtype)
        y = _conv(out_ch, 1, 1, name="conv3", dtype=self.dtype)(y)
        y = _norm(y, self.train, self.dtype, "bn3", self.norm)
        y = _attn(y, self.attn, self.se_reduction, out_ch, self.dtype)
        if self.strides != 1 or identity.shape[-1] != out_ch:
            identity = _downsample(
                x, out_ch, self.strides, self.avg_down, self.train,
                self.dtype, self.norm,
            )
        return nn.relu(y + identity)


class ResNetEncoder(nn.Module):
    """5-level feature pyramid: [stem_relu, layer1, layer2, layer3, layer4].

    Channel dims: [64,64,128,256,512] for 18/34; x4 on levels 1..4 for >=50
    (reference networks/resnet_encoder.py:70-87).

    Attributes:
      num_layers: one of 18/34/50/101/152.
      num_input_images: stacked input frames (channels = 3*n).
      normalize_input: apply the (x-0.45)/0.225 normalization (:91).
    """

    num_layers: int = 50
    num_input_images: int = 1
    normalize_input: bool = True
    train: bool = False
    dtype: object = None
    groups: int = 1       # resnext variants (torchvision resnet.py)
    base_width: int = 64  # wide_resnet variants
    se_reduction: int = 0  # seresnet/seresnext variants (timm, reduction 16)
    stem_type: str = ""   # ""=7x7 | "deep"/"deep_tiered": 3x 3x3 convs
    stem_width: int = 32  # deep-stem width (gluon v1c/v1d: 32, v1s: 64)
    avg_down: bool = False  # resnet*d / gluon-v1d shortcut pooling
    attn: str = ""        # "eca": ecaresnet*
    replace_stem_pool: bool = False  # resnetrs: 3x3 s2 conv-BN-relu pool
    aa: str = ""          # "blur"/"avg" anti-aliased strides
    norm: str = "bn"      # "gn": GroupNorm-32 (timm resnet50_gn)

    @nn.compact
    def __call__(self, x):
        block_kind, stage_sizes = RESNET_SPECS[self.num_layers]
        if block_kind == "basic":
            assert self.groups == 1 and self.base_width == 64, (
                "groups/base_width require bottleneck blocks (torchvision)"
            )
            block = functools.partial(
                BasicBlock, se_reduction=self.se_reduction,
                avg_down=self.avg_down, attn=self.attn,
            )
        else:
            block = functools.partial(
                Bottleneck, groups=self.groups, base_width=self.base_width,
                se_reduction=self.se_reduction, avg_down=self.avg_down,
                attn=self.attn, aa=self.aa, norm=self.norm,
            )

        if self.normalize_input:
            x = (x - 0.45) / 0.225
        if self.dtype is not None:
            x = x.astype(self.dtype)

        features = []
        if self.stem_type:
            # timm/gluon deep stem: 3x3 s2 + 2x 3x3 s1, ending at
            # 2*stem_width channels; "tiered" narrows the first conv to
            # 3*stem_width/4 (timm resnet.py make_stem / gluoncv resnetv1c)
            c0 = (
                3 * self.stem_width // 4
                if self.stem_type == "deep_tiered" else self.stem_width
            )
            chans = (c0, self.stem_width, 2 * self.stem_width)
            y = x
            for i, (c, s) in enumerate(zip(chans, (2, 1, 1))):
                y = _conv(c, 3, s, name=f"conv1_{i}", dtype=self.dtype)(y)
                y = BatchNorm(not self.train, dtype=self.dtype, name=f"bn1_{i}")(y)
                y = nn.relu(y)
        else:
            y = _conv(64, 7, 2, name="conv1", dtype=self.dtype)(x)
            y = _norm(y, self.train, self.dtype, "bn1", self.norm)
            y = nn.relu(y)
        features.append(y)

        if self.replace_stem_pool:
            # ResNet-RS (Bello et al. '21): strided conv instead of max pool
            y = _conv(64, 3, 2, name="stem_pool_conv", dtype=self.dtype)(y)
            y = BatchNorm(not self.train, dtype=self.dtype,
                          name="stem_pool_bn")(y)
            y = nn.relu(y)
        elif self.aa:
            # anti-aliased stem pool: max 3x3 s1 + blur/avg s2
            y = nn.max_pool(y, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
            y = _aa_pool(y, self.aa, self.dtype)
        else:
            y = max_pool_3x3_s2(y)
        for stage, (width, n_blocks) in enumerate(
            zip((64, 128, 256, 512), stage_sizes)
        ):
            for i in range(n_blocks):
                strides = 2 if (i == 0 and stage > 0) else 1
                y = block(
                    width, strides, self.train, self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(y)
            features.append(y)
        return features

    @staticmethod
    def feature_channels(num_layers: int) -> Sequence[int]:
        base = [64, 64, 128, 256, 512]
        if RESNET_SPECS[num_layers][0] == "bottleneck":
            return [base[0]] + [c * 4 for c in base[1:]]
        return base
