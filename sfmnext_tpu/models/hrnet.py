"""HRNet trunks (Wang et al. TPAMI'20) for the timm-Unet backbones.

Covers ``hrnet_w18_small / hrnet_w18_small_v2 / hrnet_w18 / w30 / w32 /
w40 / w44 / w48 / w64`` (networks/Unet.py:346-347).

Parallel multi-resolution branches with repeated full cross-resolution
fusion (strided 3x3 chains downward, 1x1 + nearest-upsample upward).
Feature taps follow timm's features_only flavor: the stem's first conv
activation (r2) plus per-branch "incre" bottlenecks projecting the four
branches to 128/256/512/1024 channels at r4/8/16/32.

TPU notes: branch tensors keep static shapes; the nearest upsample is a
reshape-broadcast (no gather); all fusion convs are dense MXU work.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import BatchNorm, kaiming_normal_fanout

# variant -> (stage1 (block count, planes), per-stage: (n_modules,
#             blocks_per_branch, base width))
HRNET_SPECS = {
    "hrnet_w18_small": ((1, 32), (1, 2, 16), (1, 2, 16), (1, 2, 16)),
    "hrnet_w18_small_v2": ((2, 64), (1, 2, 18), (3, 2, 18), (2, 2, 18)),
    "hrnet_w18": ((4, 64), (1, 4, 18), (4, 4, 18), (3, 4, 18)),
    "hrnet_w30": ((4, 64), (1, 4, 30), (4, 4, 30), (3, 4, 30)),
    "hrnet_w32": ((4, 64), (1, 4, 32), (4, 4, 32), (3, 4, 32)),
    "hrnet_w40": ((4, 64), (1, 4, 40), (4, 4, 40), (3, 4, 40)),
    "hrnet_w44": ((4, 64), (1, 4, 44), (4, 4, 44), (3, 4, 44)),
    "hrnet_w48": ((4, 64), (1, 4, 48), (4, 4, 48), (3, 4, 48)),
    "hrnet_w64": ((4, 64), (1, 4, 64), (4, 4, 64), (3, 4, 64)),
}


def _conv(feat, k, s=1, name=None, dtype=None):
    return nn.Conv(
        feat, (k, k), strides=(s, s), padding=k // 2, use_bias=False,
        kernel_init=kaiming_normal_fanout, dtype=dtype, name=name,
    )


def _upsample_nearest(x, factor):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


class _Basic(nn.Module):
    planes: int
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = _conv(self.planes, 3, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="bn1")(y))
        y = _conv(self.planes, 3, name="conv2", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn2")(y)
        return nn.relu(y + x)


class _Bottleneck(nn.Module):
    planes: int  # out = 4x
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        y = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="bn1")(y))
        y = _conv(self.planes, 3, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="bn2")(y))
        y = _conv(out_ch, 1, name="conv3", dtype=self.dtype)(y)
        y = BatchNorm(not self.train, dtype=self.dtype, name="bn3")(y)
        identity = x
        if x.shape[-1] != out_ch:
            identity = _conv(out_ch, 1, name="down_conv",
                             dtype=self.dtype)(x)
            identity = BatchNorm(not self.train, dtype=self.dtype,
                                 name="down_bn")(identity)
        return nn.relu(y + identity)


class _Fuse(nn.Module):
    """Full cross-resolution fusion across branches."""

    widths: tuple
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, xs):
        outs = []
        for i, wi in enumerate(self.widths):
            acc = None
            for j, xj in enumerate(xs):
                if j == i:
                    y = xj
                elif j > i:  # lower res -> up: 1x1 conv + nearest up
                    y = _conv(wi, 1, name=f"up{i}_{j}", dtype=self.dtype)(xj)
                    y = BatchNorm(not self.train, dtype=self.dtype,
                                  name=f"up{i}_{j}_bn")(y)
                    y = _upsample_nearest(y, 2 ** (j - i))
                else:  # higher res -> down: chain of strided 3x3s
                    y = xj
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = wi if last else self.widths[j]
                        y = _conv(ch, 3, 2, name=f"down{i}_{j}_{k}",
                                  dtype=self.dtype)(y)
                        y = BatchNorm(not self.train, dtype=self.dtype,
                                      name=f"down{i}_{j}_{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    variant: str = "hrnet_w18"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in HRNET_SPECS:
            raise ValueError(f"unknown hrnet variant {self.variant!r}")
        (n1, planes1), *stages = HRNET_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y = _conv(64, 3, 2, name="stem1", dtype=self.dtype)(x)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="stem1_bn")(y))
        stem_tap = y
        y = _conv(64, 3, 2, name="stem2", dtype=self.dtype)(y)
        y = nn.relu(BatchNorm(not self.train, dtype=self.dtype,
                              name="stem2_bn")(y))

        for bi in range(n1):
            y = _Bottleneck(planes1, self.train, self.dtype,
                            name=f"layer1_{bi}")(y)

        xs = [y]
        for si, (n_mod, n_blk, w) in enumerate(stages):
            widths = tuple(w * (2 ** b) for b in range(si + 2))
            # transition: adapt existing branches, spawn the new one
            new_xs = []
            for b, wb in enumerate(widths):
                if b < len(xs):
                    src = xs[b]
                    if src.shape[-1] != wb:
                        src = _conv(wb, 3, name=f"t{si}_b{b}",
                                    dtype=self.dtype)(src)
                        src = nn.relu(BatchNorm(
                            not self.train, dtype=self.dtype,
                            name=f"t{si}_b{b}_bn")(src))
                    new_xs.append(src)
                else:
                    src = _conv(wb, 3, 2, name=f"t{si}_b{b}",
                                dtype=self.dtype)(xs[-1])
                    src = nn.relu(BatchNorm(
                        not self.train, dtype=self.dtype,
                        name=f"t{si}_b{b}_bn")(src))
                    new_xs.append(src)
            xs = new_xs
            for mi in range(n_mod):
                xs = [
                    _branch_blocks(
                        xs[b], widths[b], n_blk, self.train, self.dtype,
                        f"s{si}_m{mi}_b{b}",
                    )
                    for b in range(len(xs))
                ]
                xs = _Fuse(widths, self.train, self.dtype,
                           name=f"s{si}_m{mi}_fuse")(xs)

        # incre heads: project branches to 128/256/512/1024 (timm features)
        feats = [stem_tap]
        for b, planes in enumerate((32, 64, 128, 256)):
            feats.append(
                _Bottleneck(planes, self.train, self.dtype,
                            name=f"incre{b}")(xs[b])
            )
        return feats


def _branch_blocks(x, width, n, train, dtype, prefix):
    for bi in range(n):
        x = _Basic(width, train, dtype, name=f"{prefix}_{bi}")(x)
    return x
