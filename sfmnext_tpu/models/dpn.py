"""Dual Path Networks (Chen et al. NeurIPS'17) for the timm-Unet backbones.

Covers ``dpn68 / dpn68b / dpn92 / dpn98 / dpn107 / dpn131``
(networks/Unet.py:341). Each block carries a residual path (fixed width,
added) and a densely-growing path (concatenated): pre-activated
1x1 -> grouped 3x3 -> 1x1 producing ``bw + inc`` channels, split into the
two paths. The 'b' flavor normalizes before splitting with two separate
1x1 heads.

Feature taps: stem (r2) + the concatenated dual-path state at each stage
end (r4/8/16/32), deepest tap pre-activated with the trunk's final
BN-ReLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import (
    BatchNorm,
    kaiming_normal_fanout,
    max_pool_3x3_s2,
)

# variant -> (small_stem, init_features, k_r, groups, k_sec, inc_sec, b)
DPN_SPECS = {
    "dpn68": (True, 10, 128, 32, (3, 4, 12, 3), (16, 32, 32, 64), False),
    "dpn68b": (True, 10, 128, 32, (3, 4, 12, 3), (16, 32, 32, 64), True),
    "dpn92": (False, 64, 96, 32, (3, 4, 20, 3), (16, 32, 24, 128), False),
    "dpn98": (False, 96, 160, 40, (3, 6, 20, 3), (16, 32, 32, 128), False),
    "dpn107": (False, 128, 200, 50, (4, 8, 20, 3), (20, 64, 64, 128), False),
    "dpn131": (False, 128, 160, 40, (4, 8, 28, 3), (16, 32, 32, 128), False),
}


class DualPathBlock(nn.Module):
    r: int        # 1x1-a / 3x3-b width
    bw: int       # residual-path width
    inc: int      # dense-path growth
    groups: int
    kind: str = "normal"  # "proj" | "down" | "normal"
    b: bool = False
    train: bool = False
    dtype: object = None

    def _bac(self, x, feat, k, s=1, groups=1, name=""):
        """pre-act BN-ReLU-conv."""
        x = BatchNorm(not self.train, dtype=self.dtype, name=f"{name}_bn")(x)
        x = nn.relu(x)
        return nn.Conv(
            feat, (k, k), strides=(s, s), padding=k // 2,
            feature_group_count=groups, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype,
            name=f"{name}_conv",
        )(x)

    @nn.compact
    def __call__(self, res, dense):
        x_in = jnp.concatenate([res, dense], axis=-1)
        stride = 2 if self.kind == "down" else 1
        if self.kind in ("proj", "down"):
            w = self._bac(x_in, self.bw + 2 * self.inc, 1, stride, name="w")
            res_s, dense_s = w[..., : self.bw], w[..., self.bw:]
        else:
            res_s, dense_s = res, dense
        y = self._bac(x_in, self.r, 1, name="a")
        y = self._bac(y, self.r, 3, stride, groups=self.groups, name="b")
        if self.b:
            y = BatchNorm(not self.train, dtype=self.dtype, name="c_bn")(y)
            y = nn.relu(y)
            c1 = nn.Conv(self.bw, (1, 1), use_bias=False,
                         kernel_init=kaiming_normal_fanout,
                         dtype=self.dtype, name="c1_conv")(y)
            c2 = nn.Conv(self.inc, (1, 1), use_bias=False,
                         kernel_init=kaiming_normal_fanout,
                         dtype=self.dtype, name="c2_conv")(y)
        else:
            y = self._bac(y, self.bw + self.inc, 1, name="c")
            c1, c2 = y[..., : self.bw], y[..., self.bw:]
        return res_s + c1, jnp.concatenate([dense_s, c2], axis=-1)


class DPN(nn.Module):
    variant: str = "dpn92"
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.variant not in DPN_SPECS:
            raise ValueError(f"unknown dpn variant {self.variant!r}")
        small, init_f, k_r, groups, k_sec, inc_sec = DPN_SPECS[self.variant][:6]
        b = DPN_SPECS[self.variant][6]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        k = 3 if small else 7
        y = nn.Conv(
            init_f, (k, k), strides=(2, 2), padding=k // 2, use_bias=False,
            kernel_init=kaiming_normal_fanout, dtype=self.dtype,
            name="stem_conv",
        )(x)
        y = BatchNorm(not self.train, dtype=self.dtype, name="stem_bn")(y)
        y = nn.relu(y)
        feats = [y]
        y = max_pool_3x3_s2(y)

        bwf = 1 if small else 4
        res, dense = y, y[..., :0]
        for si in range(4):
            bw = 64 * (2 ** si) * bwf
            r = k_r * (2 ** si)
            inc = inc_sec[si]
            kind = "proj" if si == 0 else "down"
            for bi in range(k_sec[si]):
                res, dense = DualPathBlock(
                    r, bw, inc, groups, kind if bi == 0 else "normal", b,
                    self.train, self.dtype, name=f"stage{si}_block{bi}",
                )(res, dense)
            feats.append(jnp.concatenate([res, dense], axis=-1))
        feats[-1] = nn.relu(
            BatchNorm(not self.train, dtype=self.dtype, name="norm")(feats[-1])
        )
        return feats
