"""Golden parity for the eff_b5 / ConvNeXt-Unet weight converters.

Builds torch modules with the exact state_dict naming of the reference's
external backbones — gen-efficientnet ``tf_efficientnet_b5_ap``
(networks/base_encoder.py:91-94) and timm convnext via Unet
(networks/Unet.py:114-117) — with random weights AND random BN running
stats, ports them through utils/torch_port, and checks the Flax forward
matches torch. timm/torchvision are not installed here, so the torch side
is reconstructed from nn primitives (same approach as test_torch_port.py).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sfmnext_tpu.utils import torch_port as tp


def _randomize_bn(module, rng):
    """Random running stats so the BN port is actually exercised."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1)
            )
            m.running_var.copy_(
                torch.from_numpy(
                    (rng.rand(m.num_features) * 0.5 + 0.5).astype(np.float32)
                )
            )


# ----------------------------------------------------------- efficientnet b5


def _same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])


class _ConvSame(nn.Conv2d):
    def forward(self, x):
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups
        )


class _SE(nn.Module):
    def __init__(self, mid, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(mid, reduced, 1)
        self.conv_expand = nn.Conv2d(reduced, mid, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class _DSConv(nn.Module):
    """gen-efficientnet DepthwiseSeparableConv naming (expand ratio 1)."""

    def __init__(self, in_ch, out_ch, k, s):
        super().__init__()
        self.conv_dw = _ConvSame(in_ch, in_ch, k, s, groups=in_ch, bias=False)
        self.bn1 = nn.BatchNorm2d(in_ch, eps=1e-3)
        self.se = _SE(in_ch, max(1, int(in_ch * 0.25)))
        self.conv_pw = _ConvSame(in_ch, out_ch, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.residual = s == 1 and in_ch == out_ch

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_dw(x)))
        y = self.se(y)
        y = self.bn2(self.conv_pw(y))
        return y + x if self.residual else y


class _InvRes(nn.Module):
    """gen-efficientnet InvertedResidual naming (expand ratio 6)."""

    def __init__(self, in_ch, out_ch, k, s, expand=6):
        super().__init__()
        mid = in_ch * expand
        self.conv_pw = _ConvSame(in_ch, mid, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = _ConvSame(mid, mid, k, s, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
        self.se = _SE(mid, max(1, int(in_ch * 0.25)))
        self.conv_pwl = _ConvSame(mid, out_ch, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.residual = s == 1 and in_ch == out_ch

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_pw(x)))
        y = F.silu(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.residual else y


class TorchEffB5(nn.Module):
    def __init__(self):
        super().__init__()
        from sfmnext_tpu.models.efficientnet import B5_STAGES as cfg

        self.conv_stem = _ConvSame(3, 48, 3, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(48, eps=1e-3)
        blocks = []
        in_ch = 48
        for si in range(7):
            stage = []
            for bi in range(cfg["repeats"][si]):
                out = cfg["channels"][si]
                s = cfg["strides"][si] if bi == 0 else 1
                k = cfg["kernels"][si]
                cls = _DSConv if cfg["expand"][si] == 1 else _InvRes
                args = (in_ch, out, k, s)
                stage.append(
                    cls(*args)
                    if cfg["expand"][si] == 1
                    else _InvRes(*args, expand=cfg["expand"][si])
                )
                in_ch = out
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.ModuleList(blocks)
        self.conv_head = _ConvSame(in_ch, 2048, 1, 1, bias=False)

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_stem(x)))
        taps = []
        for stage in self.blocks:
            y = stage(y)
            taps.append(y)
        head = self.conv_head(y)
        # the reference decoder taps features[4,5,6,8,11]
        # = blocks 0,1,2,4 outputs + conv_head (base_encoder.py:41)
        return [taps[0], taps[1], taps[2], taps[4], head]


def test_efficientnet_b5_port_matches_torch():
    from sfmnext_tpu.models.efficientnet import EfficientNetB5

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchEffB5().eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_efficientnet_b5(sd)

    model = EfficientNetB5(train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=2e-4, err_msg=f"feature {i}"
        )


# -------------------------------------------------------------- convnext unet


class _CNBlock(nn.Module):
    """timm ConvNeXtBlock naming: conv_dw / norm / mlp.fc1 / mlp.fc2 / gamma
    (the converter also accepts the pwconv1/pwconv2 variant)."""

    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):
        y = self.conv_dw(x).permute(0, 2, 3, 1)
        y = self.norm(y)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        y = self.gamma * y
        return x + y.permute(0, 3, 1, 2)


class _CNStage(nn.Module):
    def __init__(self, in_dim, dim, depth, downsample):
        super().__init__()
        if downsample:
            self.downsample = nn.Sequential(
                _ChanLN(in_dim), nn.Conv2d(in_dim, dim, 2, 2)
            )
        else:
            self.downsample = nn.Identity()
        self.blocks = nn.Sequential(*[_CNBlock(dim) for _ in range(depth)])

    def forward(self, x):
        return self.blocks(self.downsample(x))


class _ChanLN(nn.Module):
    """LayerNorm over channel dim of NCHW (timm norm_layer for downsample)."""

    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x):
        y = x.permute(0, 2, 3, 1)
        y = F.layer_norm(y, (y.shape[-1],), self.weight, self.bias, 1e-6)
        return y.permute(0, 3, 1, 2)


class TorchConvNeXt(nn.Module):
    def __init__(self, depths, dims):
        super().__init__()
        self.stem = nn.Sequential(nn.Conv2d(3, dims[0], 4, 4), _ChanLN(dims[0]))
        stages = []
        in_dim = dims[0]
        for si, (depth, dim) in enumerate(zip(depths, dims)):
            stages.append(_CNStage(in_dim, dim, depth, downsample=si > 0))
            in_dim = dim
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        y = self.stem(x)
        feats = []
        for stage in self.stages:
            y = stage(y)
            feats.append(y)
        return feats


class _TorchConvBnAct(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv = nn.Conv2d(i, o, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(o)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _TorchDecoderBlock(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv1 = _TorchConvBnAct(i, o)
        self.conv2 = _TorchConvBnAct(o, o)

    def forward(self, x, skip=None):
        if skip is not None:
            x = F.interpolate(
                x, size=skip.shape[-2:], mode="bilinear", align_corners=True
            )
            x = torch.cat([x, skip], 1)
        else:
            x = F.interpolate(x, scale_factor=2.0, mode="bilinear")
        return self.conv2(self.conv1(x))


class TorchConvNeXtUnet(nn.Module):
    """Reference Unet wiring (networks/Unet.py:139-146, 258-312; center=False)."""

    def __init__(self, depths, dims, dec_chs, num_classes):
        super().__init__()
        self.encoder = TorchConvNeXt(depths, dims)
        enc_chs = list(dims[::-1])
        in_chs = [
            i + s
            for i, s in zip(
                [enc_chs[0]] + list(dec_chs[:-1]), enc_chs[1:] + [0]
            )
        ]
        self.decoder = nn.Module()
        self.decoder.blocks = nn.ModuleList(
            [_TorchDecoderBlock(i, o) for i, o in zip(in_chs, dec_chs)]
        )
        self.decoder.final_conv = nn.Conv2d(dec_chs[-1], num_classes, 1)

    def forward(self, x):
        feats = self.encoder(x)[::-1]
        y, skips = feats[0], feats[1:]
        for i, b in enumerate(self.decoder.blocks):
            y = b(y, skips[i] if i < len(skips) else None)
        return self.decoder.final_conv(y)


def test_convnext_unet_port_matches_torch():
    from sfmnext_tpu.models.unet import Unet

    torch.manual_seed(2)
    rng = np.random.RandomState(2)
    depths, dims = (2, 2, 6, 2), (40, 80, 160, 320)  # convnext_atto
    dec_chs = (64, 48, 32, 24)
    ref = TorchConvNeXtUnet(depths, dims, dec_chs, num_classes=8).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)
        # non-trivial layer-scale gammas
        for m in ref.modules():
            if isinstance(m, _CNBlock):
                m.gamma.copy_(
                    torch.from_numpy(
                        rng.rand(m.gamma.shape[0]).astype(np.float32)
                    )
                )

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_convnext_unet(sd, "convnext_atto")

    model = Unet(
        backbone="convnext_atto", num_classes=8, decoder_channels=dec_chs,
        train=False,
    )
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_effb5_export_roundtrip():
    """export -> convert is the identity on the combined eff_b5 tree."""
    from sfmnext_tpu.models.efficientnet import BaseEncoderDecoder
    from sfmnext_tpu.utils import torch_export as te

    model = BaseEncoderDecoder(num_features=64, model_dim=8, train=False)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    sd = te.export_base_encoder_decoder(v["params"], v["batch_stats"])
    p2, s2 = tp.convert_base_encoder_decoder(sd)
    _trees_equal(v["params"], p2)
    _trees_equal(v["batch_stats"], s2)


def test_convnext_unet_export_roundtrip():
    from sfmnext_tpu.models.unet import Unet
    from sfmnext_tpu.utils import torch_export as te

    model = Unet(
        backbone="convnext_atto", num_classes=8,
        decoder_channels=(64, 48, 32, 24), train=False,
    )
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 96, 3)))
    sd = te.export_convnext_unet(v["params"], v["batch_stats"], "convnext_atto")
    p2, s2 = tp.convert_convnext_unet(sd, "convnext_atto")
    _trees_equal(v["params"], p2)
    _trees_equal(
        {k: v_ for k, v_ in v["batch_stats"].items() if v_},
        {k: v_ for k, v_ in s2.items() if v_},
    )


def test_convnext_key_normalization():
    """features_only flattened keys (stages_0.) and pwconv naming resolve."""
    sd = {
        "stages_0.blocks.0.conv_dw.weight": np.zeros(1),
        "stem_0.weight": np.zeros(1),
        "stages.1.blocks.0.mlp.fc1.weight": np.zeros(1),
    }
    out = tp._normalize_convnext_keys(sd)
    assert "stages.0.blocks.0.dwconv.weight" in out
    assert "stem.0.weight" in out
    assert "stages.1.blocks.0.pwconv1.weight" in out


# -------------------------------------------------------------------- regnet


class _RegCBA(nn.Module):
    """timm ConvBnAct naming: .conv / .bn"""

    def __init__(self, in_ch, out_ch, k, s, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(
            in_ch, out_ch, k, s, padding=k // 2, groups=groups, bias=False
        )
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x, act=True):
        y = self.bn(self.conv(x))
        return F.relu(y) if act else y


class _RegSE(nn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, rd, 1)
        self.fc2 = nn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(F.relu(self.fc1(s))))


class _RegBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride, gw, se):
        super().__init__()
        self.conv1 = _RegCBA(in_ch, out_ch, 1, 1)
        self.conv2 = _RegCBA(out_ch, out_ch, 3, stride, groups=out_ch // gw)
        if se:
            self.se = _RegSE(out_ch, max(1, int(round(in_ch * 0.25))))
        else:
            self.se = None
        self.conv3 = _RegCBA(out_ch, out_ch, 1, 1)
        if stride != 1 or in_ch != out_ch:
            self.downsample = _RegCBA(in_ch, out_ch, 1, stride)
        else:
            self.downsample = None

    def forward(self, x):
        y = self.conv1(x)
        y = self.conv2(y)
        if self.se is not None:
            y = self.se(y)
        y = self.conv3(y, act=False)
        if self.downsample is not None:
            x = self.downsample(x, act=False)
        return F.relu(y + x)


class TorchRegNet(nn.Module):
    """Block-for-block timm regnet (state-dict-compatible naming)."""

    def __init__(self, variant):
        super().__init__()
        from sfmnext_tpu.models.regnet import REGNET_CFG

        depths, widths, gw, se = REGNET_CFG[variant]
        self.stem = _RegCBA(3, 32, 3, 2)
        in_ch = 32
        for si, (d, w) in enumerate(zip(depths, widths), start=1):
            stage = nn.Module()
            for bi in range(d):
                setattr(
                    stage, f"b{bi + 1}",
                    _RegBlock(in_ch, w, 2 if bi == 0 else 1, gw, se),
                )
                in_ch = w
            setattr(self, f"s{si}", stage)
        self.depths = depths

    def forward(self, x):
        y = self.stem(x)
        taps = [y]
        for si in range(1, 5):
            stage = getattr(self, f"s{si}")
            for bi in range(self.depths[si - 1]):
                y = getattr(stage, f"b{bi + 1}")(y)
            taps.append(y)
        return taps


@pytest.mark.parametrize("variant", ["regnety_002", "regnetx_002"])
def test_regnet_port_matches_torch(variant):
    from sfmnext_tpu.models.regnet import RegNet

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchRegNet(variant).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_regnet(sd, variant)

    model = RegNet(variant=variant, train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=2e-4, err_msg=f"feature {i}"
        )
