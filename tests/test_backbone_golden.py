"""Golden numeric parity for the round-3 backbone mechanisms.

Hand-built torch models with the exact timm state-dict naming (timm is not
installed here — same approach as tests/test_torch_port_encoders.py),
random weights AND random BN stats, ported via utils/torch_port, asserted
feature-for-feature against the Flax trunks:

- timm deep/tiered-stem ResNets with SE / ECA and avg-down shortcuts
  (the resnet*d/t, seresnet*, ecaresnet*, gluon v1c/v1d/v1s machinery)
- the mobile-builder trunk (MobileNetV3 small: ds + ir blocks, mnv3-style
  SE with hard-sigmoid, hswish/relu per-block acts). The torch side uses
  TF-'SAME' conv padding and BN eps 1e-3 mirroring the trunk's documented
  convention (models/mobile_builder.py fidelity note).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from sfmnext_tpu.utils import torch_port as tp


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(m.num_features) * 0.5 + 0.5).astype(np.float32)))


# ------------------------------------------------- timm deep-stem resnets


class _SE(nn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, rd, 1)
        self.fc2 = nn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(F.relu(self.fc1(s))))


class _ECA(nn.Module):
    def __init__(self, ch):
        super().__init__()
        t = int(abs((math.log2(ch) + 1.0) / 2.0))
        k = max(t if t % 2 else t + 1, 3)
        self.conv = nn.Conv1d(1, 1, k, padding=k // 2, bias=False)

    def forward(self, x):
        b, c = x.shape[:2]
        s = x.mean((2, 3)).view(b, 1, c)
        s = self.conv(s).view(b, c, 1, 1)
        return x * torch.sigmoid(s)


class _TimmBasicBlock(nn.Module):
    def __init__(self, in_ch, ch, stride, se_rd, attn, avg_down):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)
        if se_rd:
            self.se = _SE(ch, max(1, ch // se_rd))
        elif attn == "eca":
            self.se = _ECA(ch)
        else:
            self.se = None
        if stride != 1 or in_ch != ch:
            if avg_down and stride != 1:
                self.downsample = nn.Sequential(
                    nn.AvgPool2d(2, 2, ceil_mode=True,
                                 count_include_pad=False),
                    nn.Conv2d(in_ch, ch, 1, 1, bias=False),
                    nn.BatchNorm2d(ch),
                )
            else:
                self.downsample = nn.Sequential(
                    nn.Conv2d(in_ch, ch, 1, stride, bias=False),
                    nn.BatchNorm2d(ch),
                )
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.se is not None:
            y = self.se(y)
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(y + sc)


class TimmDeepStemResNet(nn.Module):
    """timm resnet18d-style: deep(-tiered) stem + basic blocks."""

    def __init__(self, stem_type, se_rd, attn):
        super().__init__()
        sw = 32
        c0 = 3 * sw // 4 if stem_type == "deep_tiered" else sw
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, c0, 3, 2, 1, bias=False), nn.BatchNorm2d(c0),
            nn.ReLU(), nn.Conv2d(c0, sw, 3, 1, 1, bias=False),
            nn.BatchNorm2d(sw), nn.ReLU(),
            nn.Conv2d(sw, 2 * sw, 3, 1, 1, bias=False),
        )
        self.bn1 = nn.BatchNorm2d(2 * sw)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        in_ch = 2 * sw
        for si, ch in enumerate((64, 128, 256, 512)):
            blocks = []
            for bi in range(2):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(
                    _TimmBasicBlock(in_ch, ch, stride, se_rd, attn, True)
                )
                in_ch = ch
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        taps = [y]
        y = self.maxpool(y)
        for si in range(4):
            y = getattr(self, f"layer{si + 1}")(y)
            taps.append(y)
        return taps


@pytest.mark.parametrize(
    "stem_type,se_rd,attn",
    [("deep", 16, ""), ("deep_tiered", 0, "eca")],
)
def test_timm_resnet_port_matches_torch(stem_type, se_rd, attn):
    from sfmnext_tpu.models.resnet import ResNetEncoder

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TimmDeepStemResNet(stem_type, se_rd, attn).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_timm_resnet(
        sd, 18, stem_type=stem_type, se_reduction=se_rd, attn=attn
    )
    model = ResNetEncoder(
        num_layers=18, normalize_input=False, train=False,
        stem_type=stem_type, stem_width=32, avg_down=True,
        se_reduction=se_rd, attn=attn,
    )
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


# --------------------------------------------------- mobile trunk (mnv3)


class _ConvSame(nn.Conv2d):
    def forward(self, x):
        ih, iw = x.shape[-2:]
        k, s = self.kernel_size[0], self.stride[0]
        ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
        pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _bn3(ch):
    return nn.BatchNorm2d(ch, eps=1e-3)


class _MnvSE(nn.Module):
    """mnv3 SE: rd from expanded chs (divisor 8), relu + hard-sigmoid."""

    def __init__(self, ch, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(ch, rd, 1)
        self.conv_expand = nn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.relu(self.conv_reduce(s)))
        return x * F.hardsigmoid(s)


class _DsBlock(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride, se_rd, act):
        super().__init__()
        self.conv_dw = _ConvSame(in_ch, in_ch, k, stride, groups=in_ch,
                                 bias=False)
        self.bn1 = _bn3(in_ch)
        self.se = _MnvSE(in_ch, se_rd) if se_rd else None
        self.conv_pw = _ConvSame(in_ch, out_ch, 1, bias=False)
        self.bn2 = _bn3(out_ch)
        self.act = act

    def forward(self, x):
        y = self.act(self.bn1(self.conv_dw(x)))
        if self.se is not None:
            y = self.se(y)
        y = self.bn2(self.conv_pw(y))
        if y.shape == x.shape and self.conv_dw.stride[0] == 1:
            y = y + x
        return y


class _IrBlock(nn.Module):
    def __init__(self, in_ch, mid, out_ch, k, stride, se_rd, act):
        super().__init__()
        self.conv_pw = _ConvSame(in_ch, mid, 1, bias=False)
        self.bn1 = _bn3(mid)
        self.conv_dw = _ConvSame(mid, mid, k, stride, groups=mid, bias=False)
        self.bn2 = _bn3(mid)
        self.se = _MnvSE(mid, se_rd) if se_rd else None
        self.conv_pwl = _ConvSame(mid, out_ch, 1, bias=False)
        self.bn3 = _bn3(out_ch)
        self.act = act
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = self.act(self.bn1(self.conv_pw(x)))
        y = self.act(self.bn2(self.conv_dw(y)))
        if self.se is not None:
            y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.has_skip else y


class TorchMNV3Small050(nn.Module):
    """timm mobilenetv3_small_050 naming, SAME-pad/eps-1e-3 convention."""

    def __init__(self):
        super().__init__()
        from sfmnext_tpu.models.mobile_builder import (
            make_divisible, mobile_cfg,
        )

        cfg = mobile_cfg("mobilenetv3_small_050")
        relu, hsw = F.relu, F.hardswish
        self.conv_stem = _ConvSame(3, cfg["stem"], 3, 2, bias=False)
        self.bn1 = _bn3(cfg["stem"])
        in_ch = cfg["stem"]
        stages = []
        for stage in cfg["stages"]:
            blocks = []
            for spec in stage:
                for r in range(spec["repeat"]):
                    stride = spec["stride"] if r == 0 else 1
                    out_ch = spec["channels"]
                    act = relu if (spec["act"] or cfg["act"]) == "relu" \
                        else hsw
                    if spec["type"] == "cn":
                        m = nn.Module()
                        m.conv = _ConvSame(in_ch, out_ch, spec["kernel"],
                                           bias=False)
                        m.bn1 = _bn3(out_ch)
                        m.forward = (
                            lambda x, m=m, a=act: a(m.bn1(m.conv(x)))
                        )
                        blocks.append(m)
                    elif spec["type"] == "ds":
                        rd = (make_divisible(in_ch * spec["se"], 8)
                              if spec["se"] else 0)
                        blocks.append(_DsBlock(
                            in_ch, out_ch, spec["kernel"], stride, rd, act))
                    else:
                        mid = make_divisible(in_ch * spec["expand"])
                        rd = (make_divisible(mid * spec["se"], 8)
                              if spec["se"] else 0)
                        blocks.append(_IrBlock(
                            in_ch, mid, out_ch, spec["kernel"], stride, rd,
                            act))
                    in_ch = out_ch
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x):
        y = F.hardswish(self.bn1(self.conv_stem(x)))
        taps = {2: y}
        red = 2
        for stage in self.blocks:
            for b in stage:
                st = getattr(getattr(b, "conv_dw", None), "stride", (1,))[0]
                y = b(y)
                if st == 2:
                    red *= 2
                taps[red] = y
        return [taps[r] for r in (2, 4, 8, 16, 32)]


def test_mobile_trunk_port_matches_torch():
    from sfmnext_tpu.models.mobile_builder import MobileTrunk

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchMNV3Small050().eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_mobile_trunk(sd, "mobilenetv3_small_050")

    model = MobileTrunk(variant="mobilenetv3_small_050", train=False)
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


# ----------------------------------------------------- resnetv2 / BiT


class _StdConv(nn.Conv2d):
    """BiT weight-standardized conv with TF-SAME padding (timm
    StdConv2dSame — matches models.resnetv2.WSConv)."""

    def forward(self, x):
        w = self.weight
        mu = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        w = (w - mu) / torch.sqrt(var + 1e-10)
        ih, iw = x.shape[-2:]
        k, s = self.kernel_size[0], self.stride[0]
        ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
        pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, w, None, self.stride, 0, self.dilation)


class _PreactBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        mid = out_ch // 4
        self.norm1 = nn.GroupNorm(32, in_ch)
        self.conv1 = _StdConv(in_ch, mid, 1, bias=False)
        self.norm2 = nn.GroupNorm(32, mid)
        self.conv2 = _StdConv(mid, mid, 3, stride, 1, bias=False)
        self.norm3 = nn.GroupNorm(32, mid)
        self.conv3 = _StdConv(mid, out_ch, 1, bias=False)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Module()
            self.downsample.conv = _StdConv(in_ch, out_ch, 1, stride,
                                            bias=False)
        else:
            self.downsample = None

    def forward(self, x):
        xp = F.relu(self.norm1(x))
        sc = x if self.downsample is None else self.downsample.conv(xp)
        y = self.conv1(xp)
        y = self.conv2(F.relu(self.norm2(y)))
        y = self.conv3(F.relu(self.norm3(y)))
        return y + sc


class TorchBiT50x1(nn.Module):
    """timm resnetv2_50x1_bitm naming (stem.conv, stages.i.blocks.j, norm)."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Module()
        self.stem.conv = _StdConv(3, 64, 7, 2, 3, bias=False)

        def _pool_same(x):  # timm MaxPool2dSame
            ih, iw = x.shape[-2:]
            ph = max((math.ceil(ih / 2) - 1) * 2 + 3 - ih, 0)
            pw = max((math.ceil(iw / 2) - 1) * 2 + 3 - iw, 0)
            x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2],
                      value=float("-inf"))
            return F.max_pool2d(x, 3, 2)

        self.maxpool = _pool_same
        stages = []
        in_ch = 64
        for si, (ch, d) in enumerate(
            zip((256, 512, 1024, 2048), (3, 4, 6, 3))
        ):
            blocks = []
            for bi in range(d):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(_PreactBlock(in_ch, ch, stride))
                in_ch = ch
            stage = nn.Module()
            stage.blocks = nn.Sequential(*blocks)
            stages.append(stage)
        self.stages = nn.Sequential(*stages)
        self.norm = nn.GroupNorm(32, 2048)

    def forward(self, x):
        y = self.stem.conv(x)
        taps = [y]
        y = self.maxpool(y)
        for stage in self.stages:
            y = stage.blocks(y)
            taps.append(y)
        taps[-1] = F.relu(self.norm(taps[-1]))
        return taps


def test_resnetv2_bit_port_matches_torch():
    from sfmnext_tpu.models.resnetv2 import ResNetV2

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchBiT50x1().eval()

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_resnetv2(sd, "resnetv2_50x1_bitm")

    model = ResNetV2(variant="resnetv2_50x1_bitm", train=False)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    got = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        # preact residual streams reach |x|~100 with no normalization
        # damping; f32 reduction-order drift accumulates to ~1e-2 absolute
        # (~5e-5 relative) over 16 blocks
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=2e-2, err_msg=f"feature {i}"
        )


# ------------------------------------------------------------- nfnet


class _TStdConv(nn.Conv2d):
    """DeepMind scaled WS conv mirroring models.nfnet.ScaledStdConv:
    w_hat = gain * (w - mean) / sqrt(var * fan_in + 1e-10), bias after."""

    def __init__(self, in_ch, out_ch, k, s=1, groups=1):
        super().__init__(in_ch, out_ch, k, s, padding=k // 2, groups=groups,
                         bias=True)
        self.gain = nn.Parameter(torch.ones(out_ch, 1, 1, 1))

    def forward(self, x):
        w = self.weight
        fan_in = w[0].numel()
        mu = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        w = self.gain * (w - mu) / torch.sqrt(var * fan_in + 1e-10)
        y = F.conv2d(x, w, None, self.stride, self.padding, self.dilation,
                     self.groups)
        return y + self.bias.view(1, -1, 1, 1)


_G_GELU = 1.7015043497085571


def _tgelu(x):
    return F.gelu(x) * _G_GELU


class _NFBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride, beta, gw=128):
        super().__init__()
        mid = int(out_ch * 0.5)
        groups = max(1, mid // gw)
        mid = groups * gw
        self.beta = beta
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Module()
            self.downsample.conv = _TStdConv(in_ch, out_ch, 1)
        else:
            self.downsample = None
        self.conv1 = _TStdConv(in_ch, mid, 1)
        self.conv2 = _TStdConv(mid, mid, 3, stride, groups=groups)
        self.conv2b = _TStdConv(mid, mid, 3, 1, groups=groups)
        self.conv3 = _TStdConv(mid, out_ch, 1)
        self.attn_last = nn.Module()
        rd = max(1, int(out_ch * 0.5))
        self.attn_last.fc1 = nn.Conv2d(out_ch, rd, 1)
        self.attn_last.fc2 = nn.Conv2d(rd, out_ch, 1)
        self.skipinit_gain = nn.Parameter(torch.zeros(()))
        self.stride = stride

    def forward(self, x):
        y = _tgelu(x) * (1.0 / self.beta)
        sc = x
        if self.downsample is not None:
            s = y
            if self.stride != 1:
                s = F.avg_pool2d(s, 2, 2)
            sc = self.downsample.conv(s)
        y = _tgelu(self.conv1(y))
        y = _tgelu(self.conv2(y))
        y = _tgelu(self.conv2b(y))
        y = self.conv3(y)
        a = y.mean((2, 3), keepdim=True)
        a = self.attn_last.fc2(F.relu(self.attn_last.fc1(a)))
        y = y * (2.0 * torch.sigmoid(a))
        return sc + 0.2 * self.skipinit_gain * y


class TorchNFNetF0(nn.Module):
    """timm dm_nfnet_f0 naming (stem.conv1-4, stages.i.j, attn_last)."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Module()
        chs = (16, 32, 64, 128)
        strides = (2, 1, 1, 2)
        in_c = 3
        for i, (c, s) in enumerate(zip(chs, strides)):
            setattr(self.stem, f"conv{i + 1}", _TStdConv(in_c, c, 3, s))
            in_c = c
        import math as _m

        stages = []
        expected_var = 1.0
        in_ch = 128
        for si, (ch, d) in enumerate(
            zip((256, 512, 1536, 1536), (1, 2, 6, 3))
        ):
            blocks = []
            for bi in range(d):
                beta = _m.sqrt(expected_var)
                blocks.append(_NFBlock(
                    in_ch, ch, 2 if (bi == 0 and si > 0) else 1, beta))
                expected_var = (1.0 if bi == 0 else expected_var) + 0.2 ** 2
                in_ch = ch
            stages.append(nn.Sequential(*blocks))
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        y = x
        for i in range(4):
            if i == 3:
                stem_tap = y
            y = getattr(self.stem, f"conv{i + 1}")(y)
            if i < 3:
                y = _tgelu(y)
        taps = [stem_tap]
        for stage in self.stages:
            y = stage(y)
            taps.append(y)
        taps[-1] = _tgelu(taps[-1])
        return taps


def test_nfnet_port_matches_torch():
    from sfmnext_tpu.models.nfnet import NFNet

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchNFNetF0().eval()
    # non-zero skipinit gains so the residual branch is exercised
    with torch.no_grad():
        for m in ref.modules():
            if hasattr(m, "skipinit_gain"):
                m.skipinit_gain.fill_(0.5)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tp.convert_nfnet(sd, "dm_nfnet_f0")

    model = NFNet(variant="dm_nfnet_f0", train=False)
    got = model.apply({"params": params},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=2e-3, err_msg=f"feature {i}"
        )


# ------------------------------------------- mobile trunk (efficientnetv2)


class _CnBlock(nn.Module):
    """timm ConvBnAct block (v2 stage 0) with residual."""

    def __init__(self, in_ch, out_ch, k, stride, act):
        super().__init__()
        self.conv = _ConvSame(in_ch, out_ch, k, stride, bias=False)
        self.bn1 = _bn3(out_ch)
        self.act = act
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = self.act(self.bn1(self.conv(x)))
        return y + x if self.has_skip else y


class _ErBlock(nn.Module):
    """timm EdgeResidual (fused-MBConv)."""

    def __init__(self, in_ch, mid, out_ch, k, stride, se_rd, act):
        super().__init__()
        self.conv_exp = _ConvSame(in_ch, mid, k, stride, bias=False)
        self.bn1 = _bn3(mid)
        self.se = _EffSE(mid, se_rd, act) if se_rd else None
        self.conv_pwl = _ConvSame(mid, out_ch, 1, bias=False)
        self.bn2 = _bn3(out_ch)
        self.act = act
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = self.act(self.bn1(self.conv_exp(x)))
        if self.se is not None:
            y = self.se(y)
        y = self.bn2(self.conv_pwl(y))
        return y + x if self.has_skip else y


class _EffSE(nn.Module):
    """efficientnet SE: sigmoid gate, block act inside."""

    def __init__(self, ch, rd, act):
        super().__init__()
        self.conv_reduce = nn.Conv2d(ch, rd, 1)
        self.conv_expand = nn.Conv2d(rd, ch, 1)
        self.act = act

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class _IrBlockEff(nn.Module):
    """ir block with efficientnet-style SE (sigmoid, silu inside)."""

    def __init__(self, in_ch, mid, out_ch, k, stride, se_rd, act):
        super().__init__()
        self.conv_pw = _ConvSame(in_ch, mid, 1, bias=False)
        self.bn1 = _bn3(mid)
        self.conv_dw = _ConvSame(mid, mid, k, stride, groups=mid, bias=False)
        self.bn2 = _bn3(mid)
        self.se = _EffSE(mid, se_rd, act) if se_rd else None
        self.conv_pwl = _ConvSame(mid, out_ch, 1, bias=False)
        self.bn3 = _bn3(out_ch)
        self.act = act
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = self.act(self.bn1(self.conv_pw(x)))
        y = self.act(self.bn2(self.conv_dw(y)))
        if self.se is not None:
            y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.has_skip else y


class TorchEffV2B0(nn.Module):
    """timm tf_efficientnetv2_b0 naming."""

    def __init__(self):
        super().__init__()
        from sfmnext_tpu.models.mobile_builder import (
            make_divisible, mobile_cfg,
        )

        cfg = mobile_cfg("tf_efficientnetv2_b0")
        act = F.silu
        self.conv_stem = _ConvSame(3, cfg["stem"], 3, 2, bias=False)
        self.bn1 = _bn3(cfg["stem"])
        in_ch = cfg["stem"]
        stages = []
        for stage in cfg["stages"]:
            blocks = []
            for spec in stage:
                for r in range(spec["repeat"]):
                    stride = spec["stride"] if r == 0 else 1
                    out_ch = spec["channels"]
                    if spec["type"] == "cn":
                        blocks.append(_CnBlock(
                            in_ch, out_ch, spec["kernel"], stride, act))
                    elif spec["type"] == "er":
                        mid = make_divisible(in_ch * spec["expand"])
                        blocks.append(_ErBlock(
                            in_ch, mid, out_ch, spec["kernel"], stride,
                            0, act))
                    else:
                        mid = make_divisible(in_ch * spec["expand"])
                        rd = max(1, int(in_ch * spec["se"]))
                        blocks.append(_IrBlockEff(
                            in_ch, mid, out_ch, spec["kernel"], stride,
                            rd, act))
                    in_ch = out_ch
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_stem(x)))
        taps, red = {2: y}, 2
        for stage in self.blocks:
            for b in stage:
                st = 1
                for attr in ("conv_dw", "conv_exp", "conv"):
                    m = getattr(b, attr, None)
                    if m is not None:
                        st = m.stride[0]
                        break
                y = b(y)
                if st == 2:
                    red *= 2
                taps[red] = y
        return [taps[r] for r in (2, 4, 8, 16, 32)]


def test_efficientnetv2_port_matches_torch():
    from sfmnext_tpu.models.mobile_builder import MobileTrunk

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchEffV2B0().eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_mobile_trunk(sd, "tf_efficientnetv2_b0")

    model = MobileTrunk(variant="tf_efficientnetv2_b0", train=False)
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


# --------------------------------------------------------------- dpn


class _BnActConv(nn.Module):
    def __init__(self, in_ch, out_ch, k, s=1, groups=1):
        super().__init__()
        self.bn = nn.BatchNorm2d(in_ch)
        self.conv = nn.Conv2d(in_ch, out_ch, k, s, padding=k // 2,
                              groups=groups, bias=False)

    def forward(self, x):
        return self.conv(F.relu(self.bn(x)))


class _TorchDualPathBlock(nn.Module):
    def __init__(self, in_ch, r, bw, inc, groups, kind, b):
        super().__init__()
        self.bw, self.b, self.kind = bw, b, kind
        if kind == "proj":
            self.c1x1_w_s1 = _BnActConv(in_ch, bw + 2 * inc, 1, 1)
        elif kind == "down":
            self.c1x1_w_s2 = _BnActConv(in_ch, bw + 2 * inc, 1, 2)
        stride = 2 if kind == "down" else 1
        self.c1x1_a = _BnActConv(in_ch, r, 1)
        self.c3x3_b = _BnActConv(r, r, 3, stride, groups)
        if b:
            self.c1x1_c = nn.Module()
            self.c1x1_c.bn = nn.BatchNorm2d(r)
            self.c1x1_c1 = nn.Module()
            self.c1x1_c1.conv = nn.Conv2d(r, bw, 1, bias=False)
            self.c1x1_c2 = nn.Module()
            self.c1x1_c2.conv = nn.Conv2d(r, inc, 1, bias=False)
        else:
            self.c1x1_c = _BnActConv(r, bw + inc, 1)

    def forward(self, res, dense):
        x_in = torch.cat([res, dense], dim=1)
        if self.kind == "proj":
            w = self.c1x1_w_s1(x_in)
        elif self.kind == "down":
            w = self.c1x1_w_s2(x_in)
        else:
            w = None
        if w is not None:
            res_s, dense_s = w[:, : self.bw], w[:, self.bw:]
        else:
            res_s, dense_s = res, dense
        y = self.c1x1_a(x_in)
        y = self.c3x3_b(y)
        if self.b:
            y = F.relu(self.c1x1_c.bn(y))
            c1 = self.c1x1_c1.conv(y)
            c2 = self.c1x1_c2.conv(y)
        else:
            y = self.c1x1_c(y)
            c1, c2 = y[:, : self.bw], y[:, self.bw:]
        return res_s + c1, torch.cat([dense_s, c2], dim=1)


class TorchDPN68(nn.Module):
    """timm dpn68/dpn68b naming (features.convX_Y)."""

    def __init__(self, b=False):
        super().__init__()
        from sfmnext_tpu.models.dpn import DPN_SPECS

        variant = "dpn68b" if b else "dpn68"
        small, init_f, k_r, groups, k_sec, inc_sec, _ = DPN_SPECS[variant]
        feats = nn.Module()
        feats.conv1_1 = nn.Module()
        feats.conv1_1.conv = nn.Conv2d(3, init_f, 3, 2, 1, bias=False)
        feats.conv1_1.bn = nn.BatchNorm2d(init_f)
        in_ch = init_f
        bwf = 1 if small else 4
        self.k_sec = k_sec
        for si in range(4):
            bw = 64 * (2 ** si) * bwf
            r = k_r * (2 ** si)
            inc = inc_sec[si]
            for bi in range(k_sec[si]):
                kind = ("proj" if si == 0 else "down") if bi == 0 \
                    else "normal"
                blk = _TorchDualPathBlock(in_ch, r, bw, inc, groups, kind, b)
                setattr(feats, f"conv{si + 2}_{bi + 1}", blk)
                in_ch = bw + inc * (3 if bi == 0 else 1) if bi == 0 else \
                    in_ch + inc
        feats.conv5_bn_ac = nn.Module()
        feats.conv5_bn_ac.bn = nn.BatchNorm2d(in_ch)
        self.features = feats

    def forward(self, x):
        f = self.features
        y = F.relu(f.conv1_1.bn(f.conv1_1.conv(x)))
        taps = [y]
        y = F.max_pool2d(y, 3, 2, 1)
        res, dense = y, y[:, :0]
        for si in range(4):
            for bi in range(self.k_sec[si]):
                res, dense = getattr(f, f"conv{si + 2}_{bi + 1}")(res, dense)
            taps.append(torch.cat([res, dense], dim=1))
        taps[-1] = F.relu(f.conv5_bn_ac.bn(taps[-1]))
        return taps


@pytest.mark.parametrize("bflav", [False, True])
def test_dpn_port_matches_torch(bflav):
    from sfmnext_tpu.models.dpn import DPN

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchDPN68(bflav).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    variant = "dpn68b" if bflav else "dpn68"
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_dpn(sd, variant)

    model = DPN(variant=variant, train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=5e-4, err_msg=f"feature {i}"
        )


# ------------------------------------------------------------- resnest


class _TorchSplAt(nn.Module):
    """timm SplAtConv2d (radix-major channel blocks, r-softmax)."""

    def __init__(self, in_ch, ch, radix, cardinality):
        super().__init__()
        self.radix, self.card, self.ch = radix, cardinality, ch
        self.conv = nn.Conv2d(in_ch, ch * radix, 3, 1, 1,
                              groups=cardinality * radix, bias=False)
        self.bn0 = nn.BatchNorm2d(ch * radix)
        inter = max(ch * radix // 4, 32)
        self.fc1 = nn.Conv2d(ch, inter, 1, groups=cardinality)
        self.bn1 = nn.BatchNorm2d(inter)
        self.fc2 = nn.Conv2d(inter, ch * radix, 1, groups=cardinality)

    def forward(self, x):
        b = x.shape[0]
        y = F.relu(self.bn0(self.conv(x)))
        if self.radix > 1:
            sp = y.reshape(b, self.radix, self.ch, *y.shape[2:])
            gap = sp.sum(1).mean((2, 3), keepdim=True)
        else:
            gap = y.mean((2, 3), keepdim=True)
        a = F.relu(self.bn1(self.fc1(gap)))
        a = self.fc2(a)
        if self.radix > 1:
            att = F.softmax(a.reshape(b, self.radix, self.ch), dim=1)
            att = att.reshape(b, self.radix, self.ch, 1, 1)
            return (sp * att).sum(1)
        return y * torch.sigmoid(a)


class _TorchResNeStBlock(nn.Module):
    def __init__(self, in_ch, planes, stride, radix, card, base_w):
        super().__init__()
        out_ch = planes * 4
        gw = int(planes * (base_w / 64.0)) * card
        self.conv1 = nn.Conv2d(in_ch, gw, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(gw)
        self.conv2 = _TorchSplAt(gw, gw, radix, card)
        self.stride = stride
        self.conv3 = nn.Conv2d(gw, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            mods = []
            if stride != 1:
                mods.append(nn.AvgPool2d(2, 2, ceil_mode=True,
                                         count_include_pad=False))
            else:
                mods.append(nn.Identity())
            mods += [nn.Conv2d(in_ch, out_ch, 1, bias=False),
                     nn.BatchNorm2d(out_ch)]
            self.downsample = nn.Sequential(*mods)
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.conv2(y)
        if self.stride > 1:
            y = F.avg_pool2d(y, 3, 2, 1, count_include_pad=False)
        y = self.bn3(self.conv3(y))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(y + sc)


class TorchResNeSt(nn.Module):
    """timm resnest naming (deep stem conv1.{0,3,6}, layerX.Y)."""

    def __init__(self, variant):
        super().__init__()
        from sfmnext_tpu.models.resnest import RESNEST_SPECS

        depths, sw, radix, card, base_w = RESNEST_SPECS[variant]
        self.depths = depths
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, sw, 3, 2, 1, bias=False), nn.BatchNorm2d(sw),
            nn.ReLU(), nn.Conv2d(sw, sw, 3, 1, 1, bias=False),
            nn.BatchNorm2d(sw), nn.ReLU(),
            nn.Conv2d(sw, sw * 2, 3, 1, 1, bias=False),
        )
        self.bn1 = nn.BatchNorm2d(sw * 2)
        in_ch = sw * 2
        for si, planes in enumerate((64, 128, 256, 512)):
            blocks = []
            for bi in range(depths[si]):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(_TorchResNeStBlock(
                    in_ch, planes, stride, radix, card, base_w))
                in_ch = planes * 4
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        taps = [y]
        y = F.max_pool2d(y, 3, 2, 1)
        for si in range(4):
            y = getattr(self, f"layer{si + 1}")(y)
            taps.append(y)
        return taps


@pytest.mark.parametrize(
    "variant", ["resnest14d", "resnest50d_1s4x24d", "resnest50d_4s2x40d"]
)
def test_resnest_port_matches_torch(variant):
    from sfmnext_tpu.models.resnest import ResNeSt

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchResNeSt(variant).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_resnest(sd, variant)

    model = ResNeSt(variant=variant, train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=5e-4, err_msg=f"feature {i}"
        )


# --------------------------------------------------------------- hrnet


class _HRBottleneck(nn.Module):
    def __init__(self, in_ch, planes):
        super().__init__()
        out = planes * 4
        self.conv1 = nn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        if in_ch != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out, 1, bias=False), nn.BatchNorm2d(out))
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(y + sc)


class _HRBasic(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + x)


class _HRModule(nn.Module):
    def __init__(self, widths, n_blk):
        super().__init__()
        self.widths = widths
        self.branches = nn.ModuleList([
            nn.Sequential(*[_HRBasic(w) for _ in range(n_blk)])
            for w in widths
        ])
        fuse = []
        for i, wi in enumerate(widths):
            row = []
            for j, wj in enumerate(widths):
                if j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(wj, wi, 1, bias=False),
                        nn.BatchNorm2d(wi),
                        nn.Upsample(scale_factor=2 ** (j - i),
                                    mode="nearest")))
                elif j < i:
                    steps = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = wi if last else wj
                        mods = [nn.Conv2d(wj, ch, 3, 2, 1, bias=False),
                                nn.BatchNorm2d(ch)]
                        if not last:
                            mods.append(nn.ReLU(False))
                        steps.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*steps))
                else:
                    row.append(None)
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)

    def forward(self, xs):
        xs = [br(x) for br, x in zip(self.branches, xs)]
        outs = []
        for i in range(len(self.widths)):
            acc = None
            for j, xj in enumerate(xs):
                y = xj if self.fuse_layers[i][j] is None \
                    else self.fuse_layers[i][j](xj)
                acc = y if acc is None else acc + y
            outs.append(F.relu(acc))
        return outs


class TorchHRNetSmall(nn.Module):
    """Official hrnet_w18_small naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(_HRBottleneck(64, 32))
        w = 16
        self.transition1 = nn.ModuleList([
            nn.Sequential(nn.Conv2d(128, w, 3, 1, 1, bias=False),
                          nn.BatchNorm2d(w), nn.ReLU(False)),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(128, 2 * w, 3, 2, 1, bias=False),
                nn.BatchNorm2d(2 * w), nn.ReLU(False))),
        ])
        self.stage2 = nn.Sequential(_HRModule((w, 2 * w), 2))
        self.transition2 = nn.ModuleList([None, None, nn.Sequential(
            nn.Sequential(nn.Conv2d(2 * w, 4 * w, 3, 2, 1, bias=False),
                          nn.BatchNorm2d(4 * w), nn.ReLU(False)))])
        self.stage3 = nn.Sequential(_HRModule((w, 2 * w, 4 * w), 2))
        self.transition3 = nn.ModuleList([None, None, None, nn.Sequential(
            nn.Sequential(nn.Conv2d(4 * w, 8 * w, 3, 2, 1, bias=False),
                          nn.BatchNorm2d(8 * w), nn.ReLU(False)))])
        self.stage4 = nn.Sequential(_HRModule((w, 2 * w, 4 * w, 8 * w), 2))
        self.incre_modules = nn.ModuleList([
            nn.Sequential(_HRBottleneck(w * (2 ** b), 32 * (2 ** b)))
            for b in range(4)
        ])

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        stem_tap = y
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.layer1(y)
        xs = [self.transition1[0](y), self.transition1[1](y)]
        xs = self.stage2[0](xs)
        xs = xs + [self.transition2[2](xs[-1])]
        xs = self.stage3[0](xs)
        xs = xs + [self.transition3[3](xs[-1])]
        xs = self.stage4[0](xs)
        taps = [stem_tap] + [m(x) for m, x in zip(self.incre_modules, xs)]
        return taps


def test_hrnet_port_matches_torch():
    from sfmnext_tpu.models.hrnet import HRNet

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchHRNetSmall().eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_hrnet(sd, "hrnet_w18_small")

    model = HRNet(variant="hrnet_w18_small", train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=5e-4, err_msg=f"feature {i}"
        )


# --------------------------------------------------------------- vovnet


class _VovCNA(nn.Module):
    def __init__(self, in_ch, out_ch, k, s=1):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _VovSep(nn.Module):
    def __init__(self, in_ch, out_ch, k, s=1):
        super().__init__()
        self.conv_dw = nn.Conv2d(in_ch, in_ch, k, s, k // 2, groups=in_ch,
                                 bias=False)
        self.conv_pw = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv_pw(self.conv_dw(x))))


class _OsaBlock(nn.Module):
    def __init__(self, in_ch, conv_ch, out_ch, n_layers, residual, dw):
        super().__init__()
        self.residual = residual and in_ch == out_ch
        next_in = in_ch
        if dw and in_ch != conv_ch:
            self.conv_reduction = _VovCNA(in_ch, conv_ch, 1)
            next_in = conv_ch
        else:
            self.conv_reduction = None
        mids = []
        for _ in range(n_layers):
            mids.append(_VovSep(next_in, conv_ch, 3) if dw
                        else _VovCNA(next_in, conv_ch, 3))
            next_in = conv_ch
        self.conv_mid = nn.ModuleList(mids)
        self.conv_concat = _VovCNA(in_ch + n_layers * conv_ch, out_ch, 1)
        self.attn = nn.Module()
        self.attn.fc = nn.Conv2d(out_ch, out_ch, 1)

    def forward(self, x):
        outs = [x]
        y = x if self.conv_reduction is None else self.conv_reduction(x)
        for m in self.conv_mid:
            y = m(y)
            outs.append(y)
        y = self.conv_concat(torch.cat(outs, dim=1))
        s = y.mean((2, 3), keepdim=True)
        y = y * F.hardsigmoid(self.attn.fc(s))
        if self.residual:
            y = y + x
        return y


class TorchVoVNet(nn.Module):
    """timm ese_vovnet naming (stem.0-2, stages.i.blocks.j)."""

    def __init__(self, variant):
        super().__init__()
        from sfmnext_tpu.models.vovnet import VOVNET_SPECS

        (stem_chs, conv_chs, out_chs, n_layers, n_blocks, residual,
         dw) = VOVNET_SPECS[variant]
        self.dw = dw
        stem = []
        in_c = 3
        for i, (c, s) in enumerate(zip(stem_chs, (2, 1, 2))):
            stem.append(_VovSep(in_c, c, 3, s) if (dw and i == 2)
                        else _VovCNA(in_c, c, 3, s))
            in_c = c
        self.stem = nn.Sequential(*stem)
        stages = []
        for si in range(4):
            blocks = []
            for bi in range(n_blocks[si]):
                blocks.append(_OsaBlock(
                    in_c, conv_chs[si], out_chs[si], n_layers, residual, dw))
                in_c = out_chs[si]
            st = nn.Module()
            st.blocks = nn.Sequential(*blocks)
            stages.append(st)
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        y = self.stem[0](x)
        y = self.stem[1](y)
        stem_tap = y
        y = self.stem[2](y)
        taps = [stem_tap]
        for si, stage in enumerate(self.stages):
            if si > 0:
                y = F.max_pool2d(y, 3, 2, 1)
            y = stage.blocks(y)
            taps.append(y)
        return taps


@pytest.mark.parametrize("variant", ["ese_vovnet19b_dw", "ese_vovnet39b"])
def test_vovnet_port_matches_torch(variant):
    from sfmnext_tpu.models.vovnet import VoVNet

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchVoVNet(variant).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_vovnet(sd, variant)

    model = VoVNet(variant=variant, train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=5e-4, err_msg=f"feature {i}"
        )


# --------------------------------------------------------------- repvgg


class _TorchRepVggBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride, groups=1):
        super().__init__()
        self.conv_kxk = nn.Module()
        self.conv_kxk.conv = nn.Conv2d(in_ch, out_ch, 3, stride, 1,
                                       groups=groups, bias=False)
        self.conv_kxk.bn = nn.BatchNorm2d(out_ch)
        self.conv_1x1 = nn.Module()
        self.conv_1x1.conv = nn.Conv2d(in_ch, out_ch, 1, stride,
                                       groups=groups, bias=False)
        self.conv_1x1.bn = nn.BatchNorm2d(out_ch)
        if stride == 1 and in_ch == out_ch:
            self.identity = nn.BatchNorm2d(out_ch)
        else:
            self.identity = None

    def forward(self, x):
        y = self.conv_kxk.bn(self.conv_kxk.conv(x)) + \
            self.conv_1x1.bn(self.conv_1x1.conv(x))
        if self.identity is not None:
            y = y + self.identity(x)
        return F.relu(y)


class TorchRepVGG(nn.Module):
    def __init__(self, variant):
        super().__init__()
        from sfmnext_tpu.models.repvgg import REPVGG_SPECS, _GROUP_LAYERS

        wa, wb, depths, g = REPVGG_SPECS[variant]
        self.depths = depths
        self.stem = _TorchRepVggBlock(3, min(64, int(64 * wa)), 2)
        in_ch = min(64, int(64 * wa))
        stage_ch = [int(64 * wa), int(128 * wa), int(256 * wa),
                    int(512 * wb)]
        idx = 1
        stages = []
        for ch, d in zip(stage_ch, depths):
            blocks = []
            for bi in range(d):
                groups = g if (g > 1 and idx in _GROUP_LAYERS) else 1
                blocks.append(_TorchRepVggBlock(
                    in_ch, ch, 2 if bi == 0 else 1, groups))
                in_ch = ch
                idx += 1
            stages.append(nn.Sequential(*blocks))
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        y = self.stem(x)
        taps = [y]
        for stage in self.stages:
            y = stage(y)
            taps.append(y)
        return taps


@pytest.mark.parametrize("variant", ["repvgg_b0", "repvgg_b1g4"])
def test_repvgg_port_matches_torch(variant):
    from sfmnext_tpu.models.repvgg import RepVGG

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchRepVGG(variant).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_repvgg(sd, variant)

    model = RepVGG(variant=variant, train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect)
    for i, (g_, e) in enumerate(zip(got, expect)):
        g_ = np.transpose(np.asarray(g_), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g_, e, rtol=2e-3, atol=5e-4, err_msg=f"feature {i}"
        )


# -------------------------------------------------------------- ghostnet


class _GhostModule(nn.Module):
    """timm ghostnet.py GhostModule naming (primary_conv/cheap_operation)."""

    def __init__(self, inp, oup, relu=True):
        super().__init__()
        self.out_chs = oup
        init_ch = math.ceil(oup / 2)
        self.primary_conv = nn.Sequential(
            nn.Conv2d(inp, init_ch, 1, 1, 0, bias=False),
            nn.BatchNorm2d(init_ch),
            nn.ReLU(inplace=True) if relu else nn.Sequential(),
        )
        self.cheap_operation = nn.Sequential(
            nn.Conv2d(init_ch, init_ch, 3, 1, 1, groups=init_ch, bias=False),
            nn.BatchNorm2d(init_ch),
            nn.ReLU(inplace=True) if relu else nn.Sequential(),
        )

    def forward(self, x):
        x1 = self.primary_conv(x)
        x2 = self.cheap_operation(x1)
        return torch.cat([x1, x2], dim=1)[:, : self.out_chs]


class _GhostSE(nn.Module):
    """efficientnet-style SqueezeExcite w/ hard-sigmoid gate, divisor 4."""

    def __init__(self, ch, se_ratio=0.25):
        super().__init__()
        from sfmnext_tpu.models.mobile_builder import make_divisible

        rd = make_divisible(ch * se_ratio, 4)
        self.conv_reduce = nn.Conv2d(ch, rd, 1, bias=True)
        self.conv_expand = nn.Conv2d(rd, ch, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.relu(self.conv_reduce(s)))
        return x * (F.relu6(s + 3.0) / 6.0)


class _GhostBottleneck(nn.Module):
    def __init__(self, in_chs, mid, out, k, s, se):
        super().__init__()
        self.stride = s
        self.ghost1 = _GhostModule(in_chs, mid, relu=True)
        if s > 1:
            self.conv_dw = nn.Conv2d(
                mid, mid, k, s, (k - 1) // 2, groups=mid, bias=False
            )
            self.bn_dw = nn.BatchNorm2d(mid)
        self.se = _GhostSE(mid) if se > 0 else None
        self.ghost2 = _GhostModule(mid, out, relu=False)
        if in_chs == out and s == 1:
            self.shortcut = nn.Sequential()
        else:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_chs, in_chs, k, s, (k - 1) // 2,
                          groups=in_chs, bias=False),
                nn.BatchNorm2d(in_chs),
                nn.Conv2d(in_chs, out, 1, bias=False),
                nn.BatchNorm2d(out),
            )

    def forward(self, x):
        res = x
        x = self.ghost1(x)
        if self.stride > 1:
            x = self.bn_dw(self.conv_dw(x))
        if self.se is not None:
            x = self.se(x)
        x = self.ghost2(x)
        return x + self.shortcut(res)


class _GhostConvBnAct(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv = nn.Conv2d(i, o, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(o)

    def forward(self, x):
        return F.relu(self.bn1(self.conv(x)))


class TorchGhostNet(nn.Module):
    """timm ghostnet_100 layout: conv_stem/bn1 + blocks.{0..8} stages +
    the blocks.9 ConvBnAct head; stage grouping per timm's cfgs table."""

    def __init__(self, width=1.0):
        super().__init__()
        from sfmnext_tpu.models.ghostnet import GHOSTNET_CFG
        from sfmnext_tpu.models.mobile_builder import make_divisible

        sizes = (1, 1, 1, 1, 1, 1, 5, 1, 4)
        stem = make_divisible(16 * width, 4)
        self.conv_stem = nn.Conv2d(3, stem, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(stem)
        stages, prev, i = [], stem, 0
        for n in sizes:
            layers = []
            for _ in range(n):
                k, e, c, se, s = GHOSTNET_CFG[i]
                mid = make_divisible(e * width, 4)
                out = make_divisible(c * width, 4)
                layers.append(_GhostBottleneck(prev, mid, out, k, s, se))
                prev = out
                i += 1
            stages.append(nn.Sequential(*layers))
        stages.append(nn.Sequential(
            _GhostConvBnAct(prev, make_divisible(960 * width, 4))
        ))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv_stem(x)))
        red, feats = 2, {2: x}
        for stage in self.blocks:
            for blk in stage:
                x = blk(x)
                if getattr(blk, "stride", 1) == 2:
                    red *= 2
                feats[red] = x
        return [feats[r] for r in (2, 4, 8, 16, 32)]


def test_ghostnet_port_matches_torch():
    from sfmnext_tpu.models.ghostnet import GhostNet

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchGhostNet().eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_ghostnet(sd)

    model = GhostNet(variant="ghostnet_100", train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=5e-4, err_msg=f"feature {i}"
        )


# ---------------------------------------------------------------- rexnet


class _RexConvNormAct(nn.Module):
    def __init__(self, i, o, k=1, s=1, g=1, act=None):
        super().__init__()
        self.conv = nn.Conv2d(i, o, k, s, k // 2, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(o)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return self.act(x) if self.act is not None else x


class _SEWithNorm(nn.Module):
    """timm rexnet.py SEWithNorm: fc1 -> bn -> relu -> fc2 -> sigmoid."""

    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, rd, 1, bias=True)
        self.bn = nn.BatchNorm2d(rd)
        self.fc2 = nn.Conv2d(rd, ch, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(F.relu(self.bn(self.fc1(s))))
        return x * torch.sigmoid(s)


class _RexLinearBottleneck(nn.Module):
    def __init__(self, in_ch, out_ch, stride, exp, use_se):
        super().__init__()
        self.in_channels = in_ch
        self.stride = stride
        self.use_shortcut = stride == 1 and in_ch <= out_ch
        if exp != 1:
            dw = int(round(in_ch * exp))
            self.conv_exp = _RexConvNormAct(in_ch, dw, act=nn.SiLU())
        else:
            dw = in_ch
            self.conv_exp = None
        self.conv_dw = _RexConvNormAct(dw, dw, 3, stride, g=dw)
        self.se = _SEWithNorm(dw, max(1, int(dw / 12))) if use_se else None
        self.conv_pwl = _RexConvNormAct(dw, out_ch)

    def forward(self, x):
        sc = x
        if self.conv_exp is not None:
            x = self.conv_exp(x)
        x = self.conv_dw(x)
        if self.se is not None:
            x = self.se(x)
        x = F.relu6(x)
        x = self.conv_pwl(x)
        if self.use_shortcut:
            x = torch.cat(
                [x[:, : self.in_channels] + sc, x[:, self.in_channels:]], 1
            )
        return x


class TorchReXNet(nn.Module):
    """timm rexnet_* layout: stem ConvNormAct + features.{i} bottlenecks."""

    def __init__(self, width=1.0):
        super().__init__()
        from sfmnext_tpu.models.rexnet import rexnet_cfg

        stem, blocks = rexnet_cfg(width)
        self.stem = _RexConvNormAct(3, stem, 3, 2, act=nn.SiLU())
        feats, prev = [], stem
        for ch, s, e, se in blocks:
            feats.append(_RexLinearBottleneck(prev, ch, s, e, se))
            prev = ch
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        x = self.stem(x)
        red, feats = 2, {2: x}
        for blk in self.features:
            x = blk(x)
            if blk.stride == 2:
                red *= 2
            feats[red] = x
        return [feats[r] for r in (2, 4, 8, 16, 32)]


@pytest.mark.parametrize("variant", ["rexnet_100", "rexnet_130"])
def test_rexnet_port_matches_torch(variant):
    from sfmnext_tpu.models.rexnet import ReXNet

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchReXNet(int(variant.split("_")[1]) / 100.0).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_rexnet(sd, variant)

    model = ReXNet(variant=variant, train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect)
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=5e-4, err_msg=f"feature {i}"
        )


# ---------------------------------------------------------------- xception


class _XcnSeparable(nn.Module):
    """timm xception_aligned SeparableConv2d naming (conv_dw/bn_dw/
    conv_pw/bn_pw, eps 1e-3); act inside iff start_with_relu is off."""

    def __init__(self, i, o, s=1, act_inside=False):
        super().__init__()
        self.conv_dw = nn.Conv2d(i, i, 3, s, 1, groups=i, bias=False)
        self.bn_dw = nn.BatchNorm2d(i, eps=1e-3)
        self.conv_pw = nn.Conv2d(i, o, 1, bias=False)
        self.bn_pw = nn.BatchNorm2d(o, eps=1e-3)
        self.act_inside = act_inside

    def forward(self, x):
        x = self.bn_dw(self.conv_dw(x))
        if self.act_inside:
            x = F.relu(x)
        x = self.bn_pw(self.conv_pw(x))
        if self.act_inside:
            x = F.relu(x)
        return x


class _XcnModule(nn.Module):
    def __init__(self, in_chs, out_chs, stride=1, no_skip=False,
                 start_with_relu=True):
        super().__init__()
        from collections import OrderedDict

        out_chs = (out_chs,) * 3 if isinstance(out_chs, int) else out_chs
        self.no_skip = no_skip
        self.stride = stride
        if not no_skip and (out_chs[-1] != in_chs or stride != 1):
            self.shortcut = nn.Sequential(OrderedDict([
                ("conv", nn.Conv2d(in_chs, out_chs[-1], 1, stride,
                                   bias=False)),
                ("bn", nn.BatchNorm2d(out_chs[-1], eps=1e-3)),
            ]))
        else:
            self.shortcut = None
        stack = OrderedDict()
        ic = in_chs
        for i in range(3):
            if start_with_relu:
                stack[f"act{i + 1}"] = nn.ReLU()
            stack[f"conv{i + 1}"] = _XcnSeparable(
                ic, out_chs[i], stride if i == 2 else 1,
                act_inside=not start_with_relu,
            )
            ic = out_chs[i]
        self.stack = nn.Sequential(stack)

    def forward(self, x):
        skip, tap = x, None
        for name, m in self.stack.named_children():
            x = m(x)
            if name == "act3":
                tap = x  # timm feature hook 'stack.act3'
        if self.shortcut is not None:
            skip = self.shortcut(skip)
        return (x if self.no_skip else x + skip), tap


class _XcnStemConv(nn.Module):
    def __init__(self, i, o, s):
        super().__init__()
        self.conv = nn.Conv2d(i, o, 3, s, 1, bias=False)
        self.bn = nn.BatchNorm2d(o, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchXceptionAligned(nn.Module):
    """timm xception_aligned layout: stem.{0,1} ConvNormAct + blocks.{i}
    XceptionModules; feature taps at stack.act3 of stride-2 modules and
    the raw last-module output (no final act for non-preact)."""

    def __init__(self, variant):
        super().__init__()
        from sfmnext_tpu.models.xception import XCEPTION_SPECS

        entry, middle = XCEPTION_SPECS[variant]
        self.stem = nn.Sequential(_XcnStemConv(3, 32, 2),
                                  _XcnStemConv(32, 64, 1))
        blocks, ic = [], 64
        for ch, s in entry:
            blocks.append(_XcnModule(ic, ch, s))
            ic = ch
        for _ in range(middle):
            blocks.append(_XcnModule(ic, 728, 1))
        blocks.append(_XcnModule(ic, (728, 1024, 1024), 2))
        blocks.append(_XcnModule(
            1024, (1536, 1536, 2048), 1, no_skip=True,
            start_with_relu=False,
        ))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        x = self.stem(x)
        taps = []
        for blk in self.blocks:
            x, tap = blk(x)
            if blk.stride == 2:
                taps.append(tap)
        taps.append(x)
        return taps


@pytest.mark.parametrize("variant", ["xception41", "xception71"])
def test_xception_port_matches_torch(variant):
    from sfmnext_tpu.models.xception import Xception

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = TorchXceptionAligned(variant).eval()
    with torch.no_grad():
        _randomize_bn(ref, rng)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = [t.numpy() for t in ref(torch.from_numpy(x))]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = tp.convert_xception(sd, variant)

    model = Xception(variant=variant, train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    assert len(got) == len(expect) == 5
    for i, (g, e) in enumerate(zip(got, expect)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        np.testing.assert_allclose(
            g, e, rtol=2e-3, atol=5e-4, err_msg=f"feature {i}"
        )
