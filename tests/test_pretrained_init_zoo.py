"""``weights_init=pretrained`` wiring for the timm-Unet backbone zoo.

Round-3 verdict item 2: golden-tested converters existed for ten backbone
families but ``_imagenet_encoder_backbone`` couldn't reach them, and the
resnext/wide_resnet digit-parse turned ``resnext50_32x4d`` into
num_layers=50324. These tests reuse the timm-layout torch fixture modules
from test_backbone_golden / test_torch_port_encoders (real variant specs)
to verify that a raw timm state_dict placed at ``$SFMNEXT_WEIGHTS/<name>.pth``
lands, value-exact, in the Unet encoder backbone — the reference behavior
is ``timm.create_model(..., pretrained=True)`` (networks/Unet.py:114-117).
"""

import importlib

import numpy as np
import pytest
import torch

import jax

from sfmnext_tpu.config import Options
from sfmnext_tpu.training.builder import build_models, init_params
from sfmnext_tpu.utils import torch_port as tp
from sfmnext_tpu.utils.imagenet_init import apply_weights_init

golden = importlib.import_module("test_backbone_golden")
encoders = importlib.import_module("test_torch_port_encoders")


def _save_sd(path, sd):
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path
    )


def _tiny_opt(backbone):
    return Options(
        backbone=backbone, height=64, width=96, patch_size=4, query_nums=16,
        dim_out=16, model_dim=16, num_features=64,
        dec_channels=(64, 48, 32, 24), weights_init="pretrained",
    ).validate()


def _leaves_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# (backbone, fixture factory, converter) — fixtures are the golden tests'
# real-variant timm-layout torch modules.
CASES = [
    ("mobilenetv3_small_050", lambda: golden.TorchMNV3Small050(),
     lambda sd: tp.convert_mobile_trunk(sd, "mobilenetv3_small_050")),
    ("tf_efficientnetv2_b0", lambda: golden.TorchEffV2B0(),
     lambda sd: tp.convert_mobile_trunk(sd, "tf_efficientnetv2_b0")),
    ("resnetv2_50x1_bitm", lambda: golden.TorchBiT50x1(),
     lambda sd: tp.convert_resnetv2(sd, "resnetv2_50x1_bitm")),
    ("dm_nfnet_f0", lambda: golden.TorchNFNetF0(),
     lambda sd: (tp.convert_nfnet(sd, "dm_nfnet_f0"), {})),
    ("dpn68", lambda: golden.TorchDPN68(False),
     lambda sd: tp.convert_dpn(sd, "dpn68")),
    ("resnest14d", lambda: golden.TorchResNeSt("resnest14d"),
     lambda sd: tp.convert_resnest(sd, "resnest14d")),
    ("hrnet_w18_small", lambda: golden.TorchHRNetSmall(),
     lambda sd: tp.convert_hrnet(sd, "hrnet_w18_small")),
    ("ese_vovnet19b_dw", lambda: golden.TorchVoVNet("ese_vovnet19b_dw"),
     lambda sd: tp.convert_vovnet(sd, "ese_vovnet19b_dw")),
    ("repvgg_b0", lambda: golden.TorchRepVGG("repvgg_b0"),
     lambda sd: tp.convert_repvgg(sd, "repvgg_b0")),
    ("regnety_002", lambda: encoders.TorchRegNet("regnety_002"),
     lambda sd: tp.convert_regnet(sd, "regnety_002")),
    ("ghostnet_100", lambda: golden.TorchGhostNet(),
     lambda sd: tp.convert_ghostnet(sd, "ghostnet_100")),
    ("rexnet_100", lambda: golden.TorchReXNet(1.0),
     lambda sd: tp.convert_rexnet(sd, "rexnet_100")),
    ("xception41", lambda: golden.TorchXceptionAligned("xception41"),
     lambda sd: tp.convert_xception(sd, "xception41")),
]


@pytest.mark.parametrize(
    "backbone,fixture,convert", CASES, ids=[c[0] for c in CASES]
)
def test_zoo_pretrained_init_lands(backbone, fixture, convert,
                                   tmp_path, monkeypatch):
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    ref = fixture().eval()
    with torch.no_grad():
        golden._randomize_bn(ref, rng)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    _save_sd(tmp_path / f"{backbone}.pth", sd)
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))

    opt = _tiny_opt(backbone)
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    out = apply_weights_init(opt, models, variables)

    want_p, want_s = convert(sd)
    _leaves_equal(out["params"]["encoder"]["encoder"], want_p)
    if want_s:
        _leaves_equal(out["batch_stats"]["encoder"]["encoder"], want_s)
    # decoder stays at the build rng (only the backbone is pretrained)
    _leaves_equal(
        out["params"]["encoder"]["decoder"],
        variables["params"]["encoder"]["decoder"],
    )


@pytest.mark.parametrize("backbone", ["resnext50_32x4d", "wide_resnet50_2"])
def test_resnext_wide_resnet_pretrained_init(backbone, tmp_path, monkeypatch):
    """The digit-parse bug turned these into num_layers 50324 / 502.

    Round-trip: donor flax init -> torchvision-layout state_dict (identical
    naming for resnext/wide_resnet) -> weights file -> apply_weights_init.
    """
    from sfmnext_tpu.utils import torch_export as te

    opt = _tiny_opt(backbone)
    models = build_models(opt, train=True)
    variables = init_params(opt, models, jax.random.PRNGKey(0))
    donor = init_params(opt, models, jax.random.PRNGKey(7))

    sd = te.export_resnet_encoder(
        donor["params"]["encoder"]["encoder"],
        donor["batch_stats"]["encoder"]["encoder"],
    )
    _save_sd(tmp_path / f"{backbone}.pth", sd)
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))

    out = apply_weights_init(opt, models, variables)
    _leaves_equal(
        out["params"]["encoder"]["encoder"],
        donor["params"]["encoder"]["encoder"],
    )
    _leaves_equal(
        out["batch_stats"]["encoder"]["encoder"],
        donor["batch_stats"]["encoder"]["encoder"],
    )


def test_unsupported_backbone_raises_cleanly(tmp_path, monkeypatch):
    """No converter -> NotImplementedError (never a bare KeyError)."""
    monkeypatch.setenv("SFMNEXT_WEIGHTS", str(tmp_path))
    for backbone in ("vgg16", "resnetrs50"):
        opt = _tiny_opt(backbone)
        models = build_models(opt, train=True)
        variables = init_params(opt, models, jax.random.PRNGKey(0))
        # vgg16 has no converter at all; resnetrs50's replaced stem pool is
        # outside convert_timm_resnet's coverage. Dispatch must raise before
        # demanding a weights file.
        with pytest.raises(NotImplementedError):
            apply_weights_init(opt, models, variables)
