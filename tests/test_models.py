"""Model shape/behavior tests (small inputs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfmnext_tpu.models import (
    LiteResnetEncoderDecoder,
    PoseCNN,
    PoseDecoder,
    RectifyNet,
    ResnetEncoderDecoder,
    ResNetEncoder,
    SQLDecoder,
)


def test_resnet18_feature_pyramid_shapes():
    m = ResNetEncoder(num_layers=18)
    x = jnp.zeros((1, 64, 96, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(variables, x)
    chans = [f.shape[-1] for f in feats]
    assert chans == [64, 64, 128, 256, 512]
    # strides 2,4,8,16,32
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]


def test_resnet50_channels():
    m = ResNetEncoder(num_layers=50)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(variables, x)
    assert [f.shape[-1] for f in feats] == [64, 256, 512, 1024, 2048]


def test_resnet_encoder_decoder_half_resolution():
    m = ResnetEncoderDecoder(num_layers=50, num_features=64, model_dim=16)
    x = jnp.zeros((1, 64, 96, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 32, 48, 16)  # 1/2 input resolution (reference parity)


def test_lite_encoder_decoder():
    m = LiteResnetEncoderDecoder(model_dim=8)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 32, 32, 8)


def test_sql_decoder_depth_range_and_shapes():
    m = SQLDecoder(
        embedding_dim=16, patch_size=4, query_nums=8, dim_out=12,
        min_val=0.5, max_val=10.0, ffn_dim=32,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 24, 16), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    depth = out["disp0"]
    assert depth.shape == (2, 16, 24, 1)
    # depth is a convex combination of bin centers in (min_val, max_val)
    assert float(depth.min()) >= 0.5 and float(depth.max()) <= 10.0
    centers = out["bin_centers"]
    # centers strictly increasing (cumsum of positive widths)
    assert np.all(np.diff(np.asarray(centers), axis=1) > 0)


def test_sql_decoder_token_budget_guard():
    m = SQLDecoder(embedding_dim=8, patch_size=2, query_nums=4, max_tokens=10)
    x = jnp.zeros((1, 16, 16, 8))  # 64 tokens > 10
    with pytest.raises(ValueError, match="tokens exceed"):
        m.init(jax.random.PRNGKey(0), x)


def test_pose_cnn_output_scale():
    m = PoseCNN(num_input_frames=2)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 96, 6), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    aa, t = m.apply(variables, x)
    assert aa.shape == (2, 1, 1, 3) and t.shape == (2, 1, 1, 3)
    # the 0.01 scaling keeps initial outputs tiny (reference pose_cnn.py:40)
    assert float(jnp.abs(aa).max()) < 0.1


def test_pose_decoder_shapes():
    m = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    feats = [jnp.zeros((2, 4, 6, 128))]
    variables = m.init(jax.random.PRNGKey(0), [feats])
    aa, t = m.apply(variables, [feats])
    assert aa.shape == (2, 2, 1, 3) and t.shape == (2, 2, 1, 3)


def test_rectify_net_pitch_zeroed():
    m = RectifyNet()
    img = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), img, img)
    rot = m.apply(variables, img, img)
    assert rot.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(rot[:, 2]), 0.0)


def test_effb5_encoder_decoder_contract():
    from sfmnext_tpu.models.efficientnet import BaseEncoderDecoder, EfficientNetB5

    m = EfficientNetB5()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    taps = m.apply(v, jnp.zeros((1, 64, 96, 3)))
    # decoder taps: strides 2/4/8/16/32, channels per reference wiring
    assert [t.shape[-1] for t in taps] == [24, 40, 64, 176, 2048]
    assert [t.shape[1] for t in taps] == [32, 16, 8, 4, 2]

    ed = BaseEncoderDecoder(num_features=256, model_dim=16)
    v2 = ed.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    y = ed.apply(v2, jnp.zeros((1, 64, 96, 3)))
    assert y.shape == (1, 32, 48, 16)


@pytest.mark.parametrize(
    "backbone",
    [
        "convnext_atto", "resnet18", "tf_efficientnet_b0",
        "resnext50_32x4d", "wide_resnet50_2", "vgg11_bn",
        "densenet121", "mobilenetv2_050",
        "regnetx_002", "regnety_002", "res2net50_48w_2s", "res2next50",
        "legacy_seresnet18", "legacy_seresnext26_32x4d", "skresnet18",
        "ssl_resnet18", "gluon_resnet18_v1b",
        "resnet10t", "resnet18d", "ecaresnet26t", "gluon_resnet18_v1c",
        "gluon_resnet18_v1d", "gluon_resnet18_v1s", "seresnext26t_32x4d",
        "resnetrs50", "ig_resnext101_32x8d", "repvgg_b0",
        "resnetv2_50x1_bitm", "resnetv2_50d_evos", "resnest14d",
        "resnest50d_4s2x40d", "rexnet_100", "tf_efficientnetv2_b0",
        "efficientnet_lite0", "efficientnet_es", "mobilenetv3_large_100",
        "mobilenetv3_small_050", "tf_mobilenetv3_small_minimal_100",
        "lcnet_050", "mnasnet_small", "semnasnet_075", "spnasnet_100",
        "tinynet_e", "xception41", "dpn68", "ese_vovnet19b_dw",
        "darknet53", "cspresnet50", "mobilevit_xxs", "mobilevitv2_050",
        "hrnet_w18_small", "eca_nfnet_l0", "nf_resnet50", "ghostnet_100",
        "gernet_s", "gluon_resnext50_32x4d", "mixnet_s",
        "resnetblur50", "resnet33ts", "edgenext_xx_small",
        "regnetz_b16", "mobilenetv2_110d", "cs3darknet_m", "fbnetc_100",
        "lambda_resnet26t", "tf_efficientnet_cc_b0_4e", "resnet50_gn",
        "ecaresnetlight",
    ],
)
def test_unet_backbones_half_res_contract(backbone):
    from sfmnext_tpu.models.unet import Unet

    m = Unet(backbone=backbone, num_classes=16, decoder_channels=(64, 48, 32, 16))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    y = m.apply(v, jnp.zeros((1, 64, 96, 3)))
    assert y.shape == (1, 32, 48, 16)


@pytest.mark.parametrize(
    "backbone",
    # near-miss names that must NOT silently build a lookalike topology
    # (resnet51q/61q left this list when they became real byob builds)
    ["resnet55q", "resnetfoo", "resnext50_32y4d"],
)
def test_unet_lookalike_names_rejected(backbone):
    from sfmnext_tpu.models.unet import Unet

    with pytest.raises(ValueError, match="unknown resnet variant"):
        Unet(backbone=backbone).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3))
        )
