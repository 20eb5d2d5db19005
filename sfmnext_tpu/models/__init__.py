"""Flax model zoo mirroring the reference networks/ package.

Public surface parity with /root/reference/networks/__init__.py:1-9:
  ResnetEncoderDecoder, LiteResnetEncoderDecoder, Depth_Decoder_QueryTr
  (SQLDecoder here), Lite variant, PoseCNN, PoseDecoder, RectifyNet.
"""

from sfmnext_tpu.models.resnet import ResNetEncoder  # noqa: F401
from sfmnext_tpu.models.decoder_bn import (  # noqa: F401
    DecoderBN,
    LiteResnetEncoderDecoder,
    ResnetEncoderDecoder,
)
from sfmnext_tpu.models.sql_decoder import SQLDecoder  # noqa: F401
from sfmnext_tpu.models.pose_cnn import PoseCNN  # noqa: F401
from sfmnext_tpu.models.pose_decoder import PoseDecoder  # noqa: F401
from sfmnext_tpu.models.rectify import RectifyNet  # noqa: F401
from sfmnext_tpu.models.predictive_mask import PredictiveMask  # noqa: F401
