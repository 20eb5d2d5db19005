"""PoseDecoder: 6-DoF pose head over encoder features.

Behavioral reference: networks/pose_decoder.py:8-48 — per-feature 1x1
squeeze to 256 + ReLU, concat, two 3x3 convs + final 1x1 to 6*(n_frames),
global mean, 0.01 scale.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sfmnext_tpu.models.common import TorchConv


class PoseDecoder(nn.Module):
    num_input_features: int = 1
    num_frames_to_predict_for: int | None = None

    @nn.compact
    def __call__(self, input_features: Sequence):
        """input_features: list (len = num_input_features) of feature
        pyramids; only the last (deepest) level of each is used.

        Returns (axisangle, translation), each [B, n_frames, 1, 3].
        """
        n_frames = (
            self.num_frames_to_predict_for
            if self.num_frames_to_predict_for is not None
            else self.num_input_features - 1
        )
        last = [f[-1] for f in input_features]
        squeeze = TorchConv(256, (1, 1), padding=0, name="squeeze")
        squeezed = [nn.relu(squeeze(f)) for f in last]  # shared weights
        y = jnp.concatenate(squeezed, axis=-1)
        y = nn.relu(TorchConv(256, (3, 3), padding=1, name="pose_0")(y))
        y = nn.relu(TorchConv(256, (3, 3), padding=1, name="pose_1")(y))
        y = TorchConv(6 * n_frames, (1, 1), padding=0, name="pose_2")(y)
        y = y.mean(axis=(1, 2))
        y = 0.01 * y.reshape(-1, n_frames, 1, 6)
        return y[..., :3], y[..., 3:]
