"""Golden parity: torch reference architecture vs Flax model + weight port.

Builds the reference's SQL decoder / PoseCNN shapes directly from torch
primitives (same hyperparams as networks/depth_decoder_QTR.py:6-74 and
networks/pose_cnn.py:8-45), ports the torch weights through
utils/torch_port, and checks the Flax forward matches torch to float32
tolerance. This pins (a) our architecture parity and (b) the .pth import
path used for pretrained checkpoints.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from sfmnext_tpu.models.pose_cnn import PoseCNN
from sfmnext_tpu.models.sql_decoder import SQLDecoder
from sfmnext_tpu.utils import torch_port as tp

E, P, Q, D = 16, 4, 8, 12  # embedding, patch, queries, bins
H, W = 16, 24


class TorchSQLRef(nn.Module):
    """The reference decoder's computation, built from torch primitives."""

    def __init__(self):
        super().__init__()
        self.embedding_convPxP = nn.Conv2d(E, E, kernel_size=P, stride=P)
        self.positional_encodings = nn.Parameter(torch.rand(500, E))
        layer = nn.TransformerEncoderLayer(E, 4, dim_feedforward=32)
        self.transformer_encoder = nn.TransformerEncoder(layer, num_layers=4)
        self.conv3x3 = nn.Conv2d(E, E, 3, padding=1)
        self.bins_regressor = nn.Sequential(
            nn.Linear(E * Q, 16 * Q), nn.LeakyReLU(),
            nn.Linear(16 * Q, 16 * 16), nn.LeakyReLU(),
            nn.Linear(16 * 16, D),
        )
        self.convert_to_prob = nn.Sequential(
            nn.Conv2d(Q, D, 1), nn.Softmax(dim=1)
        )
        self.min_val, self.max_val = 0.5, 10.0

    def forward(self, x0):
        emb = self.embedding_convPxP(x0).flatten(2)
        emb = emb + self.positional_encodings[: emb.shape[2], :].T.unsqueeze(0)
        emb = emb.permute(2, 0, 1)
        total = self.transformer_encoder(emb)
        queries = total[:Q].permute(1, 0, 2)  # [B,Q,E]

        feats = self.conv3x3(x0)
        b, c, h, w = feats.shape
        s = feats.view(b, c, h * w).permute(0, 2, 1)  # [B,HW,E]
        energy = torch.matmul(s, queries.permute(0, 2, 1))  # [B,HW,Q]
        attn = torch.softmax(energy, dim=1)
        summary = torch.matmul(attn.permute(0, 2, 1), s)  # [B,Q,E]

        y = self.bins_regressor(summary.reshape(b, Q * E))
        y = torch.relu(y) + 0.1
        y = y / y.sum(dim=1, keepdim=True)
        widths = (self.max_val - self.min_val) * y
        widths = nn.functional.pad(widths, (1, 0), value=self.min_val)
        edges = torch.cumsum(widths, dim=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])

        emap = energy.permute(0, 2, 1).view(b, Q, h, w)
        prob = self.convert_to_prob(emap)
        return torch.sum(prob * centers.view(b, D, 1, 1), dim=1, keepdim=True)


def test_sql_decoder_matches_torch_reference():
    torch.manual_seed(0)
    ref = TorchSQLRef().eval()

    x = np.random.RandomState(0).randn(2, E, H, W).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.from_numpy(x)).numpy()  # [B,1,H,W]

    # port weights
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tp.convert_sql_decoder(sd, num_heads=4)

    model = SQLDecoder(
        embedding_dim=E, patch_size=P, query_nums=Q, dim_out=D,
        min_val=0.5, max_val=10.0, ffn_dim=32, deterministic=True,
    )
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = model.apply({"params": params}, x_nhwc)
    got = np.transpose(np.asarray(out["disp0"]), (0, 3, 1, 2))

    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


class TorchPoseRef(nn.Module):
    def __init__(self, n=2):
        super().__init__()
        chans = [(3 * n, 16, 7, 2, 3), (16, 32, 5, 2, 2), (32, 64, 3, 2, 1),
                 (64, 128, 3, 2, 1), (128, 256, 3, 2, 1), (256, 256, 3, 2, 1),
                 (256, 256, 3, 2, 1)]
        self.net = nn.ModuleList(
            [nn.Conv2d(i, o, k, s, p) for (i, o, k, s, p) in chans]
        )
        self.pose_conv = nn.Conv2d(256, 6 * (n - 1), 1)
        self.n = n

    def forward(self, x):
        for conv in self.net:
            x = torch.relu(conv(x))
        x = self.pose_conv(x).mean(3).mean(2)
        return 0.01 * x.view(-1, self.n - 1, 1, 6)


def test_pose_cnn_matches_torch_reference():
    torch.manual_seed(1)
    ref = TorchPoseRef().eval()
    x = np.random.RandomState(1).rand(2, 6, 64, 96).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tp.convert_pose_cnn(sd)

    model = PoseCNN(num_input_frames=2)
    aa, t = model.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    got = np.concatenate([np.asarray(aa), np.asarray(t)], axis=-1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)
