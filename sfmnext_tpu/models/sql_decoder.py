"""SQL (Self-Query-Layer) depth decoder — the SQLdepth paper's core.

Behavioral reference: networks/depth_decoder_QTR.py:6-74 and the lite
variant (lite_depth_decoder_QTR.py, FFN 512 instead of 1024):

  1. patchify the 1/2-res feature map with Conv(k=p, s=p)      (:11-12)
  2. add a learned 500-row positional table (first N rows)     (:13, :39)
  3. 4-layer post-LN transformer encoder, 4 heads              (:14-16)
  4. first ``query_nums`` tokens become coarse queries         (:44)
  5. FullQueryLayer cross-attention vs the conv3x3 feature map (:47)
  6. bins_regressor MLP -> normalized adaptive bin widths      (:22-26, :51-59)
  7. cumsum -> bin edges -> centers in [min_val, max_val]      (:62-68)
  8. depth = sum(softmax(1x1conv(energy)) * centers)           (:28-29, :70)

The output dict key is ``("disp", 0)`` for parity with the reference but —
exactly as in the reference — it holds *depth*, not disparity.

TPU-first: steps 5 and 8 are the hot ops; they run through
:mod:`sfmnext_tpu.ops.sql_attention` (XLA now, fused Pallas kernel behind
the same interface). The transformer runs over <=500 tokens — trivially
small; batched matmuls on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sfmnext_tpu.models.common import (
    TorchConv,
    TorchLinear,
    leaky_relu,
    torch_default_bias_init,
    torch_default_kernel_init,
)
from sfmnext_tpu.ops import sql_attention
from sfmnext_tpu.ops.pallas import sql_kernel


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch nn.TransformerEncoderLayer).

    x = LN1(x + Drop(SelfAttn(x))); x = LN2(x + Drop(FFN(x)))
    FFN = Linear2(Drop(ReLU(Linear1(x)))). Dropout p=0.1 (torch default —
    the reference leaves it on, depth_decoder_QTR.py:14).
    """

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout_rate: float = 0.1
    deterministic: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            deterministic=self.deterministic,
            # torch TransformerEncoderLayer forwards its dropout p to the
            # attention weights too (nn.MultiheadAttention(dropout=p))
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="self_attn",
        )(x, x)
        attn = nn.Dropout(self.dropout_rate, deterministic=self.deterministic)(attn)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + attn)

        y = TorchLinear(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=self.deterministic)(y)
        y = TorchLinear(self.embed_dim, dtype=self.dtype, name="linear2")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=self.deterministic)(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


class _PatchifyMatmul(nn.Module):
    """Holds the Conv_0-compatible params and applies the patch matmul."""

    features: int
    patch_size: int
    in_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, patches):  # patches: [B, N, p*p*C], (kh, kw, C) order
        p, c = self.patch_size, self.in_channels
        fan_in = p * p * c
        kernel = self.param(
            "kernel", torch_default_kernel_init, (p, p, c, self.features)
        )
        bias = self.param(
            "bias", torch_default_bias_init(fan_in), (self.features,)
        )
        w = kernel.reshape(fan_in, self.features)
        if self.dtype is not None:
            patches = patches.astype(self.dtype)
            w = w.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return patches @ w + bias


class PatchifyConv(nn.Module):
    """Conv(k=p, s=p, pad=VALID) as space-to-depth + one MXU matmul.

    Mathematically identical to ``TorchConv(features, (p, p), strides=(p, p),
    padding=0)`` and shares its parameter tree (``Conv_0/{kernel, bias}``,
    same torch-default init), so checkpoints and the .pth converters are
    unaffected. The rewrite exists because XLA's transposed-conv emitter for
    the *backward* of a patchify conv is catastrophically slow on TPU v5e
    (measured 33.9 ms — 25% of the bs8 320x1024 train step — in one
    ``EmitOutputBatchInLanesInputBatchInSublanes`` fusion). As a
    ``[B*N, p*p*C] @ [p*p*C, E]`` matmul, forward, input-gradient and
    weight-gradient are all plain MXU GEMMs; the space-to-depth reshape and
    its transpose are layout changes XLA handles well.

    Emits [B, N, E] tokens directly (the conv + reshape the reference does at
    depth_decoder_QTR.py:11-12, 37-38). Trailing rows/cols not covered by a
    full patch are cropped, matching VALID conv semantics.
    """

    features: int
    patch_size: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch_size
        oh, ow = h // p, w // p
        x = x[:, : oh * p, : ow * p, :]
        # [B,oh,p,ow,p,C] -> [B,oh,ow,p,p,C] -> [B,N,(kh,kw,C)-ordered patch]
        patches = x.reshape(b, oh, p, ow, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, oh * ow, p * p * c)
        return _PatchifyMatmul(
            self.features, p, c, dtype=self.dtype, name="Conv_0"
        )(patches)


class SQLDecoder(nn.Module):
    """Depth_Decoder_QueryTr equivalent. Input [B,H,W,C] features -> depth.

    Returns {"disp0": depth [B,H,W,1]} (plus "bin_centers" for analysis).
    """

    embedding_dim: int = 32
    patch_size: int = 20
    num_heads: int = 4
    query_nums: int = 128
    dim_out: int = 128  # number of depth bins
    norm: str = "linear"
    min_val: float = 0.001
    max_val: float = 80.0
    ffn_dim: int = 1024  # 512 in the lite variant
    num_tf_layers: int = 4
    max_tokens: int = 500
    deterministic: bool = True
    dtype: object = None
    return_energy: bool = False  # expose energy maps (attn_visualize tool)
    use_pallas: bool = False  # fused flash-SQL kernels (TPU hot path)

    @nn.compact
    def __call__(self, x0):
        b, h, w, c = x0.shape
        p = self.patch_size
        n_tokens = (h // p) * (w // p)
        if n_tokens > self.max_tokens:
            raise ValueError(
                f"{n_tokens} patch tokens exceed the positional table "
                f"({self.max_tokens}); shrink input or grow max_tokens "
                "(the reference fails silently here, depth_decoder_QTR.py:39)"
            )
        if n_tokens < self.query_nums:
            raise ValueError(
                f"query_nums={self.query_nums} > {n_tokens} tokens; "
                "queries are the first query_nums transformer outputs"
            )

        if self.dtype is not None:
            x0 = x0.astype(self.dtype)

        # 1. patchify: Conv(k=p, s=p) as space-to-depth + matmul -> [B, N, E]
        emb = PatchifyConv(
            self.embedding_dim, p, dtype=self.dtype, name="embedding_convPxP",
        )(x0)

        # 2. learned positional encodings, torch.rand init (U[0,1), :13)
        pos = self.param(
            "positional_encodings",
            lambda key, shape: jax.random.uniform(key, shape),
            (self.max_tokens, self.embedding_dim),
        )
        emb = emb + pos[None, :n_tokens, :].astype(emb.dtype)

        # 3. transformer encoder over tokens
        y = emb
        for i in range(self.num_tf_layers):
            y = TransformerEncoderLayer(
                self.embedding_dim,
                self.num_heads,
                self.ffn_dim,
                deterministic=self.deterministic,
                dtype=self.dtype,
                name=f"tf_layer{i}",
            )(y)

        # 4. coarse queries = first Q tokens
        queries = y[:, : self.query_nums, :]  # [B,Q,E]

        # 5. per-pixel features + FullQueryLayer cross-attention.
        # On the TPU hot path the softmax-over-pixels summary runs as a
        # flash-attention Pallas kernel and the energy volume is never
        # materialized (recomputed inside the bins head, step 8); the XLA
        # path remains the reference implementation and serves
        # return_energy / CPU / odd shapes.
        feats = TorchConv(self.embedding_dim, (3, 3), padding=1,
                          dtype=self.dtype, name="conv3x3")(x0)
        fused = (
            self.use_pallas
            and not self.return_energy
            and self.dtype == jnp.bfloat16
            and sql_kernel.supports(h * w)
        )
        if fused:
            energy = None
            summary = sql_kernel.sql_summary(feats, queries)
        else:
            energy, summary = sql_attention.sql_full_query(feats, queries)

        # 6. bins regressor MLP on flattened summaries (f32: tiny, and the
        # normalized widths feed a cumsum that sets metric bin edges)
        flat = summary.reshape(b, self.query_nums * self.embedding_dim)
        z = TorchLinear(16 * self.query_nums, name="bins_reg1")(flat)
        z = leaky_relu(z)
        z = TorchLinear(16 * 16, name="bins_reg2")(z)
        z = leaky_relu(z)
        z = TorchLinear(self.dim_out, name="bins_reg3")(z)

        if self.norm == "linear":
            z = nn.relu(z) + 0.1
        elif self.norm == "softmax":
            z = jax.nn.softmax(z, axis=1)
        else:
            z = jax.nn.sigmoid(z)
        z = z / z.sum(axis=1, keepdims=True)

        # 7. bin widths -> edges -> centers
        widths = (self.max_val - self.min_val) * z  # [B,D]
        widths = jnp.pad(widths, ((0, 0), (1, 0)), constant_values=self.min_val)
        edges = jnp.cumsum(widths, axis=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])  # [B,D]

        # 8. fused energy -> prob -> depth (1x1 conv Q->D + softmax + dot)
        conv_w = self.param(
            "prob_kernel",
            torch_default_kernel_init,
            (self.query_nums, self.dim_out),
        )
        conv_b = self.param(
            "prob_bias", torch_default_bias_init(self.query_nums), (self.dim_out,)
        )
        if fused:
            depth = sql_kernel.sql_depth(
                feats, queries, conv_w, conv_b, centers
            )
        else:
            depth = sql_attention.sql_bins_to_depth(
                energy, conv_w, conv_b, centers, compute_dtype=self.dtype
            )

        out = {"disp0": depth.astype(jnp.float32), "bin_centers": centers}
        if self.return_energy:
            out["energy"] = energy
        return out
