"""Self-Query-Layer cross-attention (the SQLdepth core op).

Behavioral reference: FullQueryLayer, /root/reference/networks/layers.py:4-21:
given a per-pixel feature map S and Q coarse queries, produce
  - Q "energy maps"  E[b,q,hw] = <S[b,hw,:], query[b,q,:]>
  - Q "summary embeddings" = softmax_over_pixels(E)^T @ S

and the follow-on bin-probability head (depth_decoder_QTR.py:61-70):
  depth[hw] = sum_d softmax_d(conv1x1(E)[hw,d]) * centers[d].

TPU-first design:
  * NHWC layout: features come in as [B,H,W,E]; the pixel axis (H*W, up to
    81,920 at 320x1024) is the "sequence". Both contractions are MXU
    matmuls.
  * ``sql_full_query`` is the XLA reference implementation. XLA already
    fuses the softmax with the surrounding matmuls reasonably well; a fused
    Pallas kernel (one HBM pass over the feature map for energy + online
    softmax + summary) lives in :mod:`sfmnext_tpu.ops.pallas.sql_kernel`
    and is selected via ``use_pallas=True`` once benchmarked.
"""

from __future__ import annotations

import jax.numpy as jnp


def sql_full_query(features, queries, precision=None):
    """FullQueryLayer: energy maps + softmax-over-pixel summary embeddings.

    Args:
      features: [B,H,W,E] per-pixel features (the reference's x after its
        3x3 conv, networks/depth_decoder_QTR.py:43).
      queries:  [B,Q,E] coarse queries (first Q transformer tokens).
    Returns:
      energy:  [B,H,W,Q] raw dot-product energy maps.
      summary: [B,Q,E] attention-weighted feature summaries, where the
        softmax normalizes over the H*W pixel axis.
    """
    b, h, w, e = features.shape
    q = queries.shape[1]
    s = features.reshape(b, h * w, e)

    # energy[b,n,q] = s[b,n,:] . queries[b,q,:]
    energy = jnp.einsum("bne,bqe->bnq", s, queries, precision=precision)

    # softmax over the pixel axis (dim=1 in the reference, layers.py:18)
    en = energy - energy.max(axis=1, keepdims=True)
    attn = jnp.exp(en)
    attn = attn / attn.sum(axis=1, keepdims=True)

    # summary[b,q,e] = sum_n attn[b,n,q] * s[b,n,e]
    summary = jnp.einsum("bnq,bne->bqe", attn, s, precision=precision)
    return energy.reshape(b, h, w, q), summary


def sql_bins_to_depth(energy, weight, bias, centers, precision=None):
    """Fused energy -> per-pixel depth head.

    Equivalent to the reference's convert_to_prob (1x1 conv Q->D + softmax
    over D, depth_decoder_QTR.py:28-29, 61) followed by
    ``sum(prob * centers)`` (:70), but contracted so the [B,H,W,D]
    probability volume (84 MB at 320x1024, D=256) is never materialized
    beyond one fusion.

    Args:
      energy: [B,H,W,Q].
      weight: [Q,D] 1x1-conv kernel; bias: [D].
      centers: [B,D] depth-bin centers.
    Returns:
      depth [B,H,W,1].
    """
    logits = jnp.einsum("bhwq,qd->bhwd", energy, weight, precision=precision) + bias
    logits = logits - logits.max(axis=-1, keepdims=True)
    p = jnp.exp(logits)
    # depth = (p @ centers) / sum(p)  — fold the softmax denominator in.
    num = jnp.einsum("bhwd,bd->bhw", p, centers, precision=precision)
    den = p.sum(axis=-1)
    return (num / den)[..., None]
