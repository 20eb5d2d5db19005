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
  * ``sql_full_query`` is XLA-only by measurement: the whole SQL decoder is
    ~4 ms of a ~170 ms step at 320x1024 bs16 (PROGRESS.md step-time
    decomposition), so a fused Pallas kernel here has <3% headroom and is
    deliberately not built. Revisit if the decoder's share ever grows.
"""

from __future__ import annotations

import jax.numpy as jnp


def sql_full_query(features, queries):
    """FullQueryLayer: energy maps + softmax-over-pixel summary embeddings.

    Mixed precision: the two matmuls run in the input dtype (bf16 on the
    MXU when the model computes in bf16) with f32 accumulation; the softmax
    statistics (max / sum over up-to-81920 pixels) stay f32.

    Args:
      features: [B,H,W,E] per-pixel features (the reference's x after its
        3x3 conv, networks/depth_decoder_QTR.py:43).
      queries:  [B,Q,E] coarse queries (first Q transformer tokens).
    Returns:
      energy:  [B,H,W,Q] raw dot-product energy maps (f32).
      summary: [B,Q,E] attention-weighted feature summaries (f32), softmax
        normalized over the H*W pixel axis.
    """
    b, h, w, e = features.shape
    q = queries.shape[1]
    s = features.reshape(b, h * w, e)
    queries = queries.astype(s.dtype)

    # energy[b,n,q] = s[b,n,:] . queries[b,q,:]  (f32 accumulate)
    energy = jnp.einsum(
        "bne,bqe->bnq", s, queries, preferred_element_type=jnp.float32
    )

    # softmax over the pixel axis (dim=1 in the reference, layers.py:18)
    en = energy - energy.max(axis=1, keepdims=True)
    attn = jnp.exp(en)
    attn = attn / attn.sum(axis=1, keepdims=True)

    # summary[b,q,e] = sum_n attn[b,n,q] * s[b,n,e]
    summary = jnp.einsum(
        "bnq,bne->bqe",
        attn.astype(s.dtype),
        s,
        preferred_element_type=jnp.float32,
    )
    return energy.reshape(b, h, w, q), summary


def sql_bins_to_depth(energy, weight, bias, centers, compute_dtype=None):
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
    cd = compute_dtype or energy.dtype
    logits = (
        jnp.einsum(
            "bhwq,qd->bhwd",
            energy.astype(cd),
            weight.astype(cd),
            preferred_element_type=jnp.float32,
        )
        + bias
    )
    logits = logits - logits.max(axis=-1, keepdims=True)
    p = jnp.exp(logits)
    # depth = (p @ centers) / sum(p)  — fold the softmax denominator in.
    num = jnp.einsum(
        "bhwd,bd->bhw",
        p.astype(cd),
        centers.astype(cd),
        preferred_element_type=jnp.float32,
    )
    den = p.sum(axis=-1)
    return (num / den)[..., None]
