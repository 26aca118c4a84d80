"""DSA: deepseek-v3.2 lightning indexer + top-k sparse MLA attention.

Counterpart of the reference's DSA stack (reference
xllm/core/layers/mlu/indexer.cpp:33-340 — wq_b/wk/weights_proj
projections, k layernorm, front-slice rope, hadamard rotation, the
relu-weighted index score; deepseek_sparse_attention.cpp;
deepseek_v32.h:224-232 index_topk args). TPU-native notes:

- the indexer-K cache rides the MLA cache pytree's otherwise-unused
  v slot ([L, NB, 1, bs, index_head_dim]), so donation, PD extraction,
  host offload and sleep/wakeup treat it like any KV tensor;
- prefill applies the top-k as a MASK on the dense latent attention
  (semantically exact — scores below the per-row k-th value drop to
  -inf); decode GATHERS the top-k latent rows and attends over
  [topk] instead of [ctx], which is where the HBM savings are;
- top-k is threshold-based (score >= k-th largest) — identical to
  exact top-k up to float ties.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def hadamard_matrix(n: int) -> np.ndarray:
    """Normalized Hadamard (reference create_hadamard_matrix,
    deepseek_v4_indexer.cpp:29-50, normalize=True)."""
    assert n > 0 and (n & (n - 1)) == 0, "n must be a power of two"
    m = np.ones((1, 1), np.float32)
    while m.shape[0] < n:
        m = np.block([[m, m], [m, -m]])
    return m / np.sqrt(n)


def rotate_activation(x: jnp.ndarray, had: jnp.ndarray) -> jnp.ndarray:
    """x [..., D] @ H — the indexer's quantization-friendly rotation
    (reference rotate_activation_with_hadamard)."""
    return jnp.einsum(
        "...d,de->...e", x.astype(jnp.float32), had
    ).astype(x.dtype)


def rope_front(x: jnp.ndarray, positions: jnp.ndarray, rope_dim: int,
               inv_freq: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half rope on the FIRST rope_dim dims of x [..., T, H?, D]
    (reference q_rope_at_front / indexer_rope_interleave=false,
    deepseek_v32.h:232)."""
    half = rope_dim // 2
    pos = positions.astype(jnp.float32)
    freqs = pos[:, None] * inv_freq[None, :]  # [T, half]
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    if x.ndim == 3:  # [T, H, D]
        cos, sin = cos[:, None, :], sin[:, None, :]
    xr = x[..., :rope_dim].astype(jnp.float32)
    x1, x2 = xr[..., :half], xr[..., half:]
    rot = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return jnp.concatenate(
        [rot.astype(x.dtype), x[..., rope_dim:]], axis=-1
    )


def index_scores(
    q_idx: jnp.ndarray,   # [..., S, Hi, D]
    w_idx: jnp.ndarray,   # [..., S, Hi]
    k_idx: jnp.ndarray,   # [..., KV, D]
) -> jnp.ndarray:
    """Lightning index score I[s, j] = sum_h w[s,h] * relu(q[s,h]·k[j])
    * Hi^-0.5 * D^-0.5 (reference softmax_scale_, indexer.cpp:45)."""
    hi, d = q_idx.shape[-2], q_idx.shape[-1]
    logits = jnp.einsum(
        "...shd,...jd->...shj", q_idx, k_idx,
        preferred_element_type=jnp.float32,
    )
    scale = (d**-0.5) * (hi**-0.5)
    return jnp.einsum(
        "...shj,...sh->...sj", jax.nn.relu(logits),
        w_idx.astype(jnp.float32),
    ) * scale


def topk_mask(scores: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Boolean keep-mask over the last axis: the k highest VALID scores
    (threshold semantics; ties may admit extras)."""
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(valid, scores, neg)
    kk = min(k, scores.shape[-1])
    kth = jax.lax.top_k(masked, kk)[0][..., -1:]
    return (masked >= kth) & valid
