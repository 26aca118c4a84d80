"""Reference (pure-jnp) MLA absorbed attention over the latent paged cache.

Semantic oracle for the Pallas MLA kernels. MLA (DeepSeek v2/v3, reference
xllm/models/llm/deepseek_v2.h + MLA fused ops in kernels/ops_api.h) in the
"absorbed" decode form is MQA over a shared latent head:

    cache[t] = [c_kv (kv_lora_rank, normed) | k_pe (rope dims, roped)]
    q_eff[h] = [q_nope[h] @ W_UK[h] | q_pe[h]]           (per q head)
    scores[h, t] = q_eff[h] . cache[t]
    out_lat[h] = softmax(scores[h]) @ cache[:, :kv_lora_rank]
    out[h] = out_lat[h] @ W_UV[h]

The kernels consume q_eff and produce out_lat — the absorption matmuls
(W_UK/W_UV) live in the model, where they fold into plain layer matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG_INF = -1e30


def _gather_pages(cache, layer_idx, block_tables):
    pages = cache[layer_idx, block_tables]  # [B, NB, 1, bs, D]
    b, nb, _, bs, d = pages.shape
    return pages.reshape(b, nb * bs, d)  # [B, S, D]


def mla_decode_ref(
    q_eff: jnp.ndarray,  # [B, H, Dk]  (Dk = kv_lora + rope)
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, NBmax]
    seq_lens: jnp.ndarray,  # [B] incl. current token
    scale: float,
    dv: int,  # = kv_lora rank: value dims are cache[..., :dv]
) -> jnp.ndarray:  # [B, H, dv]
    lat = _gather_pages(cache, layer_idx, block_tables)  # [B, S, Dk]
    s = lat.shape[1]
    scores = jnp.einsum(
        "bhd,bsd->bhs", q_eff, lat, preferred_element_type=jnp.float32
    ) * scale
    kv_idx = jnp.arange(s, dtype=jnp.int32)[None, None, :]
    scores = jnp.where(kv_idx < seq_lens[:, None, None], scores, _NEG_INF)
    probs = jnp.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = jnp.einsum(
        "bhs,bsd->bhd",
        probs.astype(lat.dtype),
        lat[..., :dv],
        preferred_element_type=jnp.float32,
    )
    return out.astype(q_eff.dtype)


def mla_prefill_ref(
    q_eff: jnp.ndarray,  # [S, H, Dk]
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    block_table: jnp.ndarray,  # [NBmax]
    q_offset: jnp.ndarray,
    kv_len: jnp.ndarray,
    scale: float,
    dv: int,
) -> jnp.ndarray:  # [S, H, dv]
    lat = _gather_pages(cache, layer_idx, block_table[None])[0]  # [Skv, Dk]
    s_q = q_eff.shape[0]
    s_kv = lat.shape[0]
    scores = jnp.einsum(
        "qhd,sd->hqs", q_eff, lat, preferred_element_type=jnp.float32
    ) * scale
    q_pos = q_offset + jnp.arange(s_q, dtype=jnp.int32)
    kv_idx = jnp.arange(s_kv, dtype=jnp.int32)
    mask = (kv_idx[None, :] <= q_pos[:, None]) & (kv_idx[None, :] < kv_len)
    scores = jnp.where(mask[None], scores, _NEG_INF)
    probs = jnp.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = jnp.einsum(
        "hqs,sd->qhd",
        probs.astype(lat.dtype),
        lat[:, :dv],
        preferred_element_type=jnp.float32,
    )
    return out.astype(q_eff.dtype)
