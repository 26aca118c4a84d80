"""Reference (pure-jnp) paged attention.

These are the semantic oracles for the Pallas kernels in
``xllm_tpu/ops/pallas`` and the portable fallback path (CPU tests, interpret
mode). They materialize the gathered KV, so their HBM traffic is ~2x the
Pallas kernels', but the math — GQA, causal masking against absolute
positions, fp32 softmax — is identical.

Counterpart of the reference's attention dispatch
(reference xllm/core/layers/common/attention.h + per-backend batch_prefill /
single_query_cached_kv_attn kernels, e.g.
xllm/core/kernels/mlu/attention.cpp:26-157).
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG_INF = -1e30


def _gather_kv(
    cache_all: jnp.ndarray,  # [L, num_blocks, Hkv, bs, D]
    layer_idx: jnp.ndarray,  # [] int32
    block_tables: jnp.ndarray,  # [B, NB]
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """-> [B, Hkv, NB*bs, D]."""
    pages = cache_all[layer_idx, block_tables]  # [B, NB, Hkv, bs, D]
    if pages.dtype in (jnp.float8_e4m3fn, jnp.int8):
        # quantized KV: upcast raw codes for math (int8 scales fold into
        # q / the attention output outside — decode_attention._mxu);
        # out_dtype follows q so CPU float32 tests avoid bf16 dots
        pages = pages.astype(out_dtype)
    b, nb, hkv, bs, d = pages.shape
    return pages.transpose(0, 2, 1, 3, 4).reshape(b, hkv, nb * bs, d)


def paged_attention_decode_ref(
    q: jnp.ndarray,  # [B, Hq, D]
    k_all: jnp.ndarray,  # [L, num_blocks, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    block_tables: jnp.ndarray,  # [B, NB] int32 (0-padded -> null block)
    seq_lens: jnp.ndarray,  # [B] int32, kv length incl. current token
    scale: float,
    window: int = 0,  # sliding-window attention (0 = full; mistral/qwen2)
) -> jnp.ndarray:  # [B, Hq, D]
    b, hq, d = q.shape
    hkv = k_all.shape[2]
    g = hq // hkv
    k = _gather_kv(k_all, layer_idx, block_tables, q.dtype)  # [B, Hkv, S, D]
    v = _gather_kv(v_all, layer_idx, block_tables, q.dtype)
    s = k.shape[2]
    qg = q.reshape(b, hkv, g, d)
    scores = jnp.einsum(
        "bkgd,bksd->bkgs", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    kv_idx = jnp.arange(s, dtype=jnp.int32)[None, None, None, :]
    mask = kv_idx < seq_lens[:, None, None, None]
    if window > 0:
        mask = mask & (kv_idx >= (seq_lens - window)[:, None, None, None])
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jnp.exp(scores - scores.max(axis=-1, keepdims=True))
    probs = probs / probs.sum(axis=-1, keepdims=True)
    out = jnp.einsum(
        "bkgs,bksd->bkgd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, hq, d).astype(q.dtype)


def paged_attention_prefill_ref(
    q: jnp.ndarray,  # [S, Hq, D] (padded query chunk of ONE sequence)
    k_all: jnp.ndarray,  # [L, num_blocks, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    block_table: jnp.ndarray,  # [NB] int32
    q_offset: jnp.ndarray,  # [] int32: absolute position of q token 0
    kv_len: jnp.ndarray,  # [] int32: total kv tokens incl. this chunk
    scale: float,
    window: int = 0,  # sliding-window attention (0 = full)
    q_positions: jnp.ndarray | None = None,  # [S] explicit row positions
    # (CP zigzag layouts permute the chunk; reference o/kv recover index
    # plumbing, npu_cp_prepare.cpp:196-290)
) -> jnp.ndarray:  # [S, Hq, D]
    s_q, hq, d = q.shape
    hkv = k_all.shape[2]
    g = hq // hkv
    k = _gather_kv(k_all, layer_idx, block_table[None, :], q.dtype)[0]  # [Hkv, S_kv, D]
    v = _gather_kv(v_all, layer_idx, block_table[None, :], q.dtype)[0]
    s_kv = k.shape[1]
    qg = q.reshape(s_q, hkv, g, d)
    scores = jnp.einsum(
        "qkgd,ksd->kgqs", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if q_positions is not None:
        q_pos = q_positions
    else:
        q_pos = q_offset + jnp.arange(s_q, dtype=jnp.int32)  # [S]
    kv_idx = jnp.arange(s_kv, dtype=jnp.int32)
    mask = (kv_idx[None, :] <= q_pos[:, None]) & (kv_idx[None, :] < kv_len)
    if window > 0:
        mask = mask & (kv_idx[None, :] > q_pos[:, None] - window)
    scores = jnp.where(mask[None, None, :, :], scores, _NEG_INF)
    probs = jnp.exp(scores - scores.max(axis=-1, keepdims=True))
    probs = probs / probs.sum(axis=-1, keepdims=True)
    out = jnp.einsum(
        "kgqs,ksd->qkgd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(s_q, hq, d).astype(q.dtype)
