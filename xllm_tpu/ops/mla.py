"""MLA latent-attention dispatch: Pallas on TPU, jnp oracle elsewhere.

Counterpart of the reference's MLA fused-op dispatch
(reference xllm/core/kernels/ops_api.h MLA section). Write semantics match
ops/attention.py: the cache update is part of the op, in place on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xllm_tpu.ops import mla_ref
from xllm_tpu.ops.attention import _use_pallas


def _write_latent_scatter(cache, layer_idx, lat_new, slot_mapping):
    """Portable path: scatter latent rows into the (single-head) cache."""
    bs = cache.shape[3]
    block_idx = slot_mapping // bs
    offset = slot_mapping % bs
    return cache.at[layer_idx, block_idx, 0, offset, :].set(
        lat_new.astype(cache.dtype), mode="drop"
    )


def mla_decode_attention_write(
    q_eff: jnp.ndarray,  # [B, H, Dk]
    lat_new: jnp.ndarray,  # [B, Dk]
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    block_tables: jnp.ndarray,
    seq_lens: jnp.ndarray,
    scale: float,
    dv: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    if _use_pallas():
        from xllm_tpu.ops.pallas.mla_attention import (
            mla_decode_attention_write_tpu,
        )

        return mla_decode_attention_write_tpu(
            q_eff, lat_new, cache, layer_idx, slot_mapping, block_tables,
            seq_lens, scale, dv,
        )
    cache = _write_latent_scatter(cache, layer_idx, lat_new, slot_mapping)
    out = mla_ref.mla_decode_ref(
        q_eff, cache, layer_idx, block_tables, seq_lens, scale, dv
    )
    return out, cache


def mla_prefill_attention_write(
    q_eff: jnp.ndarray,  # [S, H, Dk]
    lat_new: jnp.ndarray,  # [S, Dk]
    cache: jnp.ndarray,
    layer_idx: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    block_table: jnp.ndarray,
    q_offset: jnp.ndarray,
    kv_len: jnp.ndarray,
    scale: float,
    dv: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    if _use_pallas():
        from xllm_tpu.ops.pallas.kv_write import (
            latent_write_prefill_tpu,
            latent_write_rmw_tpu,
        )
        from xllm_tpu.ops.pallas.mla_attention import (
            mla_prefill_attention_tpu,
        )

        ntok = kv_len - q_offset
        bs = cache.shape[3]
        lat_w = lat_new.astype(cache.dtype)  # DMA cannot convert dtypes
        if lat_new.shape[0] <= bs:
            cache = latent_write_rmw_tpu(
                lat_w, cache, layer_idx, block_table, q_offset, ntok
            )
        else:
            cache = latent_write_prefill_tpu(
                lat_w, cache, layer_idx, block_table, q_offset, ntok
            )
        out = mla_prefill_attention_tpu(
            q_eff, cache, layer_idx, block_table, q_offset, kv_len, scale, dv
        )
        return out, cache
    cache = _write_latent_scatter(cache, layer_idx, lat_new, slot_mapping)
    out = mla_ref.mla_prefill_ref(
        q_eff, cache, layer_idx, block_table, q_offset, kv_len, scale, dv
    )
    return out, cache


def mla_prefill_attention_write_batched(
    q_eff: jnp.ndarray,  # [P, S, H, Dk]
    lat_new: jnp.ndarray,  # [P, S, Dk]
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # [P, S] (portable path)
    block_tables: jnp.ndarray,  # [P, NBmax]
    q_offsets: jnp.ndarray,  # [P]
    kv_lens: jnp.ndarray,  # [P] (0 = padded row)
    scale: float,
    dv: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """P latent chunks in ONE dispatch — the MLA twin of
    ops/attention.prefill_attention_write_batched (reference whole-batch
    BatchInputBuilder, batch_input_builder.h:53)."""
    p, s = lat_new.shape[0], lat_new.shape[1]
    if _use_pallas():
        from xllm_tpu.ops.pallas.kv_write import (
            latent_write_prefill_batched_tpu,
            latent_write_rmw_batched_tpu,
        )
        from xllm_tpu.ops.pallas.mla_attention import (
            mla_prefill_attention_batched_tpu,
        )

        ntoks = kv_lens - q_offsets
        bs = cache.shape[3]
        lat_w = lat_new.astype(cache.dtype)
        if s <= bs:
            cache = latent_write_rmw_batched_tpu(
                lat_w, cache, layer_idx, block_tables, q_offsets, ntoks
            )
        else:
            cache = latent_write_prefill_batched_tpu(
                lat_w, cache, layer_idx, block_tables, q_offsets, ntoks
            )
        out = mla_prefill_attention_batched_tpu(
            q_eff, cache, layer_idx, block_tables, q_offsets, kv_lens,
            scale, dv,
        )
        return out, cache
    cache = _write_latent_scatter(
        cache, layer_idx,
        lat_new.reshape(p * s, -1),
        slot_mapping.reshape(p * s),
    )
    out = jax.vmap(
        mla_ref.mla_prefill_ref,
        in_axes=(0, None, None, 0, 0, 0, None, None),
    )(q_eff, cache, layer_idx, block_tables, q_offsets, kv_lens, scale, dv)
    return out, cache
