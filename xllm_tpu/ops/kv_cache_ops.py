"""Paged KV-cache tensor ops.

Counterpart of the reference's reshape_paged_cache / cache-write kernels
(reference xllm/core/kernels/ops_api.h paged-cache ops and
xllm/core/framework/kv_cache/kv_cache.h:29). TPU layout choice:

    k_cache, v_cache: [L, num_blocks, num_kv_heads, block_size, head_dim]

All layers live in one stacked array so the per-layer loop can be a
``lax.scan`` over the layer axis with the cache threaded through the carry
(donated => scatters update HBM in place). One (layer, block, head) read is
a contiguous [block_size, head_dim] tile — the unit the Pallas attention
kernels DMA from HBM. Writes are token-sparse scatters through
``slot_mapping`` (block_id * block_size + offset); padded tokens carry
slot 0 and land in the reserved null block 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def write_kv(
    k_all: jnp.ndarray,  # [L, num_blocks, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    k_new: jnp.ndarray,  # [T, Hkv, D]
    v_new: jnp.ndarray,  # [T, Hkv, D]
    slot_mapping: jnp.ndarray,  # [T] int32, block*bs + off (0 = null)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    block_size = k_all.shape[3]
    block_idx = slot_mapping // block_size  # [T]
    offset = slot_mapping % block_size  # [T]
    k_all = k_all.at[layer_idx, block_idx, :, offset, :].set(
        k_new.astype(k_all.dtype), mode="drop"
    )
    v_all = v_all.at[layer_idx, block_idx, :, offset, :].set(
        v_new.astype(v_all.dtype), mode="drop"
    )
    return k_all, v_all


def write_kv_interleaved(
    kv_all: jnp.ndarray,  # [L, num_blocks, 2, Hkv, bs, D]
    layer_idx: jnp.ndarray,  # [] int32
    k_new: jnp.ndarray,  # [T, Hkv, D]
    v_new: jnp.ndarray,  # [T, Hkv, D]
    slot_mapping: jnp.ndarray,  # [T] int32, block*bs + off (0 = null)
) -> jnp.ndarray:
    """Interleaved-layout scatter writer (portable path).

    The interleaved cache stores K and V of a page contiguously
    ([L, NB, 2, Hkv, bs, D]) so the Pallas kernels fetch both in one
    DMA; this is the XLA-scatter equivalent for CPU tests/fallback.
    """
    block_size = kv_all.shape[4]
    block_idx = slot_mapping // block_size
    offset = slot_mapping % block_size
    new = jnp.stack([k_new, v_new], axis=1).astype(kv_all.dtype)  # [T,2,H,D]
    return kv_all.at[layer_idx, block_idx, :, :, offset, :].set(
        new, mode="drop"
    )
