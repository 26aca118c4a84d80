"""Paged-attention dispatch: Pallas kernels on TPU, jnp reference elsewhere.

The TPU-side split mirrors the reference's kernel dispatch layer
(reference xllm/core/kernels/ops_api.h:27-287 dispatching per backend):
``backend="auto"`` picks the Pallas kernels when running on TPU and the
jnp reference otherwise (CPU tests, interpret mode).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from xllm_tpu.ops import attention_ref

_FORCE_REF = os.environ.get("XLLM_ATTENTION_BACKEND", "auto") == "ref"


def _use_pallas() -> bool:
    if _FORCE_REF:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
        import xllm_tpu.ops.pallas  # noqa: F401

        return True
    except Exception:  # pragma: no cover - pallas kernels not present
        return False


def paged_attention_decode(
    q: jnp.ndarray,  # [B, Hq, D]
    k_all: jnp.ndarray,  # [L, num_blocks, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, NB]
    seq_lens: jnp.ndarray,  # [B]
    scale: float,
) -> jnp.ndarray:
    if _use_pallas():
        from xllm_tpu.ops.pallas.decode_attention import paged_attention_decode_tpu

        return paged_attention_decode_tpu(
            q, k_all, v_all, layer_idx, block_tables, seq_lens, scale
        )
    return attention_ref.paged_attention_decode_ref(
        q, k_all, v_all, layer_idx, block_tables, seq_lens, scale
    )


def paged_attention_prefill(
    q: jnp.ndarray,  # [S, Hq, D]
    k_all: jnp.ndarray,
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,
    block_table: jnp.ndarray,  # [NB]
    q_offset: jnp.ndarray,  # []
    kv_len: jnp.ndarray,  # []
    scale: float,
) -> jnp.ndarray:
    if _use_pallas():
        from xllm_tpu.ops.pallas.prefill_attention import (
            paged_attention_prefill_tpu,
        )

        return paged_attention_prefill_tpu(
            q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale
        )
    return attention_ref.paged_attention_prefill_ref(
        q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale
    )
