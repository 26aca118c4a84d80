"""Pallas paged-attention kernels vs the jnp reference oracle.

Runs the TPU kernels in interpreter mode on CPU (SURVEY.md §4: test Pallas
kernels against jnp references without a device, mirroring the reference's
kernel-vs-torch comparisons in tests/core/kernels/*).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xllm_tpu.ops.attention_ref import (
    paged_attention_decode_ref,
    paged_attention_prefill_ref,
)
from xllm_tpu.ops.pallas.decode_attention import paged_attention_decode_tpu
from xllm_tpu.ops.pallas.prefill_attention import paged_attention_prefill_tpu


def _make_cache(rng, L, NB, Hkv, bs, D, dtype=jnp.float32):
    k = jnp.asarray(rng.standard_normal((L, NB, Hkv, bs, D)), dtype)
    v = jnp.asarray(rng.standard_normal((L, NB, Hkv, bs, D)), dtype)
    return k, v


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2), (4, 1)])
def test_decode_matches_ref(hq, hkv):
    rng = np.random.default_rng(0)
    L, NB, bs, D, B, NBmax = 2, 24, 16, 64, 5, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    seq_lens = jnp.asarray([1, 16, 17, 70, 0], jnp.int32)  # last row = padding
    block_tables = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate([1, 16, 17, 70, 0]):
        for j in range((sl + bs - 1) // bs):
            block_tables[i, j] = next(used)
    block_tables = jnp.asarray(block_tables)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    ref = paged_attention_decode_ref(
        q, k_all, v_all, layer_idx, block_tables, seq_lens, scale
    )
    out = paged_attention_decode_tpu(
        q, k_all, v_all, layer_idx, block_tables, seq_lens, scale, interpret=True
    )
    # padded row (seq_len 0) is garbage in ref (softmax over empty) — skip it
    np.testing.assert_allclose(
        np.asarray(out)[:4], np.asarray(ref)[:4], rtol=2e-5, atol=2e-5
    )
    assert not np.any(np.isnan(np.asarray(out)))


@pytest.mark.parametrize("q_offset_v,kv_len_v,s", [(0, 48, 48), (48, 96, 48), (0, 30, 32)])
def test_prefill_matches_ref(q_offset_v, kv_len_v, s):
    """Chunked prefill: chunk starting at q_offset, kv_len total tokens."""
    rng = np.random.default_rng(1)
    L, NB, hkv, hq, bs, D, NBmax = 2, 16, 2, 4, 16, 64, 8
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    q = jnp.asarray(rng.standard_normal((s, hq, D)), jnp.float32)
    block_table = jnp.asarray(list(range(1, NBmax + 1)), jnp.int32)
    layer_idx = jnp.int32(0)
    scale = D**-0.5
    q_offset = jnp.int32(q_offset_v)
    kv_len = jnp.int32(kv_len_v)

    ref = paged_attention_prefill_ref(
        q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale
    )
    out = paged_attention_prefill_tpu(
        q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale,
        interpret=True,
    )
    # rows past kv_len (padding of the chunk) attend only to in-range tokens;
    # rows whose position >= kv_len are padding — compare only valid rows
    valid = min(s, kv_len_v - q_offset_v)
    np.testing.assert_allclose(
        np.asarray(out)[:valid], np.asarray(ref)[:valid], rtol=2e-5, atol=2e-5
    )
    assert not np.any(np.isnan(np.asarray(out)))


def test_decode_bf16():
    rng = np.random.default_rng(2)
    L, NB, hkv, hq, bs, D, B, NBmax = 1, 8, 2, 4, 16, 128, 2, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    seq_lens = jnp.asarray([33, 16], jnp.int32)
    bt = np.zeros((B, NBmax), np.int32)
    bt[0, :3] = [1, 2, 3]
    bt[1, :1] = [4]
    block_tables = jnp.asarray(bt)
    scale = D**-0.5
    ref = paged_attention_decode_ref(
        q, k_all, v_all, jnp.int32(0), block_tables, seq_lens, scale
    )
    out = paged_attention_decode_tpu(
        q, k_all, v_all, jnp.int32(0), block_tables, seq_lens, scale,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )
