"""Pallas paged-attention kernels vs the jnp reference oracle.

Runs the TPU kernels in interpreter mode on CPU (SURVEY.md §4: test Pallas
kernels against jnp references without a device, mirroring the reference's
kernel-vs-torch comparisons in tests/core/kernels/*).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xllm_tpu.ops.attention_ref import (
    paged_attention_decode_ref,
    paged_attention_prefill_ref,
)
from xllm_tpu.ops.kv_cache_ops import write_kv
from xllm_tpu.ops.pallas.legacy.decode_attention import (
    paged_decode_attention_write_tpu,
)
from xllm_tpu.ops.pallas.kv_write import kv_write_prefill_tpu
from xllm_tpu.ops.pallas.prefill_attention import paged_attention_prefill_tpu


def _make_cache(rng, L, NB, Hkv, bs, D, dtype=jnp.float32):
    k = jnp.asarray(rng.standard_normal((L, NB, Hkv, bs, D)), dtype)
    v = jnp.asarray(rng.standard_normal((L, NB, Hkv, bs, D)), dtype)
    return k, v


@pytest.mark.parametrize(
    "hq,hkv,dtype", [(4, 4, jnp.float32), (8, 2, jnp.float32), (4, 1, jnp.float32),
                     (4, 2, jnp.bfloat16)]
)
def test_fused_decode_write_matches_ref(hq, hkv, dtype):
    """Fused write+attend == scatter write + ref attention; cache updated.

    seq_lens INCLUDE the current token; the last batch row is padding
    (seq_len 0, slot 0 -> null block).
    """
    rng = np.random.default_rng(3)
    L, NB, bs, D, B, NBmax = 2, 32, 16, 64, 5, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    seq_lens_np = [18, 1, 16, 70, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables, seq_lens = jnp.asarray(bt), jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    assert not np.any(np.isnan(np.asarray(out, np.float32)))
    # written rows landed in the cache
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    # untouched layer unchanged
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )


@pytest.mark.parametrize(
    "q_offset_v,kv_len_v,s", [(0, 48, 48), (48, 96, 48), (0, 30, 32)]
)
def test_prefill_matches_ref(q_offset_v, kv_len_v, s):
    """Chunked prefill attention: chunk at q_offset, kv_len total tokens."""
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
    valid = min(s, kv_len_v - q_offset_v)
    np.testing.assert_allclose(
        np.asarray(out)[:valid], np.asarray(ref)[:valid], rtol=2e-5, atol=2e-5
    )
    assert not np.any(np.isnan(np.asarray(out)))


@pytest.mark.parametrize("q_offset_v,ntok_v", [(0, 48), (48, 33), (16, 40), (32, 3)])
def test_prefill_kv_write_matches_scatter(q_offset_v, ntok_v):
    """Page-run writer == scatter on all slots belonging to the chunk."""
    rng = np.random.default_rng(4)
    L, NB, hkv, bs, D, NBmax = 2, 24, 2, 16, 64, 8
    s_pad = 48
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    k_new = jnp.asarray(rng.standard_normal((s_pad, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((s_pad, hkv, D)), jnp.float32)
    block_table = jnp.asarray(list(range(1, NBmax + 1)), jnp.int32)
    layer_idx = jnp.int32(1)

    slots = np.zeros(s_pad, np.int32)
    for r in range(ntok_v):
        pos = q_offset_v + r
        slots[r] = int(block_table[pos // bs]) * bs + pos % bs
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[:ntok_v], v_new[:ntok_v], jnp.asarray(slots[:ntok_v]),
    )
    k_out, v_out = kv_write_prefill_tpu(
        k_new.transpose(1, 0, 2), v_new.transpose(1, 0, 2),
        k_all, v_all, layer_idx, block_table,
        jnp.int32(q_offset_v), jnp.int32(ntok_v), interpret=True,
    )
    # every slot covered by the chunk must match the oracle; slots beyond
    # the chunk inside the tail page are allowed to be clobbered
    for r in range(ntok_v):
        pos = q_offset_v + r
        blk, off = int(block_table[pos // bs]), pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :]),
            np.asarray(k_ref[1, blk, :, off, :]),
            rtol=1e-6, err_msg=f"row {r}",
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :]),
            np.asarray(v_ref[1, blk, :, off, :]),
            rtol=1e-6,
        )
    # untouched layer unchanged
    np.testing.assert_allclose(np.asarray(k_out[0]), np.asarray(k_all[0]))


@pytest.mark.parametrize("q_offset_v,ntok_v", [(17, 4), (14, 5), (0, 3), (30, 2)])
def test_rmw_kv_write_matches_scatter(q_offset_v, ntok_v):
    """RMW small-chunk writer (unaligned starts, page-crossing) == scatter."""
    from xllm_tpu.ops.pallas.kv_write import kv_write_rmw_tpu

    rng = np.random.default_rng(5)
    L, NB, hkv, bs, D, NBmax = 2, 12, 2, 16, 64, 6
    s = 8
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    k_new = jnp.asarray(rng.standard_normal((s, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((s, hkv, D)), jnp.float32)
    block_table = jnp.asarray(list(range(1, NBmax + 1)), jnp.int32)
    layer_idx = jnp.int32(0)

    slots = np.asarray(
        [
            int(block_table[(q_offset_v + r) // bs]) * bs + (q_offset_v + r) % bs
            for r in range(ntok_v)
        ],
        np.int32,
    )
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx, k_new[:ntok_v], v_new[:ntok_v], jnp.asarray(slots)
    )
    k_out, v_out = kv_write_rmw_tpu(
        k_new, v_new, k_all, v_all, layer_idx, block_table,
        jnp.int32(q_offset_v), jnp.int32(ntok_v), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(k_out), np.asarray(k_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v_ref), rtol=1e-6)


# ----------------------------------------------------------------------
# batched (multi-chunk) kernels: P chunks from P sequences, one dispatch
# ----------------------------------------------------------------------
def _chunked_batch(rng, chunk_specs, bs, NBmax):
    """chunk_specs: list of (q_offset, kv_len). Returns per-row tables."""
    p = len(chunk_specs)
    bt = np.zeros((p, NBmax), np.int32)
    nxt = 1
    for i, (qo, kl) in enumerate(chunk_specs):
        for j in range((max(kl, 1) + bs - 1) // bs):
            bt[i, j] = nxt
            nxt += 1
    return bt


def test_batched_prefill_attention_matches_ref():
    from xllm_tpu.ops.pallas.prefill_attention import (
        paged_attention_prefill_batched_tpu,
    )

    rng = np.random.default_rng(7)
    L, NB, hkv, hq, bs, D, NBmax = 2, 64, 2, 4, 16, 64, 8
    s = 32
    # rows: fresh chunk, continuation chunk, short row, padded row
    specs = [(0, 32), (32, 64), (0, 18), (0, 0)]
    p = len(specs)
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    q = jnp.asarray(rng.standard_normal((p, s, hq, D)), jnp.float32)
    bt = _chunked_batch(rng, specs, bs, NBmax)
    q_offsets = jnp.asarray([qo for qo, _ in specs], jnp.int32)
    kv_lens = jnp.asarray([kl for _, kl in specs], jnp.int32)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    out = paged_attention_prefill_batched_tpu(
        q, k_all, v_all, layer_idx, jnp.asarray(bt), q_offsets, kv_lens,
        scale, interpret=True,
    )
    for i, (qo, kl) in enumerate(specs):
        if kl == 0:
            continue
        ref = paged_attention_prefill_ref(
            q[i], k_all, v_all, layer_idx, jnp.asarray(bt[i]),
            jnp.int32(qo), jnp.int32(kl), scale,
        )
        valid = min(s, kl - qo)
        np.testing.assert_allclose(
            np.asarray(out[i])[:valid], np.asarray(ref)[:valid],
            rtol=2e-5, atol=2e-5, err_msg=f"row {i}",
        )
    assert not np.any(np.isnan(np.asarray(out[:3])))


def test_batched_prefill_kv_write_matches_scatter():
    from xllm_tpu.ops.pallas.kv_write import kv_write_prefill_batched_tpu

    rng = np.random.default_rng(8)
    L, NB, hkv, bs, D, NBmax = 2, 64, 2, 16, 64, 8
    s_pad = 48
    # (q_offset page-aligned, ntok): full pages, partial tail, padded row
    specs = [(0, 48), (32, 33), (16, 16), (0, 0)]
    p = len(specs)
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    k_new = jnp.asarray(rng.standard_normal((p, s_pad, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((p, s_pad, hkv, D)), jnp.float32)
    bt = _chunked_batch(rng, [(qo, qo + n) for qo, n in specs], bs, NBmax)
    q_offsets = jnp.asarray([qo for qo, _ in specs], jnp.int32)
    ntoks = jnp.asarray([n for _, n in specs], jnp.int32)
    layer_idx = jnp.int32(1)

    k_ref, v_ref = k_all, v_all
    for i, (qo, n) in enumerate(specs):
        if n == 0:
            continue
        slots = np.asarray(
            [int(bt[i, (qo + r) // bs]) * bs + (qo + r) % bs for r in range(n)],
            np.int32,
        )
        k_ref, v_ref = write_kv(
            k_ref, v_ref, layer_idx, k_new[i, :n], v_new[i, :n],
            jnp.asarray(slots),
        )
    k_out, v_out = kv_write_prefill_batched_tpu(
        k_new.transpose(0, 2, 1, 3), v_new.transpose(0, 2, 1, 3),
        k_all, v_all, layer_idx, jnp.asarray(bt), q_offsets, ntoks,
        interpret=True,
    )
    for i, (qo, n) in enumerate(specs):
        for r in range(n):
            pos = qo + r
            blk, off = int(bt[i, pos // bs]), pos % bs
            np.testing.assert_allclose(
                np.asarray(k_out[1, blk, :, off, :]),
                np.asarray(k_ref[1, blk, :, off, :]),
                rtol=1e-6, err_msg=f"row {i} tok {r}",
            )
            np.testing.assert_allclose(
                np.asarray(v_out[1, blk, :, off, :]),
                np.asarray(v_ref[1, blk, :, off, :]),
                rtol=1e-6,
            )
    np.testing.assert_allclose(np.asarray(k_out[0]), np.asarray(k_all[0]))


def test_batched_rmw_kv_write_matches_scatter():
    from xllm_tpu.ops.pallas.kv_write import kv_write_rmw_batched_tpu

    rng = np.random.default_rng(9)
    L, NB, hkv, bs, D, NBmax = 2, 48, 2, 16, 64, 6
    s = 5
    # verify-style rows: unaligned, page-crossing, padded
    specs = [(17, 5), (14, 5), (0, 3), (0, 0)]
    p = len(specs)
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    k_new = jnp.asarray(rng.standard_normal((p, s, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((p, s, hkv, D)), jnp.float32)
    bt = _chunked_batch(rng, [(qo, qo + n) for qo, n in specs], bs, NBmax)
    q_offsets = jnp.asarray([qo for qo, _ in specs], jnp.int32)
    ntoks = jnp.asarray([n for _, n in specs], jnp.int32)
    layer_idx = jnp.int32(0)

    k_ref, v_ref = k_all, v_all
    for i, (qo, n) in enumerate(specs):
        if n == 0:
            continue
        slots = np.asarray(
            [int(bt[i, (qo + r) // bs]) * bs + (qo + r) % bs for r in range(n)],
            np.int32,
        )
        k_ref, v_ref = write_kv(
            k_ref, v_ref, layer_idx, k_new[i, :n], v_new[i, :n],
            jnp.asarray(slots),
        )
    k_out, v_out = kv_write_rmw_batched_tpu(
        k_new, v_new, k_all, v_all, layer_idx, jnp.asarray(bt),
        q_offsets, ntoks, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(k_out), np.asarray(k_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v_out), np.asarray(v_ref), rtol=1e-6)


@pytest.mark.parametrize(
    "hq,hkv,dtype", [(4, 4, jnp.float32), (8, 2, jnp.float32),
                     (4, 2, jnp.bfloat16)]
)
def test_decode_v3_matches_ref(hq, hkv, dtype):
    """v3 streaming decode kernel == scatter write + ref attention."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v3_tpu,
    )

    rng = np.random.default_rng(11)
    L, NB, bs, D, B, NBmax = 2, 32, 16, 64, 5, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    seq_lens_np = [18, 1, 16, 70, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_v3_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    # written rows landed in the cache
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )


def test_sliding_window_masks():
    """SWA (mistral): decode + prefill refs and the v3 kernel agree with a
    brute-force windowed softmax."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v3_tpu,
    )

    rng = np.random.default_rng(21)
    L, NB, hkv, hq, bs, D, B, NBmax = 1, 16, 2, 4, 16, 64, 2, 6
    W = 24  # window smaller than context
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [70, 30]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.asarray(
        [bt[i, (sl - 1) // bs] * bs + (sl - 1) % bs
         for i, sl in enumerate(seq_lens_np)], np.int32)
    bt_j = jnp.asarray(bt)
    sl_j = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    layer_idx = jnp.int32(0)
    scale = D**-0.5

    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx, k_new, v_new, jnp.asarray(slots))
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, bt_j, sl_j, scale, window=W)
    # brute force for row 0
    g = hq // hkv
    kk = np.asarray(k_ref[0, bt[0]]).transpose(1, 0, 2, 3).reshape(hkv, -1, D)
    vv = np.asarray(v_ref[0, bt[0]]).transpose(1, 0, 2, 3).reshape(hkv, -1, D)
    sl0 = seq_lens_np[0]
    lo = sl0 - W
    out0 = np.zeros((hkv, g, D))
    for h in range(hkv):
        for j in range(g):
            sc = (np.asarray(q[0]).reshape(hkv, g, D)[h, j] @ kk[h].T) * scale
            sc[: lo] = -np.inf
            sc[sl0:] = -np.inf
            p = np.exp(sc - sc.max())
            p /= p.sum()
            out0[h, j] = p @ vv[h]
    np.testing.assert_allclose(
        np.asarray(ref[0]).reshape(hkv, g, D), out0, rtol=2e-5, atol=2e-5)

    out, _, _ = paged_decode_attention_write_v3_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, jnp.asarray(slots),
        bt_j, sl_j, scale, interpret=True, window=W)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # prefill ref window vs brute force via decode equivalence: last row of
    # a chunk equals decode at the same position
    q1 = q[0:1]
    pref = paged_attention_prefill_ref(
        q1, k_ref, v_ref, layer_idx, jnp.asarray(bt[0]),
        jnp.int32(seq_lens_np[0] - 1), jnp.int32(seq_lens_np[0]), scale,
        window=W)
    np.testing.assert_allclose(
        np.asarray(pref[0]), np.asarray(ref[0]), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "hq,hkv,dtype", [(4, 4, jnp.float32), (8, 2, jnp.float32),
                     (4, 2, jnp.bfloat16), (16, 8, jnp.float32)]
)
def test_decode_v4_matches_ref(hq, hkv, dtype):
    """v4 split-DMA global-ring decode kernel == oracle (incl. mid-batch
    padded rows, the DP rank-major layout)."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v4_tpu,
    )

    rng = np.random.default_rng(31)
    L, NB, bs, D, B, NBmax = 2, 48, 16, 64, 7, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    # pad rows both mid-batch and at the end
    seq_lens_np = [18, 0, 16, 70, 1, 33, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_v4_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )


@pytest.mark.parametrize(
    "hq,hkv,dtype", [(4, 4, jnp.float32), (8, 2, jnp.float32),
                     (4, 2, jnp.bfloat16), (16, 8, jnp.float32)]
)
def test_decode_v5_matches_ref(hq, hkv, dtype):
    """v5 packed-head decode kernel == oracle (incl. mid-batch padded
    rows). Same streaming skeleton as v4; compute packs all heads into
    one [Hq, Hkv*bs] block-diagonal dot per page."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v5_tpu,
    )

    rng = np.random.default_rng(47)
    L, NB, bs, D, B, NBmax = 2, 48, 16, 64, 7, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    seq_lens_np = [18, 0, 16, 70, 1, 33, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_v5_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )


def test_decode_v5_sliding_window():
    """v5 with window: only the trailing `window` positions attend."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v5_tpu,
    )
    rng = np.random.default_rng(48)
    L, NB, bs, D, B, NBmax, hq, hkv = 1, 32, 16, 64, 3, 6, 8, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [50, 7, 81]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        pos = sl - 1
        slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(0)
    scale = D**-0.5
    window = 24

    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx, k_new, v_new, slot_mapping
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale,
        window=window,
    )
    out, _, _ = paged_decode_attention_write_v5_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True, window=window,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize(
    "hq,hkv,dtype", [(4, 4, jnp.float32), (8, 2, jnp.float32),
                     (4, 2, jnp.bfloat16), (16, 8, jnp.float32)]
)
def test_decode_v6_matches_ref(hq, hkv, dtype):
    """v6 packed-head decode kernel == oracle (incl. mid-batch padded
    rows). Same streaming skeleton as v4; compute packs all heads into
    one [Hq, Hkv*bs] block-diagonal dot per page."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v6_tpu,
    )

    rng = np.random.default_rng(53)
    L, NB, bs, D, B, NBmax = 2, 48, 16, 64, 7, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    seq_lens_np = [18, 0, 16, 70, 1, 33, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_v6_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )




def test_decode_v6_sliding_window():
    """v6 with window: only the trailing `window` positions attend."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v6_tpu,
    )
    rng = np.random.default_rng(48)
    L, NB, bs, D, B, NBmax, hq, hkv = 1, 32, 16, 64, 3, 6, 8, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [50, 7, 81]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        pos = sl - 1
        slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(0)
    scale = D**-0.5
    window = 24

    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx, k_new, v_new, slot_mapping
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale,
        window=window,
    )
    out, _, _ = paged_decode_attention_write_v6_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True, window=window,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize(
    "hq,hkv,dtype", [(4, 4, jnp.float32), (8, 2, jnp.float32),
                     (4, 2, jnp.bfloat16), (16, 8, jnp.float32)]
)
def test_decode_v7_matches_ref(hq, hkv, dtype):
    """v7 pair-tile decode kernel == oracle (incl. mid-batch padded rows
    and odd page counts exercising the masked, never-DMA'd second half)."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v7_tpu,
    )

    rng = np.random.default_rng(53)
    L, NB, bs, D, B, NBmax = 2, 48, 16, 64, 7, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    # page counts 2, -, 1, 5, 1, 3, -: odd tails AND even pairs
    seq_lens_np = [18, 0, 16, 70, 1, 33, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_v7_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )


def test_decode_v7_sliding_window():
    """v7 with window: only the trailing `window` positions attend."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v7_tpu,
    )
    rng = np.random.default_rng(48)
    L, NB, bs, D, B, NBmax, hq, hkv = 1, 32, 16, 64, 3, 6, 8, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [50, 7, 81]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        pos = sl - 1
        slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(0)
    scale = D**-0.5
    window = 24

    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx, k_new, v_new, slot_mapping
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale,
        window=window,
    )
    out, _, _ = paged_decode_attention_write_v7_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True, window=window,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_single_chunk_prefill_window_matches_ref():
    """Regression: the single-chunk prefill kernel accepted `window` but
    never applied the sliding-window clause of its mask (the batched
    kernel did) — scoring/verify paths on SWA models attended beyond the
    window, including pages already recycled by the block manager."""
    rng = np.random.default_rng(31)
    L, NB, hkv, hq, bs, D, NBmax = 1, 16, 2, 4, 16, 64, 8
    W = 24
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D)
    s = 32
    q = jnp.asarray(rng.standard_normal((s, hq, D)), jnp.float32)
    block_table = jnp.asarray(list(range(1, NBmax + 1)), jnp.int32)
    layer_idx = jnp.int32(0)
    scale = D**-0.5
    q_offset = jnp.int32(64)  # chunk far enough in that the window binds
    kv_len = jnp.int32(96)

    ref = paged_attention_prefill_ref(
        q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale,
        window=W,
    )
    out = paged_attention_prefill_tpu(
        q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale,
        interpret=True, window=W,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # and the window must actually change the answer
    full = paged_attention_prefill_tpu(
        q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale,
        interpret=True,
    )
    assert np.abs(np.asarray(out) - np.asarray(full)).max() > 1e-3


@pytest.mark.parametrize(
    "hq,hkv,dtype,chunk", [(4, 4, jnp.float32, 4), (8, 2, jnp.float32, 2),
                           (4, 2, jnp.bfloat16, 4), (16, 8, jnp.float32, 4),
                           (16, 8, jnp.float32, 2)]
)
def test_decode_v8_matches_ref(hq, hkv, dtype, chunk):
    """v8 chunked-flash decode kernel == oracle (incl. mid-batch padded
    rows, tail chunks shorter than C, and ring alignment across
    sequences)."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v8_tpu,
    )

    rng = np.random.default_rng(51)
    L, NB, bs, D, B, NBmax = 2, 48, 16, 64, 7, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    seq_lens_np = [18, 0, 16, 70, 1, 33, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_v8_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True, chunk=chunk,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )


def test_decode_v8_sliding_window():
    """v8 with window: only the trailing `window` positions attend."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v8_tpu,
    )
    rng = np.random.default_rng(52)
    L, NB, bs, D, B, NBmax, hq, hkv = 1, 32, 16, 64, 3, 6, 8, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [50, 7, 81]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        pos = sl - 1
        slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(0)
    scale = D**-0.5
    window = 24

    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx, k_new, v_new, slot_mapping
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale,
        window=window,
    )
    out, _, _ = paged_decode_attention_write_v8_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True, window=window,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_decode_v8_premap_matches_devprep():
    """v8 with a host-precomputed page cumsum == device-computed."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v8_tpu,
    )
    rng = np.random.default_rng(53)
    L, NB, bs, D, B, NBmax, hq, hkv = 1, 32, 16, 64, 3, 6, 8, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [50, 7, 81]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        pos = sl - 1
        slots[i] = bt[i, pos // bs] * bs + pos % bs
    args = (
        q, k_new, v_new, k_all, v_all, jnp.int32(0),
        jnp.asarray(slots), jnp.asarray(bt),
        jnp.asarray(seq_lens_np, dtype=jnp.int32),
    )
    pages = np.asarray([(sl + bs - 1) // bs for sl in seq_lens_np])
    cum = jnp.asarray(
        np.concatenate([[0], np.cumsum(pages)]), jnp.int32
    )
    o1, k1, v1 = paged_decode_attention_write_v8_tpu(
        *args, D**-0.5, interpret=True,
    )
    o2, k2, v2 = paged_decode_attention_write_v8_tpu(
        *args, D**-0.5, interpret=True, cum=cum,
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


@pytest.mark.parametrize(
    "hq,hkv,dtype,tile", [(4, 4, jnp.float32, 4), (8, 2, jnp.float32, 2),
                          (4, 2, jnp.bfloat16, 4), (16, 8, jnp.float32, 4),
                          (16, 8, jnp.float32, 3)]
)
def test_decode_v9_matches_ref(hq, hkv, dtype, tile):
    """v9 T-page tile decode kernel == oracle (incl. mid-batch padded
    rows, tails shorter than T, ring wraparound across sequences)."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v9_tpu,
    )

    rng = np.random.default_rng(61)
    L, NB, bs, D, B, NBmax = 2, 48, 16, 64, 7, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    seq_lens_np = [18, 0, 16, 70, 1, 33, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_v9_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True, tile=tile,
    )
    # the bf16-softmax stream must stay within flash-attention prob
    # tolerance of the same oracle
    out16, _, _ = paged_decode_attention_write_v9_tpu(
        q, k_new, v_new, jnp.copy(k_all), jnp.copy(v_all), layer_idx,
        slot_mapping, block_tables, seq_lens, scale, interpret=True,
        tile=tile, softmax16=True,
    )
    valid16 = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    np.testing.assert_allclose(
        np.asarray(out16, np.float32)[valid16],
        np.asarray(ref, np.float32)[valid16],
        rtol=4e-2, atol=4e-2,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )


def test_decode_v9_sliding_window():
    """v9 with window: only the trailing `window` positions attend."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v9_tpu,
    )
    rng = np.random.default_rng(62)
    L, NB, bs, D, B, NBmax, hq, hkv = 1, 32, 16, 64, 3, 6, 8, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [50, 7, 81]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        pos = sl - 1
        slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(0)
    scale = D**-0.5
    window = 24

    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx, k_new, v_new, slot_mapping
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale,
        window=window,
    )
    out, _, _ = paged_decode_attention_write_v9_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True, window=window,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_decode_v9_premap_matches_devprep():
    """v9 with a host-precomputed page cumsum == device-computed."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v9_tpu,
    )
    rng = np.random.default_rng(63)
    L, NB, bs, D, B, NBmax, hq, hkv = 1, 32, 16, 64, 3, 6, 8, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [50, 7, 81]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        pos = sl - 1
        slots[i] = bt[i, pos // bs] * bs + pos % bs
    args = (
        q, k_new, v_new, k_all, v_all, jnp.int32(0),
        jnp.asarray(slots), jnp.asarray(bt),
        jnp.asarray(seq_lens_np, dtype=jnp.int32),
    )
    pages = np.asarray([(sl + bs - 1) // bs for sl in seq_lens_np])
    cum = jnp.asarray(
        np.concatenate([[0], np.cumsum(pages)]), jnp.int32
    )
    o1, k1, v1 = paged_decode_attention_write_v9_tpu(
        *args, D**-0.5, interpret=True,
    )
    o2, k2, v2 = paged_decode_attention_write_v9_tpu(
        *args, D**-0.5, interpret=True, cum=cum,
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


@pytest.mark.parametrize("tile", [2, 4])
def test_decode_v9_premask_matches(tile):
    """v9 premask (mask constants hoisted to resident VMEM inputs) is
    bit-identical to the in-kernel mask build, including padded rows,
    single-token and tile-straddling sequences."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v9_tpu,
    )
    rng = np.random.default_rng(64)
    L, NB, bs, D, B, NBmax, hq, hkv = 2, 40, 16, 64, 4, 6, 8, 4
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), jnp.float32)
    seq_lens_np = [50, 7, 81, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        pos = max(sl - 1, 0)
        slots[i] = bt[i, pos // bs] * bs + pos % bs
    args = (
        q, k_new, v_new, k_all, v_all, jnp.int32(1),
        jnp.asarray(slots), jnp.asarray(bt),
        jnp.asarray(seq_lens_np, dtype=jnp.int32),
    )
    o1, k1, v1 = paged_decode_attention_write_v9_tpu(
        *args, D**-0.5, interpret=True, tile=tile,
    )
    o2, k2, v2 = paged_decode_attention_write_v9_tpu(
        *args, D**-0.5, interpret=True, tile=tile, premask=True,
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


@pytest.mark.parametrize(
    "hq,hkv,dtype,tile", [(4, 4, jnp.float32, 4), (8, 2, jnp.float32, 2),
                          (4, 2, jnp.bfloat16, 4), (16, 8, jnp.float32, 4),
                          (16, 8, jnp.float32, 3)]
)
def test_decode_v10_matches_ref(hq, hkv, dtype, tile):
    """v10 narrow-score decode kernel == oracle (same edge matrix as v9:
    padded rows, tails shorter than T, ring wraparound)."""
    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_v10_tpu,
    )

    rng = np.random.default_rng(61)
    L, NB, bs, D, B, NBmax = 2, 48, 16, 64, 7, 6
    k_all, v_all = _make_cache(rng, L, NB, hkv, bs, D, dtype)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), dtype)
    k_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    v_new = jnp.asarray(rng.standard_normal((B, hkv, D)), dtype)
    seq_lens_np = [18, 0, 16, 70, 1, 33, 0]
    bt = np.zeros((B, NBmax), np.int32)
    used = iter(range(1, NB))
    for i, sl in enumerate(seq_lens_np):
        for j in range((sl + bs - 1) // bs):
            bt[i, j] = next(used)
    slots = np.zeros(B, np.int32)
    for i, sl in enumerate(seq_lens_np):
        if sl > 0:
            pos = sl - 1
            slots[i] = bt[i, pos // bs] * bs + pos % bs
    block_tables = jnp.asarray(bt)
    seq_lens = jnp.asarray(seq_lens_np, dtype=jnp.int32)
    slot_mapping = jnp.asarray(slots)
    layer_idx = jnp.int32(1)
    scale = D**-0.5

    valid = [i for i, sl in enumerate(seq_lens_np) if sl > 0]
    k_ref, v_ref = write_kv(
        k_all, v_all, layer_idx,
        k_new[jnp.asarray(valid)], v_new[jnp.asarray(valid)],
        slot_mapping[jnp.asarray(valid)],
    )
    ref = paged_attention_decode_ref(
        q, k_ref, v_ref, layer_idx, block_tables, seq_lens, scale
    )
    out, k_out, v_out = paged_decode_attention_write_v10_tpu(
        q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
        block_tables, seq_lens, scale, interpret=True, tile=tile,
    )
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        rtol=tol, atol=tol,
    )
    for i in valid:
        pos = seq_lens_np[i] - 1
        blk, off = bt[i, pos // bs], pos % bs
        np.testing.assert_allclose(
            np.asarray(k_out[1, blk, :, off, :], np.float32),
            np.asarray(k_new[i], np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(v_out[1, blk, :, off, :], np.float32),
            np.asarray(v_new[i], np.float32),
        )
    np.testing.assert_allclose(
        np.asarray(k_out[0], np.float32), np.asarray(k_all[0], np.float32)
    )

