"""Interleaved KV-cache layout: kernel parity + engine equivalence.

The interleaved layout stores K and V of a page contiguously in ONE
array [L, NB, 2, Hkv, bs, D] so the Pallas kernels fetch both in a
single DMA (the r5 decode-attention layout lever, PERF.md). These tests
pin:

- the v11 decode kernel (interpret mode) against the jnp oracle, over
  contiguous AND scattered block tables (the kernel's one-burst-per-tile
  fast path vs the per-page fallback), windows, and int8 codes;
- the interleaved prefill writers + flash kernel against the oracle;
- ENGINE-level equivalence: the same workload on kv_layout=split and
  kv_layout=interleaved produces identical tokens (reference invariant:
  cache layout is an execution detail, kv_cache_shape.* policy only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.ops import attention_ref
from xllm_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_write_v11_tpu,
)
from xllm_tpu.ops.pallas.kv_write import (
    kv_write_prefill_batched_ilv_tpu,
    kv_write_rmw_batched_ilv_tpu,
)
from xllm_tpu.ops.pallas.prefill_attention import (
    paged_attention_prefill_batched_ilv_tpu,
)


def _scattered_tables(rng, seq_lens, bs, ncols):
    """Block tables whose pages are NOT consecutive block ids."""
    b = len(seq_lens)
    npages = -(-seq_lens // bs)
    order = [(i, j) for i in range(b) for j in range(npages[i])]
    rng.shuffle(order)
    bt = np.zeros((b, ncols), np.int32)
    for blk, (i, j) in enumerate(order, start=1):
        bt[i, j] = blk
    return bt


def _contig_tables(seq_lens, bs, ncols):
    b = len(seq_lens)
    npages = -(-seq_lens // bs)
    bt = np.zeros((b, ncols), np.int32)
    nxt = 1
    for i in range(b):
        for j in range(npages[i]):
            bt[i, j] = nxt
            nxt += 1
    return bt


@pytest.mark.parametrize("contig", [True, False])
@pytest.mark.parametrize("window", [0, 9])
@pytest.mark.parametrize("tile", [2, 4])
def test_decode_v11_matches_oracle(contig, window, tile):
    rng = np.random.default_rng(0)
    B, HKV, G, D, BS, NL, NB = 4, 2, 2, 128, 8, 3, 40
    HQ = HKV * G
    seq_lens = np.array([17, 1, 0, 30], np.int32)
    bt = (_contig_tables(seq_lens, BS, 5) if contig
          else _scattered_tables(rng, seq_lens, BS, 5))
    slots = np.array(
        [bt[i, (s - 1) // BS] * BS + (s - 1) % BS if s > 0 else 0
         for i, s in enumerate(seq_lens)], np.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((NL, NB, 2, HKV, BS, D)),
                     jnp.float32) * 0.1
    li = jnp.asarray(1, jnp.int32)
    out, kv2 = paged_decode_attention_write_v11_tpu(
        q, kn, vn, kv, li, jnp.asarray(slots), jnp.asarray(bt),
        jnp.asarray(seq_lens), scale=D ** -0.5, interpret=True,
        window=window, tile=tile)

    k_ref, v_ref = np.array(kv[:, :, 0]), np.array(kv[:, :, 1])
    for i in range(B):
        if seq_lens[i] > 0:
            blk, off = slots[i] // BS, slots[i] % BS
            k_ref[1, blk, :, off, :] = np.asarray(kn[i])
            v_ref[1, blk, :, off, :] = np.asarray(vn[i])
    np.testing.assert_array_equal(np.asarray(kv2[:, :, 0]), k_ref)
    np.testing.assert_array_equal(np.asarray(kv2[:, :, 1]), v_ref)
    ref = attention_ref.paged_attention_decode_ref(
        q, jnp.asarray(k_ref), jnp.asarray(v_ref), li, jnp.asarray(bt),
        jnp.asarray(seq_lens), D ** -0.5, window=window)
    ref = jnp.where(jnp.asarray(seq_lens > 0)[:, None, None], ref, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_v11_int8_codes():
    """int8 cache: the kernel streams codes and upcasts per tile (scales
    fold outside, same as v9) — parity against the ref on upcast views."""
    rng = np.random.default_rng(3)
    B, HKV, G, D, BS, NL, NB = 3, 2, 2, 128, 8, 2, 24
    HQ = HKV * G
    seq_lens = np.array([20, 7, 15], np.int32)
    bt = _contig_tables(seq_lens, BS, 4)
    slots = np.array(
        [bt[i, (s - 1) // BS] * BS + (s - 1) % BS
         for i, s in enumerate(seq_lens)], np.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
    kn8 = jnp.asarray(rng.integers(-20, 20, (B, HKV, D)), jnp.int8)
    vn8 = jnp.asarray(rng.integers(-20, 20, (B, HKV, D)), jnp.int8)
    kv8 = jnp.asarray(rng.integers(-20, 20, (NL, NB, 2, HKV, BS, D)),
                      jnp.int8)
    li = jnp.asarray(0, jnp.int32)
    out, kv2 = paged_decode_attention_write_v11_tpu(
        q, kn8, vn8, kv8, li, jnp.asarray(slots), jnp.asarray(bt),
        jnp.asarray(seq_lens), scale=D ** -0.5, interpret=True, tile=2)
    k_ref, v_ref = np.array(kv8[:, :, 0]), np.array(kv8[:, :, 1])
    for i in range(B):
        blk, off = slots[i] // BS, slots[i] % BS
        k_ref[0, blk, :, off, :] = np.asarray(kn8[i])
        v_ref[0, blk, :, off, :] = np.asarray(vn8[i])
    np.testing.assert_array_equal(np.asarray(kv2[:, :, 0]), k_ref)
    ref = attention_ref.paged_attention_decode_ref(
        q, jnp.asarray(k_ref), jnp.asarray(v_ref), li, jnp.asarray(bt),
        jnp.asarray(seq_lens), D ** -0.5)
    # kernel upcasts codes to bf16 for the MXU; the f32-q oracle upcasts
    # to f32 — tolerance covers the bf16 rounding of O(20) code dots
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)


def test_prefill_ilv_writers_and_attention():
    rng = np.random.default_rng(1)
    P, S, HKV, G, D, BS, NL, NB = 3, 16, 2, 2, 128, 8, 2, 30
    HQ = HKV * G
    q_offsets = np.array([0, 8, 0], np.int32)
    ntoks = np.array([16, 9, 0], np.int32)  # row 2 padded
    kv_lens = q_offsets + ntoks
    bt = _contig_tables(kv_lens, BS, 4)
    kv = jnp.asarray(rng.standard_normal((NL, NB, 2, HKV, BS, D)),
                     jnp.float32) * 0.1
    k_new = jnp.asarray(rng.standard_normal((P, S, HKV, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((P, S, HKV, D)), jnp.float32)
    li = jnp.asarray(1, jnp.int32)
    kvt = jnp.stack(
        [k_new.transpose(0, 2, 1, 3), v_new.transpose(0, 2, 1, 3)], axis=1)
    kv2 = kv_write_prefill_batched_ilv_tpu(
        kvt, kv, li, jnp.asarray(bt), jnp.asarray(q_offsets),
        jnp.asarray(ntoks), interpret=True)
    kv2_np = np.asarray(kv2)
    for i in range(P):
        for j in range(int(ntoks[i])):
            pos = q_offsets[i] + j
            blk, off = bt[i, pos // BS], pos % BS
            np.testing.assert_array_equal(
                kv2_np[1, blk, 0, :, off, :], np.asarray(k_new[i, j]))
            np.testing.assert_array_equal(
                kv2_np[1, blk, 1, :, off, :], np.asarray(v_new[i, j]))

    q = jnp.asarray(rng.standard_normal((P, S, HQ, D)), jnp.float32)
    out = paged_attention_prefill_batched_ilv_tpu(
        q, kv2, li, jnp.asarray(bt), jnp.asarray(q_offsets),
        jnp.asarray(kv_lens), D ** -0.5, interpret=True)
    ref = jax.vmap(
        attention_ref.paged_attention_prefill_ref,
        in_axes=(0, None, None, None, 0, 0, 0, None),
    )(q, kv2[:, :, 0], kv2[:, :, 1], li, jnp.asarray(bt),
      jnp.asarray(q_offsets), jnp.asarray(kv_lens), D ** -0.5)
    for i in range(P):
        if ntoks[i] > 0:
            np.testing.assert_allclose(
                np.asarray(out[i, :ntoks[i]]),
                np.asarray(ref[i, :ntoks[i]]), atol=2e-5)
        else:
            np.testing.assert_array_equal(np.asarray(out[i]), 0.0)

    # RMW writer: small chunks, unaligned starts
    S2 = 5
    q_offsets2 = np.array([3, 13, 0], np.int32)
    ntoks2 = np.array([5, 3, 0], np.int32)
    k2 = jnp.asarray(rng.standard_normal((P, S2, HKV, D)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((P, S2, HKV, D)), jnp.float32)
    kv3 = kv_write_rmw_batched_ilv_tpu(
        k2, v2, kv2, li, jnp.asarray(bt), jnp.asarray(q_offsets2),
        jnp.asarray(ntoks2), interpret=True)
    kv_ref = np.array(kv2)
    for i in range(P):
        for j in range(int(ntoks2[i])):
            pos = q_offsets2[i] + j
            blk, off = bt[i, pos // BS], pos % BS
            kv_ref[1, blk, 0, :, off, :] = np.asarray(k2[i, j])
            kv_ref[1, blk, 1, :, off, :] = np.asarray(v2[i, j])
    np.testing.assert_array_equal(np.asarray(kv3), kv_ref)


# ----------------------------------------------------------------------
# engine equivalence: split vs interleaved layout (portable path, CPU)
# ----------------------------------------------------------------------
def _tiny(kv_layout):
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3",
            dtype="float32",
            vocab_size=97,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            qk_norm=True,
            max_position_embeddings=128,
            eos_token_ids=[0],
        ),
        cache=CacheConfig(block_size=4, num_blocks=64, kv_layout=kv_layout),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=8,
            max_tokens_per_chunk_for_prefill=16,
            max_model_len=128,
            decode_batch_buckets=[2, 4, 8],
            prefill_token_buckets=[4, 8, 16],
        ),
    )


def _run(engine, prompts, max_tokens=12):
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                        ignore_eos=True)
    for i, p in enumerate(prompts):
        engine.add_request(prompt_token_ids=list(p), sampling_params=sp,
                           request_id=f"r{i}")
    outs = engine.generate_all(timeout_s=300)
    return {o.request_id: tuple(o.outputs[0].token_ids) for o in outs}


def test_engine_split_vs_interleaved_identical():
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(1, 97, size=n)]
        for n in (5, 13, 3, 29, 17)
    ]
    split = LLMEngine(_tiny("split"))
    assert split.runner.k_cache.ndim == 5
    toks_split = _run(split, prompts)
    ilv = LLMEngine(_tiny("interleaved"))
    assert ilv.runner.k_cache.ndim == 6
    assert ilv.runner.v_cache.ndim == 1  # placeholder
    toks_ilv = _run(ilv, prompts)
    assert toks_split == toks_ilv


def test_engine_interleaved_beam_and_hostkv():
    """The placeholder-v paths the layout touches: beam block forks
    (copy_kv_blocks) run on the interleaved array."""
    cfg = _tiny("interleaved")
    eng = LLMEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        n=2, use_beam_search=True)
    eng.add_request(prompt_token_ids=[3, 5, 7, 11], sampling_params=sp,
                    request_id="beam")
    outs = eng.generate_all(timeout_s=300)
    assert len(outs[0].outputs) == 2
