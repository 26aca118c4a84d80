"""Row-major tail pages (kv_layout=interleaved_rm): kernel + engine.

The r5 on-chip patch probe pinned the decode residual on the tail-page
write-back (210 -> 148 us/layer with the write disabled); v12 persists
each new token as one 4 KB token-major tile and canonicalizes the page
on completion. These tests pin:

- the v12 decode kernel (interpret mode) against a logical K/V oracle
  over mixed tails, page-completion and fresh-page boundaries;
- the rowmajor prefill writers (full-page + RMW) content conventions;
- ENGINE-level generation under the rm convention end-to-end, with the
  Pallas kernels in interpret mode (subprocess: the backend env is read
  at import) — chunked prefill crossing pages, decode spanning multiple
  page completions, token agreement with the split-layout engine.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xllm_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_write_v12_tpu,
)

HKV, G, D, BS, NL, NB = 8, 2, 128, 64, 2, 40
HQ = HKV * G
TWO_H = 2 * HKV


def _build_pool(rng, seq_lens, bt):
    """Pool with canonical full pages + token-major tail content."""
    pool = rng.standard_normal(
        (NL, NB, 2, HKV, BS, D)).astype(np.float32) * 0.1
    k_log, v_log = {}, {}
    for i, sl in enumerate(seq_lens):
        ncached = sl - 1
        if ncached < 0:
            continue
        k = rng.standard_normal((ncached, HKV, D)).astype(np.float32)
        v = rng.standard_normal((ncached, HKV, D)).astype(np.float32)
        k_log[i], v_log[i] = k, v
        nfull = ncached // BS
        for pg in range(nfull):
            blk = bt[i, pg]
            pool[1, blk, 0] = k[pg * BS:(pg + 1) * BS].transpose(1, 0, 2)
            pool[1, blk, 1] = v[pg * BS:(pg + 1) * BS].transpose(1, 0, 2)
        nwin = ncached - nfull * BS
        if nwin > 0:
            blk = bt[i, nfull]
            cont = pool[1, blk].reshape(BS, TWO_H, D).copy()
            cont[:nwin, :HKV] = k[nfull * BS:]
            cont[:nwin, HKV:] = v[nfull * BS:]
            pool[1, blk] = cont.reshape(2, HKV, BS, D)
    return pool, k_log, v_log


@pytest.mark.parametrize("seq_lens", [
    [70, 1, 0, 130],      # mixed tails + padded row
    [64, 65, 128, 129],   # w=63 completion, fresh page starts
    [200, 30, 191, 64],
])
def test_decode_v12_matches_oracle(seq_lens):
    rng = np.random.default_rng(0)
    seq_lens = np.asarray(seq_lens, np.int32)
    B = len(seq_lens)
    npage_alloc = -(-seq_lens // BS)
    bt = np.zeros((B, 5), np.int32)
    nxt = 1
    for i in range(B):
        for j in range(max(npage_alloc[i], 1)):
            bt[i, j] = nxt
            nxt += 1
    pool, k_log, v_log = _build_pool(rng, seq_lens, bt)
    slots = np.array(
        [bt[i, (s - 1) // BS] * BS + (s - 1) % BS if s > 0 else 0
         for i, s in enumerate(seq_lens)], np.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, HKV, D)), jnp.float32)
    li = jnp.asarray(1, jnp.int32)
    out, kv2 = paged_decode_attention_write_v12_tpu(
        q, kn, vn, jnp.asarray(pool), li, jnp.asarray(slots),
        jnp.asarray(bt), jnp.asarray(seq_lens), scale=D ** -0.5,
        interpret=True, tile=2)
    kv2 = np.asarray(kv2)
    for i in range(B):
        sl = int(seq_lens[i])
        if sl == 0:
            np.testing.assert_array_equal(np.asarray(out[i]), 0.0)
            continue
        empty = np.zeros((0, HKV, D), np.float32)
        k_all = np.concatenate(
            [k_log.get(i, empty), np.asarray(kn[i])[None]], 0)
        v_all = np.concatenate(
            [v_log.get(i, empty), np.asarray(vn[i])[None]], 0)
        qg = np.asarray(q[i]).reshape(HKV, G, D)
        scores = np.einsum("hgd,shd->hgs", qg, k_all) * D ** -0.5
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        o_ref = np.einsum("hgs,shd->hgd", p, v_all).reshape(HQ, D)
        np.testing.assert_allclose(
            np.asarray(out[i]), o_ref, atol=2e-5)
        # the new token persisted per the convention
        ncached = sl - 1
        wblk = bt[i, ncached // BS]
        w = ncached % BS
        if w == BS - 1:  # completion: canonical page
            page = kv2[1, wblk]
            exp_k = np.concatenate(
                [k_log[i][(ncached // BS) * BS:],
                 np.asarray(kn[i])[None]], 0)
            exp_v = np.concatenate(
                [v_log[i][(ncached // BS) * BS:],
                 np.asarray(vn[i])[None]], 0)
            np.testing.assert_array_equal(page[0], exp_k.transpose(1, 0, 2))
            np.testing.assert_array_equal(page[1], exp_v.transpose(1, 0, 2))
        else:  # token-major row
            cont = kv2[1, wblk].reshape(BS, TWO_H, D)
            np.testing.assert_array_equal(cont[w, :HKV], np.asarray(kn[i]))
            np.testing.assert_array_equal(cont[w, HKV:], np.asarray(vn[i]))


def test_rm_prefill_writers():
    """Full-page writer: complete pages canonical, final partial page
    token-major; RMW: rows merge by token, completion canonicalizes."""
    from xllm_tpu.ops.pallas.kv_write import (
        kv_write_prefill_batched_rm_tpu,
        kv_write_rmw_batched_rm_tpu,
    )

    rng = np.random.default_rng(1)
    P, S = 2, 2 * BS
    q_offsets = np.array([0, 0], np.int32)
    ntoks = np.array([2 * BS, BS + 10], np.int32)  # row 1 partial tail
    kv_lens = q_offsets + ntoks
    bt = np.zeros((P, 4), np.int32)
    bt[0, :2] = [1, 2]
    bt[1, :2] = [3, 4]
    kv = jnp.asarray(
        rng.standard_normal((NL, NB, 2, HKV, BS, D)), jnp.float32) * 0.1
    k_new = jnp.asarray(rng.standard_normal((P, S, HKV, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((P, S, HKV, D)), jnp.float32)
    li = jnp.asarray(1, jnp.int32)
    kvt = jnp.stack(
        [k_new.transpose(0, 2, 1, 3), v_new.transpose(0, 2, 1, 3)], axis=1)
    kvt_tok = jnp.concatenate([k_new, v_new], axis=2)
    kv2 = np.asarray(kv_write_prefill_batched_rm_tpu(
        kvt, kvt_tok, kv, li, jnp.asarray(bt), jnp.asarray(q_offsets),
        jnp.asarray(ntoks), jnp.asarray(kv_lens), interpret=True))
    # row 0: both pages complete -> canonical
    for pg, blk in enumerate((1, 2)):
        np.testing.assert_array_equal(
            kv2[1, blk, 0],
            np.asarray(k_new[0, pg * BS:(pg + 1) * BS]).transpose(1, 0, 2))
    # row 1: page 0 canonical, page 1 token-major partial
    np.testing.assert_array_equal(
        kv2[1, 3, 1],
        np.asarray(v_new[1, :BS]).transpose(1, 0, 2))
    cont = kv2[1, 4].reshape(BS, TWO_H, D)
    np.testing.assert_array_equal(
        cont[:10, :HKV], np.asarray(k_new[1, BS:BS + 10]))
    np.testing.assert_array_equal(
        cont[:10, HKV:], np.asarray(v_new[1, BS:BS + 10]))

    # RMW on the partial tail: append rows 10..13 (stays token-major),
    # then a chunk that COMPLETES the page (canonicalizes)
    S2 = 4
    k2 = jnp.asarray(rng.standard_normal((P, S2, HKV, D)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((P, S2, HKV, D)), jnp.float32)
    q_off2 = np.array([0, BS + 10], np.int32)
    ntok2 = np.array([0, 4], np.int32)
    kv_len2 = np.array([2 * BS, BS + 14], np.int32)
    kv3 = np.asarray(kv_write_rmw_batched_rm_tpu(
        k2, v2, jnp.asarray(kv2), li, jnp.asarray(bt),
        jnp.asarray(q_off2), jnp.asarray(ntok2), jnp.asarray(kv_len2),
        interpret=True))
    cont = kv3[1, 4].reshape(BS, TWO_H, D)
    np.testing.assert_array_equal(cont[10:14, :HKV], np.asarray(k2[1]))
    # completion chunk: rows 14..63 fill page 1 of row 1
    S3 = BS - 14
    k3 = jnp.asarray(rng.standard_normal((P, S3, HKV, D)), jnp.float32)
    v3 = jnp.asarray(rng.standard_normal((P, S3, HKV, D)), jnp.float32)
    q_off3 = np.array([0, BS + 14], np.int32)
    ntok3 = np.array([0, S3], np.int32)
    kv_len3 = np.array([2 * BS, 2 * BS], np.int32)
    kv4 = np.asarray(kv_write_rmw_batched_rm_tpu(
        k3, v3, jnp.asarray(kv3), li, jnp.asarray(bt),
        jnp.asarray(q_off3), jnp.asarray(ntok3), jnp.asarray(kv_len3),
        interpret=True))
    # page 1 of row 1 is now CANONICAL with all 64 tokens
    page = kv4[1, 4]
    exp_k = np.concatenate([
        np.asarray(k_new[1, BS:BS + 10]), np.asarray(k2[1]),
        np.asarray(k3[1]),
    ], 0)
    np.testing.assert_array_equal(page[0], exp_k.transpose(1, 0, 2))


_ENGINE_SCRIPT = r"""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

def cfg(layout):
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3", dtype="float32", vocab_size=97,
            hidden_size=128, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=16, num_key_value_heads=8, head_dim=128,
            qk_norm=True, max_position_embeddings=512, eos_token_ids=[0],
        ),
        cache=CacheConfig(block_size=16, num_blocks=96, kv_layout=layout),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=3, max_tokens_per_chunk_for_prefill=32,
            max_model_len=512, decode_batch_buckets=[4],
            prefill_token_buckets=[32], prefill_row_buckets=[1, 4],
        ),
    )

def run(layout):
    eng = LLMEngine(cfg(layout))
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    prompts = [rng.integers(1, 96, size=n).tolist() for n in (9, 40, 21)]
    for i, p in enumerate(prompts):
        eng.add_request(prompt_token_ids=p, sampling_params=sp,
                        request_id=f"r{i}")
    outs = {o.request_id: o.outputs[0].token_ids
            for o in eng.generate_all(timeout_s=600)}
    assert eng.scheduler.block_manager.num_used_blocks == 0, "leak"
    return [outs[f"r{i}"] for i in range(3)]

rm = run("interleaved_rm")
assert all(len(t) == 24 for t in rm)
split = run("split")
agree = sum(a == b for x, y in zip(split, rm) for a, b in zip(x, y))
total = sum(len(x) for x in split)
print(f"AGREE {agree}/{total}")
assert agree >= total - 4, (agree, total)
print("ENGINE RM OK")
"""


def test_engine_rowmajor_interpret():
    """End-to-end engine under interleaved_rm with interpret-mode Pallas
    kernels: chunked prefill (32-token chunks over 16-token pages),
    decode crossing several page completions, tokens matching the
    split-layout portable engine (tiny f32 reduction-order flips at
    near-ties tolerated)."""
    # head_dim must be 128 for the kernels; 2*Hkv=16 divides bs=16
    env = dict(os.environ, XLLM_ATTENTION_BACKEND="interpret")
    r = subprocess.run(
        [sys.executable, "-c", _ENGINE_SCRIPT], env=env,
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "ENGINE RM OK" in r.stdout, (r.stdout[-2000:], r.stderr[-4000:])
