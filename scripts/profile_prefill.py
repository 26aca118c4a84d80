"""Prefill ablation profile at the bench config (VERDICT r3 #5).

The r3 bench measured 32,176 tok/s prefill on the 1.7B-class bf16 model
(~25-30% MFU) with no breakdown. This probe slope-times the exact bench
prefill dispatch — a [4, 2048] batched chunk group (prefill_token_buckets
2048 x prefill_row_buckets 4, 8192 tokens/dispatch) — and ablates:

  e2e        : prefill_batched + last-row logits + sample
  no_logits  : prefill_batched only
  mm_only    : layer scan with attention replaced by identity
               (matmul/MXU floor; the compute-bound term)
  attn_only  : 28x prefill_attention_write_batched in a scan
               (flash kernel + KV writes)

Timings via slope (two loops, one sync each) — block_until_ready is a
no-op through the axon tunnel (CLAUDE.md).

MFU accounting at [P=4, S=2048]: per-token matmul FLOPs =
2*(D*(Hq+2*Hkv)*dh + Hq*dh*D + 3*D*I); attention FLOPs =
2*2*Hq*dh*S_avg where S_avg = S/2 (causal). v5e bf16 peak ~394 TFLOP/s.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ParallelConfig,
    SchedulerConfig,
)
from xllm_tpu.runtime.forward_params import BatchedPrefillInput, SamplingInput
from xllm_tpu.runtime.model_runner import ModelRunner
from xllm_tpu.runtime.sampler import sample

from bench import MODEL  # bench model config

P, S = 4, 2048
ITERS = 12

RESULTS = {}


def report(name, value):
    RESULTS[name] = value
    print(f"## {name}: {value}", flush=True)


def timed_cached(fn, k_cache, v_cache, *args, iters=ITERS):
    k_cache, v_cache, out = fn(k_cache, v_cache, *args)
    np.asarray(out)  # compile + sync
    n1, n2 = max(iters // 4, 2), iters
    t0 = time.perf_counter()
    for _ in range(n1):
        k_cache, v_cache, out = fn(k_cache, v_cache, *args)
    np.asarray(out)
    t1 = time.perf_counter()
    for _ in range(n2):
        k_cache, v_cache, out = fn(k_cache, v_cache, *args)
    np.asarray(out)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
    return dt, k_cache, v_cache


def main() -> None:
    for attempt in range(6):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"tunnel probe failed ({attempt}): {type(e).__name__}",
                  flush=True)
            time.sleep(60)

    cfg = EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=64, num_blocks=1100),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=16,
            max_model_len=S + 128,
            decode_batch_buckets=[16],
            prefill_token_buckets=[512, S],
            prefill_row_buckets=[1, P],
        ),
        parallel=ParallelConfig(),
    )
    runner = ModelRunner(cfg)
    runner.load_model()
    runner.initialize_kv_cache()
    model = runner.model
    k_cache, v_cache = runner.k_cache, runner.v_cache
    params = runner.params
    c = model.cfg
    bs = cfg.cache.block_size
    nbt = runner.max_blocks_per_seq
    nb_per_seq = S // bs

    # P sequences, each a full S-token first chunk
    block_tables = np.zeros((P, nbt), np.int32)
    nxt = 1
    for i in range(P):
        for j in range(nb_per_seq):
            block_tables[i, j] = nxt
            nxt += 1
    positions = np.tile(np.arange(S, dtype=np.int32), (P, 1))
    slot_mapping = np.zeros((P, S), np.int32)
    for i in range(P):
        for t in range(S):
            slot_mapping[i, t] = block_tables[i, t // bs] * bs + t % bs
    rng = np.random.default_rng(0)
    inp = BatchedPrefillInput(
        token_ids=rng.integers(1, c.vocab_size - 1, size=(P, S)).astype(
            np.int32
        ),
        positions=positions,
        slot_mapping=slot_mapping,
        block_tables=block_tables,
        kv_lens=np.full(P, S, np.int32),
        q_offsets=np.zeros(P, np.int32),
        logits_idx=np.full(P, S - 1, np.int32),
        sample_slots=np.arange(P, dtype=np.int32),
        hist_slots=np.arange(P, dtype=np.int32),
        hist_pos=positions,
    )
    si = SamplingInput(
        temperature=np.zeros(P, np.float32),
        top_k=np.zeros(P, np.int32),
        top_p=np.ones(P, np.float32),
        key=np.array([0, 1], np.uint32),
    )
    inp = runner._put(inp)
    si = runner._put(si)

    # --- e2e ---------------------------------------------------------------
    @partial(jax.jit, donate_argnums=(0, 1))
    def e2e(k_cache, v_cache, params, inp, si):
        hidden, k_cache, v_cache = model.prefill_batched(
            params, k_cache, v_cache, inp
        )
        logits = model.compute_logits(params, hidden[:, 0])
        tokens, _ = sample(logits, si, need_logprobs=False)
        return k_cache, v_cache, tokens

    ms, k_cache, v_cache = timed_cached(e2e, k_cache, v_cache, params, inp, si)
    report("e2e_ms", round(ms, 3))
    report("e2e_tok_s", round(P * S / (ms / 1e3), 0))

    # --- no logits ----------------------------------------------------------
    @partial(jax.jit, donate_argnums=(0, 1))
    def no_logits(k_cache, v_cache, params, inp):
        hidden, k_cache, v_cache = model.prefill_batched(
            params, k_cache, v_cache, inp
        )
        return k_cache, v_cache, jnp.sum(hidden)

    ms, k_cache, v_cache = timed_cached(
        no_logits, k_cache, v_cache, params, inp
    )
    report("no_logits_ms", round(ms, 3))

    # --- matmuls only (attention -> identity) -------------------------------
    @partial(jax.jit, donate_argnums=(0, 1))
    def mm_only(k_cache, v_cache, params, inp):
        x = params["embed_tokens"][inp.token_ids.reshape(-1)]
        pos = inp.positions.reshape(-1)

        def attn_fn(q, k, v, ka, va, layer_idx):
            return q, ka, va

        x, k_cache, v_cache, _ = model._run_stack(
            params["layers"], 0, x, k_cache, v_cache, pos, attn_fn,
            model._mlp,
        )
        return k_cache, v_cache, jnp.sum(x)

    ms, k_cache, v_cache = timed_cached(
        mm_only, k_cache, v_cache, params, inp
    )
    report("mm_only_ms", round(ms, 3))

    # --- attention only ------------------------------------------------------
    from xllm_tpu.ops.attention import prefill_attention_write_batched

    q0 = jnp.zeros((P, S, c.num_attention_heads, c.head_dim), model.dtype)
    kv0 = jnp.zeros((P, S, c.num_kv_heads, c.head_dim), model.dtype)

    @partial(jax.jit, donate_argnums=(0, 1))
    def attn_only(k_cache, v_cache, inp):
        def body(carry, li):
            ka, va, acc = carry
            out, ka, va = prefill_attention_write_batched(
                q0, kv0, kv0, ka, va, li, inp.slot_mapping,
                inp.block_tables, inp.q_offsets, inp.kv_lens,
                c.head_dim ** -0.5,
            )
            return (ka, va, acc + jnp.sum(out)), None

        (k_cache, v_cache, acc), _ = jax.lax.scan(
            body, (k_cache, v_cache, jnp.zeros((), jnp.float32)),
            jnp.arange(c.num_hidden_layers, dtype=jnp.int32),
        )
        return k_cache, v_cache, acc

    ms, k_cache, v_cache = timed_cached(attn_only, k_cache, v_cache, inp)
    report("attn_only_ms", round(ms, 3))

    # --- MFU accounting ------------------------------------------------------
    d, dh = c.hidden_size, c.head_dim
    hq, hkv, L, I = (c.num_attention_heads, c.num_kv_heads,
                     c.num_hidden_layers, c.intermediate_size)
    mm_flops_tok = 2 * (d * (hq + 2 * hkv) * dh + hq * dh * d + 3 * d * I) * L
    attn_flops_tok = 2 * 2 * hq * dh * (S / 2) * L
    total = (mm_flops_tok + attn_flops_tok) * P * S
    e2e_s = RESULTS["e2e_ms"] / 1e3
    report("mfu_pct", round(total / e2e_s / 394e12 * 100, 1))
    import json

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
