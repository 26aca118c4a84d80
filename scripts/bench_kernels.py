"""A/B kernel timing on the real chip: decode attention v1 vs v3 + sampler.

Prints per-phase ms; bench config shapes (qwen3-1.7B class, B=128, ctx 192).
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from bench import MODEL, BATCH, PROMPT_LEN

import os

CTX = PROMPT_LEN + 64
ITERS = 32
BS = int(os.environ.get("BENCH_BS", "64"))
NUM_BLOCKS = 70400 // BS  # same byte budget as 1100 x 64
L = MODEL.num_hidden_layers
HKV = MODEL.num_key_value_heads
HQ = MODEL.num_attention_heads
D = MODEL.head_dim


def timed_cached(fn, k_cache, v_cache, *args, iters=ITERS):
    k_cache, v_cache, out = fn(k_cache, v_cache, *args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        k_cache, v_cache, out = fn(k_cache, v_cache, *args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3, k_cache, v_cache


def main() -> None:
    for attempt in range(6):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"tunnel probe failed ({attempt}): {type(e).__name__}",
                  flush=True)
            time.sleep(60)

    k_cache = jnp.zeros((L, NUM_BLOCKS, HKV, BS, D), jnp.bfloat16)
    v_cache = jnp.zeros((L, NUM_BLOCKS, HKV, BS, D), jnp.bfloat16)

    nb_per_seq = (CTX + BS - 1) // BS
    nbt = nb_per_seq  # tight table
    block_tables = np.zeros((BATCH, nbt), np.int32)
    nxt = 1
    for i in range(BATCH):
        for j in range(nb_per_seq):
            block_tables[i, j] = nxt
            nxt += 1
    slot_mapping = (
        block_tables[np.arange(BATCH), (CTX - 1) // BS] * BS + (CTX - 1) % BS
    ).astype(np.int32)
    seq_lens = np.full(BATCH, CTX, np.int32)
    bt = jnp.asarray(block_tables)
    sl = jnp.asarray(seq_lens)
    sm = jnp.asarray(slot_mapping)

    q = jnp.zeros((BATCH, HQ, D), jnp.bfloat16)
    knew = jnp.zeros((BATCH, HKV, D), jnp.bfloat16)
    scale = D**-0.5

    from xllm_tpu.ops.pallas.legacy.decode_attention import (
        paged_decode_attention_write_tpu,
        paged_decode_attention_write_v3_tpu,
        paged_decode_attention_write_v4_tpu,
    )

    for name, fn in (
        ("attn_v4", paged_decode_attention_write_v4_tpu),
        ("attn_v3", paged_decode_attention_write_v3_tpu),
        ("attn_v1", paged_decode_attention_write_tpu),
    ):

        @partial(jax.jit, donate_argnums=(0, 1))
        def attn28(k_cache, v_cache, q, knew, fn=fn):
            def body(carry, layer_idx):
                k_all, v_all, acc = carry
                o, k_all, v_all = fn(
                    q, knew, knew, k_all, v_all, layer_idx, sm, bt, sl, scale
                )
                return (k_all, v_all, acc + jnp.sum(o, axis=(1, 2))), None

            acc0 = jnp.zeros((BATCH,), jnp.float32)
            (k_all, v_all, acc), _ = jax.lax.scan(
                body, (k_cache, v_cache, acc0),
                jnp.arange(L, dtype=jnp.int32))
            return k_all, v_all, acc

        try:
            ms, k_cache, v_cache = timed_cached(attn28, k_cache, v_cache, q, knew)
            gb = (2 * BATCH * CTX * HKV * D * 2 * L) / 1e9
            print(f"## {name}: {ms:.3f} ms ({gb / (ms / 1e3):.0f} GB/s read)",
                  flush=True)
        except Exception as e:
            print(f"## {name}: FAILED {type(e).__name__}: {e}", flush=True)

    # sampler with approx_max_k
    from xllm_tpu.runtime.sampler import sample
    from xllm_tpu.runtime.forward_params import SamplingInput

    logits = jnp.zeros((BATCH, MODEL.vocab_size), jnp.float32)
    si = SamplingInput(
        temperature=jnp.zeros(BATCH, jnp.float32),
        top_k=jnp.zeros(BATCH, jnp.int32),
        top_p=jnp.ones(BATCH, jnp.float32),
        key=jax.random.key(0),
    )

    @jax.jit
    def do_sample(logits, si):
        return sample(logits, si)[0]

    out = do_sample(logits, si)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = do_sample(logits, si)
    np.asarray(out)
    print(f"## sampler: {(time.perf_counter() - t0) / ITERS * 1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
