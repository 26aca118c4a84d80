"""Slope-based timing: per-iteration device cost = d(time)/d(iters).

Removes the one-off sync/RTT cost that contaminated earlier probes.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from bench import MODEL, BATCH, PROMPT_LEN
from xllm_tpu.runtime.forward_params import DecodeInput, SamplingInput
from xllm_tpu.runtime.model_runner import ModelRunner
from xllm_tpu.runtime.sampler import sample
from xllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig

CTX = PROMPT_LEN + 64
BS = 64


def slope(run, iters_list=(8, 32, 96)):
    """run(n) -> wall seconds for n chained iterations (incl. one sync)."""
    run(4)  # warm
    times = [(n, run(n)) for n in iters_list]
    (n1, t1), (n2, t2) = times[0], times[-1]
    per = (t2 - t1) / (n2 - n1) * 1e3
    fixed = t1 * 1e3 - per * n1
    return per, fixed


def main() -> None:
    for attempt in range(6):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"probe fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)

    cfg = EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=BS, num_blocks=1100),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=BATCH, max_model_len=CTX + 128,
            decode_batch_buckets=[BATCH], prefill_token_buckets=[512],
        ),
    )
    runner = ModelRunner(cfg)
    runner.load_model()
    runner.initialize_kv_cache()
    model = runner.model
    c = model.cfg

    nb_per_seq = (CTX + BS - 1) // BS
    block_tables = np.zeros((BATCH, nb_per_seq), np.int32)
    nxt = 1
    for i in range(BATCH):
        for j in range(nb_per_seq):
            block_tables[i, j] = nxt
            nxt += 1
    inp = DecodeInput(
        slot_ids=np.arange(BATCH, dtype=np.int32),
        positions=np.full(BATCH, CTX - 1, np.int32),
        slot_mapping=(
            block_tables[np.arange(BATCH), (CTX - 1) // BS] * BS
            + (CTX - 1) % BS
        ).astype(np.int32),
        block_tables=block_tables,
        seq_lens=np.full(BATCH, CTX, np.int32),
    )
    si = SamplingInput(
        temperature=np.zeros(BATCH, np.float32),
        top_k=np.zeros(BATCH, np.int32),
        top_p=np.ones(BATCH, np.float32),
        key=jax.random.key(0),
    )

    # ---- e2e decode step, chained with donation (like production) ----
    @partial(jax.jit, donate_argnums=(0, 1))
    def e2e(k_cache, v_cache, params, inp, si, last_tokens):
        token_ids = last_tokens[inp.slot_ids]
        hidden, k_cache, v_cache = model.decode(
            params, k_cache, v_cache, inp, token_ids
        )
        logits = model.compute_logits(params, hidden)
        tokens, _ = sample(logits, si)
        return k_cache, v_cache, tokens

    state = {"k": runner.k_cache, "v": runner.v_cache}

    def run_e2e(n):
        t0 = time.perf_counter()
        for _ in range(n):
            state["k"], state["v"], out = e2e(
                state["k"], state["v"], runner.params, inp, si,
                runner.last_tokens)
        np.asarray(out)
        return time.perf_counter() - t0

    per, fixed = slope(run_e2e)
    print(f"## e2e: {per:.3f} ms/step (fixed {fixed:.1f} ms)", flush=True)

    # ---- attention only ----
    from xllm_tpu.ops.attention import decode_attention_write

    q = jnp.zeros((BATCH, c.num_attention_heads, c.head_dim), model.dtype)
    knew = jnp.zeros((BATCH, c.num_kv_heads, c.head_dim), model.dtype)

    @partial(jax.jit, donate_argnums=(0, 1))
    def attn28(k_cache, v_cache, q, knew, inp):
        def body(carry, layer_idx):
            k_all, v_all, acc = carry
            o, k_all, v_all = decode_attention_write(
                q, knew, knew, k_all, v_all, layer_idx,
                inp.slot_mapping, inp.block_tables, inp.seq_lens, model.scale)
            return (k_all, v_all, acc + jnp.sum(o, axis=(1, 2))), None

        acc0 = jnp.zeros((BATCH,), jnp.float32)
        (k_all, v_all, acc), _ = jax.lax.scan(
            body, (k_cache, v_cache, acc0),
            jnp.arange(c.num_hidden_layers, dtype=jnp.int32))
        return k_all, v_all, acc

    def run_attn(n):
        t0 = time.perf_counter()
        for _ in range(n):
            state["k"], state["v"], out = attn28(
                state["k"], state["v"], q, knew, inp)
        np.asarray(out)
        return time.perf_counter() - t0

    per, fixed = slope(run_attn)
    gb = 2 * BATCH * CTX * c.num_kv_heads * c.head_dim * 2 * c.num_hidden_layers / 1e9
    print(f"## attn28: {per:.3f} ms/step = {gb / per * 1e3:.0f} GB/s read "
          f"(fixed {fixed:.1f} ms)", flush=True)

    # ---- logits matmul only ----
    hidden = jnp.zeros((BATCH, c.hidden_size), model.dtype)

    @jax.jit
    def logits_only(params, hidden, x):
        h = hidden + x  # depend on a changing input to defeat caching
        out = model.compute_logits(params, h)
        return jnp.sum(out[:, :8], axis=-1)

    def run_logits(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = logits_only(runner.params, hidden, jnp.float32(i))
        np.asarray(out)
        return time.perf_counter() - t0

    per, fixed = slope(run_logits)
    print(f"## logits: {per:.3f} ms/step (fixed {fixed:.1f} ms)", flush=True)

    # ---- sampler only ----
    logits_in = jnp.zeros((BATCH, MODEL.vocab_size), jnp.float32)

    @jax.jit
    def samp(logits, si, x):
        tokens, _ = sample(logits + x, si)
        return tokens

    def run_samp(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = samp(logits_in, si, jnp.float32(i))
        np.asarray(out)
        return time.perf_counter() - t0

    per, fixed = slope(run_samp)
    print(f"## sampler: {per:.3f} ms/step (fixed {fixed:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
