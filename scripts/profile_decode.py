"""Ablation profile of one decode step on the real chip.

Phases (all synced via np.asarray — block_until_ready lies through the
axon tunnel, see CLAUDE.md):
  bw         : HBM copy bandwidth probe (1 GiB)
  e2e        : full decode step (model + logits + sampler), caches donated
  no_logits  : model.decode only
  mm_only    : attention replaced by identity (weight streaming floor)
  attn_only  : 28x decode attention pallas in a scan (KV streaming floor)
  sample_only: logits matmul + sampler on fixed hidden
  logits_only: logits matmul alone
  host_build : input_builder + _put dispatch cost

Caches are donated exactly like production (undonated steps would copy
the 8 GB pool every call and OOM). Results print incrementally.
"""

from __future__ import annotations

import json
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
from xllm_tpu.runtime.forward_params import DecodeInput, SamplingInput
from xllm_tpu.runtime.model_runner import ModelRunner
from xllm_tpu.runtime.sampler import sample

from bench import MODEL, BATCH, PROMPT_LEN  # reuse the bench config

CTX = PROMPT_LEN + 64  # mid-decode context
ITERS = 32

RESULTS = {}


def report(name, value):
    RESULTS[name] = value
    print(f"## {name}: {value}", flush=True)


def timed_cached(fn, k_cache, v_cache, *args, iters=ITERS):
    """Slope-time fn(k, v, *args) -> (k, v, small_out) with donated caches.

    Two loops of N1/N2 iterations, each ending in one sync; the slope
    (t2-t1)/(N2-N1) cancels the constant 27 ms fetch RTT (memory:
    total/ITERS timing fabricates a floor).
    """
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


def timed(fn, *args, iters=ITERS):
    out = fn(*args)
    np.asarray(out)
    n1, n2 = max(iters // 4, 2), iters
    t0 = time.perf_counter()
    for _ in range(n1):
        out = fn(*args)
    np.asarray(out)
    t1 = time.perf_counter()
    for _ in range(n2):
        out = fn(*args)
    np.asarray(out)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


def main() -> None:
    # tunnel health probe: first op after a poisoned period can take minutes
    for attempt in range(6):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"tunnel probe failed (attempt {attempt}): {type(e).__name__}",
                  flush=True)
            time.sleep(60)

    # --- bandwidth probe ---------------------------------------------------
    big = jnp.zeros((512, 1024, 1024), jnp.bfloat16)  # 1 GiB
    copy = jax.jit(lambda x: x * 1.0000001)
    ms = timed(lambda x: copy(x)[0, 0, :8], big, iters=8)
    report("bw_copy_GBps", round(2 * big.size * 2 / (ms / 1e3) / 1e9, 1))
    big.delete()

    cfg = EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=64, num_blocks=1100),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=BATCH,
            max_model_len=CTX + 128,
            decode_batch_buckets=[BATCH],
            prefill_token_buckets=[512],
        ),
        parallel=ParallelConfig(),
    )
    runner = ModelRunner(cfg)
    runner.load_model()
    runner.initialize_kv_cache()
    model = runner.model
    k_cache, v_cache = runner.k_cache, runner.v_cache
    last_tokens = runner.last_tokens

    # fabricate a steady-state decode batch: every seq has CTX tokens
    bs = cfg.cache.block_size
    nb_per_seq = (CTX + bs - 1) // bs
    nbt = runner.max_blocks_per_seq
    block_tables = np.zeros((BATCH, nbt), np.int32)
    nxt = 1
    for i in range(BATCH):
        for j in range(nb_per_seq):
            block_tables[i, j] = nxt
            nxt += 1
    positions = np.full(BATCH, CTX - 1, np.int32)
    slot_mapping = (
        block_tables[np.arange(BATCH), (CTX - 1) // bs] * bs + (CTX - 1) % bs
    ).astype(np.int32)
    seq_lens = np.full(BATCH, CTX, np.int32)
    # host-precomputed page maps, exactly like build_decode_input
    pages = -(-seq_lens // bs)
    page_cum = np.zeros(BATCH + 1, np.int32)
    np.cumsum(pages, out=page_cum[1:])
    page_seq = np.searchsorted(
        page_cum[1:], np.arange(BATCH * nbt), side="right"
    ).astype(np.int32)
    inp = DecodeInput(
        slot_ids=np.arange(BATCH, dtype=np.int32),
        positions=positions,
        slot_mapping=slot_mapping,
        block_tables=block_tables,
        seq_lens=seq_lens,
        page_cum=page_cum,
        page_seq=page_seq,
    )
    si = SamplingInput(
        temperature=np.zeros(BATCH, np.float32),
        top_k=np.zeros(BATCH, np.int32),
        top_p=np.ones(BATCH, np.float32),
        key=jax.random.key(0),
    )
    inp = runner._put(inp)
    si = runner._put(si)
    params = runner.params

    # --- e2e decode step ---------------------------------------------------
    @partial(jax.jit, donate_argnums=(0, 1))
    def e2e(k_cache, v_cache, params, inp, si, last_tokens):
        token_ids = last_tokens[inp.slot_ids]
        hidden, k_cache, v_cache = model.decode(
            params, k_cache, v_cache, inp, token_ids
        )
        logits = model.compute_logits(params, hidden)
        tokens, logprobs = sample(logits, si)
        return k_cache, v_cache, tokens

    ms, k_cache, v_cache = timed_cached(
        e2e, k_cache, v_cache, params, inp, si, last_tokens)
    report("e2e_ms", round(ms, 3))

    @partial(jax.jit, donate_argnums=(0, 1))
    def no_logits(k_cache, v_cache, params, inp, last_tokens):
        token_ids = last_tokens[inp.slot_ids]
        hidden, k_cache, v_cache = model.decode(
            params, k_cache, v_cache, inp, token_ids
        )
        return k_cache, v_cache, jnp.sum(hidden, axis=-1)

    ms, k_cache, v_cache = timed_cached(
        no_logits, k_cache, v_cache, params, inp, last_tokens)
    report("no_logits_ms", round(ms, 3))

    # --- attention only ----------------------------------------------------
    c = model.cfg
    q = jnp.zeros((BATCH, c.num_attention_heads, c.head_dim), model.dtype)
    knew = jnp.zeros((BATCH, c.num_kv_heads, c.head_dim), model.dtype)

    from xllm_tpu.ops.attention import decode_attention_write

    @partial(jax.jit, donate_argnums=(0, 1))
    def attn_only(k_cache, v_cache, q, knew, inp):
        def body(carry, layer_idx):
            k_all, v_all, acc = carry
            o, k_all, v_all = decode_attention_write(
                q, knew, knew, k_all, v_all, layer_idx,
                inp.slot_mapping, inp.block_tables, inp.seq_lens, model.scale,
                page_maps=(inp.page_cum, inp.page_seq),
            )
            return (k_all, v_all, acc + jnp.sum(o, axis=(1, 2))), None

        acc0 = jnp.zeros((BATCH,), jnp.float32)
        (k_all, v_all, acc), _ = jax.lax.scan(
            body, (k_cache, v_cache, acc0),
            jnp.arange(c.num_hidden_layers, dtype=jnp.int32))
        return k_all, v_all, acc

    ms, k_cache, v_cache = timed_cached(
        attn_only, k_cache, v_cache, q, knew, inp)
    report("attn_only_ms", round(ms, 3))

    # --- matmuls only (attention -> identity on the v rows) ----------------
    @jax.jit
    def mm_only(params, inp, last_tokens):
        token_ids = last_tokens[inp.slot_ids]
        x = params["embed_tokens"][token_ids]
        from xllm_tpu.ops.norms import rms_norm
        from xllm_tpu.ops.rope import rope_inv_freq

        inv_freq = rope_inv_freq(c.head_dim, c.rope_theta, c.rope_scaling)

        def body(x, lp):
            h = rms_norm(x, lp["input_layernorm"], c.rms_norm_eps)
            q, k, v = model._attn_qkv(lp, h, inp.positions, inv_freq)
            attn = jnp.repeat(v, c.num_attention_heads // c.num_kv_heads, 1)
            attn = attn.reshape(x.shape[0], -1)
            x = x + model._linear(lp, "o_proj_w", attn).astype(x.dtype)
            h = rms_norm(x, lp["post_attention_layernorm"], c.rms_norm_eps)
            x = x + model._mlp(lp, h)
            return x, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        logits = model.compute_logits(params, x)
        return jnp.sum(logits[:, :8], axis=-1)

    report("mm_only_ms", round(timed(mm_only, params, inp, last_tokens), 3))

    # --- logits + sampling on fixed hidden ---------------------------------
    hidden = jnp.zeros((BATCH, c.hidden_size), model.dtype)

    @jax.jit
    def sample_only(params, hidden, si):
        logits = model.compute_logits(params, hidden)
        tokens, logprobs = sample(logits, si)
        return tokens

    report("sample_only_ms", round(timed(sample_only, params, hidden, si), 3))

    @jax.jit
    def logits_only(params, hidden):
        logits = model.compute_logits(params, hidden)
        return jnp.sum(logits[:, :8], axis=-1)

    report("logits_only_ms", round(timed(logits_only, params, hidden), 3))

    # --- host-side input build + dispatch ----------------------------------
    from xllm_tpu.runtime.input_builder import (
        build_decode_input,
        build_sampling_arrays,
    )
    from xllm_tpu.framework.sampling_params import SamplingParams

    class FakeSeq:
        __slots__ = ("slot_id", "block_ids", "num_tokens", "sampling_params",
                     "rope_offset")

    sp = SamplingParams()
    fseqs = []
    for i in range(BATCH):
        f = FakeSeq()
        f.slot_id = i
        f.block_ids = list(block_tables[i, :nb_per_seq])
        f.num_tokens = CTX
        f.sampling_params = sp
        f.rope_offset = 0
        fseqs.append(f)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        binp, _rows = build_decode_input(fseqs, bs, [BATCH], nbt, runner.trash_slot)
        t, k, p = build_sampling_arrays(fseqs, BATCH)
        runner._put(binp)
    report("host_build_ms", round((time.perf_counter() - t0) / ITERS * 1e3, 3))

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
