"""End-to-end benchmark on the local chip. Prints ONE JSON line.

Primary metric (tracked across rounds): decode throughput for a
qwen3-1.7B-class dense model, bf16, batch 128, vs the HBM-bandwidth
roofline at the v5e spec 819 GB/s (weight bytes + KV bytes per step).
Extra fields in the same line: int8 decode throughput, prefill
throughput, and decode TPOT.

The reference publishes no absolute tokens/s (BASELINE.md), so
``vs_baseline`` reports achieved fraction of that roofline — the
north-star metric in BASELINE.json (>=0.95 of roofline tokens/s/chip).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np


from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    QuantConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

# qwen3-1.7B-class dense config (fits one v5e chip in bf16 with ample KV room)
MODEL = ModelConfig(
    model_type="qwen3",
    vocab_size=151936,
    hidden_size=2048,
    intermediate_size=6144,
    num_hidden_layers=28,
    num_attention_heads=16,
    num_key_value_heads=8,
    head_dim=128,
    qk_norm=True,
    tie_word_embeddings=True,
    rope_theta=1000000.0,
    max_position_embeddings=4096,
)

BATCH = 128
PROMPT_LEN = 128
DECODE_TOKENS = 128
PREFILL_PROMPTS = 16
PREFILL_LEN = 2048

# qwen3-8B-class config — BASELINE.json's north-star model (8B @ 8-bit
# weights on v5e; ~8.2 GB + KV fit the 16 GiB HBM). The 8-bit format is
# INT8, not FP8: v5e has no fast f8->bf16 upcast, so fp8 weights measure
# SLOWER than bf16 (170 vs 143 us/layer) while XLA fuses the int8
# dequant into the weight stream at 81 (scripts/probe_qmm_scan.py,
# PERF.md) — int8 is the TPU-idiomatic deployment of the reference's
# w8a8/fp8 capability class.
MODEL_8B = ModelConfig(
    model_type="qwen3",
    vocab_size=151936,
    hidden_size=4096,
    intermediate_size=12288,
    num_hidden_layers=36,
    num_attention_heads=32,
    num_key_value_heads=8,
    head_dim=128,
    qk_norm=True,
    rope_theta=1000000.0,
    max_position_embeddings=4096,
)
BATCH_8B = 64
DECODE_TOKENS_8B = 64

# v5e: 16 GiB HBM @ ~819 GB/s; ~394 bf16 TFLOP/s
HBM_BW = 819e9


def _roofline_tokens_per_sec(
    model: ModelConfig,
    batch: int,
    ctx_len: int,
    weight_bytes_per_el: float,
    kv_bytes_per_el: float = 2,
) -> float:
    d, hkv, dh, L = (
        model.hidden_size,
        model.num_key_value_heads,
        model.head_dim,
        model.num_hidden_layers,
    )
    hq = model.num_attention_heads
    inter = model.intermediate_size
    weight_bytes = (
        L * (d * (hq + 2 * hkv) * dh + hq * dh * d + 3 * d * inter)
    ) * weight_bytes_per_el + model.vocab_size * d * 2  # embed/head stay bf16
    if not model.tie_word_embeddings:
        weight_bytes += model.vocab_size * d * 2
    kv_bytes_per_step = (
        batch * ctx_len * 2 * hkv * dh * kv_bytes_per_el * L
    )
    step_time = (weight_bytes + kv_bytes_per_step) / HBM_BW
    return batch / step_time


def _make_engine(
    quant: str = "",
    model: ModelConfig = MODEL,
    batch: int = BATCH,
    num_blocks: int = 1100,
    kv: str = "auto",
) -> LLMEngine:
    # page size is an A/B knob: at bs=128 the decode kernels' per-page
    # fixed cost amortizes over twice the bytes (scripts/probe_decode_kernel)
    bs = int(os.environ.get("XLLM_BENCH_BS", "64"))
    cfg = EngineConfig(
        model=model,
        # explicit block count: the tunnel hides memory_stats, and the
        # fallback pool would be too small for this batch
        cache=CacheConfig(
            block_size=bs, num_blocks=num_blocks * 64 // bs,
            kv_cache_dtype=kv,
            # r5 layout lever (DEFAULT): interleaved K/V with row-major
            # tail pages — one DMA fetches a page's K and V, and the
            # decode write-back shrinks to a 4 KB tile (v12; bf16 decode
            # +6.7%, prefill +6%, int8-8B +7% over split in the r5
            # benches). int8 phases auto-degrade to plain interleaved
            # (the int8 A/B winner); XLLM_BENCH_KV_LAYOUT overrides.
            kv_layout=os.environ.get(
                "XLLM_BENCH_KV_LAYOUT", "interleaved_rm"
            ),
        ),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=batch,
            max_tokens_per_batch=8192,
            max_tokens_per_chunk_for_prefill=2048,
            max_model_len=PREFILL_LEN + DECODE_TOKENS + 8,
            decode_batch_buckets=[batch],
            prefill_token_buckets=[512, 2048],
            prefill_row_buckets=[1, 4],
        ),
        parallel=ParallelConfig(),
        quant=QuantConfig(method=quant),
    )
    return LLMEngine(config=cfg, tokenizer=None)


def _decode_phase(
    engine: LLMEngine,
    tag: str,
    batch: int = BATCH,
    decode_tokens: int = DECODE_TOKENS,
) -> dict:
    rng = np.random.default_rng(0)
    vocab = engine.config.model.vocab_size
    sp = SamplingParams(temperature=0.0, max_tokens=decode_tokens,
                       ignore_eos=True)
    for i in range(batch):
        ids = rng.integers(1, vocab - 1, size=PROMPT_LEN).tolist()
        engine.add_request(prompt_token_ids=ids, sampling_params=sp,
                           request_id=f"{tag}-{i}")
    prefill_steps = 0
    while any(
        s.in_prefill
        for r in engine.scheduler.running + list(engine.scheduler.waiting)
        for s in r.sequences
    ) or not engine.scheduler.running:
        engine.step()
        prefill_steps += 1
        if prefill_steps > 1000:
            raise RuntimeError("prefill did not converge")
    for _ in range(3):
        engine.step()
    generated_before = sum(
        s.num_generated_tokens
        for r in engine.scheduler.running
        for s in r.sequences
    )
    t0 = time.perf_counter()
    steps = 0
    while engine.has_unfinished():
        engine.step()
        steps += 1
    dt = time.perf_counter() - t0
    timed_tokens = batch * decode_tokens - generated_before
    return {
        "tok_s": timed_tokens / dt,
        "tpot_ms": dt / max(steps, 1) * 1e3,
    }


def _latency_phase(engine: LLMEngine, n_requests: int = 32) -> dict:
    """p50/p95 TTFT and p50 TPOT under continuous batching with staggered
    arrivals (BASELINE.json north-star latency metrics). TTFT includes the
    schedule-overlap fixup lag — what a streaming client actually sees."""
    rng = np.random.default_rng(7)
    vocab = engine.config.model.vocab_size
    sp = SamplingParams(temperature=0.0, max_tokens=32, ignore_eos=True)
    # warm the mixed-load jit buckets (multi-row prefill + small decode
    # batches) so compile time doesn't land in the timed TTFT tail — the
    # reference precompiles its graph buckets the same way (warmup)
    for i in range(8):
        engine.add_request(
            prompt_token_ids=rng.integers(
                1, vocab - 1, size=int(PROMPT_LEN * 2)
            ).tolist(),
            sampling_params=sp, request_id=f"lat-warm-{i}",
        )
    engine.generate_all(timeout_s=600)
    submit_at: dict[str, float] = {}
    first_tok: dict[str, float] = {}
    done_at: dict[str, float] = {}
    pending = [
        (f"lat-{i}",
         rng.integers(1, vocab - 1, size=int(PROMPT_LEN * 2)).tolist())
        for i in range(n_requests)
    ]
    inflight = 0
    while pending or engine.has_unfinished():
        # staggered arrivals: 4 new requests per engine step while any
        # remain (a steady mixed prefill+decode load)
        for _ in range(4):
            if pending:
                rid, ids = pending.pop()
                submit_at[rid] = time.perf_counter()
                engine.add_request(
                    prompt_token_ids=ids, sampling_params=sp, request_id=rid
                )
                inflight += 1
        for out in engine.step():
            if out.request_id not in submit_at:
                continue
            now = time.perf_counter()
            if out.request_id not in first_tok and out.outputs and len(
                out.outputs[0].token_ids
            ) >= 1:
                first_tok[out.request_id] = now
            if out.finished:
                done_at[out.request_id] = now
    ttfts = sorted(
        first_tok[r] - submit_at[r] for r in first_tok
    )
    tpots = sorted(
        (done_at[r] - first_tok[r]) / max(sp.max_tokens - 1, 1)
        for r in done_at if r in first_tok
    )
    pct = lambda a, q: a[min(int(q * len(a)), len(a) - 1)] if a else 0.0
    return {
        "ttft_p50_ms": pct(ttfts, 0.50) * 1e3,
        "ttft_p95_ms": pct(ttfts, 0.95) * 1e3,
        "tpot_p50_ms": pct(tpots, 0.50) * 1e3,
    }


def _spec_phase() -> dict:
    """Speculative decode vs PLAIN decode at the same config (the
    reference's speculative configs — suffix/ngram + MTP drafting with
    batched verify; speculative_engine.cpp:41-70, mtp_worker_impl.h:34).

    Runs in FLOAT32 with a 4k VOCAB: with random weights, the top-2
    logit gap shrinks like 1/V (~3e-5 at V=152k) — below even the f32
    reduction-order noise between the decode and verify programs, so
    near-tie argmax flips reject drafts that ARE the greedy
    continuation (the r4 caveat; 0.88 accepted/seq/step measured in
    f32 at the full vocab). At V=4096 the gap (~1e-3) dwarfs the
    noise and the bench shows the mechanism: warm suffix drafts accept
    multi-token runs and spec beats plain at the same batch. The
    transformer is the full 1.7B-class stack; only the lm_head/embed
    shrink, identically for the spec and plain runs.
    """
    from xllm_tpu.config import SpeculativeConfig

    import jax

    # f32 params are NOT enough on TPU: the DEFAULT matmul precision
    # computes f32 dots in bf16, so the decode and verify programs still
    # flip argmax at near-ties and drafts that ARE the greedy
    # continuation reject (warm accept measured 0.88/seq/step). At
    # HIGHEST precision both programs agree: the same probe measures
    # 3.00 accepted/seq/step and a 5x warm-vs-cold win. Applied for the
    # whole phase — plain baselines run under the identical setting.
    prev_precision = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")

    model32 = dataclasses.replace(MODEL, dtype="float32", vocab_size=4096)
    sched = SchedulerConfig(
        max_seqs_per_batch=32,
        max_tokens_per_batch=4096,
        max_tokens_per_chunk_for_prefill=512,
        max_model_len=512,
        decode_batch_buckets=[32],
        prefill_token_buckets=[512],
        # the verify/draft batch chunks at prefill_row_buckets[-1]: a
        # 4-row cap made every spec step run 8 verify dispatches at batch 32
        prefill_row_buckets=[1, 4, 32],
    )
    rng = np.random.default_rng(3)
    sp = SamplingParams(temperature=0.0, max_tokens=96, ignore_eos=True)
    prompts = [
        rng.integers(1, model32.vocab_size - 1, size=128).tolist()
        for _ in range(32)
    ]

    def make(method, k):
        return LLMEngine(config=EngineConfig(
            model=model32,
            cache=CacheConfig(block_size=64, num_blocks=256),
            scheduler=sched,
            parallel=ParallelConfig(),
            speculative=SpeculativeConfig(
                method=method, num_speculative_tokens=k),
        ), tokenizer=None)

    def prewarm(engine, tag):
        # compile the TAIL bucket programs (verify/decode groups of 4 and
        # 1 appear when accepts spread sequence finish times) before any
        # timed pass — a single in-region compile of a highest-precision
        # program measured 2-19 s and dominated the 7 s pass
        # (/tmp/spec_timing.log; the reference warms its graph buckets
        # the same way, graph_warmup.cpp)
        wsp = SamplingParams(temperature=0.0, max_tokens=12,
                             ignore_eos=True)
        for i in range(5):
            engine.add_request(
                prompt_token_ids=prompts[i][:64], sampling_params=wsp,
                request_id=f"{tag}-warm-{i}")
        while engine.has_unfinished():
            engine.step()

    def run(engine, tag):
        for i, ids in enumerate(prompts):
            engine.add_request(prompt_token_ids=list(ids),
                               sampling_params=sp,
                               request_id=f"{tag}-{i}")
        for _ in range(6):  # burn prefill + verify compiles
            engine.step()
        gen0 = sum(
            s.num_generated_tokens
            for r in engine.scheduler.running for s in r.sequences
        )
        t0 = time.perf_counter()
        steps = 0
        while engine.has_unfinished():
            engine.step()
            steps += 1
            if steps > 5000:
                raise RuntimeError("spec phase did not converge")
        dt = time.perf_counter() - t0
        timed = 32 * 96 - gen0
        return timed / dt, timed / max(steps, 1) / 32

    # wall-clock per pass swings run-to-run (PERF.md variance caveat:
    # variable accepts stagger sequence finishes into a ragged tail
    # where 1-4-seq steps still pay the full 27 ms tunnel RTT,
    # amplifying RTT jitter) — every REPORTED pass is the median of
    # REPS repeats, the same discipline the kernel A/Bs use
    REPS = 3

    def median_runs(engine, tag, reps=REPS):
        samples = [run(engine, f"{tag}{r}") for r in range(reps)]
        toks = sorted(s[0] for s in samples)
        yields = sorted(s[1] for s in samples)
        return toks[len(toks) // 2], yields[len(yields) // 2]

    # plain-decode baselines at the identical config (f32, batch 32):
    # overlapped (production decode) AND sync (overlap_depth 0 — the
    # discipline spec verification runs under on this rig, where the
    # 27 ms tunnel fetch RTT is paid once per sync step; deployment
    # host-device latency is sub-ms, so sync-vs-sync isolates the
    # mechanism from the environment artifact)
    plain = make("", 0)
    prewarm(plain, "p")
    plain_tok_s, _ = median_runs(plain, "plain")
    plain.overlap_depth = 0
    plain_sync_tok_s, _ = median_runs(plain, "plainsync")
    plain.runner.sleep(2)
    del plain

    # suffix spec: pass 1 cold (per-sequence index), later passes warm
    # (identical prompts draft from pass 1's generations via the GLOBAL
    # suffix cache, suffix_tree.h:129 analog — the templated/agentic
    # traffic spec decoding targets; warm passes are statistically
    # identical to each other, so their median is well-defined)
    engine = make("suffix", 4)
    prewarm(engine, "s")
    cold_tok_s, cold_yield = run(engine, "cold")
    engine.spec_stats = [0, 0, 0]
    warm_tok_s, warm_yield = median_runs(engine, "warm")
    drafted, plain_steps, accepted = engine.spec_stats
    print(f"# spec warm (x{REPS}): drafted={drafted} plain={plain_steps} "
          f"accepted_draft_tokens={accepted}", flush=True)
    engine.runner.sleep(2)
    del engine

    # MTP head drafting (reference mtp_worker_impl.h:34): the head is
    # RANDOM-initialized (no public draft checkpoint in-image), so its
    # accept rate is the honest floor — the line measures the full
    # draft+verify pipeline cost, not a tuned accept
    mtp = make("mtp", 2)
    prewarm(mtp, "m")
    mtp_tok_s, mtp_yield = run(mtp, "mtp")
    mtp.runner.sleep(2)
    del mtp

    out = {
        "spec_tok_s": round(warm_tok_s, 1),
        "spec_plain_tok_s": round(plain_tok_s, 1),
        "spec_plain_sync_tok_s": round(plain_sync_tok_s, 1),
        "spec_speedup": round(warm_tok_s / max(plain_sync_tok_s, 1e-9), 3),
        "spec_accept_per_seq_step": round(warm_yield, 2),
        "spec_cold_accept": round(cold_yield, 2),
        "mtp_tok_s": round(mtp_tok_s, 1),
        "mtp_accept_per_seq_step": round(mtp_yield, 2),
    }
    jax.config.update(
        "jax_default_matmul_precision", prev_precision or "default"
    )
    return out


def _prefill_phase(engine: LLMEngine) -> float:
    """Prefill throughput (tokens/s) on long prompts, post-compile."""
    rng = np.random.default_rng(1)
    sp = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
    # compile pass
    engine.add_request(
        prompt_token_ids=rng.integers(1, 1000, size=PREFILL_LEN).tolist(),
        sampling_params=sp, request_id="warm-prefill",
    )
    engine.generate_all(timeout_s=600)
    for i in range(PREFILL_PROMPTS):
        engine.add_request(
            prompt_token_ids=rng.integers(
                1, MODEL.vocab_size - 1, size=PREFILL_LEN
            ).tolist(),
            sampling_params=sp,
            request_id=f"pf-{i}",
        )
    t0 = time.perf_counter()
    engine.generate_all(timeout_s=600)
    dt = time.perf_counter() - t0
    return PREFILL_PROMPTS * PREFILL_LEN / dt


def main() -> None:
    import os

    engine = _make_engine()
    bf16 = _decode_phase(engine, "bf16")
    prefill_tok_s = _prefill_phase(engine)
    lat = {}
    try:
        lat = _latency_phase(engine)
    except Exception as e:  # the primary metric must survive
        print(f"# latency phase failed: {e}", flush=True)

    # int8 weights + int8 KV engine (new compile set); release the bf16
    # engine's HBM first (weights + KV pool). int8 KV is the production
    # quantized-KV format on v5e (PERF.md; fp8 upcast measured 4x slower
    # than the bytes it saves). XLLM_BENCH_KV8=auto falls back to bf16 KV.
    kv8 = os.environ.get("XLLM_BENCH_KV8", "int8")
    engine.runner.sleep(2)
    del engine

    # suffix-speculative phase (multi-token yield per verify step);
    # wrapped so the primary metric survives
    spec = {}
    if not os.environ.get("XLLM_BENCH_SKIP_SPEC"):
        try:
            spec = _spec_phase()
        except Exception as e:
            print(f"# spec phase failed: {e}", flush=True)

    engine8 = _make_engine("int8", kv=kv8)
    int8 = _decode_phase(engine8, "int8")

    # 8B-class FP8 — BASELINE.json's north-star config (skippable via
    # XLLM_BENCH_SKIP_8B=1; wrapped so the primary metric survives)
    q8b = {}
    roofline_8b = _roofline_tokens_per_sec(
        MODEL_8B, BATCH_8B, PROMPT_LEN + DECODE_TOKENS_8B // 2, 1,
        1 if os.environ.get("XLLM_BENCH_KV8", "int8") == "int8" else 2,
    )
    if not os.environ.get("XLLM_BENCH_SKIP_8B"):
        try:
            engine8.runner.sleep(2)
            del engine8
            eng_8b = _make_engine(
                "int8", model=MODEL_8B, batch=BATCH_8B, num_blocks=250,
                kv=kv8,
            )
            q8b = _decode_phase(
                eng_8b, "int8-8b", batch=BATCH_8B,
                decode_tokens=DECODE_TOKENS_8B,
            )
        except Exception as e:
            print(f"# 8B int8 phase failed: {e}", flush=True)

    kv8_bytes = 1 if kv8 == "int8" else 2
    roofline_bf16 = _roofline_tokens_per_sec(
        MODEL, BATCH, PROMPT_LEN + DECODE_TOKENS // 2, 2
    )
    # the int8 roofline charges the ACTUAL kv byte width — quantizing
    # the KV raises the bar rather than inflating the ratio
    roofline_int8 = _roofline_tokens_per_sec(
        MODEL, BATCH, PROMPT_LEN + DECODE_TOKENS // 2, 1, kv8_bytes
    )
    line = {
        "metric": "decode_throughput_qwen3_1.7b_bf16_b128",
        "value": round(bf16["tok_s"], 1),
        "unit": "tokens/s",
        "vs_baseline": round(bf16["tok_s"] / roofline_bf16, 4),
        "tpot_ms": round(bf16["tpot_ms"], 2),
        "prefill_tok_s": round(prefill_tok_s, 0),
        "int8_tok_s": round(int8["tok_s"], 1),
        "int8_vs_roofline": round(int8["tok_s"] / roofline_int8, 4),
    }
    for k, v in lat.items():
        line[k] = round(v, 2)
    line.update(spec)
    if q8b:
        line["int8_8b_tok_s"] = round(q8b["tok_s"], 1)
        line["int8_8b_vs_roofline"] = round(q8b["tok_s"] / roofline_8b, 4)
        line["int8_8b_tpot_ms"] = round(q8b["tpot_ms"], 2)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
