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

import json
import time

import numpy as np

import jax

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

# v5e: 16 GiB HBM @ ~819 GB/s; ~394 bf16 TFLOP/s
HBM_BW = 819e9


def _roofline_tokens_per_sec(
    model: ModelConfig, batch: int, ctx_len: int, weight_bytes_per_el: float
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
    kv_bytes_per_step = batch * ctx_len * 2 * hkv * dh * 2 * L
    step_time = (weight_bytes + kv_bytes_per_step) / HBM_BW
    return batch / step_time


def _make_engine(quant: str = "") -> LLMEngine:
    cfg = EngineConfig(
        model=MODEL,
        # explicit block count: the tunnel hides memory_stats, and the
        # fallback pool would be too small for this batch
        cache=CacheConfig(block_size=64, num_blocks=1100),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=BATCH,
            max_tokens_per_batch=8192,
            max_tokens_per_chunk_for_prefill=2048,
            max_model_len=PREFILL_LEN + DECODE_TOKENS + 8,
            decode_batch_buckets=[BATCH],
            prefill_token_buckets=[512, 2048],
            prefill_row_buckets=[1, 4],
        ),
        parallel=ParallelConfig(),
        quant=QuantConfig(method=quant),
    )
    return LLMEngine(config=cfg, tokenizer=None)


def _decode_phase(engine: LLMEngine, tag: str) -> dict:
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=DECODE_TOKENS,
                       ignore_eos=True)
    for i in range(BATCH):
        ids = rng.integers(1, MODEL.vocab_size - 1, size=PROMPT_LEN).tolist()
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
    timed_tokens = BATCH * DECODE_TOKENS - generated_before
    return {
        "tok_s": timed_tokens / dt,
        "tpot_ms": dt / max(steps, 1) * 1e3,
    }


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
    engine = _make_engine()
    bf16 = _decode_phase(engine, "bf16")
    prefill_tok_s = _prefill_phase(engine)

    # int8 weight-only engine (new compile set); release the bf16
    # engine's HBM first (weights + KV pool)
    engine.runner.sleep(2)
    del engine
    engine8 = _make_engine("int8")
    int8 = _decode_phase(engine8, "int8")

    roofline_bf16 = _roofline_tokens_per_sec(
        MODEL, BATCH, PROMPT_LEN + DECODE_TOKENS // 2, 2
    )
    roofline_int8 = _roofline_tokens_per_sec(
        MODEL, BATCH, PROMPT_LEN + DECODE_TOKENS // 2, 1
    )
    print(
        json.dumps(
            {
                "metric": "decode_throughput_qwen3_1.7b_bf16_b128",
                "value": round(bf16["tok_s"], 1),
                "unit": "tokens/s",
                "vs_baseline": round(bf16["tok_s"] / roofline_bf16, 4),
                "tpot_ms": round(bf16["tpot_ms"], 2),
                "prefill_tok_s": round(prefill_tok_s, 0),
                "int8_tok_s": round(int8["tok_s"], 1),
                "int8_vs_roofline": round(int8["tok_s"] / roofline_int8, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
