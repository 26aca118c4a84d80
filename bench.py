"""End-to-end decode-throughput benchmark on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute tokens/s (BASELINE.md), so
``vs_baseline`` reports achieved fraction of the HBM-bandwidth roofline for
the benchmarked config — the north-star metric in BASELINE.json (>=0.95 of
roofline tokens/s/chip). Roofline per decode step = (weight bytes read +
KV bytes read) / HBM bandwidth.
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
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.runtime.model_runner import ModelRunner

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

# v5e: 16 GiB HBM @ ~819 GB/s; ~394 bf16 TFLOP/s
HBM_BW = 819e9


def _roofline_tokens_per_sec(model: ModelConfig, batch: int, ctx_len: int) -> float:
    bytes_per_el = 2  # bf16
    d, hkv, dh, L = (
        model.hidden_size,
        model.num_key_value_heads,
        model.head_dim,
        model.num_hidden_layers,
    )
    hq = model.num_attention_heads
    inter = model.intermediate_size
    weight_bytes = (
        L * (d * (hq + 2 * hkv) * dh + hq * dh * d + 3 * d * inter) + model.vocab_size * d
    ) * bytes_per_el
    if not model.tie_word_embeddings:
        weight_bytes += model.vocab_size * d * bytes_per_el
    kv_bytes_per_step = batch * ctx_len * 2 * hkv * dh * bytes_per_el * L
    step_time = (weight_bytes + kv_bytes_per_step) / HBM_BW
    return batch / step_time


def main() -> None:
    cfg = EngineConfig(
        model=MODEL,
        # explicit block count: the tunnel hides memory_stats, and the
        # fallback pool would be too small for this batch
        cache=CacheConfig(block_size=64, num_blocks=1100),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=BATCH,
            max_tokens_per_batch=8192,
            max_tokens_per_chunk_for_prefill=2048,
            max_model_len=PROMPT_LEN + DECODE_TOKENS + 8,
            decode_batch_buckets=[BATCH],
            prefill_token_buckets=[512, 2048],
        ),
        parallel=ParallelConfig(),
    )
    engine = LLMEngine(config=cfg, tokenizer=None)

    rng = np.random.default_rng(0)
    sp = SamplingParams(
        temperature=0.0, max_tokens=DECODE_TOKENS, ignore_eos=True
    )
    for i in range(BATCH):
        ids = rng.integers(1, MODEL.vocab_size - 1, size=PROMPT_LEN).tolist()
        engine.add_request(prompt_token_ids=ids, sampling_params=sp)

    # run prefill phase (and compile both phases) untimed
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
    # a couple decode steps to warm the decode jit cache
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
    total_generated = BATCH * DECODE_TOKENS
    timed_tokens = total_generated - generated_before

    tps = timed_tokens / dt
    roofline = _roofline_tokens_per_sec(
        MODEL, BATCH, PROMPT_LEN + DECODE_TOKENS // 2
    )
    print(
        json.dumps(
            {
                "metric": "decode_throughput_qwen3_1.7b_bf16_b128",
                "value": round(tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tps / roofline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
