"""Host-side cost of one decode engine step, measured on CPU.

The bench TPOT (14.06 ms r3) exceeds PERF.md's device component sum
(11.4 ms) by ~2.6 ms/step. Device dispatch is async and the token ring
hides the fetch, so the loop is throughput-bound by
max(device_step, host_loop). This script measures host_loop directly:
the scheduler + input-builder + pending-fixup + bookkeeping path is
device-independent, so a tiny 2-layer model on CPU with the EXACT bench
batch/scheduler/block config exposes the host milliseconds per step.

Segments are timed with perf_counter monkeypatches (cProfile's ~1 us
per-call overhead inflates the 100k-call/step python paths ~10x).
The device wait (np.asarray on fetched tokens) is reported separately
— on TPU it overlaps the next dispatch via the token ring.
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_platforms", "cpu")

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

BATCH = 128
PROMPT_LEN = 128
DECODE_TOKENS = 160

# tiny device side, bench-identical host side (batch, blocks, buckets)
MODEL = ModelConfig(
    model_type="qwen3",
    vocab_size=4096,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=32,
    qk_norm=True,
    tie_word_embeddings=True,
    dtype="float32",
    max_position_embeddings=4096,
)

SEG = {}


def _wrap(obj, name, tag):
    fn = getattr(obj, name)
    SEG[tag] = 0.0

    def timed(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        SEG[tag] += time.perf_counter() - t0
        return r

    setattr(obj, name, timed)


def main() -> None:
    cfg = EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=64, num_blocks=1100),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=BATCH,
            max_tokens_per_batch=8192,
            max_tokens_per_chunk_for_prefill=2048,
            max_model_len=2048 + 128 + 8,
            decode_batch_buckets=[BATCH],
            prefill_token_buckets=[512, 2048],
            prefill_row_buckets=[1, 4],
        ),
        parallel=ParallelConfig(),
        quant=QuantConfig(),
    )
    engine = LLMEngine(config=cfg, tokenizer=None)
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=DECODE_TOKENS,
                        ignore_eos=True)
    for i in range(BATCH):
        ids = rng.integers(1, MODEL.vocab_size - 1, size=PROMPT_LEN).tolist()
        engine.add_request(prompt_token_ids=ids, sampling_params=sp,
                           request_id=f"p-{i}")
    while any(
        s.in_prefill
        for r in engine.scheduler.running + list(engine.scheduler.waiting)
        for s in r.sequences
    ) or not engine.scheduler.running:
        engine.step()
    for _ in range(4):
        engine.step()

    # segment wraps (applied post-warmup so compile time stays out)
    _wrap(engine.scheduler, "schedule", "schedule")
    _wrap(engine, "_build_outputs", "build_outputs")
    _wrap(engine.runner, "run_decode", "run_decode_host")
    _wrap(engine.scheduler, "free_finished", "free_finished")

    # split the device wait out of _process_pending: sync the arrays
    # first (timed as device_wait), then run the python fixup loop
    orig_pp = engine._process_pending
    SEG["device_wait"] = 0.0
    SEG["process_pending"] = 0.0

    def pp(entry):
        t0 = time.perf_counter()
        np.asarray(entry.tokens)
        np.asarray(entry.logprobs)
        t1 = time.perf_counter()
        r = orig_pp(entry)
        t2 = time.perf_counter()
        SEG["device_wait"] += t1 - t0
        SEG["process_pending"] += t2 - t1
        return r

    engine._process_pending = pp

    n_steps = 96
    t0 = time.perf_counter()
    for _ in range(n_steps):
        engine.step()
    dt = time.perf_counter() - t0
    print(f"## total: {dt / n_steps * 1e3:.3f} ms/step "
          f"(batch {BATCH}, {n_steps} steps; includes tiny-device wait)")
    acc = 0.0
    for tag, v in SEG.items():
        print(f"##   {tag:<22} {v / n_steps * 1e3:.3f} ms/step")
        acc += v
    other = dt - acc
    print(f"##   {'other-host':<22} {other / n_steps * 1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
