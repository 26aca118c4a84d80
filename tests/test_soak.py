"""Randomized engine soak: mixed features under memory pressure.

The reference covers scheduler/framework interactions with targeted unit
tests (SURVEY.md §4); this adds a seeded random-scenario soak over the
REAL engine — continuous arrivals, aborts, penalties, seeds, stop ids,
embeds and tiny pools (constant preemption) — asserting the core
invariants after every step:

- ``num_computed_tokens == num_tokens - 1`` for any running decode row
  (sample-then-compute, CLAUDE.md invariant)
- block refcounts never leak (pool returns to zero when drained)
- every finished request produced <= max_tokens and respected stop ids
"""

import numpy as np
import pytest

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams


def _cfg(num_blocks):
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
            max_position_embeddings=256,
            eos_token_ids=[0],
        ),
        cache=CacheConfig(block_size=4, num_blocks=num_blocks),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_chunk_for_prefill=16,
            max_model_len=96,
            decode_batch_buckets=[4],
            prefill_token_buckets=[8, 16],
            prefill_row_buckets=[1, 4],
        ),
    )


@pytest.mark.parametrize("seed,num_blocks", [(0, 24), (1, 64)])
def test_engine_soak_random_mixed_load(seed, num_blocks):
    rng = np.random.default_rng(seed)
    eng = LLMEngine(_cfg(num_blocks))
    submitted: dict[str, SamplingParams] = {}
    finished: dict[str, object] = {}
    next_id = 0

    def submit():
        nonlocal next_id
        rid = f"s{next_id}"
        next_id += 1
        kind = rng.integers(0, 5)
        sp = SamplingParams(
            temperature=0.0 if kind < 2 else float(rng.uniform(0.5, 1.2)),
            top_k=int(rng.integers(1, 8)) if kind == 2 else -1,
            top_p=float(rng.uniform(0.7, 1.0)) if kind == 3 else 1.0,
            max_tokens=int(rng.integers(1, 20)),
            ignore_eos=bool(rng.integers(0, 2)),
            seed=int(rng.integers(0, 1000)) if kind == 4 else None,
            repetition_penalty=1.3 if kind == 1 else 1.0,
            stop_token_ids=[int(rng.integers(1, 96))]
            if rng.integers(0, 3) == 0
            else None,
        )
        n = int(rng.integers(1, 60))
        eng.add_request(
            prompt_token_ids=[int(x) for x in rng.integers(1, 96, size=n)],
            sampling_params=sp,
            request_id=rid,
        )
        submitted[rid] = sp

    for _ in range(3):
        submit()
    for step in range(220):
        # random arrivals + occasional aborts
        if rng.uniform() < 0.35 and len(submitted) - len(finished) < 10:
            submit()
        if rng.uniform() < 0.08:
            live = [r for r in submitted if r not in finished]
            if live:
                victim = str(rng.choice(live))
                eng.abort_request(victim)
                finished[victim] = "aborted"
        for out in eng.step():
            if out.finished and out.request_id not in finished:
                finished[out.request_id] = out
        # invariant: every running decode row is sample-then-compute
        for req in eng.scheduler.running:
            for s in req.sequences:
                if s.is_finished or s.in_prefill or s.on_hold:
                    continue
                assert s.num_computed_tokens in (
                    s.num_tokens - 1,
                    s.num_tokens,
                ), (s.num_computed_tokens, s.num_tokens)
        if not eng.has_unfinished() and len(finished) == len(submitted):
            if step > 150:
                break

    # drain whatever is left
    for out in eng.generate_all(timeout_s=600):
        finished.setdefault(out.request_id, out)

    assert eng.block_manager.num_used_blocks == 0, "leaked blocks"
    for rid, sp in submitted.items():
        out = finished.get(rid)
        if out is None or out == "aborted":
            continue
        toks = out.outputs[0].token_ids
        assert len(toks) <= sp.max_tokens
        if sp.stop_token_ids:
            # stop id may terminate the output but must not be exceeded
            for t in toks[:-1]:
                assert t not in sp.stop_token_ids


def test_engine_soak_spec_window_host_tier():
    """Cross-feature soak: suffix speculation x sliding-window recycling
    x host-KV tier x prefix cache under a small pool — the interactions
    no targeted test covers. Repetitive prompts keep the proposer firing
    while out-of-window pages recycle mid-generation and evicted pages
    offload to host DRAM."""
    from xllm_tpu.config import SpeculativeConfig

    rng = np.random.default_rng(5)
    cfg = EngineConfig(
        model=ModelConfig(
            model_type="mistral",
            dtype="float32",
            vocab_size=97,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            sliding_window=24,
            max_position_embeddings=256,
            eos_token_ids=[0],
        ),
        cache=CacheConfig(
            block_size=4, num_blocks=40, num_host_blocks=64
        ),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=3,
            max_tokens_per_chunk_for_prefill=16,
            max_model_len=96,
            decode_batch_buckets=[3],
            prefill_token_buckets=[8, 16],
            prefill_row_buckets=[1, 2],
        ),
        speculative=SpeculativeConfig(
            method="suffix", num_speculative_tokens=3
        ),
    )
    eng = LLMEngine(cfg)
    base = [int(x) for x in rng.integers(1, 96, size=8)]
    outs = {}
    for wave in range(3):
        for i in range(3):
            # shared prefix (prefix-cache + host-tier traffic) + a
            # repetitive tail (suffix proposer fires)
            tail = [5, 6, 7, 8] * (2 + i)
            eng.add_request(
                prompt_token_ids=base + tail,
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=30, ignore_eos=True
                ),
                request_id=f"w{wave}-{i}",
            )
        for o in eng.generate_all(timeout_s=600):
            outs[o.request_id] = o.outputs[0].token_ids
    assert eng.block_manager.num_used_blocks == 0
    # same prompt across waves -> identical greedy output regardless of
    # what the caches/recycling did in between
    for i in range(3):
        assert outs[f"w1-{i}"] == outs[f"w0-{i}"]
        assert outs[f"w2-{i}"] == outs[f"w0-{i}"]
        assert len(outs[f"w0-{i}"]) == 30


def test_engine_soak_dp_mesh_random_arrivals_and_aborts():
    """DP soak: random arrivals + aborts on a (data=2, tp=2) mesh with a
    small per-rank pool — exercises per-rank block accounting, rank-major
    row assembly and abort/preemption bookkeeping under load."""
    from xllm_tpu.config import ParallelConfig

    rng = np.random.default_rng(9)
    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3",
            dtype="float32",
            vocab_size=128,  # divisible by tp=2 (embed table shards)
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            qk_norm=True,
            max_position_embeddings=256,
            eos_token_ids=[0],
        ),
        cache=CacheConfig(block_size=4, num_blocks=48),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_chunk_for_prefill=16,
            max_model_len=96,
            decode_batch_buckets=[4],
            prefill_token_buckets=[8, 16],
            prefill_row_buckets=[1, 2],
        ),
        parallel=ParallelConfig(dp_size=2, tp_size=2),
    )
    eng = LLMEngine(cfg)
    live: list[str] = []
    done = 0
    for i in range(14):
        rid = f"d{i}"
        eng.add_request(
            prompt_token_ids=[
                int(x) for x in rng.integers(1, 96, size=int(rng.integers(3, 40)))
            ],
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=int(rng.integers(1, 12)),
                ignore_eos=True,
            ),
            request_id=rid,
        )
        live.append(rid)
        for _ in range(int(rng.integers(1, 4))):
            for out in eng.step():
                if out.finished and out.request_id in live:
                    live.remove(out.request_id)
                    done += 1
        if live and rng.uniform() < 0.25:
            victim = str(rng.choice(live))
            eng.abort_request(victim)
            live.remove(victim)
    for out in eng.generate_all(timeout_s=600):
        done += 1
    assert eng.block_manager.num_used_blocks == 0
    assert done >= 5  # most requests actually completed
