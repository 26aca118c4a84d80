"""E2E drive on the real TPU chip (verify-skill recipe).

Exercises: batched prefill (pallas path), decode, batched speculative
verify, mixed greedy/sampling, edge-case rejections, preemption, and the
block-leak check. Random weights, integer-token prompts.
"""

import numpy as np

import jax  # noqa: F401  (default backend: real TPU)

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

MODEL = ModelConfig(
    model_type="qwen3", vocab_size=32000, hidden_size=1024,
    intermediate_size=2816, num_hidden_layers=8, num_attention_heads=16,
    num_key_value_heads=8, head_dim=128, qk_norm=True,
    max_position_embeddings=2048,
)


def drive(cfg, prompts, sps, tag):
    eng = LLMEngine(cfg)
    for ids, sp in zip(prompts, sps):
        eng.add_request(prompt_token_ids=ids, sampling_params=sp)
    outs = eng.generate_all(timeout_s=1200)
    assert len(outs) == len(prompts), f"{tag}: {len(outs)} != {len(prompts)}"
    for o in outs:
        assert o.finished
        assert len(o.outputs[0].token_ids) >= 1, f"{tag}: empty output"
    assert eng.block_manager.num_used_blocks == 0, f"{tag}: block leak"
    print(f"{tag}: OK ({len(outs)} requests)", flush=True)
    return eng, outs


def main():
    rng = np.random.default_rng(0)
    cfg = EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=64, num_blocks=256),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=8, decode_batch_buckets=[8],
            prefill_token_buckets=[128, 512], prefill_row_buckets=[1, 8],
            max_model_len=2048,
        ),
    )
    # mixed greedy/sampling, varying prompt lengths (chunk grouping)
    prompts = [
        rng.integers(1, 31999, size=n).tolist()
        for n in (100, 17, 300, 64, 129, 5, 250, 90)
    ]
    sps = [
        SamplingParams(temperature=0.0 if i % 2 == 0 else 0.8,
                       top_p=0.9, max_tokens=24, ignore_eos=True)
        for i in range(8)
    ]
    eng, outs = drive(cfg, prompts, sps, "mixed-batch")

    # edge cases on the live engine
    try:
        eng.add_request(prompt_token_ids=rng.integers(1, 31999, 2100).tolist(),
                        sampling_params=SamplingParams(max_tokens=4))
        raise AssertionError("overlong prompt accepted")
    except ValueError:
        pass
    try:
        eng.add_request(prompt_token_ids=[],
                        sampling_params=SamplingParams(max_tokens=4))
        raise AssertionError("empty prompt accepted")
    except ValueError:
        pass
    # engine stays healthy after rejections; exactly-full request
    full = 2048 - 9
    eng.add_request(prompt_token_ids=rng.integers(1, 31999, full).tolist(),
                    sampling_params=SamplingParams(max_tokens=8,
                                                   ignore_eos=True))
    outs = eng.generate_all(timeout_s=1200)
    assert outs and outs[0].finished
    assert eng.block_manager.num_used_blocks == 0, "post-edge block leak"
    print("edge-cases: OK", flush=True)

    # speculative (suffix) path -> batched verify on TPU
    cfg_spec = EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=64, num_blocks=256),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4, decode_batch_buckets=[4],
            prefill_token_buckets=[128], prefill_row_buckets=[1, 4],
            max_model_len=2048,
        ),
        speculative=SpeculativeConfig(method="suffix",
                                      num_speculative_tokens=3),
    )
    base = rng.integers(1, 31999, size=24).tolist()
    rep = (base * 4)[:90]  # repetitive prompt -> suffix drafts fire
    drive(cfg_spec, [rep, rep[:60]],
          [SamplingParams(temperature=0.0, max_tokens=32, ignore_eos=True)] * 2,
          "spec-suffix")

    # preemption under a tiny pool
    cfg_tiny = EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=64, num_blocks=8,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, decode_batch_buckets=[2],
            prefill_token_buckets=[128], prefill_row_buckets=[1, 2],
            max_model_len=384,
        ),
    )
    drive(cfg_tiny,
          [rng.integers(1, 31999, 120).tolist() for _ in range(2)],
          [SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)] * 2,
          "preemption")

    print("ALL VERIFY DRIVES PASSED", flush=True)


if __name__ == "__main__":
    main()
