"""r4 verify drive on the real chip (.claude/skills/verify recipe).

Exercises the round-4 changes on hardware before the bench: v9t4 decode
default, the incremental DecodeStepCache, numpy key-data sampling, the
single-pass scheduler, and gated prefix-cache registration — one small
engine E2E with mixed sampling + a leak check.
"""

import time

import numpy as np

import jax

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

cfg = EngineConfig(
    model=ModelConfig(
        model_type="qwen3", vocab_size=32000, hidden_size=1024,
        intermediate_size=2816, num_hidden_layers=8,
        num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, qk_norm=True, max_position_embeddings=2048,
    ),
    cache=CacheConfig(block_size=64, num_blocks=256),
    scheduler=SchedulerConfig(
        max_seqs_per_batch=8,
        decode_batch_buckets=[8],
        prefill_token_buckets=[128, 512],
        prefill_row_buckets=[1, 4],
        max_tokens_per_chunk_for_prefill=512,
        max_model_len=2048,
    ),
)
t0 = time.time()
eng = LLMEngine(cfg)
rng = np.random.default_rng(0)
for i in range(8):
    sp = SamplingParams(
        temperature=0.0 if i % 2 == 0 else 0.7,
        seed=11 if i == 5 else None,
        max_tokens=32, ignore_eos=True,
    )
    eng.add_request(
        prompt_token_ids=rng.integers(1, 31999, size=128).tolist(),
        sampling_params=sp, request_id=f"v{i}",
    )
outs = eng.generate_all(timeout_s=1200)
lens = sorted((o.request_id, len(o.outputs[0].token_ids)) for o in outs)
print("## outputs:", lens, flush=True)
assert all(n == 32 for _, n in lens), lens
assert eng.block_manager.num_used_blocks == 0, "block leak"
toks = [o.outputs[0].token_ids for o in outs]
assert all(0 <= t < 32000 for ts in toks for t in ts)
print(f"## TPU VERIFY DRIVE OK ({time.time()-t0:.0f}s)", flush=True)
