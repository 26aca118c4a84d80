"""Packed decode dispatch == unpacked pytree dispatch, token for token.

The packed path collapses ~18 per-step host->device transfers into one
int32 + one f32 buffer (each transfer pays tunnel dispatch overhead,
PERF.md r4); the unpack is static slices inside the jit. This guards
the buffer layout against drift between the packer (run_decode) and
_unpack_decode.
"""

import numpy as np
import pytest

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

MODEL = ModelConfig(
    model_type="qwen3",
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=32,
    qk_norm=True,
    tie_word_embeddings=True,
    dtype="float32",
    max_position_embeddings=256,
)


def _run(monkeypatch, packed: bool):
    monkeypatch.setenv("XLLM_PACKED_DISPATCH", "1" if packed else "0")
    cfg = EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=16, num_blocks=64,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_batch=256,
            max_tokens_per_chunk_for_prefill=64,
            max_model_len=128,
            decode_batch_buckets=[4],
            prefill_token_buckets=[64],
            prefill_row_buckets=[1, 4],
        ),
        parallel=ParallelConfig(),
    )
    eng = LLMEngine(config=cfg, tokenizer=None)
    assert eng.runner._packed_dispatch == packed
    rng = np.random.default_rng(11)
    for i in range(3):
        # mixed greedy / seeded-sampled / penalized rows cover every
        # packed sampling field
        sp = SamplingParams(
            temperature=0.0 if i == 0 else 0.9,
            seed=5 if i == 1 else None,
            repetition_penalty=1.2 if i == 2 else 1.0,
            max_tokens=10, ignore_eos=True,
        )
        eng.add_request(
            prompt_token_ids=rng.integers(1, 500, size=20).tolist(),
            sampling_params=sp, request_id=f"r{i}",
        )
    outs = eng.generate_all(timeout_s=300)
    return {o.request_id: list(o.outputs[0].token_ids) for o in outs}


def test_packed_matches_unpacked(monkeypatch):
    a = _run(monkeypatch, packed=True)
    b = _run(monkeypatch, packed=False)
    assert a == b
