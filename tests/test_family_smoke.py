"""Engine smoke matrix: EVERY registered text family boots a tiny random
config and survives chunked prefill + decode + preemption pressure.

Parity tests pin exact behavior per family; this matrix catches
integration regressions (loader/registry/config drift) across the whole
registry at once — the reference's per-family registration tests play
this role (model_registry.h:150-247)."""

import numpy as np
import pytest

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

_COMMON = dict(
    dtype="float32", vocab_size=128, hidden_size=64, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, max_position_embeddings=256, eos_token_ids=[0],
)
_MLA = dict(
    _COMMON, num_key_value_heads=4, q_lora_rank=48, kv_lora_rank=32,
    qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
)
_MOE = dict(
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
)

FAMILIES = {
    "llama": dict(_COMMON),
    "mistral": dict(_COMMON, sliding_window=24),
    "qwen2": dict(_COMMON, attention_bias=True),
    "qwen3": dict(_COMMON, qk_norm=True),
    "glm4": dict(_COMMON, use_sandwich_norms=True, attention_bias=True,
                 partial_rotary_factor=0.5, rope_interleaved=True),
    "qwen3_moe": dict(_COMMON, qk_norm=True, **_MOE),
    "glm4_moe": dict(_COMMON, qk_norm=True, partial_rotary_factor=0.5,
                     scoring_func="sigmoid", first_k_dense_replace=1,
                     n_shared_experts=1, **_MOE),
    "minimax_m2": dict(_COMMON, qk_norm=True, partial_rotary_factor=0.5,
                       scoring_func="sigmoid", **_MOE),
    "mimo": dict(_COMMON, attention_bias=True),
    "deepseek_v2": dict(_MLA),
    "deepseek_v3": dict(_MLA, **_MOE, first_k_dense_replace=1,
                        n_shared_experts=1, scoring_func="sigmoid",
                        n_group=2, topk_group=1),
    "kimi_k2": dict(_MLA, **_MOE, first_k_dense_replace=1,
                    scoring_func="sigmoid", n_group=2, topk_group=1),
    "deepseek_v32": dict(_MLA, index_topk=24, index_n_heads=4,
                         index_head_dim=16),
    "glm_moe_dsa": dict(_MLA, index_topk=24, index_n_heads=4,
                        index_head_dim=16),
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_family_boots_and_survives_preemption(family):
    mc = ModelConfig(model_type=family, **FAMILIES[family])
    eng = LLMEngine(EngineConfig(
        model=mc,
        # tiny pool: 2+ long requests force RECOMPUTE preemption
        cache=CacheConfig(block_size=8, num_blocks=24,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=3, max_tokens_per_chunk_for_prefill=24,
            max_model_len=160, decode_batch_buckets=[3],
            prefill_token_buckets=[8, 24],
        ),
    ))
    rng = np.random.default_rng(hash(family) % 2**32)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    for i in range(3):
        eng.add_request(
            prompt_token_ids=[int(x) for x in rng.integers(1, 120, 40 + i)],
            sampling_params=sp, request_id=f"{family}-{i}",
        )
    outs = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
    assert len(outs) == 3
    for o in outs.values():
        assert len(o.outputs[0].token_ids) == 24
    assert eng.block_manager.num_used_blocks == 0
