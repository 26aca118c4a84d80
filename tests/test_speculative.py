"""Speculative decoding: proposer, rejection sampler, engine equivalence.

Mirrors the reference's spec tests (tests/core/framework/sampling/
rejection_sampler_test.cpp, tests/core/util/suffix_decoding_cache_test.cpp,
spec_input_builder_test.cpp — SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig, SpeculativeConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.framework.suffix_cache import SuffixProposer
from xllm_tpu.runtime.rejection_sampler import rejection_sample


def test_suffix_proposer_repeating_pattern():
    prop = SuffixProposer(min_match=2, max_match=4)
    # "1 2 3 4 1 2 3 4 1 2" -> suffix [1, 2] matched at pos 6 -> draft [3, 4, 1]
    toks = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2]
    prop.extend(toks, len(toks))
    draft = prop.propose(toks, 3)
    assert draft == [3, 4, 1]


def test_suffix_proposer_no_match():
    prop = SuffixProposer()
    toks = [1, 2, 3, 4, 5, 6]
    prop.extend(toks, len(toks))
    assert prop.propose(toks, 3) == []


def test_rejection_sampler_greedy_accept_all():
    v = 16
    drafts = jnp.asarray([[3, 5]], jnp.int32)
    logits = jnp.full((1, 3, v), -10.0)
    # target argmax matches drafts at pos 0,1; bonus = 7
    logits = logits.at[0, 0, 3].set(10.0).at[0, 1, 5].set(10.0).at[0, 2, 7].set(10.0)
    toks, n = rejection_sample(
        drafts, jnp.asarray([2], jnp.int32), logits,
        jnp.zeros(1, jnp.float32), jax.random.key(0),
    )
    assert int(n[0]) == 3
    assert list(np.asarray(toks[0])) == [3, 5, 7]


def test_rejection_sampler_greedy_reject_first():
    v = 16
    drafts = jnp.asarray([[3, 5]], jnp.int32)
    logits = jnp.full((1, 3, v), -10.0)
    logits = logits.at[0, 0, 9].set(10.0)  # target disagrees at pos 0
    toks, n = rejection_sample(
        drafts, jnp.asarray([2], jnp.int32), logits,
        jnp.zeros(1, jnp.float32), jax.random.key(0),
    )
    assert int(n[0]) == 1
    assert int(toks[0, 0]) == 9  # target's own token replaces the draft


def test_rejection_sampler_partial_accept():
    v = 16
    drafts = jnp.asarray([[3, 5, 2]], jnp.int32)
    logits = jnp.full((1, 4, v), -10.0)
    logits = (
        logits.at[0, 0, 3].set(10.0)  # accept 3
        .at[0, 1, 8].set(10.0)  # reject 5 -> emit 8
        .at[0, 2, 2].set(10.0)
        .at[0, 3, 1].set(10.0)
    )
    toks, n = rejection_sample(
        drafts, jnp.asarray([3], jnp.int32), logits,
        jnp.zeros(1, jnp.float32), jax.random.key(0),
    )
    assert int(n[0]) == 2
    assert list(np.asarray(toks[0, :2])) == [3, 8]


def _engine(spec: bool) -> LLMEngine:
    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3", dtype="float32",
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, qk_norm=True, max_position_embeddings=128,
        ),
        cache=CacheConfig(block_size=16, num_blocks=32),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, decode_batch_buckets=[2],
            prefill_token_buckets=[32], max_model_len=128,
        ),
        speculative=SpeculativeConfig(
            method="suffix" if spec else "", num_speculative_tokens=3
        ),
        seed=7,
    )
    return LLMEngine(cfg)


def test_spec_engine_matches_plain_greedy():
    """Greedy output with suffix speculation == plain greedy output."""
    # a repetitive prompt so the ngram proposer actually fires
    prompt = [5, 6, 7, 8, 5, 6, 7, 8, 5, 6, 7, 8]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    outs = {}
    for spec in (False, True):
        eng = _engine(spec)
        eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
        ro = eng.generate_all()[0]
        outs[spec] = ro.outputs[0].token_ids
        assert eng.block_manager.num_used_blocks == 0
    assert outs[True] == outs[False], (outs[True], outs[False])
    assert len(outs[True]) == 24


def test_spec_verify_batches_beyond_largest_row_bucket():
    """Regression: the batched verify dispatch was bounded only by
    max_seqs_per_batch while next_bucket silently clamped to the largest
    prefill row bucket — with more drafted sequences than that bucket,
    rows overflowed (IndexError single-device; silent KV corruption into
    the next rank's shard under DP). The engine must chunk dispatches."""
    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3", dtype="float32",
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, qk_norm=True, max_position_embeddings=128,
        ),
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=6, decode_batch_buckets=[6],
            prefill_token_buckets=[32], prefill_row_buckets=[1, 2],
            max_model_len=128,
        ),
        speculative=SpeculativeConfig(
            method="suffix", num_speculative_tokens=3
        ),
        seed=7,
    )
    eng = LLMEngine(cfg)
    # 5 repetitive prompts -> all five draft in the same step; the
    # largest verify-row bucket is 2, so verification needs 3 dispatches
    prompt = [5, 6, 7, 8, 5, 6, 7, 8, 5, 6, 7, 8]
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    for i in range(5):
        eng.add_request(
            prompt_token_ids=list(prompt), sampling_params=sp,
            request_id=f"s{i}",
        )
    outs = eng.generate_all(timeout_s=600)
    assert len(outs) == 5
    tok0 = outs[0].outputs[0].token_ids
    assert len(tok0) == 16
    for o in outs[1:]:  # identical prompts -> identical greedy tokens
        assert o.outputs[0].token_ids == tok0
    assert eng.block_manager.num_used_blocks == 0
