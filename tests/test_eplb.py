"""EPLB: policy balance + output invariance under expert re-placement."""

import numpy as np

from xllm_tpu.framework.eplb import EplbManager, imbalance, rebalance_greedy


def test_rebalance_greedy_balances_skewed_load():
    # contiguous identity puts the two heaviest together on device 0
    loads = np.array([50, 45, 40, 35, 5, 4, 3, 2], np.float64)
    before = imbalance(loads, np.arange(8), num_devices=4)
    placement = rebalance_greedy(loads, num_devices=4)
    after = imbalance(loads, placement, num_devices=4)
    assert sorted(placement.tolist()) == list(range(8))  # a permutation
    assert after < before
    assert after < 1.2  # LPT pairs heavy with light: near-even
    # the two heaviest experts must land on different devices
    dev_of = {int(e): i // 2 for i, e in enumerate(placement)}
    assert dev_of[0] != dev_of[1]


def test_manager_rebalance_cycle():
    m = EplbManager(num_layers=2, num_experts=4, num_devices=2,
                    rebalance_interval=3, threshold=1.1)
    skew = np.array([[10, 0, 0, 0], [0, 10, 0, 0]], np.int64)
    for _ in range(3):
        m.record(skew)
    assert m.should_rebalance()
    placement = m.compute_placement()
    assert placement.shape == (2, 4)
    assert m.rebalances == 1 and m.steps == 0
    assert not m.should_rebalance()  # window reset


def test_engine_output_invariant_under_placement():
    """Greedy output is identical after shuffling expert weights (EPLB)."""
    from xllm_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3_moe", dtype="float32",
            vocab_size=128, hidden_size=32, intermediate_size=0,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, qk_norm=True, max_position_embeddings=64,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
            norm_topk_prob=True,
        ),
        cache=CacheConfig(block_size=16, num_blocks=16),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, decode_batch_buckets=[2],
            prefill_token_buckets=[16], max_model_len=64,
        ),
    )
    eng = LLMEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    prompt = [3, 5, 7, 9]
    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    out1 = eng.generate_all()[0].outputs[0].token_ids

    # shuffle experts with a non-trivial placement on both layers
    rng = np.random.default_rng(0)
    placement = np.stack([rng.permutation(4), rng.permutation(4)]).astype(
        np.int32
    )
    eng.runner.apply_expert_placement(placement)
    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    out2 = eng.generate_all()[0].outputs[0].token_ids
    assert out1 == out2, (out1, out2)
