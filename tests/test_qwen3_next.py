"""Qwen3-Next hybrid (GDN linear attention + full attention) engine tests.

Counterpart of the reference's qwen3-next support
(reference xllm/models/llm/qwen3_next.h + GDN kernel family): the HF
greedy parity test lives in test_model_parity; here the engine-level
state machinery is exercised — chunk-resumed prefill, multi-sequence
batches, preemption recompute, and the unsupported-path guards.
"""

import numpy as np
import pytest

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams


def _cfg(num_blocks=32, chunk=16, max_seqs=4):
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3_next",
            dtype="float32",
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            partial_rotary_factor=0.25,
            max_position_embeddings=256,
            full_attention_interval=4,
            linear_conv_kernel_dim=3,
            linear_key_head_dim=8,
            linear_num_key_heads=2,
            linear_value_head_dim=8,
            linear_num_value_heads=4,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=16,
            shared_expert_intermediate_size=32,
            norm_topk_prob=True,
        ),
        cache=CacheConfig(num_blocks=num_blocks, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=max_seqs,
            max_tokens_per_chunk_for_prefill=chunk,
            max_model_len=128,
            decode_batch_buckets=[max_seqs],
            prefill_token_buckets=[chunk],
        ),
    )


def _greedy(eng, prompt, n=8, request_id=None):
    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=n, ignore_eos=True
        ),
        request_id=request_id,
    )


def test_chunked_prefill_equals_single_shot():
    """A prompt longer than the chunk budget must produce the same greedy
    continuation as one processed in a single chunk — proves the GDN
    conv-tail + recurrent-state carry across prefill chunks."""
    rng = np.random.default_rng(0)
    prompt = [int(x) for x in rng.integers(1, 127, size=37)]

    outs = []
    for chunk in (16, 48):
        eng = LLMEngine(_cfg(chunk=chunk, num_blocks=64))
        _greedy(eng, prompt, request_id="r")
        outs.append(eng.generate_all()[0].outputs[0].token_ids)
        assert eng.block_manager.num_used_blocks == 0
    assert outs[0] == outs[1]


def test_batched_rows_isolated():
    """Two sequences in one batch keep independent linear-attention state:
    each must match its solo run."""
    rng = np.random.default_rng(1)
    p1 = [int(x) for x in rng.integers(1, 127, size=9)]
    p2 = [int(x) for x in rng.integers(1, 127, size=14)]

    solo = []
    for p in (p1, p2):
        eng = LLMEngine(_cfg())
        _greedy(eng, p, request_id="s")
        solo.append(eng.generate_all()[0].outputs[0].token_ids)

    eng = LLMEngine(_cfg())
    _greedy(eng, p1, request_id="a")
    _greedy(eng, p2, request_id="b")
    outs = {o.request_id: o.outputs[0].token_ids
            for o in eng.generate_all()}
    assert outs["a"] == solo[0]
    assert outs["b"] == solo[1]


def test_preemption_recompute_restores_state():
    """With a tiny block pool one sequence gets preempted (RECOMPUTE) and
    must still finish with the same tokens as an uncontended run."""
    rng = np.random.default_rng(2)
    p1 = [int(x) for x in rng.integers(1, 127, size=16)]
    p2 = [int(x) for x in rng.integers(1, 127, size=16)]

    eng = LLMEngine(_cfg(num_blocks=64))
    _greedy(eng, p1, n=12, request_id="a")
    want = eng.generate_all()[0].outputs[0].token_ids

    eng = LLMEngine(_cfg(num_blocks=9, max_seqs=2))
    _greedy(eng, p1, n=12, request_id="a")
    _greedy(eng, p2, n=12, request_id="b")
    outs = {o.request_id: o for o in eng.generate_all(timeout_s=600)}
    assert outs["a"].outputs[0].token_ids == want
    assert len(outs["b"].outputs[0].token_ids) == 12
    assert eng.block_manager.num_used_blocks == 0


def test_hybrid_guards():
    cfg = _cfg()
    cfg.speculative = SpeculativeConfig(method="suffix")
    with pytest.raises(NotImplementedError, match="hybrid"):
        LLMEngine(cfg)

    eng = LLMEngine(_cfg())
    assert eng.config.cache.enable_prefix_cache is False
    with pytest.raises(ValueError, match="beam"):
        eng.add_request(
            prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                use_beam_search=True, best_of=2, max_tokens=4
            ),
        )


def test_int8_weights_consumed_by_forward():
    """Regression (r5): the quant catch-all
    (runtime/model_runner._quantize_params) quantizes qwen3_next's
    raw-dot MLP stacks (shared_gate/up/down_proj_w); the forward must
    fold the per-channel scales back (Qwen3NextModel._mlp_dot) — a
    codes-only dot emits garbage logits. Greedy outputs of the int8
    engine must match an f32 engine loaded with the SAME
    quantize->dequantize round-tripped weights."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from xllm_tpu.config import QuantConfig

    cfg = _cfg()
    eng_f = LLMEngine(cfg)
    host = jax.tree.map(np.asarray, eng_f.runner.params)

    eng_q = LLMEngine(dataclasses.replace(cfg, quant=QuantConfig(method="int8")))
    eng_q.runner.update_weights(params=host)
    gp = eng_q.runner.params["groups"]
    assert gp["shared_gate_proj_w"].dtype == jnp.int8
    assert "shared_gate_proj_w_scale" in gp
    # int8 leaves routed expert stacks and the router full precision
    assert gp["experts_gate_up"].dtype == jnp.float32
    assert gp["router_w"].dtype == jnp.float32

    # host mirror of ops/quant.quantize_int8 (f32 arithmetic, same
    # round-half-to-even), round-tripped back to floats
    def rt(w):
        w32 = w.astype(np.float32)
        s = np.maximum(np.abs(w32).max(axis=-2) / np.float32(127.0),
                       np.float32(1e-8))
        q = np.clip(np.round(w32 / s[..., None, :]), -127, 127)
        return (q.astype(np.float32) * s[..., None, :]).astype(w.dtype)

    deq = dict(host)
    deq["groups"] = {
        k: (rt(w) if k.endswith("_proj_w") else w)
        for k, w in host["groups"].items()
    }
    eng_ref = LLMEngine(cfg)
    eng_ref.runner.update_weights(params=deq)

    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 127, size=11)]
    outs = []
    for eng in (eng_q, eng_ref):
        _greedy(eng, prompt, n=6, request_id="q")
        outs.append(eng.generate_all()[0].outputs[0].token_ids)
        assert eng.block_manager.num_used_blocks == 0
    assert outs[0] == outs[1], outs
