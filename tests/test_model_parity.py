"""Numerical parity vs HuggingFace transformers (torch CPU oracle).

The reference validates kernels/layers against torch reference impls on
device (SURVEY.md §4, e.g. tests/core/layers/mlu/deepseek_v2_decoder_layer_test.cpp);
here we validate the whole model: tiny random-weight checkpoints are saved
through HF and reloaded through our safetensors loader, then logits and
greedy generations must match.
"""

import numpy as np
import pytest

from xllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.models.model_args import load_model_config

VOCAB = 99


def _tiny_hf_model(tmp_path, family):
    import torch
    from transformers import AutoModelForCausalLM

    common = dict(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    if family == "qwen2":
        from transformers import Qwen2Config

        cfg = Qwen2Config(**common)
    elif family == "qwen3":
        from transformers import Qwen3Config

        cfg = Qwen3Config(**common, head_dim=16)
    elif family == "llama":
        from transformers import LlamaConfig

        cfg = LlamaConfig(**common)
    elif family == "qwen3_moe":
        from transformers import Qwen3MoeConfig

        cfg = Qwen3MoeConfig(
            **common,
            head_dim=16,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            norm_topk_prob=True,
            decoder_sparse_step=1,
            mlp_only_layers=[],
        )
    elif family == "deepseek_v2":
        from transformers import DeepseekV2Config

        cfg = DeepseekV2Config(
            vocab_size=VOCAB,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=256,
            rms_norm_eps=1e-6,
            rope_theta=10000.0,
            tie_word_embeddings=False,
            q_lora_rank=32,
            kv_lora_rank=32,
            qk_nope_head_dim=16,
            qk_rope_head_dim=8,
            v_head_dim=16,
            n_routed_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            norm_topk_prob=False,  # HF v2 gate never renormalizes topk
            first_k_dense_replace=1,
            n_shared_experts=1,
            routed_scaling_factor=1.0,
            topk_method="greedy",
            n_group=1,
            topk_group=1,
            scoring_func="softmax",
            attention_bias=False,
        )
    elif family == "glm4":
        from transformers import Glm4Config

        cfg = Glm4Config(**common, head_dim=16, partial_rotary_factor=0.5,
                         attention_bias=True, pad_token_id=0)
    else:
        raise ValueError(family)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg)
    model = model.eval().to(torch.float32)
    path = tmp_path / family
    model.save_pretrained(path, safe_serialization=True)
    return model, str(path)


@pytest.mark.parametrize("family", ["qwen2", "qwen3", "llama", "qwen3_moe", "deepseek_v2", "glm4"])
def test_logits_and_greedy_match_hf(tmp_path, family):
    import torch

    hf_model, path = _tiny_hf_model(tmp_path, family)
    rng = np.random.default_rng(42)
    prompt = [int(x) for x in rng.integers(1, VOCAB, size=11)]

    # --- HF greedy continuation ---
    with torch.no_grad():
        ids = torch.tensor([prompt])
        hf_logits = hf_model(ids).logits[0, -1].numpy()
        gen = hf_model.generate(
            ids, max_new_tokens=6, do_sample=False, num_beams=1,
            pad_token_id=0, eos_token_id=None,
        )
        hf_tokens = gen[0, len(prompt):].tolist()

    # --- ours ---
    mc = load_model_config(path)
    assert mc.model_type == family
    mc.dtype = "float32"
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=4, num_blocks=32),
        scheduler=SchedulerConfig(
            max_model_len=256,
            decode_batch_buckets=[2],
            prefill_token_buckets=[16],
        ),
    )
    engine = LLMEngine(cfg, tokenizer=None)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    engine.add_request(prompt_token_ids=prompt, sampling_params=sp)
    outs = engine.generate_all(timeout_s=300)
    ours = outs[0].outputs[0].token_ids

    assert ours == hf_tokens, f"{family}: greedy mismatch {ours} vs {hf_tokens}"

    # logits parity on the last prompt position (first sampled token comes
    # from these logits; compare distributions too)
    # re-run prefill-only through a fresh engine to grab logits
    import jax
    from xllm_tpu.runtime.input_builder import build_prefill_input
    from xllm_tpu.framework.request import Sequence, StoppingChecker

    runner = engine.runner
    seq = Sequence(prompt, sp, StoppingChecker(6, 256))
    assert engine.block_manager.allocate(seq, len(prompt))
    inp, _ = build_prefill_input(seq, len(prompt), 4, [16], runner.max_blocks_per_seq)
    hidden, k, v = jax.jit(runner.model.prefill)(
        runner.params, runner.k_cache, runner.v_cache, inp
    )
    our_logits = np.asarray(runner.model.compute_logits(runner.params, hidden))[0]
    np.testing.assert_allclose(our_logits, hf_logits, rtol=2e-4, atol=2e-4)
