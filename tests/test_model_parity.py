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
    elif family == "deepseek_v3":
        from transformers import DeepseekV3Config

        cfg = DeepseekV3Config(
            vocab_size=VOCAB,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=256,
            rms_norm_eps=1e-6,
            rope_theta=10000.0,
            rope_scaling=None,
            tie_word_embeddings=False,
            q_lora_rank=32,
            kv_lora_rank=32,
            qk_nope_head_dim=16,
            qk_rope_head_dim=8,
            v_head_dim=16,
            n_routed_experts=8,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            norm_topk_prob=True,
            first_k_dense_replace=1,
            n_shared_experts=1,
            routed_scaling_factor=1.5,
            topk_method="noaux_tc",
            n_group=2,
            topk_group=1,
            scoring_func="sigmoid",
            attention_bias=False,
        )
    elif family == "qwen3_next":
        from transformers import Qwen3NextConfig

        cfg = Qwen3NextConfig(
            vocab_size=VOCAB,
            hidden_size=64,
            intermediate_size=96,
            num_hidden_layers=4,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            partial_rotary_factor=0.25,
            max_position_embeddings=256,
            rms_norm_eps=1e-6,
            rope_theta=10000.0,
            tie_word_embeddings=False,
            full_attention_interval=4,
            linear_conv_kernel_dim=3,
            linear_key_head_dim=8,
            linear_num_key_heads=2,
            linear_value_head_dim=8,
            linear_num_value_heads=4,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            shared_expert_intermediate_size=48,
            norm_topk_prob=True,
            decoder_sparse_step=1,
            mlp_only_layers=[],
        )
    elif family == "glm4":
        from transformers import Glm4Config

        cfg = Glm4Config(**common, head_dim=16, partial_rotary_factor=0.5,
                         attention_bias=True, pad_token_id=0)
    elif family == "glm4_moe":
        from transformers import Glm4MoeConfig

        cfg = Glm4MoeConfig(
            **common,
            head_dim=16,
            partial_rotary_factor=0.5,
            attention_bias=True,
            use_qk_norm=True,
            n_routed_experts=8,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            n_shared_experts=1,
            routed_scaling_factor=1.5,
            n_group=2,
            topk_group=1,
            first_k_dense_replace=1,
            norm_topk_prob=True,
            pad_token_id=0,
        )
    else:
        raise ValueError(family)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg)
    model = model.eval().to(torch.float32)
    if family in ("deepseek_v3", "glm4_moe"):
        # exercise a NON-zero e_score_correction_bias (kimi-k2 routing)
        with torch.no_grad():
            for layer in model.model.layers:
                gate = getattr(layer.mlp, "gate", None)
                if gate is not None and hasattr(
                    gate, "e_score_correction_bias"
                ):
                    gate.e_score_correction_bias.add_(
                        torch.randn_like(gate.e_score_correction_bias) * 0.5
                    )
    path = tmp_path / family
    model.save_pretrained(path, safe_serialization=True)
    return model, str(path)


@pytest.mark.parametrize(
    "family",
    ["qwen2", "qwen3", "llama", "qwen3_moe", "deepseek_v2", "deepseek_v3",
     "glm4", "glm4_moe", "qwen3_next"],
)
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
    assert mc.model_type == ("deepseek_v2" if family.startswith("deepseek") else family)
    if family == "qwen3_next":
        # the logits-grab block below drives the single-seq prefill path,
        # which hybrid models do not expose; greedy equality covers parity
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
        ours = engine.generate_all(timeout_s=300)[0].outputs[0].token_ids
        assert ours == hf_tokens, f"{family}: {ours} vs {hf_tokens}"
        return
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


def test_yarn_rope_matches_hf():
    """YaRN inv_freq + attention factor vs HF's _compute_yarn_parameters
    (reference rotary_embedding yarn path)."""
    import numpy as np
    import pytest

    try:
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    except Exception:
        pytest.skip("no transformers rope utils")
    import types

    from xllm_tpu.ops.rope import rope_inv_freq, rope_mscale

    head_dim, theta = 64, 10000.0
    scaling = {
        "rope_type": "yarn",
        "factor": 8.0,
        "beta_fast": 32.0,
        "beta_slow": 1.0,
        "original_max_position_embeddings": 4096,
    }
    hf_cfg = types.SimpleNamespace(
        rope_theta=theta,
        head_dim=head_dim,
        hidden_size=head_dim * 4,
        num_attention_heads=4,
        partial_rotary_factor=1.0,
        max_position_embeddings=32768,
        rope_scaling=dict(scaling),
    )
    want, want_att = ROPE_INIT_FUNCTIONS["yarn"](hf_cfg, device=None)
    got = np.asarray(rope_inv_freq(head_dim, theta, scaling))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)
    # no explicit attention_factor: HF default 0.1*ln(factor)+1
    np.testing.assert_allclose(rope_mscale(scaling), want_att, rtol=1e-6)

    # deepseek two-knob convention: all-in-one softmax factor m1
    ds = dict(scaling, mscale=1.0, mscale_all_dim=1.0)
    import math

    assert rope_mscale(ds) == pytest.approx(0.1 * math.log(8.0) + 1.0)
