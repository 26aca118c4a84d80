"""On-chip verify drive for the qwen3_next int8 consumption fix:
build a tiny qwen3_next engine with int8 weight-only quant on the real
TPU, push f32 weights (exercising the catch-all), and check greedy
generation matches the dequantized-weights reference engine."""

import dataclasses

import numpy as np

import jax

from xllm_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, QuantConfig, SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams


def cfg():
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3_next", dtype="float32", vocab_size=128,
            hidden_size=32, intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            partial_rotary_factor=0.25, max_position_embeddings=256,
            full_attention_interval=4, linear_conv_kernel_dim=3,
            linear_key_head_dim=8, linear_num_key_heads=2,
            linear_value_head_dim=8, linear_num_value_heads=4,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
            shared_expert_intermediate_size=32, norm_topk_prob=True,
        ),
        cache=CacheConfig(num_blocks=32, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, max_tokens_per_chunk_for_prefill=16,
            max_model_len=128, decode_batch_buckets=[2],
            prefill_token_buckets=[16],
        ),
    )


def run(eng, prompt):
    eng.add_request(prompt_token_ids=list(prompt),
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=6, ignore_eos=True))
    out = eng.generate_all(timeout_s=600)[0].outputs[0].token_ids
    assert eng.block_manager.num_used_blocks == 0
    return out


def main():
    import jax.numpy as jnp

    base = cfg()
    eng_f = LLMEngine(base)
    host = jax.tree.map(np.asarray, eng_f.runner.params)

    eng_q = LLMEngine(dataclasses.replace(base, quant=QuantConfig(method="int8")))
    eng_q.runner.update_weights(params=host)
    gp = eng_q.runner.params["groups"]
    assert gp["shared_gate_proj_w"].dtype == jnp.int8
    assert "shared_gate_proj_w_scale" in gp

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
    eng_ref = LLMEngine(base)
    eng_ref.runner.update_weights(params=deq)

    prompt = [int(x) for x in
              np.random.default_rng(7).integers(1, 127, size=11)]
    out_q = run(eng_q, prompt)
    out_ref = run(eng_ref, prompt)
    assert out_q == out_ref, (out_q, out_ref)
    print("verify_r5_qnext_int8 OK:", out_q)


if __name__ == "__main__":
    main()
