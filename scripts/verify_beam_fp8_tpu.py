"""TPU smoke: beam search + fp8 KV cache + penalties E2E."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

MODEL = ModelConfig(
    model_type="qwen3", vocab_size=32000, hidden_size=1024,
    intermediate_size=2816, num_hidden_layers=8, num_attention_heads=16,
    num_key_value_heads=8, head_dim=128, qk_norm=True,
    max_position_embeddings=1024,
)


def cfg(kv="auto"):
    return EngineConfig(
        model=MODEL,
        cache=CacheConfig(block_size=64, num_blocks=128, kv_cache_dtype=kv),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4, decode_batch_buckets=[4],
            prefill_token_buckets=[128], prefill_row_buckets=[1, 4],
            max_model_len=1024,
        ),
    )


def main():
    for attempt in range(8):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"probe fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)

    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 31999, size=40).tolist()

    # beam search on chip
    eng = LLMEngine(cfg())
    eng.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            use_beam_search=True, n=3, best_of=3, max_tokens=8,
            ignore_eos=True,
        ),
        request_id="beam",
    )
    eng.add_request(
        prompt_token_ids=prompt[:25],
        sampling_params=SamplingParams(
            temperature=0.7, seed=42, repetition_penalty=1.3, max_tokens=8,
            ignore_eos=True,
        ),
        request_id="pen",
    )
    outs = {o.request_id: o for o in eng.generate_all(timeout_s=1200)}
    assert len(outs["beam"].outputs) == 3
    assert all(len(b.token_ids) == 8 for b in outs["beam"].outputs)
    assert len(outs["pen"].outputs[0].token_ids) == 8
    print("beam+penalties: OK", outs["beam"].outputs[0].token_ids[:4],
          flush=True)
    eng.runner.sleep(2)
    del eng

    # fp8 KV on chip
    eng8 = LLMEngine(cfg(kv="fp8_e4m3"))
    eng8.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=10,
                                       ignore_eos=True),
        request_id="fp8kv",
    )
    outs = eng8.generate_all(timeout_s=1200)
    assert len(outs[0].outputs[0].token_ids) == 10
    print("fp8-kv: OK", outs[0].outputs[0].token_ids[:5], flush=True)
    print("BEAM/FP8KV DRIVES PASSED", flush=True)


if __name__ == "__main__":
    main()
