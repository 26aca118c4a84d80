"""Targeted TPU drive: int8 + fp8 weight-only engines generate E2E."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    QuantConfig,
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


def main():
    for attempt in range(8):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"probe fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 31999, size=n).tolist() for n in (60, 100)]

    outs = {}
    for method in ("", "int8", "fp8_e4m3"):
        cfg = EngineConfig(
            model=MODEL,
            cache=CacheConfig(block_size=64, num_blocks=128),
            scheduler=SchedulerConfig(
                max_seqs_per_batch=2, decode_batch_buckets=[2],
                prefill_token_buckets=[128], prefill_row_buckets=[1, 2],
                max_model_len=1024,
            ),
            quant=QuantConfig(method=method),
        )
        eng = LLMEngine(cfg)
        for i, ids in enumerate(prompts):
            eng.add_request(
                prompt_token_ids=ids,
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=12, ignore_eos=True
                ),
                request_id=f"r{i}",
            )
        res = {o.request_id: o for o in eng.generate_all(timeout_s=900)}
        outs[method] = [res[f"r{i}"].outputs[0].token_ids for i in range(2)]
        print(f"{method or 'bf16'}: OK {outs[method][0][:6]}", flush=True)

    # greedy tokens should mostly agree with bf16 early in the rollout
    for method in ("int8", "fp8_e4m3"):
        agree = sum(
            a == b
            for pa, pb in zip(outs[""], outs[method])
            for a, b in zip(pa[:6], pb[:6])
        )
        print(f"{method} first-6 agreement: {agree}/12", flush=True)
    print("QUANT DRIVES PASSED", flush=True)


if __name__ == "__main__":
    main()
