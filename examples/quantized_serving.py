"""INT8 weights + INT8 KV serving — the v5e production quantized config.

fp8 has no fast upcast path on v5e (measured 4x slower than bf16 for
the KV stream, and slower than bf16 for weights), so the 8-bit
deployment is int8 on both axes: XLA fuses the weight dequant into the
matmul stream and the decode kernels read raw int8 KV codes with the
per-head scales folded into q / the attention output (PERF.md).

Run with a real checkpoint directory, or --random for random weights
and integer-token prompts.
"""

import argparse

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    QuantConfig,
)
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.llm import LLM
from xllm_tpu.models.model_args import load_model_config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="", help="HF checkpoint directory")
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--prompts", nargs="*", default=["The capital of"])
    args = ap.parse_args()

    if args.random:
        import jax

        model_cfg = ModelConfig(
            model_type="qwen3",
            dtype="float32" if jax.default_backend() == "cpu" else "bfloat16",
            vocab_size=1024,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=4,
            num_attention_heads=8,
            num_key_value_heads=4,
            head_dim=32 if jax.default_backend() == "cpu" else 128,
            qk_norm=True,
            max_position_embeddings=2048,
        )
    else:
        model_cfg = load_model_config(args.model)

    cfg = EngineConfig(
        model=model_cfg,
        cache=CacheConfig(kv_cache_dtype="int8"),  # int8 paged KV
        quant=QuantConfig(method="int8"),          # int8 weight-only
    )
    llm = LLM(config=cfg)
    sp = SamplingParams(
        temperature=0.0, max_tokens=args.max_tokens, ignore_eos=args.random
    )
    if args.random:
        import numpy as np

        rng = np.random.default_rng(0)
        ids = [
            [int(x) for x in rng.integers(1, 1000, size=16)]
            for _ in range(max(len(args.prompts), 1))
        ]
        outs = llm.generate(prompt_token_ids=ids, sampling_params=sp)
    else:
        outs = llm.generate(args.prompts, sp)
    for out in outs:
        print("---", out.request_id)
        print(out.outputs[0].text or out.outputs[0].token_ids)


if __name__ == "__main__":
    main()
