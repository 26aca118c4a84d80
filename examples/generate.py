"""Offline batch generation (reference examples/generate.py).

Runs with a real HF checkpoint directory, or --random for random weights
and integer-token prompts (no checkpoint needed).
"""

import argparse

from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.llm import LLM


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="", help="HF checkpoint directory")
    ap.add_argument(
        "--random", action="store_true",
        help="random weights + integer-token prompts (no checkpoint)",
    )
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--prompts", nargs="*", default=["Hello, my name is"])
    args = ap.parse_args()

    sp = SamplingParams(
        temperature=args.temperature, max_tokens=args.max_tokens,
        ignore_eos=args.random,
    )
    if args.random:
        import jax
        import numpy as np

        from xllm_tpu.config import EngineConfig, ModelConfig

        # small random model; CPU XLA lacks bf16 dots, so pick f32 there
        cfg = EngineConfig(
            model=ModelConfig(
                model_type="qwen3",
                dtype="float32"
                if jax.default_backend() == "cpu"
                else "bfloat16",
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
        )
        llm = LLM(config=cfg)
        rng = np.random.default_rng(0)
        vocab = llm.engine.config.model.vocab_size
        ids = [
            [int(x) for x in rng.integers(1, vocab - 1, size=16)]
            for _ in range(max(len(args.prompts), 1))
        ]
        for out in llm.generate(prompt_token_ids=ids, sampling_params=sp):
            print(f"--- {out.request_id}")
            print(out.outputs[0].token_ids)
        return

    llm = LLM(args.model)
    for out in llm.generate(args.prompts, sp):
        print(f"--- {out.request_id}")
        print(out.outputs[0].text)


if __name__ == "__main__":
    main()
