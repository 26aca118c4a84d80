"""Suffix-speculative decoding with the cross-request global cache.

Model-free drafting: each sequence's n-gram index proposes
continuations from its own history, and on a miss the GLOBAL cache
drafts from earlier FINISHED generations (reference SuffixDecodingCache
global tree, suffix_tree.h:129) — repeated/templated prompts accept
near-complete drafts, multiplying tokens per verify step.

Run with a real checkpoint, or --random for a synthetic demo that
submits the same prompts twice (the second pass drafts from the
first's outputs).
"""

import argparse
import time

from xllm_tpu.config import (
    EngineConfig,
    ModelConfig,
    SpeculativeConfig,
)
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.llm import LLM
from xllm_tpu.models.model_args import load_model_config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="", help="HF checkpoint directory")
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--k", type=int, default=4, help="draft tokens/step")
    ap.add_argument("--max-tokens", type=int, default=48)
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
        speculative=SpeculativeConfig(
            method="suffix", num_speculative_tokens=args.k
        ),
    )
    llm = LLM(config=cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=args.max_tokens,
                        ignore_eos=args.random)

    import numpy as np

    rng = np.random.default_rng(0)
    ids = [
        [int(x) for x in rng.integers(1, 1000, size=32)] for _ in range(4)
    ]

    def run(tag):
        t0 = time.perf_counter()
        outs = llm.generate(prompt_token_ids=[list(x) for x in ids],
                            sampling_params=sp)
        dt = time.perf_counter() - t0
        n = sum(len(o.outputs[0].token_ids) for o in outs)
        print(f"{tag}: {n} tokens in {dt:.2f}s ({n/dt:.0f} tok/s)")

    run("cold (per-sequence suffix index only)")
    run("warm (global cache drafts from the finished generations)")


if __name__ == "__main__":
    main()
