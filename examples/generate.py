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
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--prompts", nargs="*", default=["Hello, my name is"])
    args = ap.parse_args()

    llm = LLM(args.model)
    sp = SamplingParams(
        temperature=args.temperature, max_tokens=args.max_tokens
    )
    for out in llm.generate(args.prompts, sp):
        print(f"--- {out.request_id}")
        print(out.outputs[0].text)


if __name__ == "__main__":
    main()
