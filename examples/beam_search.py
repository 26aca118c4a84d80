"""Beam search through the offline API (reference beam_searcher.cpp:21).

Returns the top-`width` hypotheses per prompt, token-identical to HF
generate(num_beams=width, length_penalty=0.0, early_stopping=True).
"""

import argparse

from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.llm import LLM


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--width", type=int, default=4)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--prompt", default="The capital of France is")
    args = ap.parse_args()

    llm = LLM(args.model)
    sp = SamplingParams(
        use_beam_search=True, best_of=args.width, n=args.width,
        max_tokens=args.max_tokens, temperature=0.0,
    )
    (out,) = llm.generate([args.prompt], sp)
    for i, seq in enumerate(out.outputs):
        print(f"--- beam {i}")
        print(seq.text)


if __name__ == "__main__":
    main()
