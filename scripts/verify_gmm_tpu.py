"""Drive a tiny qwen3-moe engine on the real TPU with the own gmm kernel.

One-shot end-to-end check that ops/pallas/gmm.py works inside the
production engine path (prefill + decode) on real Mosaic hardware.
"""

import os

os.environ.setdefault("XLLM_GMM_IMPL", "own")

import numpy as np  # noqa: E402
import jax  # noqa: E402

from xllm_tpu.config import (  # noqa: E402
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine  # noqa: E402
from xllm_tpu.framework.sampling_params import SamplingParams  # noqa: E402


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3_moe",
            vocab_size=8192,
            hidden_size=512,
            intermediate_size=1024,
            num_hidden_layers=2,
            num_attention_heads=8,
            num_key_value_heads=4,
            head_dim=128,
            qk_norm=True,
            max_position_embeddings=1024,
            num_experts=8,
            num_experts_per_tok=2,
            moe_intermediate_size=256,
        ),
        cache=CacheConfig(block_size=64, num_blocks=64),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=8,
            decode_batch_buckets=[8],
            prefill_token_buckets=[128],
            max_model_len=1024,
        ),
    )
    eng = LLMEngine(cfg)
    rng = np.random.default_rng(0)
    for _ in range(4):
        ids = rng.integers(1, 8191, size=64).tolist()
        eng.add_request(
            prompt_token_ids=ids,
            sampling_params=SamplingParams(max_tokens=16),
        )
    outs = eng.generate_all()
    for o in outs:
        toks = o.outputs[0].token_ids if hasattr(o, "outputs") else o
        print("gen:", toks if isinstance(toks, list) else o, flush=True)
    assert eng.block_manager.num_used_blocks == 0, "block leak"
    print("OK: own gmm served 4 requests end-to-end on TPU", flush=True)


if __name__ == "__main__":
    main()
