"""r5 verify drive: rolling quantized load + cross-page-size PD on chip.

Follows the verify-skill recipe: a tiny HF checkpoint saved to a
tmpdir exercises the tokenizer/loader flow; the int8 engine loads it
through the ROLLING path (per-stack donated quantize — no full bf16
model in HBM) and serves; a prefill@bigger-page node hands off to a
decode@smaller-page node and matches the single-engine output.
"""

import tempfile

import numpy as np
import jax

assert jax.default_backend() == "tpu", jax.default_backend()

import torch
from transformers import AutoModelForCausalLM, Qwen3Config

from xllm_tpu.config import (
    CacheConfig, EngineConfig, QuantConfig, SchedulerConfig,
)
from xllm_tpu.disagg.pd import DecodeInstance, PDOrchestrator, PrefillInstance
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.models.model_args import load_model_config

tmp = tempfile.mkdtemp()
cfg = Qwen3Config(
    vocab_size=2048, hidden_size=512, intermediate_size=1024,
    num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=8,
    head_dim=128, max_position_embeddings=512, tie_word_embeddings=False,
)
AutoModelForCausalLM.from_config(cfg).eval().to(torch.float32)\
    .save_pretrained(tmp, safe_serialization=True)
mc = load_model_config(tmp)
mc.dtype = "bfloat16"


def engine(quant="", bs=64, blocks=64):
    return LLMEngine(EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=bs, num_blocks=blocks),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4, decode_batch_buckets=[4],
            prefill_token_buckets=[64, 128], max_model_len=512),
        quant=QuantConfig(method=quant),
    ))


rng = np.random.default_rng(0)
sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
prompt = rng.integers(1, 2047, size=40).tolist()

# rolling int8 load (the loader quantizes per stack as it loads)
eng_q = engine("int8")
assert eng_q.runner.params["layers"]["qkv_proj_w"].dtype.name == "int8"
eng_q.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
out_q = eng_q.generate_all(timeout_s=900)[0].outputs[0].token_ids
assert len(out_q) == 16
print("rolling int8 load: engine serves from per-stack-quantized weights")
eng_q.runner.sleep(2)
del eng_q

# cross-page-size PD: prefill@128 -> decode@64
single = engine(bs=64)
single.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
expect = single.generate_all(timeout_s=900)[0].outputs[0].token_ids
pre = PrefillInstance(engine(bs=128, blocks=32))
dec = DecodeInstance(engine(bs=64))
out = PDOrchestrator(pre, dec).generate(list(prompt), sp)
got = out.outputs[0].token_ids
agree = sum(a == b for a, b in zip(got, expect))
print(f"PD prefill@128 -> decode@64 vs single engine: {agree}/16 tokens")
assert agree >= 12, (got, expect)  # bf16 near-ties across page layouts
print("VERIFY r5 misc: OK")
