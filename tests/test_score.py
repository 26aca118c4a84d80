"""Prompt scoring (per-token logprobs) + the quantization accuracy
north star: perplexity delta vs full precision (BASELINE.md: int8/fp8
within 1% of BF16; reference accuracy harness docs/en/accuracy_test.md)."""

import numpy as np
import pytest

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    QuantConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine


def _engine(mc, quant=""):
    return LLMEngine(EngineConfig(
        model=mc,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, max_tokens_per_chunk_for_prefill=16,
            max_model_len=128, decode_batch_buckets=[2],
            prefill_token_buckets=[8, 16],
        ),
        quant=QuantConfig(method=quant),
    ))


def _tiny_hf(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(Qwen3Config(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )).eval().float()
    path = tmp_path / "score_model"
    hf.save_pretrained(path, safe_serialization=True)
    return hf, path


def test_score_matches_hf_log_softmax(tmp_path):
    torch = pytest.importorskip("torch")
    hf, path = _tiny_hf(tmp_path)

    from xllm_tpu.models.model_args import load_model_config

    mc = load_model_config(str(path))
    mc.dtype = "float32"
    eng = _engine(mc)
    rng = np.random.default_rng(3)
    ids = [int(x) for x in rng.integers(1, 90, 37)]  # spans chunks
    got = eng.score_prompt(ids)
    with torch.no_grad():
        logits = hf(torch.tensor([ids])).logits[0]
    lsm = torch.log_softmax(logits.float(), dim=-1)
    want = np.array(
        [lsm[i, ids[i + 1]].item() for i in range(len(ids) - 1)]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert eng.block_manager.num_used_blocks == 0


@pytest.mark.parametrize("method", ["int8", "fp8_e4m3"])
def test_quantized_perplexity_within_bound(tmp_path, method):
    """North star (BASELINE.md): quantized perplexity within ~1% of full
    precision. Scored over a fixed synthetic corpus on the same
    checkpoint with and without quantization."""
    pytest.importorskip("torch")
    _, path = _tiny_hf(tmp_path)

    from xllm_tpu.models.model_args import load_model_config

    rng = np.random.default_rng(11)
    corpus = [
        [int(x) for x in rng.integers(1, 90, n)] for n in (40, 33, 25)
    ]

    def ppl(quant):
        mc = load_model_config(str(path))
        mc.dtype = "float32"
        eng = _engine(mc, quant)
        lps = np.concatenate([eng.score_prompt(ids) for ids in corpus])
        return float(np.exp(-lps.mean()))

    base = ppl("")
    quantized = ppl(method)
    delta = abs(quantized - base) / base
    assert delta < 0.015, (method, base, quantized, delta)
