"""INT8 weight-only quantization: roundtrip, fused kernel parity, engine E2E."""

import jax.numpy as jnp
import numpy as np
import pytest

from xllm_tpu.ops.pallas.quant_matmul import quant_matmul_int8
from xllm_tpu.ops.quant import quantize_int8


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.05, jnp.float32)
    wq, s = quantize_int8(w)
    assert wq.dtype == jnp.int8 and s.shape == (32,)
    deq = np.asarray(wq, np.float32) * np.asarray(s)[None, :]
    err = np.abs(deq - np.asarray(w)).max()
    assert err <= np.asarray(s).max() * 0.51  # half-ULP per channel


def test_quantize_batched_layers():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 16, 8)) * 0.1, jnp.float32)
    wq, s = quantize_int8(w)
    assert wq.shape == (3, 16, 8) and s.shape == (3, 8)


def test_fused_quant_matmul_matches_dequant():
    rng = np.random.default_rng(2)
    m, k, n = 16, 128, 256
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
    wq, s = quantize_int8(w)
    ref = np.asarray(x) @ (np.asarray(wq, np.float32) * np.asarray(s)[None, :])
    out = quant_matmul_int8(
        x.astype(jnp.bfloat16), wq, s, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_engine_e2e_int8():
    from xllm_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, QuantConfig, SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3", dtype="float32",
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, qk_norm=True, max_position_embeddings=64,
        ),
        cache=CacheConfig(block_size=16, num_blocks=16),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, decode_batch_buckets=[2],
            prefill_token_buckets=[16], max_model_len=64,
        ),
        quant=QuantConfig(method="int8"),
    )
    eng = LLMEngine(cfg)
    assert eng.runner.params["layers"]["qkv_proj_w"].dtype == jnp.int8
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    eng.add_request(prompt_token_ids=[3, 5, 7], sampling_params=sp)
    outs = eng.generate_all()
    assert len(outs[0].outputs[0].token_ids) == 6
    assert eng.block_manager.num_used_blocks == 0


def test_engine_e2e_fp8_dummy_init():
    """Dummy-load fp8: weights are random-initialized DIRECTLY in the
    quantized dtype (no bf16 original — an 8B bf16 init would OOM the
    chip before quantization, the r2 bench failure)."""
    from xllm_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, QuantConfig, SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3", dtype="float32",
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, qk_norm=True, max_position_embeddings=64,
        ),
        cache=CacheConfig(block_size=16, num_blocks=16),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, decode_batch_buckets=[2],
            prefill_token_buckets=[16], max_model_len=64,
        ),
        quant=QuantConfig(method="fp8_e4m3"),
    )
    eng = LLMEngine(cfg)
    layers = eng.runner.params["layers"]
    assert layers["qkv_proj_w"].dtype == jnp.float8_e4m3fn
    assert layers["qkv_proj_w_scale"].dtype == jnp.float32
    # norms/embeddings stay full precision
    assert layers["input_layernorm"].dtype != jnp.float8_e4m3fn
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    eng.add_request(prompt_token_ids=[3, 5, 7], sampling_params=sp)
    outs = eng.generate_all()
    assert len(outs[0].outputs[0].token_ids) == 6
    assert eng.block_manager.num_used_blocks == 0


@pytest.mark.parametrize("method", ["int8", "fp8_e4m3"])
@pytest.mark.parametrize("family", ["qwen3", "deepseek_v2"])
def test_quantized_logits_error_bound(method, family):
    """VERDICT r1 item 5: weight-only quant for dense AND MLA stacks with
    a logits-error bound vs bf16 (proxy for the <=1% ppl delta bar)."""
    import numpy as np

    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        QuantConfig,
        SchedulerConfig,
    )
    from xllm_tpu.runtime.model_runner import ModelRunner

    if family == "qwen3":
        mc = ModelConfig(
            model_type="qwen3", dtype="float32", vocab_size=256,
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            qk_norm=True, max_position_embeddings=64,
        )
    else:
        mc = ModelConfig(
            model_type="deepseek_v2", dtype="float32", vocab_size=256,
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4, head_dim=16,
            q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16, num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=32,
            first_k_dense_replace=1, n_shared_experts=1,
            max_position_embeddings=64,
        )

    def build(method_, params=None):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(num_blocks=8, block_size=8),
            scheduler=SchedulerConfig(
                max_seqs_per_batch=2, max_model_len=64,
                decode_batch_buckets=[2], prefill_token_buckets=[16],
            ),
            quant=QuantConfig(method=method_),
        )
        r = ModelRunner(cfg)
        r.load_model(params=params)
        r.initialize_kv_cache()
        return r

    base = build("")
    # quantize the SAME weights (dummy-load quant engines random-init
    # directly in the quantized dtype, so same-seed builds don't share
    # an underlying bf16 model)
    quant = build(method, params=base.params)
    import jax
    import jax.numpy as jnp

    from xllm_tpu.runtime.forward_params import PrefillInput

    ids = np.arange(1, 13, dtype=np.int32)
    inp = PrefillInput(
        token_ids=np.pad(ids, (0, 4)),
        positions=np.pad(np.arange(12, dtype=np.int32), (0, 4),
                         constant_values=11),
        slot_mapping=np.pad(8 + np.arange(12, dtype=np.int32), (0, 4)),
        block_table=np.asarray([1, 2, 0, 0, 0, 0, 0, 0], np.int32),
        kv_len=np.int32(12),
        q_offset=np.int32(0),
        logits_idx=np.int32(11),
    )

    def logits_of(r):
        hidden, _, _ = r.model.prefill(
            r.params, r.k_cache, r.v_cache, inp
        )
        return np.asarray(r.model.compute_logits(r.params, hidden))

    lb = logits_of(base)
    lq = logits_of(quant)
    # per-token softmax shift must be small: top-1 agreement + bounded
    # mean abs logit error relative to the logit scale
    assert lb.argmax(-1) == lq.argmax(-1)
    rel = np.abs(lb - lq).mean() / (np.abs(lb).mean() + 1e-9)
    bound = 0.08 if method == "int8" else 0.05
    assert rel < bound, f"{family}/{method}: rel logit err {rel:.4f}"


def test_fp8_kv_cache_greedy_close_to_bf16():
    """Quantized (fp8_e4m3) KV cache: engine runs end-to-end and greedy
    outputs stay close to the full-precision cache (reference quantized
    KV variants, kv_cache_impl.h:29)."""
    import numpy as np

    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    mc = ModelConfig(
        model_type="qwen3", dtype="float32", vocab_size=256,
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        qk_norm=True, max_position_embeddings=128,
    )

    def run(kv_dtype):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(num_blocks=32, block_size=8,
                              kv_cache_dtype=kv_dtype),
            scheduler=SchedulerConfig(
                max_seqs_per_batch=2, max_model_len=128,
                decode_batch_buckets=[2], prefill_token_buckets=[16],
                prefill_row_buckets=[1, 2],
            ),
        )
        eng = LLMEngine(cfg)
        rng = np.random.default_rng(4)
        eng.add_request(
            prompt_token_ids=rng.integers(1, 255, size=11).tolist(),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=12, ignore_eos=True
            ),
            request_id="r0",
        )
        return eng.generate_all(timeout_s=120)[0].outputs[0].token_ids

    base = run("auto")
    fp8 = run("fp8_e4m3")
    assert len(fp8) == 12
    # early tokens should agree before tiny quant errors compound
    agree = sum(a == b for a, b in zip(base[:6], fp8[:6]))
    assert agree >= 4, (base, fp8)


@pytest.mark.parametrize("m,k,n", [(8, 64, 256), (128, 128, 512)])
def test_quant_matmul_v2_matches_reference(m, k, n):
    """Split-DMA streaming matmul (v2) == dequantized XLA matmul."""
    from xllm_tpu.ops.pallas.quant_matmul import (
        quant_matmul_fp8_v2,
        quant_matmul_int8_v2,
    )
    from xllm_tpu.ops.quant import quantize_fp8, quantize_int8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)

    wq, s = quantize_int8(w)
    ref = jnp.dot(x, wq.astype(jnp.float32) * s[None, :])
    out = quant_matmul_int8_v2(x, wq, s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-2
    )

    wq8, s8 = quantize_fp8(w)
    ref8 = jnp.dot(x, wq8.astype(jnp.float32) * s8[None, :])
    out8 = quant_matmul_fp8_v2(x, wq8, s8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out8), np.asarray(ref8), rtol=5e-2, atol=5e-2
    )


@pytest.mark.parametrize("m,k,n", [(8, 64, 256), (128, 128, 512)])
def test_quant_matmul_stacked_matches_reference(m, k, n):
    """Stacked (layer-indexed-in-HBM) kernels == per-layer dequant dot.

    These back quant_matmul_stacked, which the per-layer scan uses so a
    pallas call never consumes a scanned weight slice (the materialized
    copy cost int8 its whole bandwidth win — see ops/quant.py)."""
    from xllm_tpu.ops.pallas.quant_matmul import (
        quant_matmul_fp8_stacked,
        quant_matmul_int8_v2_stacked,
    )
    from xllm_tpu.ops.quant import quantize_fp8, quantize_int8

    nl = 3
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((nl, k, n)) * 0.05, jnp.float32)

    wq, s = quantize_int8(w)
    for li in (0, nl - 1):
        ref = jnp.dot(x, wq[li].astype(jnp.float32) * s[li][None, :])
        out = quant_matmul_int8_v2_stacked(
            x, wq, s, jnp.int32(li), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-2
        )

    wq8, s8 = quantize_fp8(w)
    for li in (0, nl - 1):
        ref8 = jnp.dot(x, wq8[li].astype(jnp.float32) * s8[li][None, :])
        out8 = quant_matmul_fp8_stacked(
            x, wq8, s8, jnp.int32(li), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out8), np.asarray(ref8), rtol=5e-2, atol=5e-2
        )


def test_matmul_bf16_stacked_interpret_parity():
    """Stacked bf16 streamer == XLA dot on the scanned layer slice."""
    from xllm_tpu.ops.pallas.quant_matmul import matmul_bf16_stacked

    rng = np.random.default_rng(3)
    nl, m, k, n = 3, 16, 128, 512
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((nl, k, n)) * 0.05, jnp.bfloat16)
    for li in (0, nl - 1):
        ref = jnp.dot(
            x.astype(jnp.float32), w[li].astype(jnp.float32)
        )
        out = matmul_bf16_stacked(x, w, jnp.int32(li), interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-2
        )


def test_matmul_bf16_v2_interpret_parity():
    """bf16 split-DMA streaming matmul == XLA dot (interpret mode)."""
    import numpy as np

    import jax.numpy as jnp

    from xllm_tpu.ops.pallas.quant_matmul import matmul_bf16_v2

    rng = np.random.default_rng(0)
    for m, k, n in ((128, 512, 1024), (64, 256, 512)):
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.bfloat16)
        got = matmul_bf16_v2(x, w, interpret=True)
        ref = jnp.dot(x, w, preferred_element_type=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


def test_fp8_kv_cache_mla_greedy_close_to_bf16():
    """fp8 KV on the MLA LATENT cache (K/V share pages; the dummy v slot
    and, for DSA, the indexer-K cache must survive the dtype change)."""
    import numpy as np

    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    mc = ModelConfig(
        model_type="deepseek_v2", dtype="float32", vocab_size=256,
        hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=96, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, max_position_embeddings=256,
    )

    def run(kv_dtype):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(num_blocks=32, block_size=8,
                              kv_cache_dtype=kv_dtype),
            scheduler=SchedulerConfig(
                max_seqs_per_batch=2, max_model_len=128,
                decode_batch_buckets=[2], prefill_token_buckets=[32],
            ),
        )
        eng = LLMEngine(cfg)
        rng = np.random.default_rng(6)
        eng.add_request(
            prompt_token_ids=[int(x) for x in rng.integers(1, 250, 28)],
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=12, ignore_eos=True
            ),
        )
        out = eng.generate_all(timeout_s=300)[0].outputs[0].token_ids
        assert eng.block_manager.num_used_blocks == 0
        return out

    base = run("auto")
    fp8 = run("fp8_e4m3")
    match = sum(a == b for a, b in zip(base, fp8))
    assert match >= len(base) - 2, (base, fp8)
