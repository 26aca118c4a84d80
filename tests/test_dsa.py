"""DSA (deepseek-v3.2 sparse attention): indexer math, top-k masking,
dense-equivalence oracle, engine E2E, checkpoint plumbing.

Counterpart of the reference's DSA stack
(reference xllm/core/layers/mlu/indexer.cpp,
npu_torch/deepseek_sparse_attention.cpp, deepseek_v32.h:224-232,
glm5.h:21-43). The key oracle: with index_topk >= context, the top-k
mask keeps every valid token, so DSA must reproduce dense MLA exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.ops.dsa import (
    hadamard_matrix,
    index_scores,
    rope_front,
    rotate_activation,
    topk_mask,
)


def mla_config(index_topk=0, **kw):
    base = dict(
        model_type="deepseek_v2",
        dtype="float32",
        vocab_size=96,
        hidden_size=48,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=16,
        max_position_embeddings=128,
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=16,
        norm_topk_prob=True,
        first_k_dense_replace=1,
        n_shared_experts=1,
        routed_scaling_factor=1.0,
        index_topk=index_topk,
        index_n_heads=4,
        index_head_dim=16,
    )
    base.update(kw)
    return EngineConfig(
        model=ModelConfig(**base),
        cache=CacheConfig(block_size=8, num_blocks=48),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_chunk_for_prefill=32,
            max_model_len=128,
            decode_batch_buckets=[4],
            prefill_token_buckets=[8, 32],
            prefill_row_buckets=[1, 4],
        ),
    )


# ---------------------------------------------------------------------------
def test_hadamard_is_orthonormal():
    h = hadamard_matrix(16)
    np.testing.assert_allclose(h @ h.T, np.eye(16), atol=1e-6)
    # rotation preserves inner products -> index scores invariant
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((5, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((7, 16)).astype(np.float32))
    ra, rb = rotate_activation(a, jnp.asarray(h)), rotate_activation(
        b, jnp.asarray(h)
    )
    np.testing.assert_allclose(
        np.asarray(ra @ rb.T), np.asarray(a @ b.T), rtol=1e-4, atol=1e-4
    )


def test_index_scores_formula():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((3, 2, 8)).astype(np.float32)  # [S, Hi, D]
    w = rng.standard_normal((3, 2)).astype(np.float32)
    k = rng.standard_normal((5, 8)).astype(np.float32)
    got = np.asarray(index_scores(jnp.asarray(q), jnp.asarray(w),
                                  jnp.asarray(k)))
    want = np.einsum(
        "sh,shj->sj", w, np.maximum(np.einsum("shd,jd->shj", q, k), 0.0)
    ) * (8**-0.5) * (2**-0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_topk_mask_selects_k_highest_valid():
    scores = jnp.asarray([[5.0, 1.0, 3.0, 4.0, 2.0]])
    valid = jnp.asarray([[True, True, True, False, True]])
    m = np.asarray(topk_mask(scores, valid, 2))
    np.testing.assert_array_equal(m, [[True, False, True, False, False]])
    # k >= valid count keeps everything valid
    m = np.asarray(topk_mask(scores, valid, 10))
    np.testing.assert_array_equal(m, np.asarray(valid))


def test_rope_front_only_rotates_prefix():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 2, 16)).astype(np.float32))
    inv = jnp.asarray(1.0 / 10000.0 ** (np.arange(4) / 4), jnp.float32)
    pos = jnp.asarray([0, 1, 2, 3], jnp.int32)
    y = rope_front(x, pos, 8, inv)
    # suffix untouched
    np.testing.assert_array_equal(np.asarray(y[..., 8:]),
                                  np.asarray(x[..., 8:]))
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(x[0]),
                               rtol=1e-6)
    # rotation preserves the prefix norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y[..., :8]), axis=-1),
        np.linalg.norm(np.asarray(x[..., :8]), axis=-1), rtol=1e-5,
    )


# ---------------------------------------------------------------------------
def _run_greedy(cfg, prompts, max_tokens=10):
    eng = LLMEngine(cfg)
    # identical base weights across configs: DSA adds extra params but
    # the shared ones come from the same seeded init inside ModelRunner
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                        ignore_eos=True)
    for i, p in enumerate(prompts):
        eng.add_request(prompt_token_ids=list(p), sampling_params=sp,
                        request_id=f"r{i}")
    outs = {o.request_id: o.outputs[0].token_ids
            for o in eng.generate_all(timeout_s=600)}
    assert eng.block_manager.num_used_blocks == 0
    return outs, eng


def test_dsa_full_topk_equals_dense():
    """index_topk >= context keeps every token -> DSA must reproduce the
    dense MLA engine's greedy output (the reference semantics collapse)."""
    rng = np.random.default_rng(3)
    prompts = [
        [int(x) for x in rng.integers(1, 90, 21)],
        [int(x) for x in rng.integers(1, 90, 9)],
    ]
    dense_out, dense_eng = _run_greedy(mla_config(0), prompts)

    cfg = mla_config(index_topk=128)
    eng = LLMEngine(cfg)
    # graft the dense engine's weights (DSA params stay random — with
    # topk >= ctx they only produce scores, never drop a token)
    for k, v in dense_eng.runner.params.items():
        if k in ("embed_tokens", "norm", "lm_head"):
            eng.runner.params[k] = v
    for stack in ("dense_layers", "moe_layers"):
        for k, v in dense_eng.runner.params[stack].items():
            eng.runner.params[stack][k] = v
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    for i, p in enumerate(prompts):
        eng.add_request(prompt_token_ids=list(p), sampling_params=sp,
                        request_id=f"r{i}")
    outs = {o.request_id: o.outputs[0].token_ids
            for o in eng.generate_all(timeout_s=600)}
    assert outs == dense_out
    assert eng.block_manager.num_used_blocks == 0


def test_dsa_small_topk_sparsifies():
    """A small top-k engages real sparsity: the engine still runs clean
    and the output differs from dense (tokens get dropped)."""
    rng = np.random.default_rng(4)
    prompts = [[int(x) for x in rng.integers(1, 90, 25)]]
    dense_out, dense_eng = _run_greedy(mla_config(0), prompts)

    eng = LLMEngine(mla_config(index_topk=4))
    for k, v in dense_eng.runner.params.items():
        if k in ("embed_tokens", "norm", "lm_head"):
            eng.runner.params[k] = v
    for stack in ("dense_layers", "moe_layers"):
        for k, v in dense_eng.runner.params[stack].items():
            eng.runner.params[stack][k] = v
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    eng.add_request(prompt_token_ids=list(prompts[0]), sampling_params=sp,
                    request_id="r0")
    outs = eng.generate_all(timeout_s=600)
    toks = outs[0].outputs[0].token_ids
    assert len(toks) == 10
    assert toks != dense_out["r0"]
    assert eng.block_manager.num_used_blocks == 0


def test_dsa_chunked_prefill_matches_single_shot():
    """Chunked prefill through the DSA path reproduces one-shot prefill
    (the index-K cache accumulates across chunks like the latent)."""
    rng = np.random.default_rng(5)
    prompt = [int(x) for x in rng.integers(1, 90, 26)]
    cfg1 = mla_config(index_topk=128)
    out1, eng1 = _run_greedy(cfg1, [prompt])

    cfg2 = mla_config(index_topk=128)
    cfg2.scheduler.max_tokens_per_chunk_for_prefill = 8
    cfg2.scheduler.prefill_token_buckets = [8]
    cfg2.scheduler.resolve_buckets()
    eng2 = LLMEngine(cfg2)
    for k, v in eng1.runner.params.items():
        eng2.runner.params[k] = v
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    eng2.add_request(prompt_token_ids=list(prompt), sampling_params=sp,
                     request_id="r0")
    outs = eng2.generate_all(timeout_s=600)
    assert outs[0].outputs[0].token_ids == out1["r0"]


def test_v32_checkpoint_loading(tmp_path):
    """A deepseek-v2 checkpoint rewritten with indexer tensors and the
    DeepseekV32ForCausalLM architecture loads the idx_* params."""
    torch = pytest.importorskip("torch")
    try:
        from transformers import DeepseekV2Config
        from transformers.models.deepseek_v2.modeling_deepseek_v2 import (
            DeepseekV2ForCausalLM,
        )
    except Exception:
        pytest.skip("transformers lacks deepseek_v2")
    import json
    import os

    from safetensors import safe_open
    from safetensors.numpy import save_file

    hf_cfg = DeepseekV2Config(
        vocab_size=96, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, n_routed_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        first_k_dense_replace=1, n_shared_experts=1,
        topk_method="greedy", n_group=1, topk_group=1,
        scoring_func="softmax", attention_bias=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    model = DeepseekV2ForCausalLM(hf_cfg).eval().float()
    base = tmp_path / "v2"
    model.save_pretrained(base, safe_serialization=True)

    out_dir = tmp_path / "v32"
    os.makedirs(out_dir, exist_ok=True)
    tensors = {}
    with safe_open(os.path.join(base, "model.safetensors"),
                   framework="np") as f:
        for name in f.keys():
            tensors[name] = f.get_tensor(name)
    rng = np.random.default_rng(0)
    hi, di = 4, 16
    for i in range(2):
        p = f"model.layers.{i}.self_attn.indexer"
        tensors[f"{p}.wq_b.weight"] = rng.standard_normal(
            (hi * di, 24)).astype(np.float32)
        tensors[f"{p}.wk.weight"] = rng.standard_normal(
            (di, 48)).astype(np.float32)
        tensors[f"{p}.k_norm.weight"] = np.ones(di, np.float32)
        tensors[f"{p}.k_norm.bias"] = np.zeros(di, np.float32)
        tensors[f"{p}.weights_proj.weight"] = rng.standard_normal(
            (hi, 48)).astype(np.float32)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(base, "config.json")) as f:
        cj = json.load(f)
    cj["architectures"] = ["DeepseekV32ForCausalLM"]
    cj["index_topk"] = 64
    cj["index_n_heads"] = hi
    cj["index_head_dim"] = di
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cj, f)

    from xllm_tpu.models.loader import load_params
    from xllm_tpu.models.model_args import load_model_config
    from xllm_tpu.models.registry import create_model

    mc = load_model_config(str(out_dir))
    assert mc.model_type == "deepseek_v32"
    assert mc.index_topk == 64 and mc.index_n_heads == hi
    mc.dtype = "float32"
    m = create_model(mc)
    assert type(m).__name__ == "MlaDecoderModel" and m.dsa
    params = load_params(mc)
    lp = params["dense_layers"]
    assert lp["idx_wq_b"].shape == (1, 24, hi * di)
    assert lp["idx_weights_w"].shape == (1, 48, hi)
    assert params["moe_layers"]["idx_wq_b"].shape == (1, 24, hi * di)


def test_dsa_sp_engine_matches_single_device():
    """Prefill sequence-parallelism for DSA models: the reference gates
    prefill-SP to its sparse-attention families (deepseek v3.2/v4,
    deepseek_sparse_attention.cpp; master gating in options SP docs). On
    TPU the same capability is the ``cp`` mesh axis — the chunk's token
    dim is zigzag-sharded and GSPMD gathers indexer-K/latent pages for
    the top-k attention. Engine token parity (cp=2, tp=2) vs single dev."""
    import numpy as np

    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        ParallelConfig,
        SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    def cfg(cp=1, tp=1):
        return EngineConfig(
            model=ModelConfig(
                model_type="deepseek_v32", dtype="float32", vocab_size=512,
                hidden_size=128, intermediate_size=256,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=4, q_lora_rank=96, kv_lora_rank=64,
                qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
                index_topk=48, index_n_heads=4, index_head_dim=32,
                max_position_embeddings=512,
            ),
            cache=CacheConfig(num_blocks=64, block_size=16),
            scheduler=SchedulerConfig(
                max_seqs_per_batch=4, max_tokens_per_batch=512,
                decode_batch_buckets=[4], prefill_token_buckets=[64, 128],
                prefill_row_buckets=[1, 4], max_model_len=512,
            ),
            parallel=ParallelConfig(cp_size=cp, tp_size=tp),
        )

    rng = np.random.default_rng(11)
    # long prompt spans chunks (sparse top-k < prompt length); short one
    # rides the same batched dispatch
    prompts = [rng.integers(1, 500, size=n).tolist() for n in (200, 90)]

    def run(c):
        eng = LLMEngine(c)
        for i, ids in enumerate(prompts):
            eng.add_request(
                prompt_token_ids=ids,
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=8, ignore_eos=True
                ),
                request_id=f"r{i}",
            )
        outs = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
        return [outs[f"r{i}"].outputs[0].token_ids for i in range(len(prompts))]

    base = run(cfg())
    sp = run(cfg(cp=2, tp=2))
    assert sp == base
