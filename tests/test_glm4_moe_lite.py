"""glm4-moe-lite: MLA + concat (rotate-half) rotary, oracle-checked.

The reference header is the spec (no public HF class for this variant):
xllm/models/llm/npu/glm4_moe_lite.h:105-127 — deepseek MLA weights
(q_a/q_b, kv_a_with_mqa, kv_b split) with get_concat_rotary_embedding
(rotary_embedding_util.cpp:363, cat({freqs, freqs}) = neox rotate-half)
and noaux_tc sigmoid routing. The oracle below implements the model
from scratch in numpy with NON-absorbed attention (explicit per-head
K/V), so it is structurally independent of the absorbed-latent path
under test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xllm_tpu.config import ModelConfig
from xllm_tpu.models.registry import get_model_class as resolve_model_class
from xllm_tpu.runtime.forward_params import PrefillInput

H, NOPE, ROPE, VH, QR, KVR = 2, 16, 8, 24, 32, 24
D, E, K, MI = 64, 8, 2, 16


def _cfg():
    return ModelConfig(
        model_type="glm4_moe_lite", dtype="float32", vocab_size=97,
        hidden_size=D, intermediate_size=80, num_hidden_layers=2,
        num_attention_heads=H, num_key_value_heads=H, head_dim=NOPE + ROPE,
        qk_nope_head_dim=NOPE, qk_rope_head_dim=ROPE, v_head_dim=VH,
        q_lora_rank=QR, kv_lora_rank=KVR, max_position_embeddings=64,
        num_experts=E, num_experts_per_tok=K, moe_intermediate_size=MI,
        norm_topk_prob=True, n_shared_experts=1, first_k_dense_replace=1,
        scoring_func="sigmoid", n_group=2, topk_group=1,
        routed_scaling_factor=1.8, rope_theta=1e6,
    )


def _rms(x, w, eps=1e-6):
    v = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(v + eps)) * w


def _neox_rope(x, positions, theta, dim):
    """rotate-half rope on the last `dim` axis (concat rotary:
    reference rotary_embedding_util.cpp cat({freqs, freqs}))."""
    inv = 1.0 / theta ** (np.arange(0, dim, 2) / dim)
    ang = positions[:, None] * inv[None, :]  # [T, dim/2]
    cos = np.concatenate([np.cos(ang), np.cos(ang)], -1)
    sin = np.concatenate([np.sin(ang), np.sin(ang)], -1)
    while cos.ndim < x.ndim:
        cos, sin = cos[:, None], sin[:, None]
    half = dim // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], -1)
    return x * cos + rot * sin


def _route_noaux(x, rw, bias, k, n_group, topk_group):
    logits = x @ rw
    scores = 1.0 / (1.0 + np.exp(-logits))
    sel = scores + bias
    t, e = sel.shape
    gsel = sel.reshape(t, n_group, e // n_group)
    g2 = np.sort(gsel, axis=-1)[..., -2:].sum(-1)  # top-2 strength
    keep_g = np.argsort(-g2, axis=-1)[:, :topk_group]
    mask = np.full((t, n_group), -np.inf)
    np.put_along_axis(mask, keep_g, 0.0, axis=1)
    sel = (gsel + mask[..., None]).reshape(t, e)
    topi = np.argsort(-sel, axis=-1)[:, :k]
    topv = np.take_along_axis(scores, topi, axis=-1)
    topv = topv / np.maximum(topv.sum(-1, keepdims=True), 1e-20)
    return topv, topi


def _oracle_logits(params, ids, cfg):
    g = lambda tree, key: np.asarray(tree[key], np.float64)
    T = len(ids)
    pos = np.arange(T, dtype=np.float64)
    x = g(params, "embed_tokens")[ids]
    stacks = [("dense_layers", 0), ("moe_layers", 0)]
    for group, li in stacks:
        lp = {k: np.asarray(v, np.float64)[li]
              for k, v in params[group].items()}
        h = _rms(x, lp["input_layernorm"], cfg.rms_norm_eps)
        qa = _rms(h @ lp["q_a_proj_w"], lp["q_a_norm"], cfg.rms_norm_eps)
        q = (qa @ lp["q_b_proj_w"]).reshape(T, H, NOPE + ROPE)
        q_nope, q_pe = q[..., :NOPE], q[..., NOPE:]
        kv_a = h @ lp["kv_a_proj_w"]
        c_kv = _rms(kv_a[:, :KVR], lp["kv_a_norm"], cfg.rms_norm_eps)
        k_pe = kv_a[:, KVR:]
        q_pe = _neox_rope(q_pe, pos, cfg.rope_theta, ROPE)
        k_pe = _neox_rope(k_pe, pos, cfg.rope_theta, ROPE)
        # explicit (non-absorbed) K/V per head
        k_nope = np.einsum("tk,hkn->thn", c_kv, lp["kv_b_nope_w"])
        v = np.einsum("tk,hkv->thv", c_kv, lp["kv_b_v_w"])
        k_full = np.concatenate(
            [k_nope, np.broadcast_to(k_pe[:, None, :], (T, H, ROPE))], -1)
        q_full = np.concatenate([q_nope, q_pe], -1)
        scale = (NOPE + ROPE) ** -0.5
        scores = np.einsum("thd,shd->hts", q_full, k_full) * scale
        causal = np.tril(np.ones((T, T), bool))
        scores = np.where(causal[None], scores, -np.inf)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        att = np.einsum("hts,shv->thv", p, v).reshape(T, H * VH)
        x = x + att @ lp["o_proj_w"]
        h2 = _rms(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        if group == "dense_layers":
            act = (h2 @ lp["gate_proj_w"])
            act = act / (1 + np.exp(-act)) * (h2 @ lp["up_proj_w"])
            x = x + act @ lp["down_proj_w"]
        else:
            topv, topi = _route_noaux(
                h2, lp["router_w"], lp["router_bias"], K,
                cfg.n_group, cfg.topk_group)
            routed = np.zeros_like(h2)
            for t in range(T):
                for j in range(K):
                    e_id = topi[t, j]
                    gu = h2[t] @ lp["experts_gate_up"][e_id]
                    a = gu[:MI] / (1 + np.exp(-gu[:MI])) * gu[MI:]
                    routed[t] += topv[t, j] * (a @ lp["experts_down"][e_id])
            out = routed * cfg.routed_scaling_factor
            sg = h2 @ lp["shared_gate_proj_w"]
            act = sg / (1 + np.exp(-sg)) * (h2 @ lp["shared_up_proj_w"])
            out = out + act @ lp["shared_down_proj_w"]
            x = x + out
    x = _rms(x, np.asarray(params["norm"], np.float64), cfg.rms_norm_eps)
    head = (g(params, "lm_head") if "lm_head" in params
            else g(params, "embed_tokens").T)
    return x @ head


def test_glm4_moe_lite_logits_match_oracle():
    cfg = _cfg()
    cls = resolve_model_class("glm4_moe_lite")
    model = cls(cfg)
    assert model.mla_rope_style == "neox"
    params = model.init_params(jax.random.key(0))
    k_cache, v_cache = model.new_kv_cache(8, 8)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 96, size=12).astype(np.int32)
    inp = PrefillInput(
        token_ids=jnp.asarray(ids),
        positions=jnp.arange(12, dtype=jnp.int32),
        slot_mapping=jnp.asarray(8 + np.arange(12, dtype=np.int32)),
        block_table=jnp.asarray([1, 2, 0, 0], jnp.int32),
        kv_len=jnp.int32(12),
        q_offset=jnp.int32(0),
        logits_idx=jnp.int32(11),
    )
    hidden, _, _ = model.prefill(params, k_cache, v_cache, inp)
    logits = np.asarray(model.compute_logits(params, hidden))[0]
    ref = _oracle_logits(params, ids, cfg)[-1]
    np.testing.assert_allclose(logits, ref, atol=2e-4)


def test_glm4_moe_lite_differs_from_interleaved_rope():
    """The rope convention is the point of the family: the same weights
    under deepseek_v2 (interleaved) must NOT reproduce the lite logits."""
    cfg = _cfg()
    lite = resolve_model_class("glm4_moe_lite")(cfg)
    ds = resolve_model_class("deepseek_v2")(cfg)
    params = lite.init_params(jax.random.key(0))
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 96, size=9).astype(np.int32)
    inp = PrefillInput(
        token_ids=jnp.asarray(ids),
        positions=jnp.arange(9, dtype=jnp.int32),
        slot_mapping=jnp.asarray(8 + np.arange(9, dtype=np.int32)),
        block_table=jnp.asarray([1, 2, 0, 0], jnp.int32),
        kv_len=jnp.int32(9),
        q_offset=jnp.int32(0),
        logits_idx=jnp.int32(8),
    )
    out_lite = np.asarray(
        lite.compute_logits(
            params, lite.prefill(params, *lite.new_kv_cache(8, 8), inp)[0]
        )
    )
    out_ds = np.asarray(
        ds.compute_logits(
            params, ds.prefill(params, *ds.new_kv_cache(8, 8), inp)[0]
        )
    )
    assert np.abs(out_lite - out_ds).max() > 1e-4  # >> f32 noise (~1e-7)


def test_glm4_moe_lite_engine_smoke():
    from xllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    eng = LLMEngine(EngineConfig(
        model=_cfg(),
        cache=CacheConfig(block_size=8, num_blocks=32),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, decode_batch_buckets=[2],
            prefill_token_buckets=[16], max_model_len=64,
        ),
    ))
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    eng.add_request(prompt_token_ids=[3, 5, 7, 11, 13], sampling_params=sp)
    outs = eng.generate_all(timeout_s=300)
    assert len(outs[0].outputs[0].token_ids) == 6
    assert eng.scheduler.block_manager.num_used_blocks == 0
