"""glm4v: GLM vision tower + glm4 text M-RoPE, engine E2E vs HF.

Counterpart of the reference's glm4v VLM family
(reference xllm/models/vlm/glm4v.h registration rows)."""

import numpy as np
import pytest

IMG_TOK = 151


def _hf_modules():
    torch = pytest.importorskip("torch")
    try:
        from transformers.models.glm4v.configuration_glm4v import (
            Glm4vConfig,
            Glm4vVisionConfig,
        )
        from transformers.models.glm4v.modeling_glm4v import (
            Glm4vForConditionalGeneration,
            Glm4vVisionModel,
        )
    except Exception:
        pytest.skip("transformers lacks glm4v")
    return (torch, Glm4vConfig, Glm4vVisionConfig,
            Glm4vForConditionalGeneration, Glm4vVisionModel)


def _tiny_vision_cfg(Glm4vVisionConfig):
    return Glm4vVisionConfig(
        depth=2, hidden_size=32, num_heads=2, intermediate_size=64,
        out_hidden_size=64, image_size=28, patch_size=14,
        temporal_patch_size=2, spatial_merge_size=2, attention_bias=False,
    )


def _tower_params_from_hf(sd, depth):
    def t2np(t):
        return np.asarray(t.detach().numpy(), np.float32)

    blocks = {k: [] for k in [
        "norm1_w", "norm2_w", "qkv_w", "proj_w", "gate_w", "up_w", "down_w"]}
    for i in range(depth):
        p = f"blocks.{i}."
        blocks["norm1_w"].append(t2np(sd[p + "norm1.weight"]))
        blocks["norm2_w"].append(t2np(sd[p + "norm2.weight"]))
        blocks["qkv_w"].append(t2np(sd[p + "attn.qkv.weight"]).T)
        blocks["proj_w"].append(t2np(sd[p + "attn.proj.weight"]).T)
        blocks["gate_w"].append(t2np(sd[p + "mlp.gate_proj.weight"]).T)
        blocks["up_w"].append(t2np(sd[p + "mlp.up_proj.weight"]).T)
        blocks["down_w"].append(t2np(sd[p + "mlp.down_proj.weight"]).T)
    pe = t2np(sd["patch_embed.proj.weight"])
    ds = t2np(sd["downsample.weight"])
    return {
        "patch_embed_w": pe.reshape(pe.shape[0], -1).T,
        "patch_embed_b": t2np(sd["patch_embed.proj.bias"]),
        "post_conv_ln_w": t2np(sd["post_conv_layernorm.weight"]),
        "pos_embed": t2np(sd["embeddings.position_embedding.weight"]),
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
        "post_ln_w": t2np(sd["post_layernorm.weight"]),
        "downsample_w": ds.reshape(ds.shape[0], -1).T,
        "downsample_b": t2np(sd["downsample.bias"]),
        "merger_proj_w": t2np(sd["merger.proj.weight"]).T,
        "merger_ln_w": t2np(sd["merger.post_projection_norm.weight"]),
        "merger_ln_b": t2np(sd["merger.post_projection_norm.bias"]),
        "merger_gate_w": t2np(sd["merger.gate_proj.weight"]).T,
        "merger_up_w": t2np(sd["merger.up_proj.weight"]).T,
        "merger_down_w": t2np(sd["merger.down_proj.weight"]).T,
    }


def test_glm_vision_tower_matches_hf():
    """Tower parity incl. the bicubic grid_sample pos-embed resampling at
    a non-native grid size."""
    torch, _, Glm4vVisionConfig, _, Glm4vVisionModel = _hf_modules()
    from xllm_tpu.models.vision_glm import GlmVisionConfig, GlmVisionEncoder

    torch.manual_seed(0)
    cfg = _tiny_vision_cfg(Glm4vVisionConfig)
    hf = Glm4vVisionModel(cfg).eval().float()

    # 56x84 image -> 4x6 patch grid (not the 2x2 native pos grid)
    gh, gw = 4, 6
    n = gh * gw
    rng = np.random.default_rng(0)
    patches = rng.standard_normal(
        (n, 3 * cfg.temporal_patch_size * cfg.patch_size**2)
    ).astype(np.float32)
    with torch.no_grad():
        want = hf(
            torch.from_numpy(patches), torch.tensor([[1, gh, gw]])
        ).numpy()

    ours = GlmVisionEncoder(GlmVisionConfig(
        depth=cfg.depth, hidden_size=cfg.hidden_size,
        num_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        out_hidden_size=cfg.out_hidden_size, image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        temporal_patch_size=cfg.temporal_patch_size,
        spatial_merge_size=cfg.spatial_merge_size,
        rms_norm_eps=cfg.rms_norm_eps,
        attention_bias=cfg.attention_bias,
    ))
    params = _tower_params_from_hf(hf.state_dict(), cfg.depth)
    got = np.asarray(ours.encode(params, patches, gh, gw))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _tiny_hf_cfg(Glm4vConfig, Glm4vVisionConfig):
    return Glm4vConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=512,
            rope_theta=10000.0, partial_rotary_factor=0.5,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [2, 1, 1]},
        ),
        vision_config=_tiny_vision_cfg(Glm4vVisionConfig).to_dict(),
        image_token_id=IMG_TOK,
        video_token_id=152,
        image_start_token_id=148,
        image_end_token_id=149,
        video_start_token_id=153,
        video_end_token_id=154,
    )


def test_glm4v_get_rope_index_matches_hf():
    torch, Glm4vConfig, Glm4vVisionConfig, Glm4vForCond, _ = _hf_modules()
    hf = Glm4vForCond(_tiny_hf_cfg(Glm4vConfig, Glm4vVisionConfig)).eval()

    from xllm_tpu.models.qwen2_vl import get_rope_index

    ids = [3, 4] + [IMG_TOK] * 6 + [5] + [IMG_TOK] * 2 + [6, 7]
    grids = [(1, 4, 6), (1, 2, 4)]
    want_pos, want_delta = hf.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor(grids)
    )
    got_pos, got_off = get_rope_index(ids, IMG_TOK, grids, merge_size=2)
    np.testing.assert_array_equal(got_pos, want_pos[:, 0].numpy())
    assert got_off == int(want_delta[0, 0])


def test_glm4v_engine_greedy_matches_hf(tmp_path):
    """Full-stack greedy parity: HF Glm4vForConditionalGeneration vs the
    engine loading the same checkpoint (image intake -> GLM tower ->
    partial-interleaved M-RoPE decode)."""
    torch, Glm4vConfig, Glm4vVisionConfig, Glm4vForCond, _ = _hf_modules()
    torch.manual_seed(0)
    hf = Glm4vForCond(
        _tiny_hf_cfg(Glm4vConfig, Glm4vVisionConfig)
    ).eval().float()
    path = tmp_path / "glm4v"
    hf.save_pretrained(path, safe_serialization=True)

    from xllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams
    from xllm_tpu.models.model_args import load_model_config
    from xllm_tpu.processors.image import ImageProcessor

    mc = load_model_config(str(path))
    assert mc.model_type == "glm4v"
    assert mc.use_sandwich_norms and mc.partial_rotary_factor == 0.5
    mc.dtype = "float32"
    eng = LLMEngine(EngineConfig(
        model=mc,
        cache=CacheConfig(num_blocks=64, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2,
            max_tokens_per_chunk_for_prefill=64,
            max_model_len=256,
            decode_batch_buckets=[2],
            prefill_token_buckets=[8, 64],
            prefill_row_buckets=[1, 2],
        ),
    ))

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(56, 84, 3)).astype(np.uint8)
    proc = ImageProcessor(patch_size=14, merge_size=2, temporal_patch_size=2)
    patches, grid = proc(img)
    n_llm = proc.num_llm_tokens(grid)

    prompt = [5, 6, 148, IMG_TOK, 149, 7, 8]
    expanded = [5, 6, 148] + [IMG_TOK] * n_llm + [149, 7, 8]
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([grid]),
            max_new_tokens=8,
            do_sample=False,
        )
    want = out[0, len(expanded):].tolist()

    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True
        ),
        request_id="img",
        images=[img],
    )
    outs = eng.generate_all(timeout_s=300)
    got = outs[0].outputs[0].token_ids
    assert got == want, (got, want)
    assert eng.block_manager.num_used_blocks == 0


def test_glm4v_moe_engine_greedy_matches_hf(tmp_path):
    """GLM-4.5V: glm4_moe text backbone under the GLM tower, greedy parity
    vs HF Glm4vMoeForConditionalGeneration (sigmoid noaux routing,
    chunked rotate-half partial M-RoPE)."""
    torch = pytest.importorskip("torch")
    try:
        from transformers.models.glm4v_moe.configuration_glm4v_moe import (
            Glm4vMoeConfig,
        )
        from transformers.models.glm4v_moe.modeling_glm4v_moe import (
            Glm4vMoeForConditionalGeneration,
        )
    except Exception:
        pytest.skip("transformers lacks glm4v_moe")
    _, _, Glm4vVisionConfig, _, _ = _hf_modules()

    torch.manual_seed(0)
    cfg = Glm4vMoeConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=512, rope_theta=10000.0,
            partial_rotary_factor=0.5, attention_bias=False,
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=32, n_shared_experts=1,
            first_k_dense_replace=1, n_group=1, topk_group=1,
            norm_topk_prob=True, routed_scaling_factor=1.0,
            use_qk_norm=False,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [2, 1, 1]},
        ),
        vision_config=_tiny_vision_cfg(Glm4vVisionConfig).to_dict(),
        image_token_id=IMG_TOK,
        video_token_id=152,
        image_start_token_id=148,
        image_end_token_id=149,
        video_start_token_id=153,
        video_end_token_id=154,
    )
    hf = Glm4vMoeForConditionalGeneration(cfg).eval().float()
    path = tmp_path / "glm4v_moe"
    hf.save_pretrained(path, safe_serialization=True)

    from xllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams
    from xllm_tpu.models.model_args import load_model_config
    from xllm_tpu.processors.image import ImageProcessor

    mc = load_model_config(str(path))
    assert mc.model_type == "glm4v_moe"
    assert mc.scoring_func == "sigmoid" and not mc.use_sandwich_norms
    mc.dtype = "float32"
    eng = LLMEngine(EngineConfig(
        model=mc,
        cache=CacheConfig(num_blocks=64, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2,
            max_tokens_per_chunk_for_prefill=64,
            max_model_len=256,
            decode_batch_buckets=[2],
            prefill_token_buckets=[8, 64],
            prefill_row_buckets=[1, 2],
        ),
    ))

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8)
    proc = ImageProcessor(patch_size=14, merge_size=2, temporal_patch_size=2)
    patches, grid = proc(img)
    n_llm = proc.num_llm_tokens(grid)

    prompt = [5, 6, 148, IMG_TOK, 149, 7, 8]
    expanded = [5, 6, 148] + [IMG_TOK] * n_llm + [149, 7, 8]
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([grid]),
            max_new_tokens=8,
            do_sample=False,
        )
    want = out[0, len(expanded):].tolist()

    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True
        ),
        request_id="img",
        images=[img],
    )
    outs = eng.generate_all(timeout_s=300)
    got = outs[0].outputs[0].token_ids
    assert got == want, (got, want)
    assert eng.block_manager.num_used_blocks == 0
