"""VLM stack: processor, M-RoPE indexing, vision tower, engine E2E.

Counterpart of the reference's VLM path (qwen2-vl models + processors +
encoder cache + mrope, SURVEY.md §2.5) on a tiny random-weight model.
"""

import numpy as np
import pytest

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams

IMG_TOK = 77


def _vlm_config():
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen2_vl",
            dtype="float32",
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            max_position_embeddings=256,
            mrope_section=[2, 3, 3],  # sums to head_dim/2 = 8
            image_token_id=IMG_TOK,
            vision={
                "depth": 2,
                "embed_dim": 32,
                "num_heads": 2,
                "patch_size": 14,
                "temporal_patch_size": 2,
                "spatial_merge_size": 2,
            },
        ),
        cache=CacheConfig(num_blocks=32, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_chunk_for_prefill=32,
            max_model_len=256,
            decode_batch_buckets=[4],
            prefill_token_buckets=[8, 32],
            prefill_row_buckets=[1, 4],
        ),
    )


def test_smart_resize_and_patchify():
    from xllm_tpu.processors.image import ImageProcessor, smart_resize

    h, w = smart_resize(100, 230, factor=28)
    assert h % 28 == 0 and w % 28 == 0
    proc = ImageProcessor()
    img = np.random.default_rng(0).integers(
        0, 255, size=(56, 84, 3)
    ).astype(np.uint8)
    patches, grid = proc(img)
    t, gh, gw = grid
    assert t == 1 and gh == 4 and gw == 6
    assert patches.shape == (gh * gw, 3 * 2 * 14 * 14)
    assert proc.num_llm_tokens(grid) == gh * gw // 4


def test_get_rope_index_matches_qwen2vl_semantics():
    from xllm_tpu.models.qwen2_vl import get_rope_index

    # prompt: [a, b, IMG x 4 (grid 1x4x4 merged 2 -> 2x2=4 tokens), c]
    toks = [5, 6] + [IMG_TOK] * 4 + [9]
    pos, offset = get_rope_index(toks, IMG_TOK, [(1, 4, 4)], merge_size=2)
    # text tokens 0,1 advance all components together
    np.testing.assert_array_equal(pos[:, 0], [0, 0, 0])
    np.testing.assert_array_equal(pos[:, 1], [1, 1, 1])
    # image span: t=2 constant, (h, w) lattice from 2
    np.testing.assert_array_equal(pos[0, 2:6], [2, 2, 2, 2])
    np.testing.assert_array_equal(pos[1, 2:6], [2, 2, 3, 3])
    np.testing.assert_array_equal(pos[2, 2:6], [2, 3, 2, 3])
    # text resumes at 2 + max(1, 2, 2) = 4
    np.testing.assert_array_equal(pos[:, 6], [4, 4, 4])
    # generated tokens: position = (n - 1) + offset advances from 5
    assert len(toks) - 1 + offset == 4


def test_vision_encoder_shapes():
    import jax

    from xllm_tpu.models.vision import VisionConfig, VisionEncoder

    cfg = VisionConfig(
        depth=2, embed_dim=32, num_heads=2, patch_size=14,
        temporal_patch_size=2, spatial_merge_size=2, hidden_size=64,
    )
    enc = VisionEncoder(cfg)
    params = enc.init_params(jax.random.key(0))
    patches = np.random.default_rng(1).standard_normal(
        (24, cfg.patch_dim)
    ).astype(np.float32)
    out = enc.encode(params, patches, 4, 6)
    assert out.shape == (6, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_vlm_engine_end_to_end():
    eng = LLMEngine(_vlm_config())
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8)
    prompt = [3, 4, IMG_TOK, 5, 6]

    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True
        ),
        request_id="img",
        images=[img],
    )
    # a text-only request shares the batch
    eng.add_request(
        prompt_token_ids=[3, 4, 5, 6, 9, 11],
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True
        ),
        request_id="txt",
    )
    outs = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
    assert len(outs["img"].outputs[0].token_ids) == 8
    assert len(outs["txt"].outputs[0].token_ids) == 8
    assert eng.block_manager.num_used_blocks == 0

    # a different image must change the continuation (embeddings differ);
    # the same image must reproduce it (and hit the encoder cache)
    img2 = rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8)
    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True
        ),
        request_id="img2",
        images=[img2],
    )
    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True
        ),
        request_id="img_again",
        images=[img],
    )
    outs2 = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
    assert (
        outs2["img_again"].outputs[0].token_ids
        == outs["img"].outputs[0].token_ids
    )
    assert (
        outs2["img2"].outputs[0].token_ids
        != outs["img"].outputs[0].token_ids
    )
    assert eng._encoder_cache.hits >= 1


def test_vlm_rejects_mismatched_images():
    eng = LLMEngine(_vlm_config())
    with pytest.raises(ValueError, match="image"):
        eng.add_request(
            prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_tokens=4),
            images=[np.zeros((56, 56, 3), np.uint8)],
        )


def test_vision_tower_matches_hf():
    """Vision tower parity vs transformers' Qwen2-VL implementation on a
    tiny config with copied weights (checkpoint-convention proof:
    patch ordering, 2D rope pairing, merger grouping)."""
    torch = pytest.importorskip("torch")
    try:
        from transformers.models.qwen2_vl.configuration_qwen2_vl import (
            Qwen2VLVisionConfig,
        )
        from transformers.models.qwen2_vl.modeling_qwen2_vl import (
            Qwen2VisionTransformerPretrainedModel,
        )
    except Exception:
        pytest.skip("transformers lacks qwen2_vl")
    import jax

    from xllm_tpu.models.vision import VisionConfig, VisionEncoder

    depth, dim, heads, ps = 2, 32, 2, 14
    hf_cfg = Qwen2VLVisionConfig(
        depth=depth, embed_dim=dim, num_heads=heads, hidden_size=48,
        mlp_ratio=2.0, in_channels=3, patch_size=ps,
        temporal_patch_size=2, spatial_merge_size=2,
    )
    torch.manual_seed(0)
    hf = Qwen2VisionTransformerPretrainedModel(hf_cfg).eval().float()

    cfg = VisionConfig(
        depth=depth, embed_dim=dim, num_heads=heads, mlp_ratio=2.0,
        in_channels=3, patch_size=ps, temporal_patch_size=2,
        spatial_merge_size=2, hidden_size=48,
    )
    enc = VisionEncoder(cfg)

    def t2np(t):
        return np.asarray(t.detach().numpy(), np.float32)

    sd = hf.state_dict()
    blocks = {
        "norm1_w": [], "norm1_b": [], "norm2_w": [], "norm2_b": [],
        "qkv_w": [], "qkv_b": [], "proj_w": [], "proj_b": [],
        "fc1_w": [], "fc1_b": [], "fc2_w": [], "fc2_b": [],
    }
    for i in range(depth):
        p = f"blocks.{i}."
        blocks["norm1_w"].append(t2np(sd[p + "norm1.weight"]))
        blocks["norm1_b"].append(t2np(sd[p + "norm1.bias"]))
        blocks["norm2_w"].append(t2np(sd[p + "norm2.weight"]))
        blocks["norm2_b"].append(t2np(sd[p + "norm2.bias"]))
        blocks["qkv_w"].append(t2np(sd[p + "attn.qkv.weight"]).T)
        blocks["qkv_b"].append(t2np(sd[p + "attn.qkv.bias"]))
        blocks["proj_w"].append(t2np(sd[p + "attn.proj.weight"]).T)
        blocks["proj_b"].append(t2np(sd[p + "attn.proj.bias"]))
        blocks["fc1_w"].append(t2np(sd[p + "mlp.fc1.weight"]).T)
        blocks["fc1_b"].append(t2np(sd[p + "mlp.fc1.bias"]))
        blocks["fc2_w"].append(t2np(sd[p + "mlp.fc2.weight"]).T)
        blocks["fc2_b"].append(t2np(sd[p + "mlp.fc2.bias"]))
    params = {
        "patch_embed_w": t2np(
            sd["patch_embed.proj.weight"]
        ).reshape(dim, -1).T,
        "blocks": {k: np.stack(v) for k, v in blocks.items()},
        "merger_ln_w": t2np(sd["merger.ln_q.weight"]),
        "merger_ln_b": t2np(sd["merger.ln_q.bias"]),
        "merger_fc1_w": t2np(sd["merger.mlp.0.weight"]).T,
        "merger_fc1_b": t2np(sd["merger.mlp.0.bias"]),
        "merger_fc2_w": t2np(sd["merger.mlp.2.weight"]).T,
        "merger_fc2_b": t2np(sd["merger.mlp.2.bias"]),
    }
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)

    gh, gw = 4, 6
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((gh * gw, cfg.patch_dim)).astype(np.float32)
    grid_thw = torch.tensor([[1, gh, gw]])
    with torch.no_grad():
        want = hf(
            torch.from_numpy(patches), grid_thw=grid_thw
        ).numpy()
    got = np.asarray(enc.encode(params, patches, gh, gw))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_qwen2vl_checkpoint_loader_roundtrip(tmp_path):
    """Save a tiny HF Qwen2-VL checkpoint; load through load_model_config +
    load_params; prove (a) the ModelConfig maps the VLM fields, (b) the
    vision tower output matches HF's visual module on the loaded weights."""
    torch = pytest.importorskip("torch")
    try:
        from transformers.models.qwen2_vl.configuration_qwen2_vl import (
            Qwen2VLConfig,
        )
        from transformers.models.qwen2_vl.modeling_qwen2_vl import (
            Qwen2VLForConditionalGeneration,
        )
    except Exception:
        pytest.skip("transformers lacks qwen2_vl")
    import jax.numpy as jnp

    from xllm_tpu.models.loader import load_params
    from xllm_tpu.models.model_args import load_model_config
    from xllm_tpu.models.registry import create_model

    hf_cfg = Qwen2VLConfig(
        vocab_size=128,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        vision_config={
            "depth": 2, "embed_dim": 32, "num_heads": 2, "hidden_size": 48,
            "mlp_ratio": 2.0, "in_chans": 3, "patch_size": 14,
            "temporal_patch_size": 2, "spatial_merge_size": 2,
        },
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    mc = load_model_config(str(tmp_path))
    assert mc.model_type == "qwen2_vl"
    assert mc.mrope_section == [2, 2, 2]
    assert mc.image_token_id == hf_cfg.image_token_id
    assert mc.vision["depth"] == 2
    mc.dtype = "float32"

    model = create_model(mc)
    params = load_params(mc, shardings=None, dtype=jnp.float32)
    assert "visual" in params

    gh, gw = 4, 4
    rng = np.random.default_rng(0)
    patches = rng.standard_normal(
        (gh * gw, model.vision_cfg.patch_dim)
    ).astype(np.float32)
    with torch.no_grad():
        want = hf.visual(
            torch.from_numpy(patches), grid_thw=torch.tensor([[1, gh, gw]])
        ).numpy()
    got = np.asarray(model.encode_images(params, patches, (1, gh, gw)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
