"""VLM video path: processor, frame sampling, M-RoPE, tower, engine E2E.

Counterpart of the reference's video processors + VLM video flow
(reference xllm/processors/qwen2_vl_video_processor.h:30-49,
video_processor.h, qwen2_vl_prompt_processor.cpp video branch) on tiny
random-weight models, with HF parity where transformers provides the
oracle.
"""

import numpy as np
import pytest

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.processors.video import VideoProcessor, sample_frames

IMG_TOK = 77
VID_TOK = 78


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
            mrope_section=[2, 3, 3],
            image_token_id=IMG_TOK,
            video_token_id=VID_TOK,
            vision={
                "depth": 2,
                "embed_dim": 32,
                "num_heads": 2,
                "patch_size": 14,
                "temporal_patch_size": 2,
                "spatial_merge_size": 2,
            },
        ),
        cache=CacheConfig(num_blocks=64, block_size=8),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_chunk_for_prefill=64,
            max_model_len=256,
            decode_batch_buckets=[4],
            prefill_token_buckets=[8, 64],
            prefill_row_buckets=[1, 4],
        ),
    )


def test_sample_frames():
    # 30 fps, 6 s video, target 2 fps -> 12 frames, tp-even
    idx = sample_frames(180, 30.0, target_fps=2.0, temporal_patch_size=2)
    assert len(idx) == 12 and len(idx) % 2 == 0
    assert idx[0] == 0 and idx[-1] == 179
    # unknown fps keeps all frames (rounded to tp)
    idx = sample_frames(7, 0.0, temporal_patch_size=2)
    assert len(idx) == 6
    # clamps: short video below min_frames keeps what exists
    idx = sample_frames(2, 30.0, min_frames=4, temporal_patch_size=2)
    assert len(idx) == 2
    # max_frames cap applies
    idx = sample_frames(10000, 1.0, max_frames=16, temporal_patch_size=2)
    assert len(idx) == 16


def test_video_processor_grid_and_rows():
    proc = VideoProcessor(patch_size=14, merge_size=2, temporal_patch_size=2)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(4, 56, 84, 3)).astype(np.uint8)
    patches, grid, spg = proc(frames, fps=0.0)
    gt, gh, gw = grid
    assert (gt, gh, gw) == (2, 4, 6)
    assert patches.shape == (gt * gh * gw, 3 * 2 * 14 * 14)
    assert spg == 1.0
    # fps sets second_per_grid_t = tp / fps
    _, _, spg = proc(frames, fps=2.0)
    assert spg == pytest.approx(1.0)
    # a still-image video (all frames equal) produces the image layout
    # repeated over t: row blocks for each t must be identical
    still = np.repeat(frames[:1], 4, axis=0)
    p2, g2, _ = proc(still, fps=0.0)
    half = g2[1] * g2[2]
    np.testing.assert_array_equal(p2[:half], p2[half:])


def test_video_patch_rows_match_hf():
    """Patch row order parity vs transformers' Qwen2VLImageProcessor
    video path (the layout contract of the vision tower)."""
    try:
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor,
        )
    except Exception:
        pytest.skip("transformers lacks qwen2_vl")
    rng = np.random.default_rng(1)
    # sizes already factor multiples -> no resize, exact value parity
    frames = rng.integers(0, 255, size=(4, 56, 84, 3)).astype(np.uint8)
    hf = Qwen2VLImageProcessor(
        min_pixels=56 * 56, max_pixels=28 * 28 * 1280
    )
    try:
        out = hf(images=None, videos=[list(frames)], return_tensors="np")
    except Exception:
        pytest.skip("installed transformers cannot process videos")
    want = out["pixel_values_videos"]
    want_grid = out["video_grid_thw"][0]

    proc = VideoProcessor(
        patch_size=14, merge_size=2, temporal_patch_size=2,
        min_pixels=56 * 56, max_pixels=28 * 28 * 1280,
    )
    got, grid, _ = proc(frames, fps=0.0)
    assert tuple(grid) == tuple(want_grid)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_get_rope_index_with_video_matches_hf():
    """M-RoPE positions for a mixed image+video prompt vs HF
    Qwen2VLForConditionalGeneration.get_rope_index."""
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

    from xllm_tpu.models.qwen2_vl import get_rope_index

    hf_cfg = Qwen2VLConfig(
        vocab_size=160,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=151,
        video_token_id=152,
        vision_start_token_id=150,
        vision_config={
            "depth": 1, "embed_dim": 32, "num_heads": 2, "hidden_size": 48,
            "patch_size": 14, "temporal_patch_size": 2,
            "spatial_merge_size": 2,
        },
    )
    model = Qwen2VLForConditionalGeneration(hf_cfg)

    img_grid = (1, 4, 6)     # 6 LLM tokens
    vid_grid = (2, 4, 4)     # 8 LLM tokens
    ids = (
        [5, 6, 150] + [151] * 6 + [7, 150] + [152] * 8 + [8, 9]
    )
    pos_hf, delta_hf = model.model.get_rope_index(
        torch.tensor([ids]),
        image_grid_thw=torch.tensor([img_grid]),
        video_grid_thw=torch.tensor([vid_grid]),
        attention_mask=torch.ones(1, len(ids), dtype=torch.long),
    )
    pos, offset = get_rope_index(
        ids, 151, [img_grid, vid_grid], merge_size=2, video_token_id=152
    )
    np.testing.assert_array_equal(pos, pos_hf[:, 0].numpy())
    assert offset == int(delta_hf[0])


def test_vision_tower_video_matches_hf():
    """Tower parity on a grid_t=2 video patch batch (temporal rope tiling
    + full attention over the whole video)."""
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

    gt, gh, gw = 2, 4, 6
    rng = np.random.default_rng(0)
    patches = rng.standard_normal(
        (gt * gh * gw, cfg.patch_dim)
    ).astype(np.float32)
    grid_thw = torch.tensor([[gt, gh, gw]])
    with torch.no_grad():
        want = hf(torch.from_numpy(patches), grid_thw=grid_thw).numpy()
    got = np.asarray(enc.encode(params, patches, gh, gw, grid_t=gt))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_vlm_engine_video_end_to_end():
    eng = LLMEngine(_vlm_config())
    rng = np.random.default_rng(3)
    vid = rng.integers(0, 255, size=(4, 56, 56, 3)).astype(np.uint8)
    img = rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    eng.add_request(
        prompt_token_ids=[3, VID_TOK, 5],
        sampling_params=sp, request_id="vid", videos=[(vid, 2.0)],
    )
    # mixed media: image + video in one prompt
    eng.add_request(
        prompt_token_ids=[3, IMG_TOK, 4, VID_TOK, 5],
        sampling_params=sp, request_id="mixed",
        images=[img], videos=[vid],
    )
    outs = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
    assert len(outs["vid"].outputs[0].token_ids) == 8
    assert len(outs["mixed"].outputs[0].token_ids) == 8
    assert eng.block_manager.num_used_blocks == 0

    # a different video changes the continuation; same video reproduces
    vid2 = rng.integers(0, 255, size=(4, 56, 56, 3)).astype(np.uint8)
    eng.add_request(
        prompt_token_ids=[3, VID_TOK, 5],
        sampling_params=sp, request_id="vid2", videos=[(vid2, 2.0)],
    )
    eng.add_request(
        prompt_token_ids=[3, VID_TOK, 5],
        sampling_params=sp, request_id="vid_again", videos=[(vid, 2.0)],
    )
    outs2 = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
    assert (
        outs2["vid_again"].outputs[0].token_ids
        == outs["vid"].outputs[0].token_ids
    )
    assert (
        outs2["vid2"].outputs[0].token_ids
        != outs["vid"].outputs[0].token_ids
    )

    # count mismatch rejected
    with pytest.raises(ValueError, match="video"):
        eng.add_request(
            prompt_token_ids=[3, 4, 5], sampling_params=sp, videos=[vid]
        )


def test_api_video_extraction():
    """GIF data URLs and frame lists decode to (frames, fps) videos with
    placeholder markup (zero-egress: no container decoding)."""
    import base64
    import io
    import types

    from PIL import Image

    from xllm_tpu.server.api import APIServer

    rng = np.random.default_rng(5)
    frames = [
        Image.fromarray(
            rng.integers(0, 255, size=(28, 28, 3)).astype(np.uint8)
        )
        for _ in range(4)
    ]
    buf = io.BytesIO()
    frames[0].save(
        buf, format="GIF", save_all=True, append_images=frames[1:],
        duration=250, loop=0,
    )
    gif_url = "data:image/gif;base64," + base64.b64encode(
        buf.getvalue()
    ).decode()

    def png_url(im):
        b = io.BytesIO()
        im.save(b, format="PNG")
        return "data:image/png;base64," + base64.b64encode(
            b.getvalue()
        ).decode()

    srv = types.SimpleNamespace(
        config=types.SimpleNamespace(
            model=types.SimpleNamespace(
                image_token_id=-1, video_token_id=-1,
                vision_start_token_id=-1,
            )
        ),
        engine=types.SimpleNamespace(tokenizer=None),
    )
    srv._image_placeholder = lambda: APIServer._image_placeholder(srv)
    srv._video_placeholder = lambda: APIServer._video_placeholder(srv)
    srv._decode_data_image = APIServer._decode_data_image

    messages = [
        {"role": "user", "content": [
            {"type": "text", "text": "watch: "},
            {"type": "video_url", "video_url": {"url": gif_url}},
            {"type": "video", "frames": [png_url(f) for f in frames],
             "fps": 2.0},
        ]},
    ]
    norm, images, videos = APIServer._extract_images(srv, messages)
    assert not images and len(videos) == 2
    f0, fps0 = videos[0]
    assert f0.shape == (4, 28, 28, 3) and fps0 == pytest.approx(4.0)
    f1, fps1 = videos[1]
    assert f1.shape == (4, 28, 28, 3) and fps1 == 2.0
    assert norm[0]["content"].count("<|video_pad|>") == 2

    with pytest.raises(ValueError, match="data"):
        APIServer._extract_images(srv, [
            {"role": "user", "content": [
                {"type": "video_url",
                 "video_url": {"url": "http://x/video.mp4"}},
            ]},
        ])
