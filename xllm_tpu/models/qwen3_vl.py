"""Qwen3-VL: qwen3 text backbone + qwen3 vision tower + DeepStack.

Counterpart of the reference's qwen3-vl models
(reference xllm/models/vlm/qwen3_vl.h, qwen3_vl_base.h; the deepstack
per-layer visual-feature injection is the oxygen/qwen3-vl forward,
xllm/models/llm/oxygen.h:36-95 ``h = h + deep_stacks[i]``). Differences
from qwen2-vl:

- interleaved M-RoPE slot layout (HF apply_interleaved_mrope);
- the vision tower (models/vision3.py) returns BOTH the merged
  embeddings and K deepstack feature maps; the decoder adds map k to the
  hidden states at image rows after layer k (first K layers);
- videos are split into per-frame t=1 grids (HF get_rope_index
  repeat_interleaves video grids; the reference processor interleaves
  timestamp text tokens between frames — token-level timestamps ride the
  prompt, not the rope).
"""

from __future__ import annotations

import jax

from xllm_tpu.config import ModelConfig
from xllm_tpu.models.moe_decoder import MoeDecoderModel
from xllm_tpu.models.qwen2_vl import Qwen2VLModel
from xllm_tpu.models.registry import ModelRegistry
from xllm_tpu.models.vision3 import Qwen3VisionEncoder, Vision3Config


@ModelRegistry.register("qwen3_vl")
class Qwen3VLModel(Qwen2VLModel):
    is_vlm = True
    has_deepstack = True
    video_grid_per_frame = True

    def __init__(self, cfg: ModelConfig):
        # skip Qwen2VLModel.__init__'s tower; build the v3 tower instead
        super(Qwen2VLModel, self).__init__(cfg)
        vc = cfg.vision or {}
        self.vision_cfg = Vision3Config(
            depth=vc.get("depth", 27),
            hidden_size=vc.get("hidden_size", 1152),
            intermediate_size=vc.get("intermediate_size", 4304),
            num_heads=vc.get("num_heads", 16),
            in_channels=vc.get("in_channels", 3),
            patch_size=vc.get("patch_size", 16),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            out_hidden_size=vc.get("out_hidden_size", cfg.hidden_size),
            num_position_embeddings=vc.get("num_position_embeddings", 2304),
            deepstack_visual_indexes=tuple(
                vc.get("deepstack_visual_indexes", (0, 1, 2))
            ),
        )
        self.vision = Qwen3VisionEncoder(self.vision_cfg, dtype=self.dtype)
        self.mrope_section = tuple(cfg.mrope_section or (24, 20, 20))
        self.mrope_interleaved = True
        self.image_token_id = cfg.image_token_id
        self.video_token_id = getattr(cfg, "video_token_id", -1)
        self.vision_tokens_per_second = 0.0  # qwen3-vl: t index is 0/frame

    # spatial_merge_size alias used by the image/video processors
    @property
    def num_deepstack(self) -> int:
        return len(self.vision_cfg.deepstack_visual_indexes)


@ModelRegistry.register("qwen3_vl_moe")
class Qwen3VLMoeModel(Qwen3VLModel, MoeDecoderModel):
    """qwen3-vl with the qwen3-moe text backbone (reference
    xllm/models/vlm/qwen3_vl_moe.h): cooperative MRO — the VLM layer
    (tower, M-RoPE, deepstack) wraps MoeDecoderModel's expert MLPs."""
