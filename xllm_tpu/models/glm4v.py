"""GLM-4V / GLM-4.5V: glm4 text backbone + GLM vision tower + M-RoPE.

Counterpart of the reference's glm4v VLM family
(reference xllm/models/vlm/glm4v.h + glm4v-moe registration,
model_registry VLM rows; HF Glm4vForConditionalGeneration is the weight
oracle). Shares the TPU VLM design of qwen2_vl.py: the tower feeds the
decoder through embedding-override prefill rows; prefill rows carry
explicit [3, S] (t, h, w) position ids; decode reduces to 1D rope at
``position + rope_offset``.

The text stack is the glm4 arch (sandwich norms, fused gate_up split at
load, q/k/v bias) with M-RoPE applied in glm4's PARTIAL-INTERLEAVED
convention: the (t, h, w) sections drive the first ``sum(sections)``
frequency slots, rotated as even/odd pairs over the first
``2*sum(sections)`` dims; the tail passes through (HF
apply_multimodal_rotary_pos_emb + rotate_half_llm).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.config import ModelConfig
from xllm_tpu.models.decoder import DenseDecoderModel
from xllm_tpu.models.moe_decoder import MoeDecoderModel
from xllm_tpu.models.registry import ModelRegistry
from xllm_tpu.models.vision_glm import GlmVisionConfig, GlmVisionEncoder


def apply_mrope_glm(
    q: jnp.ndarray,  # [T, Hq, D]
    k: jnp.ndarray,  # [T, Hkv, D]
    positions3: jnp.ndarray,  # [3, T]
    inv_freq: jnp.ndarray,  # [sum(sections)] f32
    sections: tuple[int, int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Partial-interleaved multimodal rope (glm4v text attention)."""
    nslots = inv_freq.shape[0]
    comp = np.zeros(nslots, np.int32)
    comp[sections[0] : sections[0] + sections[1]] = 1
    comp[sections[0] + sections[1] :] = 2
    comp = jnp.asarray(comp)
    pos = positions3.astype(jnp.float32)  # [3, T]
    angles = pos[comp, :].T * inv_freq[None, :]  # [T, nslots]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]
    rot = 2 * nslots

    def r(x):
        xf = x.astype(jnp.float32)
        xr, rest = xf[..., :rot], xf[..., rot:]
        pairs = xr.reshape(*xr.shape[:-1], -1, 2)
        xre, xim = pairs[..., 0], pairs[..., 1]
        out = jnp.stack(
            [xre * cos - xim * sin, xim * cos + xre * sin], axis=-1
        ).reshape(xr.shape)
        return jnp.concatenate([out, rest], axis=-1).astype(x.dtype)

    return r(q), r(k)


def apply_mrope_glm_half(
    q: jnp.ndarray,
    k: jnp.ndarray,
    positions3: jnp.ndarray,  # [3, T]
    inv_freq: jnp.ndarray,  # [sum(sections)]
    sections: tuple[int, int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Partial CHUNKED-section rotate-half M-RoPE (glm4v_moe text
    attention — HF Glm4vMoe apply_multimodal_rotary_pos_emb)."""
    nslots = inv_freq.shape[0]
    comp = np.zeros(nslots, np.int32)
    comp[sections[0] : sections[0] + sections[1]] = 1
    comp[sections[0] + sections[1] :] = 2
    comp = jnp.asarray(comp)
    pos = positions3.astype(jnp.float32)
    angles = pos[comp, :].T * inv_freq[None, :]  # [T, nslots]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]
    rot = 2 * nslots

    def r(x):
        xf = x.astype(jnp.float32)
        xr, rest = xf[..., :rot], xf[..., rot:]
        x1, x2 = xr[..., :nslots], xr[..., nslots:]
        out = jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )
        return jnp.concatenate([out, rest], axis=-1).astype(x.dtype)

    return r(q), r(k)


@ModelRegistry.register("glm4v", "glm4v_text")
class Glm4vModel(DenseDecoderModel):
    """glm4 decoder with M-RoPE + the GLM vision tower."""

    is_vlm = True
    # each video frame carries its own (1, h, w) rope grid; temporal info
    # rides the prompt's per-frame timestamp tokens (HF glm4v processor)
    video_grid_per_frame = True

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        vc = cfg.vision or {}
        self.vision_cfg = GlmVisionConfig(
            depth=vc.get("depth", 24),
            hidden_size=vc.get("hidden_size", 1536),
            num_heads=vc.get("num_heads", 12),
            intermediate_size=vc.get("intermediate_size", 13696),
            out_hidden_size=vc.get("out_hidden_size", cfg.hidden_size),
            in_channels=vc.get("in_channels", 3),
            image_size=vc.get("image_size", 336),
            patch_size=vc.get("patch_size", 14),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            rms_norm_eps=vc.get("rms_norm_eps", 1e-5),
            attention_bias=bool(vc.get("attention_bias", False)),
        )
        self.vision = GlmVisionEncoder(self.vision_cfg, dtype=self.dtype)
        self.mrope_section = tuple(cfg.mrope_section or (16, 24, 24))
        self.image_token_id = cfg.image_token_id
        self.video_token_id = getattr(cfg, "video_token_id", -1)
        self.vision_tokens_per_second = 0.0  # temporal idx = frame number

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        params = super().init_params(k1)
        params["visual"] = self.vision.init_params(k2)
        return params

    def param_shardings(self) -> dict:
        out = super().param_shardings()
        out["visual"] = self.vision.param_shardings()
        return out

    # ------------------------------------------------------------------
    def _attn_qkv(self, lp, x, positions, inv_freq):
        """positions is [T] (decode / text) or [3, T] (VLM prefill)."""
        c = self.cfg
        t = x.shape[0]
        hkv, dh = c.num_kv_heads, c.head_dim
        g = c.num_attention_heads // hkv
        qkv = self._linear(lp, "qkv_proj_w", x)
        if c.attention_bias:
            qkv = qkv + lp["qkv_proj_b"]
        qkv = qkv.astype(x.dtype).reshape(t, hkv, g + 2, dh)
        q = qkv[:, :, :g].reshape(t, c.num_attention_heads, dh)
        k = qkv[:, :, g]
        v = qkv[:, :, g + 1]
        pos3 = (
            positions
            if positions.ndim == 2
            else jnp.broadcast_to(positions[None], (3, t))
        )
        fn = (
            apply_mrope_glm
            if self.cfg.rope_interleaved
            else apply_mrope_glm_half
        )
        q, k = fn(q, k, pos3, inv_freq, self.mrope_section)
        return q, k, v

    # ------------------------------------------------------------------
    def encode_images(
        self, params: dict, patches: jnp.ndarray, grid: tuple[int, int, int]
    ) -> jnp.ndarray:
        t, gh, gw = grid
        return self.vision.encode(params["visual"], patches, gh, gw, grid_t=t)


@ModelRegistry.register("glm4v_moe")
class Glm4vMoeModel(Glm4vModel, MoeDecoderModel):
    """GLM-4.5V: glm4v tower + glm4_moe text backbone (reference glm4v-moe
    VLM row): sigmoid noaux routing, first_k_dense prefix, chunked
    rotate-half partial M-RoPE (cooperative MRO like qwen3_vl_moe)."""
