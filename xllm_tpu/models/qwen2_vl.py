"""Qwen2-VL: dense LLM + vision tower + M-RoPE.

Counterpart of the reference's qwen2-vl / qwen2.5-vl models
(reference xllm/models/vlm/qwen2_vl.h + mrope helpers under
xllm/models/vlm/mposition/, VLMEngine vlm_engine.h:37). TPU-native
design:

- the vision tower output feeds the decoder through the
  embedding-override inputs (BatchedPrefillInput.extra_embeds/extra_mask)
  — no splicing of variable-length embedding lists inside jit;
- M-RoPE: prefill rows carry explicit [3, S] (t, h, w) position ids
  computed at intake (``get_rope_index``); decode rows reduce to 1D rope
  at ``position + rope_offset`` because all three components are equal on
  text continuations (the per-sequence offset is the reference's
  mrope-delta, mposition helpers);
- decode/KV/causal logic is untouched — image tokens are ordinary tokens
  with overridden embeddings and positions.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.config import ModelConfig
from xllm_tpu.models.decoder import DenseDecoderModel
from xllm_tpu.models.registry import ModelRegistry
from xllm_tpu.models.vision import VisionConfig, VisionEncoder
from xllm_tpu.ops.rope import rope_inv_freq


def get_rope_index(
    token_ids: list[int],
    image_token_id: int,
    grids: list[tuple[int, int, int]],
    merge_size: int = 2,
    video_token_id: int = -9,
    second_per_grid_ts: list[float] | None = None,
    tokens_per_second: float = 0.0,
) -> tuple[np.ndarray, int]:
    """qwen2-vl M-RoPE position ids for an (expanded) prompt.

    Returns (positions [3, N] int32, rope_offset): text tokens advance all
    three components together; an image/video span of grid (t, gh, gw)
    uses t/h/w lattice positions starting at the running offset; after the
    span the text counter resumes past the span's max position.
    rope_offset = next position for generated tokens minus N (so decode
    rope position = (num_tokens - 1) + rope_offset).

    Video spans (reference video processors + VLM mrope): with
    ``tokens_per_second > 0`` (qwen2.5-vl) the temporal index advances by
    wall-clock seconds per temporal grid step; otherwise (qwen2-vl) it
    advances by one per step. ``grids``/``second_per_grid_ts`` are per
    media item in prompt order (images and videos interleaved).
    """
    n = len(token_ids)
    pos = np.zeros((3, n), np.int64)
    st = 0  # running position offset
    i = 0
    img_i = 0
    media_toks = {image_token_id, video_token_id}
    while i < n:
        if token_ids[i] in media_toks and img_i < len(grids):
            t, gh, gw = grids[img_i]
            lh, lw = gh // merge_size, gw // merge_size
            span = t * lh * lw
            t_steps = np.arange(t)
            if token_ids[i] == video_token_id and tokens_per_second > 0:
                spg = 1.0
                if second_per_grid_ts and img_i < len(second_per_grid_ts):
                    spg = second_per_grid_ts[img_i]
                t_steps = (t_steps * spg * tokens_per_second).astype(np.int64)
            t_idx = np.repeat(t_steps, lh * lw)
            h_idx = np.tile(np.repeat(np.arange(lh), lw), t)
            w_idx = np.tile(np.arange(lw), t * lh)
            pos[0, i : i + span] = st + t_idx
            pos[1, i : i + span] = st + h_idx
            pos[2, i : i + span] = st + w_idx
            st = st + max(int(t_idx.max()) + 1, lh, lw)
            i += span
            img_i += 1
        else:
            pos[:, i] = st
            st += 1
            i += 1
    rope_offset = st - n
    return pos.astype(np.int32), int(rope_offset)


def mrope_slot_components(
    half: int, sections: tuple[int, int, int], interleaved: bool = False
) -> np.ndarray:
    """Which (t=0, h=1, w=2) component drives each frequency slot.

    Chunked (qwen2-vl): [TTT...HHH...WWW]. Interleaved (qwen3-vl,
    HF apply_interleaved_mrope): slot j%3==1 takes H while j < 3*sec_h,
    j%3==2 takes W while j < 3*sec_w, T everywhere else — preserving
    frequency continuity across components."""
    sec = np.zeros(half, np.int32)
    if interleaved:
        for j in range(half):
            if j % 3 == 1 and j < 3 * sections[1]:
                sec[j] = 1
            elif j % 3 == 2 and j < 3 * sections[2]:
                sec[j] = 2
    else:
        sec[sections[0] : sections[0] + sections[1]] = 1
        sec[sections[0] + sections[1] :] = 2
    return sec


def apply_mrope(
    q: jnp.ndarray,  # [T, Hq, D]
    k: jnp.ndarray,  # [T, Hkv, D]
    positions3: jnp.ndarray,  # [3, T]
    inv_freq: jnp.ndarray,  # [D/2]
    sections: tuple[int, int, int],
    interleaved: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal rotary embedding: the D/2 frequency slots are split into
    (t, h, w) sections; slot j uses component section(j)'s position."""
    half = inv_freq.shape[0]
    comp = jnp.asarray(mrope_slot_components(half, sections, interleaved))
    pos = positions3.astype(jnp.float32)  # [3, T]
    pos_per_slot = pos[comp, :]  # [half, T] -> component position per slot
    freqs = pos_per_slot.T * inv_freq[None, :]  # [T, half]
    cos = jnp.cos(freqs)[:, None, :]
    sin = jnp.sin(freqs)[:, None, :]

    def rot(x):
        x1, x2 = x[..., :half], x[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    return rot(q), rot(k)


@ModelRegistry.register("qwen2_vl", "qwen2_5_vl")
class Qwen2VLModel(DenseDecoderModel):
    """Decoder with M-RoPE + an attached vision tower."""

    is_vlm = True

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        vc = cfg.vision or {}
        self.vision_cfg = VisionConfig(
            depth=vc.get("depth", 32),
            embed_dim=vc.get("embed_dim", vc.get("hidden_size", 1280)),
            num_heads=vc.get("num_heads", 16),
            mlp_ratio=vc.get("mlp_ratio", 4.0),
            in_channels=vc.get("in_channels", vc.get("in_chans", 3)),
            patch_size=vc.get("patch_size", 14),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            hidden_size=cfg.hidden_size,
        )
        self.vision = VisionEncoder(self.vision_cfg, dtype=self.dtype)
        self.mrope_section = tuple(
            cfg.mrope_section or (16, 24, 24)
        )
        self.image_token_id = cfg.image_token_id
        self.video_token_id = getattr(cfg, "video_token_id", -1)
        self.mrope_interleaved = bool(getattr(cfg, "mrope_interleaved", False))
        # qwen2.5-vl temporal M-RoPE scale (absent/0 for qwen2-vl)
        self.vision_tokens_per_second = float(
            vc.get("tokens_per_second", 0.0) or 0.0
        )

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
        if c.qk_norm:
            from xllm_tpu.ops.norms import rms_norm

            q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
        if positions.ndim == 2:
            q, k = apply_mrope(
                q, k, positions, inv_freq, self.mrope_section,
                interleaved=self.mrope_interleaved,
            )
        else:
            # text-only rows: all three components equal -> plain rope
            q, k = apply_mrope(
                q, k, jnp.broadcast_to(positions[None], (3, t)),
                inv_freq, self.mrope_section,
                interleaved=self.mrope_interleaved,
            )
        return q, k, v

    # ------------------------------------------------------------------
    def encode_images(
        self, params: dict, patches: jnp.ndarray, grid: tuple[int, int, int]
    ) -> jnp.ndarray:
        """-> merged embeddings [n_llm_tokens, D] for one image."""
        _, gh, gw = grid
        return self.vision.encode(params["visual"], patches, gh, gw)
