"""Qwen2-VL vision tower (ViT + patch merger) in JAX.

Counterpart of the reference's VLM model stack
(reference xllm/models/vlm/qwen2_vl.h vision encoder layers,
xllm/core/layers vision encoder blocks, processors for patching;
mrope helpers under xllm/models/vlm/mposition/). TPU-native notes:

- the encoder is a plain functional pytree like the decoders: per-block
  tensors stacked on a leading axis, one ``lax.scan`` over depth;
- images arrive PRE-PATCHED from the host processor
  (``processors/image.py``): [N, C*Tp*ph*pw] rows plus the (t, h, w)
  grid — all static-shape friendly;
- 2D rotary position embedding over the (h, w) grid inside the tower;
  the merged tokens feed the LLM stream via the embedding-override path
  (BatchedPrefillInput.extra_embeds), the TPU replacement for the
  reference's mm-embedding splicing (mm_handler.h:31,104).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xllm_tpu.models.decoder import TP_AXIS


@dataclass
class VisionConfig:
    """qwen2-vl "vision_config" subset (config.json)."""

    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: float = 4.0
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_size: int = 3584  # LLM hidden size (merger output)

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def merge_dim(self) -> int:
        return self.embed_dim * self.spatial_merge_size**2


class VisionEncoder:
    def __init__(self, cfg: VisionConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.head_dim = cfg.embed_dim // cfg.num_heads

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        d = c.embed_dim
        mlp = int(d * c.mlp_ratio)

        def w(key, *shape, scale=0.02):
            return (
                jax.random.normal(key, shape, jnp.float32) * scale
            ).astype(self.dtype)

        ks = iter(jax.random.split(rng, 12))
        blocks = {
            "norm1_w": jnp.ones((c.depth, d), self.dtype),
            "norm1_b": jnp.zeros((c.depth, d), self.dtype),
            "norm2_w": jnp.ones((c.depth, d), self.dtype),
            "norm2_b": jnp.zeros((c.depth, d), self.dtype),
            "qkv_w": w(next(ks), c.depth, d, 3 * d),
            "qkv_b": jnp.zeros((c.depth, 3 * d), self.dtype),
            "proj_w": w(next(ks), c.depth, d, d),
            "proj_b": jnp.zeros((c.depth, d), self.dtype),
            "fc1_w": w(next(ks), c.depth, d, mlp),
            "fc1_b": jnp.zeros((c.depth, mlp), self.dtype),
            "fc2_w": w(next(ks), c.depth, mlp, d),
            "fc2_b": jnp.zeros((c.depth, d), self.dtype),
        }
        return {
            "patch_embed_w": w(next(ks), c.patch_dim, d),
            "blocks": blocks,
            "merger_ln_w": jnp.ones((d,), self.dtype),
            "merger_ln_b": jnp.zeros((d,), self.dtype),
            "merger_fc1_w": w(next(ks), c.merge_dim, c.merge_dim),
            "merger_fc1_b": jnp.zeros((c.merge_dim,), self.dtype),
            "merger_fc2_w": w(next(ks), c.merge_dim, c.hidden_size),
            "merger_fc2_b": jnp.zeros((c.hidden_size,), self.dtype),
        }

    def param_shardings(self) -> dict:
        blocks = {
            "norm1_w": P(), "norm1_b": P(), "norm2_w": P(), "norm2_b": P(),
            "qkv_w": P(None, None, TP_AXIS), "qkv_b": P(None, TP_AXIS),
            "proj_w": P(None, TP_AXIS, None), "proj_b": P(),
            "fc1_w": P(None, None, TP_AXIS), "fc1_b": P(None, TP_AXIS),
            "fc2_w": P(None, TP_AXIS, None), "fc2_b": P(),
        }
        return {
            "patch_embed_w": P(),
            "blocks": blocks,
            "merger_ln_w": P(), "merger_ln_b": P(),
            "merger_fc1_w": P(), "merger_fc1_b": P(),
            "merger_fc2_w": P(None, TP_AXIS), "merger_fc2_b": P(TP_AXIS),
        }

    # ------------------------------------------------------------------
    def _rot_pos(self, grid_h: int, grid_w: int) -> jnp.ndarray:
        """2D rope position ids per patch (row-major h, w)."""
        m = self.cfg.spatial_merge_size
        hh = grid_h // m
        ww = grid_w // m
        # qwen2-vl orders patches merge-block-major
        hpos = jnp.arange(grid_h, dtype=jnp.int32)
        wpos = jnp.arange(grid_w, dtype=jnp.int32)
        h_ids = jnp.repeat(hpos[:, None], grid_w, axis=1)
        w_ids = jnp.repeat(wpos[None, :], grid_h, axis=0)

        def blockify(x):
            return (
                x.reshape(hh, m, ww, m)
                .transpose(0, 2, 1, 3)
                .reshape(-1)
            )

        return jnp.stack([blockify(h_ids), blockify(w_ids)], axis=-1)

    def _rope_2d(self, q, k, pos_hw):
        """Apply half-h/half-w rotary embedding (qwen2-vl vision rope)."""
        n, heads, dh = q.shape
        half = dh // 2
        quarter = half // 2
        inv = 1.0 / (
            10000.0
            ** (jnp.arange(0, quarter, dtype=jnp.float32) / quarter)
        )
        freqs_h = pos_hw[:, 0:1].astype(jnp.float32) * inv[None, :]
        freqs_w = pos_hw[:, 1:2].astype(jnp.float32) * inv[None, :]
        freqs = jnp.concatenate([freqs_h, freqs_w], axis=-1)  # [N, half]
        cos = jnp.cos(freqs)[:, None, :]
        sin = jnp.sin(freqs)[:, None, :]

        def rot(x):
            x1, x2 = x[..., :half], x[..., half:]
            return jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
            ).astype(x.dtype)

        return rot(q), rot(k)

    def encode(
        self,
        params: dict,
        patches: jnp.ndarray,
        grid_h: int,
        grid_w: int,
        grid_t: int = 1,
    ) -> jnp.ndarray:
        """[N, patch_dim] -> merged LLM-space embeddings [N/m^2, hidden].

        ``grid_t > 1`` is the video path (reference video processors,
        qwen2_vl_video_processor.h:30): N = grid_t*grid_h*grid_w patch
        rows, temporal groups share the (h, w) rope lattice, and
        attention is block-diagonal per temporal group (HF Qwen2-VL
        cu_seqlens repeat h*w per t)."""
        c = self.cfg
        heads, dh = c.num_heads, self.head_dim
        x = jnp.dot(
            patches.astype(self.dtype), params["patch_embed_w"],
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        n = x.shape[0]
        pos_hw = self._rot_pos(grid_h, grid_w)
        seg_bias = None
        if grid_t > 1:
            pos_hw = jnp.tile(pos_hw, (grid_t, 1))
            seg = jnp.arange(n, dtype=jnp.int32) // (grid_h * grid_w)
            seg_bias = jnp.where(
                seg[:, None] == seg[None, :], 0.0, -jnp.inf
            )[None]  # [1, N, N] broadcast over heads

        def ln(v, w, b):
            mu = jnp.mean(v.astype(jnp.float32), axis=-1, keepdims=True)
            var = jnp.var(v.astype(jnp.float32), axis=-1, keepdims=True)
            return ((v - mu) * jax.lax.rsqrt(var + 1e-6) * w + b).astype(
                v.dtype
            )

        def block(x, bp):
            h = ln(x, bp["norm1_w"], bp["norm1_b"])
            qkv = (
                jnp.dot(h, bp["qkv_w"], preferred_element_type=jnp.float32)
                + bp["qkv_b"]
            ).astype(x.dtype)
            q, k, v = jnp.split(qkv.reshape(n, 3 * heads, dh), 3, axis=1)
            q, k = self._rope_2d(q, k, pos_hw)
            scores = jnp.einsum(
                "nhd,mhd->hnm", q, k, preferred_element_type=jnp.float32
            ) * (dh**-0.5)
            if seg_bias is not None:
                scores = scores + seg_bias
            probs = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum(
                "hnm,mhd->nhd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).reshape(n, heads * dh).astype(x.dtype)
            x = x + (
                jnp.dot(att, bp["proj_w"], preferred_element_type=jnp.float32)
                + bp["proj_b"]
            ).astype(x.dtype)
            h = ln(x, bp["norm2_w"], bp["norm2_b"])
            f = (
                jnp.dot(h, bp["fc1_w"], preferred_element_type=jnp.float32)
                + bp["fc1_b"]
            ).astype(jnp.float32)
            # quick_gelu (qwen2-vl vision blocks' hidden_act)
            f = f * jax.nn.sigmoid(1.702 * f)
            x = x + (
                jnp.dot(
                    f.astype(x.dtype), bp["fc2_w"],
                    preferred_element_type=jnp.float32,
                )
                + bp["fc2_b"]
            ).astype(x.dtype)
            return x, None

        x, _ = jax.lax.scan(block, x, params["blocks"])
        x = ln(x, params["merger_ln_w"], params["merger_ln_b"])
        x = x.reshape(-1, c.merge_dim)
        x = (
            jnp.dot(
                x, params["merger_fc1_w"], preferred_element_type=jnp.float32
            )
            + params["merger_fc1_b"]
        )
        x = jax.nn.gelu(x, approximate=False)
        x = (
            jnp.dot(
                x.astype(self.dtype), params["merger_fc2_w"],
                preferred_element_type=jnp.float32,
            )
            + params["merger_fc2_b"]
        )
        return x.astype(self.dtype)
