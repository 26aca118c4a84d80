"""GLM-4V vision tower (EVA-style ViT + conv downsample + gated merger).

Counterpart of the reference's glm4v vision encoder
(reference xllm/models/vlm/glm4v.h vision stack; HF Glm4vVisionModel is
the weight-layout oracle). Differences from the qwen towers that this
file owns:

- RMS norms (no bias) in blocks + post-conv/post-final norms;
- learned absolute position embeddings resampled with BICUBIC
  grid_sample (align_corners=False, border padding) to each image's
  (h, w) patch grid;
- silu-gated block MLPs; spatial merge via a conv2d downsample over each
  merge block, then a gated projection merger with an affine LayerNorm.

Like the other towers: pre-patched host input, per-block tensors stacked
on a leading axis under one ``lax.scan``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xllm_tpu.models.decoder import TP_AXIS


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Cubic-convolution weights for offsets (-1-t, -t, 1-t, 2-t)."""
    def w1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def w2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    return (w2(t + 1.0), w1(t), w1(1.0 - t), w2(2.0 - t))


def bicubic_sample(table: jnp.ndarray, gy: jnp.ndarray, gx: jnp.ndarray):
    """torch.grid_sample(mode="bicubic", align_corners=False,
    padding_mode="border") over table [H, W, C] at normalized coords
    gy/gx in [-1, 1] -> [N, C]."""
    h, w, _ = table.shape
    fy = ((gy + 1.0) * h - 1.0) / 2.0
    fx = ((gx + 1.0) * w - 1.0) / 2.0
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    ty = fy - y0
    tx = fx - x0
    wy = _cubic_weights(ty)
    wx = _cubic_weights(tx)
    out = 0.0
    for i in range(4):
        yi = jnp.clip(y0.astype(jnp.int32) + (i - 1), 0, h - 1)
        row = 0.0
        for j in range(4):
            xj = jnp.clip(x0.astype(jnp.int32) + (j - 1), 0, w - 1)
            row = row + wx[j][:, None] * table[yi, xj]
        out = out + wy[i][:, None] * row
    return out


@dataclass
class GlmVisionConfig:
    """glm4v "vision_config" subset (config.json)."""

    depth: int = 24
    hidden_size: int = 1536
    num_heads: int = 12
    intermediate_size: int = 13696
    out_hidden_size: int = 4096
    in_channels: int = 3
    image_size: int = 336
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    rms_norm_eps: float = 1e-5
    attention_bias: bool = False

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def pos_grid(self) -> int:
        return self.image_size // self.patch_size


class GlmVisionEncoder:
    def __init__(self, cfg: GlmVisionConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.head_dim = cfg.hidden_size // cfg.num_heads

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        d, inter, out = c.hidden_size, c.intermediate_size, c.out_hidden_size
        m = c.spatial_merge_size

        def w(key, *shape, scale=0.02):
            return (
                jax.random.normal(key, shape, jnp.float32) * scale
            ).astype(self.dtype)

        ks = iter(jax.random.split(rng, 16))
        blocks = {
            "norm1_w": jnp.ones((c.depth, d), self.dtype),
            "norm2_w": jnp.ones((c.depth, d), self.dtype),
            "qkv_w": w(next(ks), c.depth, d, 3 * d),
            "proj_w": w(next(ks), c.depth, d, d),
            "gate_w": w(next(ks), c.depth, d, out),
            "up_w": w(next(ks), c.depth, d, out),
            "down_w": w(next(ks), c.depth, out, d),
        }
        if c.attention_bias:
            blocks["qkv_b"] = jnp.zeros((c.depth, 3 * d), self.dtype)
        return {
            "patch_embed_w": w(next(ks), c.patch_dim, d),
            "patch_embed_b": jnp.zeros((d,), self.dtype),
            "post_conv_ln_w": jnp.ones((d,), self.dtype),
            "pos_embed": w(next(ks), c.pos_grid * c.pos_grid, d),
            "blocks": blocks,
            "post_ln_w": jnp.ones((d,), self.dtype),
            "downsample_w": w(next(ks), d * m * m, out),
            "downsample_b": jnp.zeros((out,), self.dtype),
            "merger_proj_w": w(next(ks), out, out),
            "merger_ln_w": jnp.ones((out,), self.dtype),
            "merger_ln_b": jnp.zeros((out,), self.dtype),
            "merger_gate_w": w(next(ks), out, inter),
            "merger_up_w": w(next(ks), out, inter),
            "merger_down_w": w(next(ks), inter, out),
        }

    def param_shardings(self) -> dict:
        c = self.cfg
        blocks = {
            "norm1_w": P(), "norm2_w": P(),
            "qkv_w": P(None, None, TP_AXIS),
            "proj_w": P(None, TP_AXIS, None),
            "gate_w": P(None, None, TP_AXIS),
            "up_w": P(None, None, TP_AXIS),
            "down_w": P(None, TP_AXIS, None),
        }
        if c.attention_bias:
            blocks["qkv_b"] = P(None, TP_AXIS)
        return {
            "patch_embed_w": P(), "patch_embed_b": P(),
            "post_conv_ln_w": P(), "pos_embed": P(),
            "blocks": blocks,
            "post_ln_w": P(),
            "downsample_w": P(), "downsample_b": P(),
            "merger_proj_w": P(),
            "merger_ln_w": P(), "merger_ln_b": P(),
            "merger_gate_w": P(None, TP_AXIS),
            "merger_up_w": P(None, TP_AXIS),
            "merger_down_w": P(TP_AXIS, None),
        }

    # ------------------------------------------------------------------
    def _pos_ids(self, grid_h: int, grid_w: int) -> jnp.ndarray:
        """(h, w) per patch in merge-block-major order -> [N, 2]."""
        m = self.cfg.spatial_merge_size
        hh, ww = grid_h // m, grid_w // m
        h_ids = jnp.repeat(
            jnp.arange(grid_h, dtype=jnp.int32)[:, None], grid_w, axis=1
        )
        w_ids = jnp.repeat(
            jnp.arange(grid_w, dtype=jnp.int32)[None, :], grid_h, axis=0
        )

        def blockify(x):
            return x.reshape(hh, m, ww, m).transpose(0, 2, 1, 3).reshape(-1)

        return jnp.stack([blockify(h_ids), blockify(w_ids)], axis=-1)

    def _rope_2d(self, q, k, pos_hw):
        """Half-h/half-w rotate-half rope (same lattice as qwen2-vl)."""
        dh = q.shape[-1]
        half = dh // 2
        quarter = half // 2
        inv = 1.0 / (
            10000.0 ** (jnp.arange(0, quarter, dtype=jnp.float32) / quarter)
        )
        freqs_h = pos_hw[:, 0:1].astype(jnp.float32) * inv[None, :]
        freqs_w = pos_hw[:, 1:2].astype(jnp.float32) * inv[None, :]
        freqs = jnp.concatenate([freqs_h, freqs_w], axis=-1)  # [N, half]
        cos = jnp.cos(freqs)[:, None, :]
        sin = jnp.sin(freqs)[:, None, :]

        def rot(x):
            xf = x.astype(jnp.float32)
            x1, x2 = xf[..., :half], xf[..., half:]
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
        """[N, patch_dim] -> merged embeddings [N/m^2, out_hidden]."""
        c = self.cfg
        heads, dh = c.num_heads, self.head_dim
        eps = c.rms_norm_eps

        def rms(v, w):
            vf = v.astype(jnp.float32)
            var = jnp.mean(vf * vf, axis=-1, keepdims=True)
            return (vf * jax.lax.rsqrt(var + eps) * w).astype(v.dtype)

        x = (
            jnp.dot(
                patches.astype(self.dtype), params["patch_embed_w"],
                preferred_element_type=jnp.float32,
            )
            + params["patch_embed_b"]
        ).astype(self.dtype)
        x = rms(x, params["post_conv_ln_w"])
        n = x.shape[0]

        pos_hw = self._pos_ids(grid_h, grid_w)
        seg_bias = None
        if grid_t > 1:
            pos_hw = jnp.tile(pos_hw, (grid_t, 1))
            seg = jnp.arange(n, dtype=jnp.int32) // (grid_h * grid_w)
            seg_bias = jnp.where(
                seg[:, None] == seg[None, :], 0.0, -jnp.inf
            )[None]

        # bicubic-resampled absolute position embedding (HF
        # Glm4vVisionEmbeddings: grid_sample over the pos_grid lattice)
        pg = c.pos_grid
        table = params["pos_embed"].astype(jnp.float32).reshape(pg, pg, -1)
        norm_h = (pos_hw[:, 0].astype(jnp.float32) + 0.5) / grid_h * 2 - 1
        norm_w = (pos_hw[:, 1].astype(jnp.float32) + 0.5) / grid_w * 2 - 1
        x = x + bicubic_sample(table, norm_h, norm_w).astype(x.dtype)

        def block(x, bp):
            h = rms(x, bp["norm1_w"])
            qkv = jnp.dot(
                h, bp["qkv_w"], preferred_element_type=jnp.float32
            )
            if c.attention_bias:
                qkv = qkv + bp["qkv_b"]
            qkv = qkv.astype(x.dtype).reshape(n, 3, heads, dh)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
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
            x = x + jnp.dot(
                att, bp["proj_w"], preferred_element_type=jnp.float32
            ).astype(x.dtype)
            h = rms(x, bp["norm2_w"])
            gate = jnp.dot(
                h, bp["gate_w"], preferred_element_type=jnp.float32
            )
            up = jnp.dot(h, bp["up_w"], preferred_element_type=jnp.float32)
            f = jax.nn.silu(gate) * up
            x = x + jnp.dot(
                f.astype(x.dtype), bp["down_w"],
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            return x, None

        x, _ = jax.lax.scan(block, x, params["blocks"])
        x = rms(x, params["post_ln_w"])

        # conv2d downsample over each merge block == linear on the
        # channel-major flattened block (weight pre-reshaped at load)
        m = c.spatial_merge_size
        xb = x.reshape(-1, m, m, c.hidden_size).transpose(0, 3, 1, 2)
        xb = xb.reshape(-1, c.hidden_size * m * m)
        x = (
            jnp.dot(
                xb, params["downsample_w"],
                preferred_element_type=jnp.float32,
            )
            + params["downsample_b"]
        ).astype(self.dtype)

        # gated merger with affine LN after the input projection
        x = jnp.dot(
            x, params["merger_proj_w"], preferred_element_type=jnp.float32
        )
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        x = x * params["merger_ln_w"] + params["merger_ln_b"]
        x = jax.nn.gelu(x, approximate=False)
        gate = jnp.dot(
            x.astype(self.dtype), params["merger_gate_w"],
            preferred_element_type=jnp.float32,
        )
        up = jnp.dot(
            x.astype(self.dtype), params["merger_up_w"],
            preferred_element_type=jnp.float32,
        )
        f = jax.nn.silu(gate) * up
        x = jnp.dot(
            f.astype(self.dtype), params["merger_down_w"],
            preferred_element_type=jnp.float32,
        )
        return x.astype(self.dtype)
