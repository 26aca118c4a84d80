"""MMDiT diffusion transformer (flux-class) in JAX.

Counterpart of the reference's DiT model stack (reference
xllm/models/dit/ — flux transformer + text encoders + schedulers,
22,855 LoC of libtorch; model interface DiTModel in
core/framework/model/causal_lm.h). TPU-native notes:

- double-stream (image/text) and single-stream blocks are stacked on a
  leading axis and run under ``lax.scan`` — one compiled block body per
  kind, MXU-shaped matmuls throughout;
- 2D axial RoPE over the latent patch grid (text tokens at position 0),
  computed once per resolution outside the scan;
- the model exposes ``block0`` / ``rest`` split points so the DiT cache
  (FBCache, xllm/core/framework/dit_cache/fbcache.cpp) can decide
  skip-vs-compute ON DEVICE inside the sampling scan via ``lax.cond`` —
  no host round trip per denoise step;
- adaLN modulation vectors come from one fused projection per block.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@dataclass
class DiTConfig:
    """flux-style transformer config (config.json subset)."""

    in_channels: int = 16        # latent channels
    patch_size: int = 2
    hidden_size: int = 1024
    num_heads: int = 8
    num_double_blocks: int = 4
    num_single_blocks: int = 8
    mlp_ratio: float = 4.0
    text_dim: int = 512          # encoder_hidden_states dim
    pooled_dim: int = 256        # pooled projection dim
    guidance_embed: bool = True  # flux-dev style guidance conditioning
    axes_dim: tuple = (32, 32)   # rope dims per (h, w) axis; sum == head_dim
    # extra conditioning channels concatenated to every step's latent
    # tokens (flux-fill: packed masked-image latents + sub-pixel mask =
    # 64 + 256 = 320 on top of the 64 latent features — the reference
    # fill transformer's in_channels 384, pipeline_flux_fill.h:388)
    cond_dim: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size**2


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal features for scalar conditioning (t or guidance)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _rope_rotate(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


class DiTModel:
    def __init__(self, cfg: DiTConfig, dtype=jnp.float32, sp_axis=None):
        assert sum(cfg.axes_dim) == cfg.head_dim
        self.cfg = cfg
        self.dtype = dtype
        # Ulysses SP: when set, _attend runs under shard_map with this
        # mesh axis (dit/sp.py); image tokens arrive seq-sharded.
        self.sp_axis = sp_axis

    # -- params ---------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        d, hd = c.hidden_size, c.head_dim
        mlp = int(d * c.mlp_ratio)
        ks = iter(jax.random.split(rng, 64))

        def w(*shape, scale=0.02):
            return (jax.random.normal(next(ks), shape) * scale).astype(
                self.dtype)

        def zeros(*shape):
            return jnp.zeros(shape, self.dtype)

        def stack(n, f):
            outs = [f() for _ in range(n)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

        def double_block():
            return {
                # per-stream fused adaLN: 6 gates each (shift/scale/gate
                # for attn + mlp), one projection from vec
                "img_mod_w": w(d, 6 * d), "img_mod_b": zeros(6 * d),
                "txt_mod_w": w(d, 6 * d), "txt_mod_b": zeros(6 * d),
                "img_qkv_w": w(d, 3 * d), "img_qkv_b": zeros(3 * d),
                "txt_qkv_w": w(d, 3 * d), "txt_qkv_b": zeros(3 * d),
                "img_qnorm": jnp.ones((hd,), self.dtype),
                "img_knorm": jnp.ones((hd,), self.dtype),
                "txt_qnorm": jnp.ones((hd,), self.dtype),
                "txt_knorm": jnp.ones((hd,), self.dtype),
                "img_out_w": w(d, d), "img_out_b": zeros(d),
                "txt_out_w": w(d, d), "txt_out_b": zeros(d),
                "img_mlp1_w": w(d, mlp), "img_mlp1_b": zeros(mlp),
                "img_mlp2_w": w(mlp, d), "img_mlp2_b": zeros(d),
                "txt_mlp1_w": w(d, mlp), "txt_mlp1_b": zeros(mlp),
                "txt_mlp2_w": w(mlp, d), "txt_mlp2_b": zeros(d),
            }

        def single_block():
            return {
                "mod_w": w(d, 3 * d), "mod_b": zeros(3 * d),
                # fused qkv + mlp-in, attn-out + mlp-out (flux single block)
                "lin1_w": w(d, 3 * d + mlp), "lin1_b": zeros(3 * d + mlp),
                "lin2_w": w(d + mlp, d), "lin2_b": zeros(d),
                "qnorm": jnp.ones((hd,), self.dtype),
                "knorm": jnp.ones((hd,), self.dtype),
            }

        params = {
            "img_in_w": w(c.patch_dim + c.cond_dim, d),
            "img_in_b": zeros(d),
            "txt_in_w": w(c.text_dim, d), "txt_in_b": zeros(d),
            "t_mlp1_w": w(256, d), "t_mlp1_b": zeros(d),
            "t_mlp2_w": w(d, d), "t_mlp2_b": zeros(d),
            "pool_mlp1_w": w(c.pooled_dim, d), "pool_mlp1_b": zeros(d),
            "pool_mlp2_w": w(d, d), "pool_mlp2_b": zeros(d),
            "double": stack(c.num_double_blocks, double_block),
            "single": stack(c.num_single_blocks, single_block),
            "final_mod_w": w(d, 2 * d), "final_mod_b": zeros(2 * d),
            "final_w": zeros(d, c.patch_dim), "final_b": zeros(c.patch_dim),
        }
        if c.guidance_embed:
            params["g_mlp1_w"] = w(256, d)
            params["g_mlp1_b"] = zeros(d)
            params["g_mlp2_w"] = w(d, d)
            params["g_mlp2_b"] = zeros(d)
        return params

    # -- pieces ---------------------------------------------------------
    def _ln(self, x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)

    def _rmsn(self, x, wgt):
        x32 = x.astype(jnp.float32)
        return (x32 * jax.lax.rsqrt(
            (x32**2).mean(-1, keepdims=True) + 1e-6)).astype(x.dtype) * wgt

    def rope_img(self, grid_h: int, grid_w: int):
        """Axial 2D rope angles for the image patch grid: [N, head_dim//2]."""
        c = self.cfg
        tabs = []
        pos_h = jnp.repeat(jnp.arange(grid_h), grid_w)
        pos_w = jnp.tile(jnp.arange(grid_w), grid_h)
        for dim_a, pos in zip(c.axes_dim, (pos_h, pos_w)):
            half = dim_a // 2
            freqs = 1.0 / (10000.0 ** (jnp.arange(half) / half))
            tabs.append(pos.astype(jnp.float32)[:, None] * freqs[None])
        return jnp.concatenate(tabs, axis=-1)

    def rope_grid(self, grid_h: int, grid_w: int, txt_len: int):
        """Axial 2D rope tables for [txt; img] tokens.

        Text tokens sit at position (0, 0) — they attend position-free,
        like flux's ids scheme. Returns (cos, sin): [T+N, head_dim//2].
        """
        ang = self.rope_img(grid_h, grid_w)
        ang = jnp.concatenate(
            [jnp.zeros((txt_len, ang.shape[-1]), jnp.float32), ang])
        return jnp.cos(ang), jnp.sin(ang)

    def _attend(self, q, k, v, cos, sin, txt_len=0):
        """q/k/v: [B, S, H, hd]; joint full attention with axial rope.

        RoPE is applied before any SP collective — per-token rotation
        commutes with the Ulysses head shuffle (dit/sp.py).
        """
        q = _rope_rotate(q, cos[None, :, None], sin[None, :, None])
        k = _rope_rotate(k, cos[None, :, None], sin[None, :, None])
        if self.sp_axis is not None:
            from xllm_tpu.dit.sp import ulysses_attend
            return ulysses_attend(q, k, v, txt_len, self.sp_axis)
        scale = 1.0 / math.sqrt(q.shape[-1])
        logits = jnp.einsum("bshd,bthd->bhst", q, k) * scale
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhst,bthd->bshd", probs, v)

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.cfg.num_heads, self.cfg.head_dim)

    def _double(self, bp, img, txt, vec, cos, sin):
        c = self.cfg
        b = img.shape[0]
        im = jax.nn.silu(vec) @ bp["img_mod_w"] + bp["img_mod_b"]
        tm = jax.nn.silu(vec) @ bp["txt_mod_w"] + bp["txt_mod_b"]
        (i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2) = jnp.split(im, 6, -1)
        (t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2) = jnp.split(tm, 6, -1)

        i_h = self._ln(img) * (1 + i_sc1[:, None]) + i_sh1[:, None]
        t_h = self._ln(txt) * (1 + t_sc1[:, None]) + t_sh1[:, None]
        i_qkv = i_h @ bp["img_qkv_w"] + bp["img_qkv_b"]
        t_qkv = t_h @ bp["txt_qkv_w"] + bp["txt_qkv_b"]
        iq, ik, iv = (self._heads(x) for x in jnp.split(i_qkv, 3, -1))
        tq, tk, tv = (self._heads(x) for x in jnp.split(t_qkv, 3, -1))
        iq, ik = self._rmsn(iq, bp["img_qnorm"]), self._rmsn(ik, bp["img_knorm"])
        tq, tk = self._rmsn(tq, bp["txt_qnorm"]), self._rmsn(tk, bp["txt_knorm"])
        q = jnp.concatenate([tq, iq], 1)
        k = jnp.concatenate([tk, ik], 1)
        v = jnp.concatenate([tv, iv], 1)
        o = self._attend(q, k, v, cos, sin,
                         txt_len=txt.shape[1]).reshape(b, q.shape[1], -1)
        t_o, i_o = o[:, : txt.shape[1]], o[:, txt.shape[1]:]
        img = img + i_g1[:, None] * (i_o @ bp["img_out_w"] + bp["img_out_b"])
        txt = txt + t_g1[:, None] * (t_o @ bp["txt_out_w"] + bp["txt_out_b"])

        i_h = self._ln(img) * (1 + i_sc2[:, None]) + i_sh2[:, None]
        t_h = self._ln(txt) * (1 + t_sc2[:, None]) + t_sh2[:, None]
        i_mlp = jax.nn.gelu(i_h @ bp["img_mlp1_w"] + bp["img_mlp1_b"])
        t_mlp = jax.nn.gelu(t_h @ bp["txt_mlp1_w"] + bp["txt_mlp1_b"])
        img = img + i_g2[:, None] * (i_mlp @ bp["img_mlp2_w"] + bp["img_mlp2_b"])
        txt = txt + t_g2[:, None] * (t_mlp @ bp["txt_mlp2_w"] + bp["txt_mlp2_b"])
        return img, txt

    def _single(self, bp, x, vec, cos, sin, txt_len=0):
        c = self.cfg
        b, s, d = x.shape
        mlp = int(d * c.mlp_ratio)
        m = jax.nn.silu(vec) @ bp["mod_w"] + bp["mod_b"]
        sh, sc, g = jnp.split(m, 3, -1)
        h = self._ln(x) * (1 + sc[:, None]) + sh[:, None]
        lin = h @ bp["lin1_w"] + bp["lin1_b"]
        qkv, mlp_h = lin[..., : 3 * d], lin[..., 3 * d:]
        q, k, v = (self._heads(t) for t in jnp.split(qkv, 3, -1))
        q, k = self._rmsn(q, bp["qnorm"]), self._rmsn(k, bp["knorm"])
        o = self._attend(q, k, v, cos, sin, txt_len=txt_len).reshape(b, s, d)
        out = jnp.concatenate([o, jax.nn.gelu(mlp_h)], -1)
        return x + g[:, None] * (out @ bp["lin2_w"] + bp["lin2_b"])

    # -- conditioning + io ---------------------------------------------
    def patchify(self, latents):
        """[B,h,w,C] -> token latents [B, gh*gw, p*p*C]."""
        c = self.cfg
        b, h, w, ch = latents.shape
        p = c.patch_size
        gh, gw = h // p, w // p
        x = latents.reshape(b, gh, p, gw, p, ch)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * ch)

    def unpatchify(self, tokens, grid_hw):
        """[B, gh*gw, p*p*C] -> [B,h,w,C]."""
        c = self.cfg
        gh, gw = grid_hw
        p, ch = c.patch_size, c.in_channels
        b = tokens.shape[0]
        x = tokens.reshape(b, gh, gw, p, p, ch)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p, ch)

    def cond_vec(self, params, t, pooled, guidance=None):
        """Per-step conditioning vector from (t, pooled, guidance)."""
        c = self.cfg
        te = timestep_embedding(t * 1000.0, 256).astype(self.dtype)
        vec = jax.nn.silu(te @ params["t_mlp1_w"] + params["t_mlp1_b"])
        vec = vec @ params["t_mlp2_w"] + params["t_mlp2_b"]
        pe = jax.nn.silu(
            pooled.astype(self.dtype) @ params["pool_mlp1_w"]
            + params["pool_mlp1_b"])
        vec = vec + pe @ params["pool_mlp2_w"] + params["pool_mlp2_b"]
        if c.guidance_embed and guidance is not None:
            ge = timestep_embedding(guidance * 1000.0, 256).astype(self.dtype)
            ge = jax.nn.silu(ge @ params["g_mlp1_w"] + params["g_mlp1_b"])
            vec = vec + ge @ params["g_mlp2_w"] + params["g_mlp2_b"]
        return vec

    def embed_tokens(self, params, lat_tokens, txt_embeds, t, pooled,
                     guidance=None):
        """Token-space embed (patchify hoisted out of the denoise scan).

        lat_tokens [B, N, patch_dim] -> (img_tok, txt_tok, vec); the
        caller supplies rope tables (possibly SP-sliced — dit/sp.py).
        """
        img = (lat_tokens.astype(self.dtype) @ params["img_in_w"]
               + params["img_in_b"])
        txt = (txt_embeds.astype(self.dtype) @ params["txt_in_w"]
               + params["txt_in_b"])
        vec = self.cond_vec(params, t, pooled, guidance)
        return img, txt, vec

    def final_tokens(self, params, img, vec):
        """Final adaLN + projection, token space: [B, N, patch_dim]."""
        m = jax.nn.silu(vec) @ params["final_mod_w"] + params["final_mod_b"]
        sh, sc = jnp.split(m, 2, -1)
        h = self._ln(img) * (1 + sc[:, None]) + sh[:, None]
        return h @ params["final_w"] + params["final_b"]

    def embed(self, params, latents, txt_embeds, t, pooled, guidance=None):
        """latents [B,h,w,C] -> (img_tok, txt_tok, vec, (cos,sin))."""
        c = self.cfg
        b, h, w, ch = latents.shape
        p = c.patch_size
        gh, gw = h // p, w // p
        x = self.patchify(latents)
        img = (x @ params["img_in_w"] + params["img_in_b"]).astype(self.dtype)
        txt = (txt_embeds.astype(self.dtype) @ params["txt_in_w"]
               + params["txt_in_b"])
        vec = self.cond_vec(params, t, pooled, guidance)
        cos, sin = self.rope_grid(gh, gw, txt.shape[1])
        return img, txt, vec, (cos.astype(self.dtype), sin.astype(self.dtype))

    def block0(self, params, img, txt, vec, rope):
        """First double block — the FBCache probe block."""
        bp0 = jax.tree.map(lambda x: x[0], params["double"])
        return self._double(bp0, img, txt, vec, *rope)

    def rest(self, params, img, txt, vec, rope):
        """Double blocks 1.. + all single blocks (scanned)."""
        cos, sin = rope

        def dbody(carry, bp):
            i, t = carry
            i, t = self._double(bp, i, t, vec, cos, sin)
            return (i, t), None

        nd = self.cfg.num_double_blocks
        tail = jax.tree.map(lambda x: x[1:], params["double"])
        if nd > 1:
            (img, txt), _ = jax.lax.scan(dbody, (img, txt), tail)
        x = jnp.concatenate([txt, img], 1)

        def sbody(x, bp):
            return self._single(bp, x, vec, cos, sin,
                                txt_len=txt.shape[1]), None

        x, _ = jax.lax.scan(sbody, x, params["single"])
        return x[:, txt.shape[1]:], x[:, : txt.shape[1]]

    def final(self, params, img, vec, grid_hw):
        return self.unpatchify(self.final_tokens(params, img, vec), grid_hw)

    def forward(self, params, latents, txt_embeds, t, pooled, guidance=None):
        """Full velocity prediction v(x_t, t): [B,h,w,C]."""
        img, txt, vec, rope = self.embed(
            params, latents, txt_embeds, t, pooled, guidance)
        img, txt = self.block0(params, img, txt, vec, rope)
        img, txt = self.rest(params, img, txt, vec, rope)
        gh = latents.shape[1] // self.cfg.patch_size
        gw = latents.shape[2] // self.cfg.patch_size
        return self.final(params, img, vec, (gh, gw))
