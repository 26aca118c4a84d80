"""Wan-class video DiT: image→video flow-matching in JAX.

Counterpart of the reference's Wan stack (reference
xllm/models/dit/transformers/transformer_wan.h — 3D patch embed,
3-axis pair-rotated rope :1017-1130 + wan_apply_rotary_emb :56-73,
scale_shift_table blocks :1136-1296, condition embedder :914-1015;
pipeline xllm/models/dit/pipelines/pipeline_wan_i2v.h:169-300 i2v
latent/mask conditioning). TPU-native notes:

- blocks are stacked on a leading axis under ``lax.scan`` (one compiled
  body), modulation = per-block ``scale_shift_table`` + shared
  6-way timestep projection;
- the 3-axis rope (t gets head_dim-2*2*(head_dim/6), h/w get
  2*(head_dim/6) each) is precomputed per (F', H', W') grid;
- the whole Euler solve is ONE jit (scan over steps, CFG inside);
- the video VAE is a compact factorized 3D conv autoencoder
  (spatial 8x + temporal 4x, the wan scale factors) standing in for
  AutoencoderKLWan's causal stack — same latent geometry and
  latents_mean/std interface, so real-checkpoint plumbing is isolated
  to the VAE loader.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------
@dataclass
class WanConfig:
    num_layers: int = 4
    dim: int = 128                 # heads * head_dim
    num_heads: int = 8
    ffn_dim: int = 256
    in_channels: int = 36          # z(16) + mask(4) + cond z(16)
    out_channels: int = 16
    text_dim: int = 64             # UMT5 hidden
    image_dim: int = 0             # CLIP image embed (0 = t2v)
    freq_dim: int = 64             # timestep sinusoid features
    patch_size: tuple = (1, 2, 2)  # (t, h, w)
    rope_max_seq_len: int = 1024
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


@dataclass
class WanVaeConfig:
    z_channels: int = 16
    base_channels: int = 32
    temporal_factor: int = 4
    spatial_factor: int = 8
    latents_mean: tuple = ()
    latents_std: tuple = ()


# ---------------------------------------------------------------------------
# rope: 3-axis pair rotation
# ---------------------------------------------------------------------------
def wan_rope_freqs(head_dim: int, f: int, h: int, w: int,
                   theta: float = 10000.0) -> np.ndarray:
    """Per-patch pair frequencies [f*h*w, head_dim/2]: the t axis takes
    head_dim/2 - 2*(head_dim/6) pair slots, h and w take head_dim/6 each
    (reference WanRotaryPosEmbed, transformer_wan.h:1017-1130)."""
    half = head_dim // 2
    hw = head_dim // 6
    t_dim = half - 2 * hw

    def axis(n, d):
        inv = 1.0 / (theta ** (np.arange(d, dtype=np.float64) * 2 / (2 * d)))
        return np.outer(np.arange(n, dtype=np.float64), inv)  # [n, d]

    ft = axis(f, t_dim)[:, None, None, :] * np.ones((1, h, w, 1))
    fh = axis(h, hw)[None, :, None, :] * np.ones((f, 1, w, 1))
    fw = axis(w, hw)[None, None, :, :] * np.ones((f, h, 1, 1))
    out = np.concatenate([ft, fh, fw], axis=-1).reshape(f * h * w, half)
    return out.astype(np.float32)


def wan_apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x [N, H, D]; cos/sin [N, D/2]; adjacent-pair rotation
    (reference wan_apply_rotary_emb, transformer_wan.h:56-73)."""
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out1 = x1 * c - x2 * s
    out2 = x1 * s + x2 * c
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape).astype(x.dtype)


def _layer_norm(x, eps, w=None, b=None):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        h = h * w + b
    return h


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    v = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return ((xf * jax.lax.rsqrt(v + eps)) * w).astype(x.dtype)


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------
class WanTransformer3D:
    """Reference WanTransformer3DModel (transformer_wan.h:1299-1470)."""

    def __init__(self, cfg: WanConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype

    # -- params -----------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        d = c.dim
        pt, ph, pw = c.patch_size
        patch_dim = c.in_channels * pt * ph * pw
        key = iter(jax.random.split(rng, 32))

        def w(*shape, scale=0.02):
            return (
                jax.random.normal(next(key), shape, jnp.float32) * scale
            ).astype(self.dtype)

        n = c.num_layers

        def bw(*shape, scale=0.02):
            return (
                jax.random.normal(next(key), (n, *shape), jnp.float32) * scale
            ).astype(self.dtype)

        blocks = {
            "scale_shift": (
                jax.random.normal(next(key), (n, 6, d), jnp.float32)
                / math.sqrt(d)
            ).astype(jnp.float32),
            "q_w": bw(d, d), "q_b": jnp.zeros((n, d), self.dtype),
            "k_w": bw(d, d), "k_b": jnp.zeros((n, d), self.dtype),
            "v_w": bw(d, d), "v_b": jnp.zeros((n, d), self.dtype),
            "qn": jnp.ones((n, d), self.dtype),
            "kn": jnp.ones((n, d), self.dtype),
            "o_w": bw(d, d), "o_b": jnp.zeros((n, d), self.dtype),
            "cq_w": bw(d, d), "cq_b": jnp.zeros((n, d), self.dtype),
            "ck_w": bw(d, d), "ck_b": jnp.zeros((n, d), self.dtype),
            "cv_w": bw(d, d), "cv_b": jnp.zeros((n, d), self.dtype),
            "cqn": jnp.ones((n, d), self.dtype),
            "ckn": jnp.ones((n, d), self.dtype),
            "co_w": bw(d, d), "co_b": jnp.zeros((n, d), self.dtype),
            "norm2_w": jnp.ones((n, d), self.dtype),
            "norm2_b": jnp.zeros((n, d), self.dtype),
            "ff0_w": bw(d, c.ffn_dim), "ff0_b": jnp.zeros(
                (n, c.ffn_dim), self.dtype
            ),
            "ff1_w": bw(c.ffn_dim, d), "ff1_b": jnp.zeros((n, d), self.dtype),
        }
        params = {
            "patch_w": w(patch_dim, d),
            "patch_b": jnp.zeros((d,), self.dtype),
            "time_mlp0_w": w(c.freq_dim, d),
            "time_mlp0_b": jnp.zeros((d,), self.dtype),
            "time_mlp1_w": w(d, d), "time_mlp1_b": jnp.zeros((d,), self.dtype),
            "time_proj_w": w(d, 6 * d),
            "time_proj_b": jnp.zeros((6 * d,), self.dtype),
            "text_fc0_w": w(c.text_dim, d),
            "text_fc0_b": jnp.zeros((d,), self.dtype),
            "text_fc1_w": w(d, d), "text_fc1_b": jnp.zeros((d,), self.dtype),
            "blocks": blocks,
            "out_scale_shift": (
                jax.random.normal(next(key), (2, d), jnp.float32)
                / math.sqrt(d)
            ).astype(jnp.float32),
            "proj_out_w": w(
                d, c.out_channels * pt * ph * pw
            ),
            "proj_out_b": jnp.zeros(
                (c.out_channels * pt * ph * pw,), self.dtype
            ),
        }
        if c.image_dim > 0:
            params.update({
                "img_norm1_w": jnp.ones((c.image_dim,), self.dtype),
                "img_norm1_b": jnp.zeros((c.image_dim,), self.dtype),
                "img_fc0_w": w(c.image_dim, d),
                "img_fc0_b": jnp.zeros((d,), self.dtype),
                "img_fc1_w": w(d, d),
                "img_fc1_b": jnp.zeros((d,), self.dtype),
                "img_norm2_w": jnp.ones((d,), self.dtype),
                "img_norm2_b": jnp.zeros((d,), self.dtype),
            })
        return params

    # -- condition embedder -------------------------------------------------
    def _timestep_feats(self, t):
        """sinusoidal (flip_sin_to_cos=True, scale 1) -> [B, freq_dim]
        (reference WanTimesteps, transformer_wan.h:248)."""
        half = self.cfg.freq_dim // 2
        exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
        emb = jnp.exp(exponent / half)
        args = t.astype(jnp.float32)[:, None] * emb[None]
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)

    def _condition(self, params, t, text, image_embeds=None):
        c = self.cfg
        feats = self._timestep_feats(t).astype(self.dtype)
        temb = jnp.dot(feats, params["time_mlp0_w"]) + params["time_mlp0_b"]
        temb = jax.nn.silu(temb)
        temb = jnp.dot(temb, params["time_mlp1_w"]) + params["time_mlp1_b"]
        ts6 = (
            jnp.dot(jax.nn.silu(temb), params["time_proj_w"])
            + params["time_proj_b"]
        ).reshape(-1, 6, c.dim)
        txt = jnp.dot(text.astype(self.dtype), params["text_fc0_w"]) + params[
            "text_fc0_b"
        ]
        txt = jax.nn.gelu(txt, approximate=True)
        txt = jnp.dot(txt, params["text_fc1_w"]) + params["text_fc1_b"]
        img = None
        if image_embeds is not None and c.image_dim > 0:
            h = _layer_norm(
                image_embeds.astype(self.dtype), c.eps,
                params["img_norm1_w"], params["img_norm1_b"],
            ).astype(self.dtype)
            h = jnp.dot(h, params["img_fc0_w"]) + params["img_fc0_b"]
            h = jax.nn.gelu(h, approximate=False)
            h = jnp.dot(h, params["img_fc1_w"]) + params["img_fc1_b"]
            img = _layer_norm(
                h, c.eps, params["img_norm2_w"], params["img_norm2_b"]
            ).astype(self.dtype)
        return temb, ts6, txt, img

    # -- forward ------------------------------------------------------------
    def forward(
        self,
        params,
        latents,        # [B, C_in, F, H, W]
        t,              # [B] diffusion timestep (0..1000 scale)
        text,           # [B, St, text_dim]
        image_embeds=None,  # [B, Si, image_dim]
    ):
        c = self.cfg
        b, _, f, hh, ww = latents.shape
        pt, ph, pw = c.patch_size
        pf, phh, pww = f // pt, hh // ph, ww // pw
        n = pf * phh * pww
        heads, hd = c.num_heads, c.head_dim

        # 3D patchify -> [B, N, patch_dim] (conv3d stride==kernel)
        x = latents.astype(self.dtype).reshape(
            b, c.in_channels, pf, pt, phh, ph, pww, pw
        )
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, n, -1)
        x = jnp.dot(x, params["patch_w"]) + params["patch_b"]

        temb, ts6, txt, img = self._condition(params, t, text, image_embeds)
        if img is not None:
            txt = jnp.concatenate([img, txt], axis=1)

        freqs = jnp.asarray(wan_rope_freqs(hd, pf, phh, pww))
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)

        def block(x, bp):
            mod = (
                bp["scale_shift"][None] + ts6.astype(jnp.float32)
            )  # [B, 6, d]
            shift_sa, scale_sa, gate_sa, c_shift, c_scale, c_gate = (
                mod[:, i][:, None] for i in range(6)
            )
            # self-attention (FP32LayerNorm, no affine)
            h = (
                _layer_norm(x, c.eps) * (1 + scale_sa) + shift_sa
            ).astype(x.dtype)
            q = _rms_norm(
                jnp.dot(h, bp["q_w"]) + bp["q_b"], bp["qn"], c.eps
            ).reshape(b, n, heads, hd)
            k = _rms_norm(
                jnp.dot(h, bp["k_w"]) + bp["k_b"], bp["kn"], c.eps
            ).reshape(b, n, heads, hd)
            v = (jnp.dot(h, bp["v_w"]) + bp["v_b"]).reshape(b, n, heads, hd)
            q = jax.vmap(wan_apply_rope, in_axes=(0, None, None))(q, cos, sin)
            k = jax.vmap(wan_apply_rope, in_axes=(0, None, None))(k, cos, sin)
            scores = jnp.einsum(
                "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            att = jnp.einsum(
                "bhst,bthd->bshd", jax.nn.softmax(scores, -1).astype(v.dtype),
                v, preferred_element_type=jnp.float32,
            ).reshape(b, n, c.dim).astype(x.dtype)
            att = jnp.dot(att, bp["o_w"]) + bp["o_b"]
            x = (
                x.astype(jnp.float32) + att.astype(jnp.float32) * gate_sa
            ).astype(x.dtype)

            # cross-attention on text (+image prefix), ungated residual;
            # input is norm2(x) — affine FP32LayerNorm when
            # cross_attn_norm (reference transformer_wan.h:1220-1222)
            st = txt.shape[1]
            xn = _layer_norm(x, c.eps, bp["norm2_w"], bp["norm2_b"]).astype(
                x.dtype
            )
            q = _rms_norm(
                jnp.dot(xn, bp["cq_w"]) + bp["cq_b"], bp["cqn"], c.eps
            ).reshape(b, n, heads, hd)
            k = _rms_norm(
                jnp.dot(txt, bp["ck_w"]) + bp["ck_b"], bp["ckn"], c.eps
            ).reshape(b, st, heads, hd)
            v = (jnp.dot(txt, bp["cv_w"]) + bp["cv_b"]).reshape(
                b, st, heads, hd
            )
            scores = jnp.einsum(
                "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            att = jnp.einsum(
                "bhst,bthd->bshd", jax.nn.softmax(scores, -1).astype(v.dtype),
                v, preferred_element_type=jnp.float32,
            ).reshape(b, n, c.dim).astype(x.dtype)
            x = x + (jnp.dot(att, bp["co_w"]) + bp["co_b"])

            # FFN with modulation: norm3 is NO-affine (reference
            # transformer_wan.h:1229-1230); norm2's affine weights belong
            # to the cross-attention input above
            h = (
                _layer_norm(x, c.eps) * (1 + c_scale) + c_shift
            ).astype(x.dtype)
            h = jnp.dot(h, bp["ff0_w"]) + bp["ff0_b"]
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(
                x.dtype
            )
            h = jnp.dot(h, bp["ff1_w"]) + bp["ff1_b"]
            x = (
                x.astype(jnp.float32) + h.astype(jnp.float32) * c_gate
            ).astype(x.dtype)
            return x, None

        x, _ = jax.lax.scan(block, x, params["blocks"])

        # AdaLN-final (reference :1460-1470)
        ss = params["out_scale_shift"][None] + temb.astype(jnp.float32)[
            :, None
        ]
        shift, scale = ss[:, 0][:, None], ss[:, 1][:, None]
        x = (_layer_norm(x, c.eps) * (1 + scale) + shift).astype(self.dtype)
        x = jnp.dot(x, params["proj_out_w"]) + params["proj_out_b"]
        # unpatchify -> [B, C_out, F, H, W]
        x = x.reshape(b, pf, phh, pww, c.out_channels, pt, ph, pw)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(
            b, c.out_channels, f, hh, ww
        )
        return x


# ---------------------------------------------------------------------------
# compact video VAE (wan latent geometry)
# ---------------------------------------------------------------------------
def conv3d(x, w, b=None, stride=(1, 1, 1), padding=(0, 0, 0)):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None, None]
    return out


def conv_transpose3d(x, w, b=None, stride=(1, 1, 1)):
    """torch ConvTranspose3d with kernel==stride (pixel-shuffle style)."""
    k = w.shape[2:]
    w_flip = jnp.flip(w, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4)
    out = jax.lax.conv_general_dilated(
        x, w_flip, window_strides=(1, 1, 1),
        padding=[(kk - 1, kk - 1) for kk in k],
        lhs_dilation=stride,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None, None]
    return out


class WanVae:
    """Factorized 3D conv autoencoder with the wan latent geometry
    (temporal 4x — first frame kept whole: F' = 1 + (F-1)/4 — and
    spatial 8x; reference AutoencoderKLWan latent shape,
    pipeline_wan_i2v.h:179-188)."""

    def __init__(self, cfg: WanVaeConfig):
        self.cfg = cfg

    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        ch = c.base_channels
        tf, sf = c.temporal_factor, c.spatial_factor
        key = iter(jax.random.split(rng, 16))

        def w(*shape, scale=0.05):
            return jax.random.normal(next(key), shape, jnp.float32) * scale

        return {
            # encoder: spatial stride sf, then temporal stride tf (frames
            # beyond the first), then 1x1x1 to 2*z (mean | logvar)
            "e_sp_w": w(ch, 3, 1, sf, sf), "e_sp_b": jnp.zeros((ch,)),
            "e_tm_w": w(2 * ch, ch, tf, 1, 1), "e_tm_b": jnp.zeros((2 * ch,)),
            "e_first_w": w(2 * ch, ch, 1, 1, 1),
            "e_first_b": jnp.zeros((2 * ch,)),
            "e_mid_w": w(2 * ch, 2 * ch, 1, 3, 3),
            "e_mid_b": jnp.zeros((2 * ch,)),
            "e_out_w": w(2 * c.z_channels, 2 * ch, 1, 1, 1),
            "e_out_b": jnp.zeros((2 * c.z_channels,)),
            # decoder mirrors
            "d_in_w": w(2 * ch, c.z_channels, 1, 1, 1),
            "d_in_b": jnp.zeros((2 * ch,)),
            "d_mid_w": w(2 * ch, 2 * ch, 1, 3, 3),
            "d_mid_b": jnp.zeros((2 * ch,)),
            "d_tm_w": w(2 * ch, ch, tf, 1, 1), "d_tm_b": jnp.zeros((ch,)),
            "d_first_w": w(ch, 2 * ch, 1, 1, 1),
            "d_first_b": jnp.zeros((ch,)),
            "d_sp_w": w(ch, 3, 1, sf, sf), "d_sp_b": jnp.zeros((3,)),
        }

    def encode_mode(self, params, video):
        """[B, 3, F, H, W] -> latent mode [B, z, 1+(F-1)/tf, H/sf, W/sf]."""
        c = self.cfg
        sf, tf = c.spatial_factor, c.temporal_factor
        x = conv3d(video, params["e_sp_w"], params["e_sp_b"],
                   stride=(1, sf, sf))
        x = jax.nn.silu(x)
        first = conv3d(x[:, :, :1], params["e_first_w"], params["e_first_b"])
        rest = x[:, :, 1:]
        if rest.shape[2]:
            rest = conv3d(rest, params["e_tm_w"], params["e_tm_b"],
                          stride=(tf, 1, 1))
            x = jnp.concatenate([first, rest], axis=2)
        else:
            x = first
        x = jax.nn.silu(x)
        x = x + jax.nn.silu(
            conv3d(x, params["e_mid_w"], params["e_mid_b"],
                   padding=(0, 1, 1))
        )
        out = conv3d(x, params["e_out_w"], params["e_out_b"])
        mean, _logvar = jnp.split(out, 2, axis=1)
        return mean

    def decode(self, params, z):
        c = self.cfg
        sf, tf = c.spatial_factor, c.temporal_factor
        x = conv3d(z, params["d_in_w"], params["d_in_b"])
        x = x + jax.nn.silu(
            conv3d(x, params["d_mid_w"], params["d_mid_b"],
                   padding=(0, 1, 1))
        )
        x = jax.nn.silu(x)
        first = conv3d(x[:, :, :1], params["d_first_w"], params["d_first_b"])
        rest = x[:, :, 1:]
        if rest.shape[2]:
            rest = conv_transpose3d(rest, params["d_tm_w"], params["d_tm_b"],
                                    stride=(tf, 1, 1))
            x = jnp.concatenate([first, rest], axis=2)
        else:
            x = first
        x = jax.nn.silu(x)
        x = conv_transpose3d(x, params["d_sp_w"], params["d_sp_b"],
                             stride=(1, sf, sf))
        return jnp.tanh(x)


# ---------------------------------------------------------------------------
# i2v pipeline
# ---------------------------------------------------------------------------
@dataclass
class WanPipelineConfig:
    model: WanConfig = field(default_factory=WanConfig)
    vae: WanVaeConfig = field(default_factory=WanVaeConfig)
    num_steps: int = 8
    guidance_scale: float = 5.0
    num_train_timesteps: float = 1000.0
    shift: float = 5.0  # flow-match sigma shift (wan default)


def build_i2v_condition(latent_cond, num_latent_frames, temporal_factor):
    """mask+latent conditioning channels (reference prepare_latents,
    pipeline_wan_i2v.h:240-271): the first frame is known (mask 1, its
    temporal-factor sub-frames folded into channels), the rest unknown."""
    b, _, _, lh, lw = latent_cond.shape
    num_frames = (num_latent_frames - 1) * temporal_factor + 1
    mask = np.ones((b, 1, num_frames, lh, lw), np.float32)
    mask[:, :, 1:] = 0.0
    first = np.repeat(mask[:, :, :1], temporal_factor, axis=2)
    mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
    mask = mask.reshape(b, -1, temporal_factor, lh, lw).transpose(
        0, 2, 1, 3, 4
    )  # [B, tf, F', H', W']
    return jnp.concatenate(
        [jnp.asarray(mask), latent_cond.astype(jnp.float32)], axis=1
    )


class WanPipeline:
    """Reference WanImageToVideoPipeline forward
    (pipeline_wan_i2v.h:100-165): first frame -> VAE latent condition +
    mask channels; Euler flow-match with CFG; VAE decode to frames."""

    def __init__(self, cfg: WanPipelineConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.model = WanTransformer3D(cfg.model, dtype=dtype)
        self.vae = WanVae(cfg.vae)
        self._solve = None

    def init_params(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        return {"dit": self.model.init_params(k1),
                "vae": self.vae.init_params(k2)}

    def _sigmas(self):
        c = self.cfg
        s = np.linspace(1.0, 1.0 / c.num_steps, c.num_steps,
                        dtype=np.float32)
        s = c.shift * s / (1 + (c.shift - 1) * s)
        return np.concatenate([s, [0.0]]).astype(np.float32)

    def _build_solve(self):
        c = self.cfg
        sigmas = self._sigmas()
        use_cfg = c.guidance_scale > 1.0

        def solve(params, y0, cond, text, neg_text, image_embeds):
            def step(y, inp):
                sigma, sigma_next = inp
                t = jnp.full(
                    (y.shape[0],), sigma * c.num_train_timesteps, jnp.float32
                )
                inp_lat = jnp.concatenate(
                    [y.astype(jnp.float32), cond], axis=1
                )
                pred = self.model.forward(
                    params["dit"], inp_lat, t, text,
                    image_embeds=image_embeds,
                )
                if use_cfg:
                    pred_u = self.model.forward(
                        params["dit"], inp_lat, t, neg_text,
                        image_embeds=image_embeds,
                    )
                    pred = pred_u + c.guidance_scale * (pred - pred_u)
                y = y + (sigma_next - sigma) * pred.astype(jnp.float32)
                return y, None

            y, _ = jax.lax.scan(
                step, y0, (sigmas[:-1], sigmas[1:])
            )
            return y

        return jax.jit(solve)

    def generate(
        self,
        params,
        first_frame,     # [H, W, 3] float in [-1, 1]
        text_states,     # [B, St, text_dim]
        *,
        num_frames: int,
        seed: int = 0,
        neg_text_states=None,
        image_embeds=None,
        decode: bool = True,
    ):
        c = self.cfg
        tf, sf = c.vae.temporal_factor, c.vae.spatial_factor
        if (num_frames - 1) % tf:
            raise ValueError(f"num_frames must be 1 mod {tf}")
        h, w = first_frame.shape[:2]
        lf = (num_frames - 1) // tf + 1
        lh, lw = h // sf, w // sf
        b = text_states.shape[0]

        # VAE-encode the conditioning video: first frame + zeros
        video = np.zeros((b, 3, num_frames, h, w), np.float32)
        video[:, :, 0] = np.transpose(first_frame, (2, 0, 1))
        latent_cond = self.vae.encode_mode(params["vae"], jnp.asarray(video))
        cond = build_i2v_condition(latent_cond, lf, tf)

        y0 = jax.random.normal(
            jax.random.key(seed), (b, c.vae.z_channels, lf, lh, lw),
            jnp.float32,
        )
        if neg_text_states is None:
            neg_text_states = jnp.zeros_like(text_states)
        if self._solve is None:
            self._solve = self._build_solve()
        latents = self._solve(
            params, y0, cond, jnp.asarray(text_states),
            jnp.asarray(neg_text_states),
            None if image_embeds is None else jnp.asarray(image_embeds),
        )
        if not decode:
            return latents
        frames = self.vae.decode(params["vae"], latents)
        return np.asarray(frames)  # [B, 3, F, H, W] in [-1, 1]
