"""LongCat-class audio DiT: text→speech flow-matching in JAX.

Counterpart of the reference's audio generation stack (reference
xllm/models/dit/transformers/transformer_longcat_audiodit.h — snake-beta
1D WAV-VAE :58-520, cross-attn DiT blocks with global AdaLN + long skip
:1120-1470, APG guidance :1470-1520; pipeline
xllm/models/dit/pipelines/pipeline_longcat_audiodit.h:130-470). Semantics
preserved; TPU-native notes:

- DiT blocks are stacked on a leading axis and run under ``lax.scan`` in
  two segments split at the repa layer (the long-skip re-injection
  point), so one compiled block body serves any depth;
- the Euler flow-match solve is ONE jit: a ``lax.scan`` over timesteps
  carrying (latent, APG momentum buffer) — conditional + unconditional
  forwards per step, no host round trips;
- the VAE's conv1d / transposed-conv1d map to
  ``lax.conv_general_dilated`` (NCH layout; transposed = lhs_dilation
  with flipped kernels), torch-parity tested;
- text conditioning is pluggable: any encoder producing [B, S, text_dim]
  states (the reference wraps UMT5-base, :1522-1560).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# conv helpers (NCH layout)
# ---------------------------------------------------------------------------
def conv1d(x, w, b=None, stride=1, padding=0, dilation=1):
    """x [B, Cin, T], w [Cout, Cin, K] (torch Conv1d layout)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def conv_transpose1d(x, w, b=None, stride=1, padding=0):
    """torch ConvTranspose1d: x [B, Cin, T], w [Cin, Cout, K].

    Equivalent dilated conv: insert (stride-1) zeros between inputs,
    pad K-1-padding on both sides, convolve with the kernel flipped and
    the in/out axes swapped."""
    k = w.shape[-1]
    w_flip = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [Cout, Cin, K]
    out = jax.lax.conv_general_dilated(
        x, w_flip, window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def snake_beta(x, alpha, beta):
    """SnakeBeta activation, log-scale params (reference
    AudioSnakeBeta, transformer_longcat_audiodit.h:58-80)."""
    a = jnp.exp(alpha)[None, :, None]
    b = jnp.exp(beta)[None, :, None]
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


def pixel_unshuffle_1d(x, factor):
    b, c, w = x.shape
    return x.reshape(b, c, w // factor, factor).transpose(0, 1, 3, 2).reshape(
        b, c * factor, w // factor
    )


def pixel_shuffle_1d(x, factor):
    b, cf, w = x.shape
    c = cf // factor
    return x.reshape(b, c, factor, w).transpose(0, 1, 3, 2).reshape(
        b, c, w * factor
    )


# ---------------------------------------------------------------------------
# WAV-VAE (snake-beta residual conv stack)
# ---------------------------------------------------------------------------
@dataclass
class AudioVaeConfig:
    in_channels: int = 1
    channels: int = 128
    c_mults: tuple = (1, 2, 4, 8, 16)
    strides: tuple = (2, 4, 4, 8, 8)
    latent_dim: int = 64
    scale: float = 0.71
    final_tanh: bool = False

    @property
    def downsampling_ratio(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out


class AudioVae:
    """Reference AudioDiTVae (transformer_longcat_audiodit.h:506-585)."""

    def __init__(self, cfg: AudioVaeConfig):
        self.cfg = cfg

    # -- params -----------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        mults = (1,) + tuple(c.c_mults)
        key = iter(jax.random.split(rng, 512))

        def w(*shape, scale=0.02):
            return jax.random.normal(next(key), shape, jnp.float32) * scale

        def res_unit(ch):
            return {
                "a0_alpha": jnp.zeros((ch,)), "a0_beta": jnp.zeros((ch,)),
                "c0_w": w(ch, ch, 7), "c0_b": jnp.zeros((ch,)),
                "a1_alpha": jnp.zeros((ch,)), "a1_beta": jnp.zeros((ch,)),
                "c1_w": w(ch, ch, 1), "c1_b": jnp.zeros((ch,)),
            }

        enc_blocks = []
        for i in range(len(c.strides)):
            in_ch = mults[i] * c.channels
            out_ch = mults[i + 1] * c.channels
            s = c.strides[i]
            enc_blocks.append({
                "res": [res_unit(in_ch) for _ in range(3)],
                "act_alpha": jnp.zeros((in_ch,)),
                "act_beta": jnp.zeros((in_ch,)),
                "down_w": w(out_ch, in_ch, 2 * s),
                "down_b": jnp.zeros((out_ch,)),
            })
        ch_last = mults[-1] * c.channels
        dec_blocks = []
        for i in range(len(c.strides) - 1, -1, -1):
            in_ch = mults[i + 1] * c.channels
            out_ch = mults[i] * c.channels
            s = c.strides[i]
            dec_blocks.append({
                "act_alpha": jnp.zeros((in_ch,)),
                "act_beta": jnp.zeros((in_ch,)),
                "up_w": w(in_ch, out_ch, 2 * s),  # ConvTranspose layout
                "up_b": jnp.zeros((out_ch,)),
                "res": [res_unit(out_ch) for _ in range(3)],
            })
        return {
            "enc_in_w": w(c.channels, c.in_channels, 7),
            "enc_in_b": jnp.zeros((c.channels,)),
            "enc_blocks": enc_blocks,
            "enc_out_alpha": jnp.zeros((ch_last,)),
            "enc_out_beta": jnp.zeros((ch_last,)),
            "enc_out_w": w(2 * c.latent_dim, ch_last, 3),
            "enc_out_b": jnp.zeros((2 * c.latent_dim,)),
            "dec_in_w": w(ch_last, c.latent_dim, 7),
            "dec_in_b": jnp.zeros((ch_last,)),
            "dec_blocks": dec_blocks,
            "dec_out_alpha": jnp.zeros((c.channels,)),
            "dec_out_beta": jnp.zeros((c.channels,)),
            "dec_out_w": w(c.in_channels, c.channels, 7),
        }

    # -- forward ----------------------------------------------------------
    def _res_unit(self, p, x, dilation):
        h = snake_beta(x, p["a0_alpha"], p["a0_beta"])
        pad = (dilation * 6) // 2
        h = conv1d(h, p["c0_w"], p["c0_b"], padding=pad, dilation=dilation)
        h = snake_beta(h, p["a1_alpha"], p["a1_beta"])
        h = conv1d(h, p["c1_w"], p["c1_b"])
        return x + h

    def encode(self, params, audio, rng=None):
        """[B, 1, T] -> latents [B, latent_dim, T/ratio] (scaled)."""
        c = self.cfg
        x = conv1d(audio, params["enc_in_w"], params["enc_in_b"], padding=3)
        for bi, blk in enumerate(params["enc_blocks"]):
            h = x
            for di, d in enumerate((1, 3, 9)):
                h = self._res_unit(blk["res"][di], h, d)
            h = snake_beta(h, blk["act_alpha"], blk["act_beta"])
            s = c.strides[bi]
            x = conv1d(h, blk["down_w"], blk["down_b"], stride=s,
                       padding=math.ceil(s / 2))
        x = snake_beta(x, params["enc_out_alpha"], params["enc_out_beta"])
        x = conv1d(x, params["enc_out_w"], params["enc_out_b"], padding=1)
        mean, logscale = jnp.split(x, 2, axis=1)
        stdev = jax.nn.softplus(logscale) + 1e-4
        noise = (
            jax.random.normal(rng, mean.shape, jnp.float32)
            if rng is not None else jnp.zeros_like(mean)
        )
        return (mean + noise * stdev) / c.scale

    def decode(self, params, latents):
        """[B, latent_dim, T'] -> waveform [B, 1, T'*ratio]."""
        c = self.cfg
        z = latents * c.scale
        x = conv1d(z, params["dec_in_w"], params["dec_in_b"], padding=3)
        for bi, blk in enumerate(params["dec_blocks"]):
            s = c.strides[len(c.strides) - 1 - bi]
            h = snake_beta(x, blk["act_alpha"], blk["act_beta"])
            h = conv_transpose1d(h, blk["up_w"], blk["up_b"], stride=s,
                                 padding=math.ceil(s / 2))
            for di, d in enumerate((1, 3, 9)):
                h = self._res_unit(blk["res"][di], h, d)
            x = h
        x = snake_beta(x, params["dec_out_alpha"], params["dec_out_beta"])
        x = conv1d(x, params["dec_out_w"], padding=3)
        if c.final_tanh:
            x = jnp.tanh(x)
        return x


# ---------------------------------------------------------------------------
# AudioDiT transformer
# ---------------------------------------------------------------------------
@dataclass
class AudioDiTConfig:
    dim: int = 1536
    depth: int = 24
    heads: int = 24
    ff_mult: float = 4.0
    latent_dim: int = 64
    text_dim: int = 768
    long_skip: bool = True
    text_conv: bool = True       # 4 ConvNeXtV2 blocks on text
    use_latent_condition: bool = True
    repa_layer: int = 8          # long-skip re-injection after this block
    rope_base: float = 100000.0
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


def _rms_norm_last(x, w, eps):
    xf = x.astype(jnp.float32)
    v = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(v + eps)).astype(x.dtype) * w


def _layer_norm(x, eps, w=None, b=None):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        h = h * w + b
    return h.astype(x.dtype)


def _rope_table(seq_len, dim, base):
    inv = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(t, inv)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _apply_rope(x, cos, sin):
    """x [B, S, H, D]; cos/sin [S, D] (rotate-half convention)."""
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s).astype(
        x.dtype
    )


class AudioDiT:
    """Reference AudioDiTTransformer
    (transformer_longcat_audiodit.h:1265-1470)."""

    def __init__(self, cfg: AudioDiTConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype

    # -- params -----------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        d = c.dim
        mlp = int(d * c.ff_mult)
        key = iter(jax.random.split(rng, 64))

        def w(*shape, scale=0.02):
            return (
                jax.random.normal(next(key), shape, jnp.float32) * scale
            ).astype(self.dtype)

        def embedder(in_dim):
            return {
                "w0": w(in_dim, d), "b0": jnp.zeros((d,), self.dtype),
                "w1": w(d, d), "b1": jnp.zeros((d,), self.dtype),
            }

        def block(k):
            kk = jax.random.split(k, 16)
            ki = iter(kk)

            def bw(*shape, scale=0.02):
                return (
                    jax.random.normal(next(ki), shape, jnp.float32) * scale
                ).astype(self.dtype)

            return {
                "adaln_scale_shift": bw(6 * d, scale=1.0 / math.sqrt(d)),
                "sa_q_w": bw(d, d), "sa_q_b": jnp.zeros((d,), self.dtype),
                "sa_k_w": bw(d, d), "sa_k_b": jnp.zeros((d,), self.dtype),
                "sa_v_w": bw(d, d), "sa_v_b": jnp.zeros((d,), self.dtype),
                "sa_qn": jnp.ones((d,), self.dtype),
                "sa_kn": jnp.ones((d,), self.dtype),
                "sa_o_w": bw(d, d), "sa_o_b": jnp.zeros((d,), self.dtype),
                "ca_q_w": bw(d, d), "ca_q_b": jnp.zeros((d,), self.dtype),
                "ca_k_w": bw(d, d), "ca_k_b": jnp.zeros((d,), self.dtype),
                "ca_v_w": bw(d, d), "ca_v_b": jnp.zeros((d,), self.dtype),
                "ca_qn": jnp.ones((d,), self.dtype),
                "ca_kn": jnp.ones((d,), self.dtype),
                "ca_o_w": bw(d, d), "ca_o_b": jnp.zeros((d,), self.dtype),
                "ff_w0": bw(d, mlp), "ff_b0": jnp.zeros((mlp,), self.dtype),
                "ff_w1": bw(mlp, d), "ff_b1": jnp.zeros((d,), self.dtype),
            }

        keys = jax.random.split(next(key), c.depth)
        blocks = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[block(k) for k in keys]
        )
        params = {
            "time_w0": w(256, d), "time_b0": jnp.zeros((d,), self.dtype),
            "time_w1": w(d, d), "time_b1": jnp.zeros((d,), self.dtype),
            "input_embed": embedder(c.latent_dim),
            "text_embed": embedder(c.text_dim),
            "blocks": blocks,
            "adaln_global_w": w(d, 6 * d),
            "adaln_global_b": jnp.zeros((6 * d,), self.dtype),
            "norm_out_w": w(d, 2 * d),
            "norm_out_b": jnp.zeros((2 * d,), self.dtype),
            "proj_out_w": w(d, c.latent_dim),
            "proj_out_b": jnp.zeros((c.latent_dim,), self.dtype),
        }
        if c.use_latent_condition:
            params["latent_embed"] = embedder(c.latent_dim)
            params["latent_cond_embedder"] = embedder(2 * d)
        if c.text_conv:
            tc = []
            for _ in range(4):
                tc.append({
                    "dw_w": w(d, 1, 7), "dw_b": jnp.zeros((d,), self.dtype),
                    "ln_w": jnp.ones((d,), self.dtype),
                    "ln_b": jnp.zeros((d,), self.dtype),
                    "pw1_w": w(d, 2 * d),
                    "pw1_b": jnp.zeros((2 * d,), self.dtype),
                    "grn_g": jnp.zeros((2 * d,), self.dtype),
                    "grn_b": jnp.zeros((2 * d,), self.dtype),
                    "pw2_w": w(2 * d, d), "pw2_b": jnp.zeros((d,), self.dtype),
                })
            params["text_conv"] = tc
        return params

    # -- pieces -----------------------------------------------------------
    def _embedder(self, p, x, mask=None):
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        h = jnp.dot(x, p["w0"]) + p["b0"]
        h = jax.nn.silu(h)
        h = jnp.dot(h, p["w1"]) + p["b1"]
        if mask is not None:
            h = jnp.where(mask[..., None], h, 0.0)
        return h

    def _timestep_embed(self, params, t):
        """Sinusoidal (scale 1000) -> MLP(SiLU) (reference
        AudioTimestepEmbedding, :636-660)."""
        half = 128
        emb = np.log(10000.0) / (half - 1)
        freqs = jnp.exp(-emb * jnp.arange(half, dtype=jnp.float32))
        args = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None]
        h = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        h = jnp.dot(h.astype(self.dtype), params["time_w0"]) + params["time_b0"]
        h = jax.nn.silu(h)
        return jnp.dot(h, params["time_w1"]) + params["time_b1"]

    def _text_convnext(self, p, x):
        """ConvNeXtV2 block (reference AudioConvNeXtV2Block, :755-795)."""
        c = self.cfg
        h = x.transpose(0, 2, 1)  # [B, D, S]
        dw = jnp.broadcast_to(p["dw_w"], (c.dim, 1, 7))
        h = jax.lax.conv_general_dilated(
            h, dw, window_strides=(1,), padding=[(3, 3)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=c.dim,
        ) + p["dw_b"][None, :, None]
        h = h.transpose(0, 2, 1)  # [B, S, D]
        h = _layer_norm(h, c.eps, p["ln_w"], p["ln_b"])
        h = jnp.dot(h, p["pw1_w"]) + p["pw1_b"]
        h = jax.nn.silu(h)
        # GRN: gx = ||h||_2 over seq, nx = gx / mean(gx over channels)
        gx = jnp.sqrt(
            jnp.sum(jnp.square(h.astype(jnp.float32)), axis=1, keepdims=True)
        )
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        h = (p["grn_g"] * (h * nx.astype(h.dtype)) + p["grn_b"]) + h
        h = jnp.dot(h, p["pw2_w"]) + p["pw2_b"]
        return x + h

    def _attend(self, q, k, v, bias=None):
        c = self.cfg
        scores = jnp.einsum(
            "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
        ) * (c.head_dim**-0.5)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        # all-masked rows (unconditional pass) -> zeros, not NaN
        probs = jnp.nan_to_num(probs, nan=0.0)
        return jnp.einsum(
            "bhst,bthd->bshd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    def _block(self, bp, x, text, adaln6, rope_x, rope_t, mask, cond_mask):
        c = self.cfg
        b, s, d = x.shape
        h = c.heads
        hd = c.head_dim
        gate_sa, scale_sa, shift_sa, gate_ff, scale_ff, shift_ff = jnp.split(
            adaln6 + bp["adaln_scale_shift"][None], 6, axis=-1
        )

        def modulate(v, scale, shift):
            return _layer_norm(v, c.eps) * (1.0 + scale[:, None]) + shift[
                :, None
            ]

        # self-attention
        nx = modulate(x, scale_sa, shift_sa)
        q = _rms_norm_last(jnp.dot(nx, bp["sa_q_w"]) + bp["sa_q_b"],
                           bp["sa_qn"], c.eps).reshape(b, s, h, hd)
        k = _rms_norm_last(jnp.dot(nx, bp["sa_k_w"]) + bp["sa_k_b"],
                           bp["sa_kn"], c.eps).reshape(b, s, h, hd)
        v = (jnp.dot(nx, bp["sa_v_w"]) + bp["sa_v_b"]).reshape(b, s, h, hd)
        q = _apply_rope(q, *rope_x)
        k = _apply_rope(k, *rope_x)
        bias = None
        if mask is not None:
            bias = jnp.where(mask[:, None, None, :], 0.0, -jnp.inf)
        att = self._attend(q, k, v, bias).reshape(b, s, d)
        x = x + gate_sa[:, None] * (jnp.dot(att, bp["sa_o_w"]) + bp["sa_o_b"])

        # cross-attention (ungated residual)
        st = text.shape[1]
        q = _rms_norm_last(jnp.dot(x, bp["ca_q_w"]) + bp["ca_q_b"],
                           bp["ca_qn"], c.eps).reshape(b, s, h, hd)
        k = _rms_norm_last(jnp.dot(text, bp["ca_k_w"]) + bp["ca_k_b"],
                           bp["ca_kn"], c.eps).reshape(b, st, h, hd)
        v = (jnp.dot(text, bp["ca_v_w"]) + bp["ca_v_b"]).reshape(b, st, h, hd)
        q = _apply_rope(q, *rope_x)
        k = _apply_rope(k, *rope_t)
        bias = None
        if cond_mask is not None:
            bias = jnp.where(cond_mask[:, None, None, :], 0.0, -jnp.inf)
        att = self._attend(q, k, v, bias).reshape(b, s, d)
        x = x + jnp.dot(att, bp["ca_o_w"]) + bp["ca_o_b"]

        # FFN
        nh = modulate(x, scale_ff, shift_ff)
        f = jnp.dot(nh, bp["ff_w0"]) + bp["ff_b0"]
        f = jax.nn.gelu(f, approximate=True)
        f = jnp.dot(f, bp["ff_w1"]) + bp["ff_b1"]
        return x + gate_ff[:, None] * f

    # -- forward ----------------------------------------------------------
    def forward(
        self,
        params,
        x,             # [B, S, latent_dim] noised latent
        text,          # [B, St, text_dim]
        text_len,      # [B] valid text tokens
        t,             # [B] timestep in [0, 1]
        mask=None,     # [B, S] bool
        cond_mask=None,  # [B, St] bool
        latent_cond=None,  # [B, S, latent_dim]
    ):
        c = self.cfg
        x = x.astype(self.dtype)
        text = text.astype(self.dtype)
        temb = self._timestep_embed(params, t)  # [B, d]

        text = self._embedder(params["text_embed"], text, cond_mask)
        if c.text_conv:
            for tp in params["text_conv"]:
                text = self._text_convnext(tp, text)
            if cond_mask is not None:
                text = jnp.where(cond_mask[..., None], text, 0.0)

        x = self._embedder(params["input_embed"], x, mask)
        if c.use_latent_condition and latent_cond is not None:
            lc = self._embedder(
                params["latent_embed"], latent_cond.astype(self.dtype), mask
            )
            x = self._embedder(
                params["latent_cond_embedder"],
                jnp.concatenate([x, lc], axis=-1),
            )
        x_clone = x

        rope_x = _rope_table(x.shape[1], c.head_dim, c.rope_base)
        rope_t = _rope_table(text.shape[1], c.head_dim, c.rope_base)

        # global AdaLN conditioning: t + masked text mean
        if cond_mask is not None:
            tl = text_len.astype(jnp.float32)[:, None] + 1e-9
            text_mean = (
                jnp.sum(text.astype(jnp.float32), axis=1) / tl
            ).astype(text.dtype)
            norm_cond = temb + text_mean
        else:
            norm_cond = temb
        adaln6 = (
            jnp.dot(jax.nn.silu(norm_cond), params["adaln_global_w"])
            + params["adaln_global_b"]
        )

        # two scan segments split at the repa layer; long-skip adds the
        # embedded input after segment 1 and after segment 2
        blocks = params["blocks"]
        repa = min(max(c.repa_layer, 0), c.depth) if c.long_skip else c.depth
        seg1 = jax.tree.map(lambda a: a[:repa], blocks)
        seg2 = jax.tree.map(lambda a: a[repa:], blocks)

        def body(carry, bp):
            return self._block(
                bp, carry, text, adaln6, rope_x, rope_t, mask, cond_mask
            ), None

        if repa > 0:
            x, _ = jax.lax.scan(body, x, seg1)
        if c.long_skip:
            x = x + x_clone
        if repa < c.depth:
            x, _ = jax.lax.scan(body, x, seg2)
        if c.long_skip:
            x = x + x_clone

        # AdaLayerNormZeroFinal + projection
        e = (
            jnp.dot(jax.nn.silu(norm_cond), params["norm_out_w"])
            + params["norm_out_b"]
        )
        scale, shift = jnp.split(e, 2, axis=-1)
        x = _layer_norm(x, c.eps) * (1.0 + scale[:, None]) + shift[:, None]
        return jnp.dot(x, params["proj_out_w"]) + params["proj_out_b"]


# ---------------------------------------------------------------------------
# APG guidance (reference transformer_longcat_audiodit.h:1470-1520)
# ---------------------------------------------------------------------------
def apg_step(pred_cond, pred_uncond, guidance_scale, running_avg, step_idx,
             momentum=-0.3, eta=0.5):
    """One APG update; returns (guided, new_running_avg)."""
    diff = pred_cond - pred_uncond
    running_avg = jnp.where(step_idx == 0, diff, diff + momentum * running_avg)
    d = running_avg.astype(jnp.float32)
    v1 = pred_cond.astype(jnp.float32)
    v1_norm = jnp.sqrt(
        jnp.sum(jnp.square(v1), axis=(-1, -2), keepdims=True)
    ).clip(1e-12)
    v1n = v1 / v1_norm
    par = jnp.sum(d * v1n, axis=(-1, -2), keepdims=True) * v1n
    orth = d - par
    update = orth + eta * par
    return (
        pred_cond + guidance_scale * update.astype(pred_cond.dtype),
        running_avg,
    )


def approx_duration_from_text(text: str, max_duration_s: float = 30.0):
    """Duration estimate (reference pipeline_longcat_audiodit.h:258-290):
    CJK chars at 0.21 s, latin letters at 0.082 s, majority class absorbs
    other glyphs."""
    nzh = nen = nother = 0
    for ch in text:
        cp = ord(ch)
        if 0x4E00 <= cp <= 0x9FFF:
            nzh += 1
        elif ch.isascii() and ch.isalpha():
            nen += 1
        elif ch not in " \t\n":
            nother += 1
    if nzh > nen:
        nzh += nother
    else:
        nen += nother
    return max(min(nzh * 0.21 + nen * 0.082, max_duration_s), 1.0)


# ---------------------------------------------------------------------------
# Pipeline: text -> waveform
# ---------------------------------------------------------------------------
@dataclass
class AudioPipelineConfig:
    dit: AudioDiTConfig = field(default_factory=AudioDiTConfig)
    vae: AudioVaeConfig = field(default_factory=AudioVaeConfig)
    sampling_rate: int = 44100
    num_steps: int = 16
    guidance_scale: float = 3.0
    guidance_method: str = "apg"  # "apg" | "cfg" | "" (none)


class AudioPipeline:
    """Reference LongCatAudioDiTPipeline forward
    (pipeline_longcat_audiodit.h:130-470): duration -> noise -> Euler
    flow-match solve with APG/CFG -> VAE decode. The whole solve is one
    jit (scan over steps, APG momentum in the carry)."""

    def __init__(self, cfg: AudioPipelineConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dit = AudioDiT(cfg.dit, dtype=dtype)
        self.vae = AudioVae(cfg.vae)
        self._solve = None

    def init_params(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        return {"dit": self.dit.init_params(k1),
                "vae": self.vae.init_params(k2)}

    def frames_for_duration(self, duration_s: float) -> int:
        c = self.cfg
        return max(
            int(round(duration_s * c.sampling_rate
                      / c.vae.downsampling_ratio)), 1
        )

    # -- the jitted Euler solve -------------------------------------------
    def _build_solve(self):
        c = self.cfg
        use_guidance = c.guidance_scale > 1e-5 and c.guidance_method
        t_sched = np.linspace(0.0, 1.0, c.num_steps, dtype=np.float32)

        def solve(params, y0, text, text_len, text_mask,
                  neg_text, neg_len, neg_mask, latent_cond):
            b = y0.shape[0]
            ts = jnp.asarray(t_sched)
            dts = jnp.diff(ts)

            def step(carry, inp):
                y, avg = carry
                t_val, dt, idx = inp
                t_b = jnp.full((b,), t_val, jnp.float32)
                pred = self.dit.forward(
                    params["dit"], y, text, text_len, t_b,
                    cond_mask=text_mask, latent_cond=latent_cond,
                )
                if not use_guidance:
                    return (y + pred * dt, avg), None
                null_pred = self.dit.forward(
                    params["dit"], y, neg_text, neg_len, t_b,
                    cond_mask=neg_mask,
                    latent_cond=jnp.zeros_like(latent_cond),
                )
                if c.guidance_method == "apg":
                    pred_sample = y + (1.0 - t_val) * pred
                    null_sample = y + (1.0 - t_val) * null_pred
                    guided, avg = apg_step(
                        pred_sample, null_sample, c.guidance_scale, avg, idx
                    )
                    velocity = (guided - y) / (1.0 - t_val + 1e-9)
                else:
                    velocity = pred + (pred - null_pred) * c.guidance_scale
                return (y + velocity * dt, avg), None

            (y, _), _ = jax.lax.scan(
                step, (y0, jnp.zeros_like(y0)),
                (ts[:-1], dts, jnp.arange(c.num_steps - 1)),
            )
            return y

        return jax.jit(solve)

    def generate(
        self,
        params,
        text_states,     # [B, St, text_dim] encoder states
        text_len,        # [B]
        *,
        duration_s: float,
        seed: int = 0,
        neg_text_states=None,
        decode: bool = True,
    ):
        c = self.cfg
        b, st, _ = text_states.shape
        frames = self.frames_for_duration(duration_s)
        rng = jax.random.key(seed)
        y0 = jax.random.normal(
            rng, (b, frames, c.vae.latent_dim), jnp.float32
        )
        text_mask = (
            jnp.arange(st)[None, :] < jnp.asarray(text_len)[:, None]
        )
        if neg_text_states is None:
            neg_text_states = jnp.zeros_like(text_states)
            neg_mask = jnp.zeros((b, st), bool)
            neg_len = jnp.zeros((b,), jnp.int32)
        else:
            neg_mask = jnp.ones((b, neg_text_states.shape[1]), bool)
            neg_len = jnp.full((b,), neg_text_states.shape[1], jnp.int32)
        latent_cond = jnp.zeros((b, frames, c.vae.latent_dim), jnp.float32)
        if self._solve is None:
            self._solve = self._build_solve()
        latents = self._solve(
            params, y0, text_states, jnp.asarray(text_len), text_mask,
            neg_text_states, neg_len, neg_mask, latent_cond,
        )
        if not decode:
            return latents
        wav = self.vae.decode(
            params["vae"], latents.transpose(0, 2, 1)
        )
        return np.asarray(wav[:, 0, :])
