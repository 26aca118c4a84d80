"""OneRec-class T5 encoder-decoder for generative recommendation (JAX).

Counterpart of the reference's OneRec model
(xllm/models/rec/onerec.h: OneRecModelImpl encoder/decoder forwards,
OneRecForConditionalGeneration; RecForCausalLMImplBase in
core/framework/model/rec_causal_lm.h — tied-embedding 1/sqrt(d) logits
scaling, args at onerec.h:230-263: num_layers/num_decoder_layers,
relative_attention_num_buckets/max_distance, layer_norm_epsilon).

Architecture (T5 family): RMSNorm (no bias, pre-norm), relative
position bias buckets added to attention logits (bidirectional in the
encoder, causal in the decoder, none in cross-attention; only layer 0
owns the bias table, shared across layers), ReLU or gated-GELU FFN,
tied word embeddings with 1/sqrt(d_model) logits scale.

TPU-native: layers are stacked on a leading axis and scanned
(`lax.scan`) like every other model family here (models/decoder.py
convention); the whole encoder and each decoder step are single fused
XLA programs. The decoder re-runs over the fixed-length semantic-ID
prefix each beam round (rounds are tiny — rec_type.h kRecTotalSteps=3),
which keeps shapes static with no paged KV plumbing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class OneRecConfig:
    vocab_size: int = 512            # semantic-id vocab (decoder side)
    encoder_vocab_size: int = 0      # 0 -> shared with vocab_size
    d_model: int = 128
    d_kv: int = 32                   # per-head dim
    d_ff: int = 256
    num_layers: int = 2              # encoder layers
    num_decoder_layers: int = 2
    num_heads: int = 4
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # or "relu"
    tie_word_embeddings: bool = True
    dtype: str = "float32"

    @property
    def enc_vocab(self) -> int:
        return self.encoder_vocab_size or self.vocab_size


def _rel_bucket(rel_pos, bidirectional, num_buckets, max_distance):
    """T5 relative position bucketing (log-spaced far buckets)."""
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class OneRecModel:
    def __init__(self, cfg: OneRecConfig):
        self.cfg = cfg
        self.dtype = jnp.dtype(cfg.dtype)

    # -- params ---------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        inner = c.num_heads * c.d_kv
        ks = iter(jax.random.split(rng, 128))

        def w(*shape, scale=None):
            scale = scale or (1.0 / math.sqrt(shape[0]))
            return (jax.random.normal(next(ks), shape) * scale).astype(
                self.dtype)

        def ffn_p():
            p = {"wo": w(c.d_ff, c.d_model)}
            if c.feed_forward_proj.startswith("gated"):
                p["wi_0"] = w(c.d_model, c.d_ff)
                p["wi_1"] = w(c.d_model, c.d_ff)
            else:
                p["wi"] = w(c.d_model, c.d_ff)
            return p

        def attn_p():
            return {"q": w(c.d_model, inner), "k": w(c.d_model, inner),
                    "v": w(c.d_model, inner), "o": w(inner, c.d_model)}

        def norm():
            return jnp.ones((c.d_model,), self.dtype)

        def enc_layer():
            return {"attn": attn_p(), "ffn": ffn_p(),
                    "n1": norm(), "n2": norm()}

        def dec_layer():
            return {"attn": attn_p(), "cross": attn_p(), "ffn": ffn_p(),
                    "n1": norm(), "n2": norm(), "n3": norm()}

        def stack(n, f):
            outs = [f() for _ in range(n)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

        params = {
            "shared": w(c.enc_vocab, c.d_model, scale=1.0),
            "enc_rel_bias": w(c.relative_attention_num_buckets, c.num_heads,
                              scale=0.1),
            "dec_rel_bias": w(c.relative_attention_num_buckets, c.num_heads,
                              scale=0.1),
            "encoder": stack(c.num_layers, enc_layer),
            "decoder": stack(c.num_decoder_layers, dec_layer),
            "enc_final_norm": norm(),
            "dec_final_norm": norm(),
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = w(c.d_model, c.vocab_size, scale=0.02)
        if c.encoder_vocab_size:
            params["dec_embed"] = w(c.vocab_size, c.d_model, scale=1.0)
        return params

    # -- pieces ---------------------------------------------------------
    def _rms(self, x, wgt):
        x32 = x.astype(jnp.float32)
        out = x32 * jax.lax.rsqrt(
            (x32**2).mean(-1, keepdims=True) + self.cfg.layer_norm_epsilon)
        return out.astype(x.dtype) * wgt

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.cfg.num_heads, self.cfg.d_kv)

    def _attn(self, p, x, kv_x, bias):
        """T5 attention: no scaling (folded into init), additive bias."""
        b, s, _ = x.shape
        q = self._heads(x @ p["q"])
        k = self._heads(kv_x @ p["k"])
        v = self._heads(kv_x @ p["v"])
        logits = jnp.einsum("bshd,bthd->bhst", q, k)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhst,bthd->bshd", probs, v)
        return o.reshape(b, s, -1) @ p["o"]

    def _ffn(self, p, x):
        if self.cfg.feed_forward_proj.startswith("gated"):
            h = jax.nn.gelu(x @ p["wi_0"], approximate=True) * (x @ p["wi_1"])
        else:
            h = jax.nn.relu(x @ p["wi"])
        return h @ p["wo"]

    def _rel_bias(self, table, q_len, k_len, bidirectional):
        ctx = jnp.arange(q_len)[:, None]
        mem = jnp.arange(k_len)[None, :]
        buckets = _rel_bucket(
            mem - ctx, bidirectional,
            self.cfg.relative_attention_num_buckets,
            self.cfg.relative_attention_max_distance)
        return table[buckets].transpose(2, 0, 1)[None]  # [1,H,q,k]

    # -- encoder --------------------------------------------------------
    def encode(self, params, tokens, mask=None):
        """tokens [B,S] int32 -> hidden [B,S,d]; mask [B,S] 1=real."""
        c = self.cfg
        x = params["shared"][tokens]
        bias = self._rel_bias(params["enc_rel_bias"], tokens.shape[1],
                              tokens.shape[1], bidirectional=True)
        if mask is not None:
            pad = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
            bias = bias + pad.astype(bias.dtype)

        def body(x, lp):
            h = self._rms(x, lp["n1"])
            x = x + self._attn(lp["attn"], h, h, bias)
            h = self._rms(x, lp["n2"])
            x = x + self._ffn(lp["ffn"], h)
            return x, None

        x, _ = jax.lax.scan(body, x, params["encoder"])
        return self._rms(x, params["enc_final_norm"])

    # -- decoder --------------------------------------------------------
    def decode(self, params, dec_tokens, enc_hidden, enc_mask=None):
        """dec_tokens [B,L] -> logits [B,L,V] (causal, full re-run)."""
        c = self.cfg
        embed = params.get("dec_embed", params["shared"])
        x = embed[dec_tokens]
        L = dec_tokens.shape[1]
        bias = self._rel_bias(params["dec_rel_bias"], L, L,
                              bidirectional=False)
        causal = jnp.tril(jnp.ones((L, L), jnp.float32))
        bias = bias + ((1.0 - causal) * -1e9).astype(bias.dtype)
        xbias = None
        if enc_mask is not None:
            pad = (1.0 - enc_mask[:, None, None, :].astype(jnp.float32))
            xbias = (pad * -1e9).astype(x.dtype)

        def body(x, lp):
            h = self._rms(x, lp["n1"])
            x = x + self._attn(lp["attn"], h, h, bias)
            h = self._rms(x, lp["n2"])
            x = x + self._attn(lp["cross"], h, enc_hidden, xbias)
            h = self._rms(x, lp["n3"])
            x = x + self._ffn(lp["ffn"], h)
            return x, None

        x, _ = jax.lax.scan(body, x, params["decoder"])
        x = self._rms(x, params["dec_final_norm"])
        if self.cfg.tie_word_embeddings:
            # rec_causal_lm.h:40-48 — tied head scales by 1/sqrt(d)
            x = x * (1.0 / math.sqrt(self.cfg.d_model))
            head = embed.T
        else:
            head = params["lm_head"]
        return (x @ head).astype(jnp.float32)
