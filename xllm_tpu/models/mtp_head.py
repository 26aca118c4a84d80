"""MTP (multi-token prediction) draft head for speculative decoding.

Counterpart of the reference's MTP/Eagle3 speculative workers
(reference xllm/core/runtime/mtp_worker_impl.h:34, eagle3_worker_impl.h:23,
draft/target pairing speculative_engine.cpp:41-70; DeepSeek-V3-style MTP
module weights: enorm, hnorm, eh_proj, one transformer layer, shared
embedding/lm_head).

TPU-native design: the draft head lives INSIDE the target's jit step —
drafting k tokens is a ``lax.scan`` of k single-token head decodes reading
the device-resident hidden/token rings, so draft tokens never cross to the
host (the reference moves them through WorkerImpl tensors the same way,
spec_input_builder.cpp). The head keeps its own 1-layer paged KV cache
addressed by the SAME block tables as the target (positions align 1:1).

Eagle3 differences (fc over [embed; hidden], no hnorm/enorm pair, custom
vocab mapping) collapse to the same structure here; the loader maps either
family's tensors into these parameter names.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xllm_tpu.config import ModelConfig
from xllm_tpu.models.decoder import TP_AXIS, DenseDecoderModel
from xllm_tpu.ops.norms import rms_norm
from xllm_tpu.ops.rope import rope_inv_freq


class MTPHead:
    """One-layer draft transformer fed by [norm(embed); norm(hidden)].

    Reuses the target's embedding and lm_head (tied weights are the MTP
    convention); owns enorm/hnorm/eh_proj and one dense decoder layer.
    """

    def __init__(self, cfg: ModelConfig, target: DenseDecoderModel):
        self.cfg = cfg
        self.target = target
        self.dtype = target.dtype
        self.scale = cfg.head_dim**-0.5

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        hq, hkv, dh = c.num_attention_heads, c.num_kv_heads, c.head_dim
        g = hq // hkv
        d, inter = c.hidden_size, c.intermediate_size

        def w(key, *shape, scale=0.02):
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        keys = iter(jax.random.split(rng, 8))
        layer = {
            "input_layernorm": jnp.ones((1, d), self.dtype),
            "post_attention_layernorm": jnp.ones((1, d), self.dtype),
            "qkv_proj_w": w(next(keys), 1, d, hkv * (g + 2) * dh),
            "o_proj_w": w(next(keys), 1, hq * dh, d),
            "gate_proj_w": w(next(keys), 1, d, inter),
            "up_proj_w": w(next(keys), 1, d, inter),
            "down_proj_w": w(next(keys), 1, inter, d),
        }
        if c.qk_norm:
            layer["q_norm"] = jnp.ones((1, dh), self.dtype)
            layer["k_norm"] = jnp.ones((1, dh), self.dtype)
        return {
            "enorm": jnp.ones((d,), self.dtype),
            "hnorm": jnp.ones((d,), self.dtype),
            "eh_proj": w(next(keys), 2 * d, d),
            "layers": layer,
            "norm": jnp.ones((d,), self.dtype),
        }

    def param_shardings(self) -> dict:
        layer = {
            "input_layernorm": P(),
            "post_attention_layernorm": P(),
            "qkv_proj_w": P(None, None, TP_AXIS),
            "o_proj_w": P(None, TP_AXIS, None),
            "gate_proj_w": P(None, None, TP_AXIS),
            "up_proj_w": P(None, None, TP_AXIS),
            "down_proj_w": P(None, TP_AXIS, None),
        }
        if self.cfg.qk_norm:
            layer["q_norm"] = P()
            layer["k_norm"] = P()
        return {
            "enorm": P(),
            "hnorm": P(),
            "eh_proj": P(None, TP_AXIS),
            "layers": layer,
            "norm": P(),
        }

    def new_kv_cache(self, num_blocks: int, block_size: int):
        c = self.cfg
        shape = (1, num_blocks, c.num_kv_heads, block_size, c.head_dim)
        return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)

    def kv_cache_sharding(self) -> P:
        return P(None, "data", TP_AXIS, None, None)

    # ------------------------------------------------------------------
    def _embed(self, params: dict, head_params: dict, tokens) -> jnp.ndarray:
        x = params["embed_tokens"][tokens]
        return rms_norm(x, head_params["enorm"], self.cfg.rms_norm_eps)

    def _combine(
        self, head_params: dict, emb_n: jnp.ndarray, hidden: jnp.ndarray
    ) -> jnp.ndarray:
        h_n = rms_norm(hidden, head_params["hnorm"], self.cfg.rms_norm_eps)
        x = jnp.concatenate([emb_n, h_n], axis=-1)
        return jnp.dot(
            x, head_params["eh_proj"], preferred_element_type=jnp.float32
        ).astype(self.dtype)

    def _layer_forward(
        self,
        head_params: dict,
        x: jnp.ndarray,  # [T, D]
        positions: jnp.ndarray,
        attn_fn,
    ) -> jnp.ndarray:
        """One dense decoder layer over the combined states."""
        t = self.target
        c = self.cfg
        lp = jax.tree.map(lambda a: a[0], head_params["layers"])
        inv_freq = rope_inv_freq(c.head_dim, c.rope_theta, c.rope_scaling)
        h = rms_norm(x, lp["input_layernorm"], c.rms_norm_eps)
        q, k, v = t._attn_qkv({**lp}, h, positions, inv_freq)
        attn = attn_fn(q, k, v)
        attn = attn.reshape(x.shape[0], c.num_attention_heads * c.head_dim)
        x = x + t._linear(lp, "o_proj_w", attn).astype(x.dtype)
        h = rms_norm(x, lp["post_attention_layernorm"], c.rms_norm_eps)
        gate = t._linear(lp, "gate_proj_w", h)
        up = t._linear(lp, "up_proj_w", h)
        act = jax.nn.silu(gate) * up
        x = x + t._linear(lp, "down_proj_w", act.astype(x.dtype)).astype(x.dtype)
        return rms_norm(x, head_params["norm"], c.rms_norm_eps)

    # ------------------------------------------------------------------
    def prefill_batched(
        self,
        params: dict,
        head_params: dict,
        dk_cache: jnp.ndarray,
        dv_cache: jnp.ndarray,
        hidden: jnp.ndarray,  # [P, S, D] target hidden states of the chunk
        inp,  # BatchedPrefillInput
        tokens_next: jnp.ndarray | None = None,  # [P, S] explicit t+1 tokens
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Advance the draft KV over a prompt chunk (no token output).

        MTP predicts token t+1 from (hidden_t, embed(token_{t+1})): row j
        of the head's input combines the chunk's token j+1 embedding with
        hidden j. The last row pairs with the sampled next token, which is
        not known inside the prefill dispatch — its head-KV is written by
        the next step's draft pass instead (position alignment holds
        because the head cache uses the same block tables).
        """
        from xllm_tpu.ops.attention import prefill_attention_write_batched

        p, s = inp.token_ids.shape
        if tokens_next is not None:
            # verify rewrite pass: row j pairs hidden_j with the rejection
            # sampler's emitted token for position j+1
            tok_next = tokens_next
        else:
            # shift tokens left: row j gets token j+1 (last row repeats
            # itself; its KV row is recomputed by the next dispatch before
            # being read)
            tok_next = jnp.concatenate(
                [inp.token_ids[:, 1:], inp.token_ids[:, -1:]], axis=1
            )
        emb = self._embed(params, head_params, tok_next.reshape(-1))
        x = self._combine(head_params, emb, hidden.reshape(p * s, -1))

        result = {}

        def attn_fn(q, k, v):
            out, result["k"], result["v"] = prefill_attention_write_batched(
                q.reshape(p, s, *q.shape[1:]),
                k.reshape(p, s, *k.shape[1:]),
                v.reshape(p, s, *v.shape[1:]),
                dk_cache,
                dv_cache,
                jnp.int32(0),
                inp.slot_mapping,
                inp.block_tables,
                inp.q_offsets,
                inp.kv_lens,
                self.scale,
            )
            return out.reshape(p * s, *out.shape[2:])

        self._layer_forward(
            head_params, x, inp.positions.reshape(-1), attn_fn
        )
        return result["k"], result["v"]

    def draft_tokens(
        self,
        params: dict,
        head_params: dict,
        dk_cache: jnp.ndarray,
        dv_cache: jnp.ndarray,
        last_hidden: jnp.ndarray,  # [B, D] target hidden at last position
        last_tokens: jnp.ndarray,  # [B] the sampled-but-uncomputed token
        positions: jnp.ndarray,  # [B] position of last_tokens (num_tokens-1)
        slot_mapping_k: jnp.ndarray,  # [B, k] slots for draft positions
        block_tables: jnp.ndarray,  # [B, NB]
        seq_lens: jnp.ndarray,  # [B] num_tokens (incl. last sampled)
        k: int,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Autoregressively draft k tokens per row -> ([B, k], dk, dv).

        Step j: head input combines embed(tok_j) with hidden_{j-1}; its
        KV lands at position (pos of tok_j); argmax logits give tok_{j+1}.
        """
        from xllm_tpu.ops.attention import decode_attention_write

        def step(carry, j):
            hidden, tok, dk, dv = carry
            emb = self._embed(params, head_params, tok)
            x = self._combine(head_params, emb, hidden)
            slots_j = jax.lax.dynamic_index_in_dim(
                slot_mapping_k, j, axis=1, keepdims=False
            )
            result = {}

            def attn_fn(q, k_, v_):
                out, result["dk"], result["dv"] = decode_attention_write(
                    q, k_, v_, dk, dv, jnp.int32(0),
                    slots_j, block_tables, seq_lens + j, self.scale,
                )
                return out

            h_out = self._layer_forward(
                head_params, x, positions + j, attn_fn
            )
            logits = self.target.compute_logits(params, h_out)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (
                h_out.astype(self.dtype), nxt, result["dk"], result["dv"]
            ), nxt

        (hid, tok, dk_cache, dv_cache), drafts = jax.lax.scan(
            step,
            (last_hidden.astype(self.dtype), last_tokens, dk_cache, dv_cache),
            jnp.arange(k, dtype=jnp.int32),
        )
        return drafts.T, dk_cache, dv_cache  # [B, k]
