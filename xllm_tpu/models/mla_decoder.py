"""DeepSeek-style MLA decoder (deepseek v2/v2-lite family).

Counterpart of the reference's deepseek v2/v3 models + MLA layers
(reference xllm/models/llm/deepseek_v2.h, layers npu_deepseek_v2_decoder,
kernels MLA fused ops). TPU-native design:

- the paged cache holds the ABSORBED latent per token:
  [c_kv (kv_lora_rank, rms-normed) | k_pe (rope dims, roped)] — MQA over
  one Dk = kv_lora_rank + rope head; K and V share pages and the Pallas
  kernels read each page once (ops/pallas/mla_attention.py)
- absorption matmuls (W_UK into q, W_UV out of the latent) are plain
  einsums against the per-layer kv_b factor stacks
- MoE layers (optional): a dense prefix of ``first_k_dense`` layers, then
  MoE layers combining a shared-expert MLP with routed experts scaled by
  ``routed_scaling_factor`` (deepseek v2 softmax-topk routing)

Scale note: 1/sqrt(qk_nope+qk_rope) x yarn mscale^2 (ops/rope.rope_mscale)
matching deepseek checkpoints with long-context rope scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xllm_tpu.config import ModelConfig
from xllm_tpu.models.decoder import TP_AXIS, DenseDecoderModel
from xllm_tpu.ops.mla import (
    mla_decode_attention_write,
    mla_prefill_attention_write,
    mla_prefill_attention_write_batched,
)
from xllm_tpu.ops.moe import moe_mlp
from xllm_tpu.ops.norms import rms_norm
from xllm_tpu.ops.rope import apply_rope_interleaved, rope_inv_freq
from xllm_tpu.runtime.forward_params import DecodeInput, PrefillInput


class MlaDecoderModel(DenseDecoderModel):
    # custom cache layout (latent / linear-state) — the GQA int8-KV
    # scale folding does not apply
    supports_int8_kv = False
    supports_interleaved_kv = False  # latent cache has its own layout

    # chunk-batched latent kernels: the engine's whole-batch prefill /
    # batched-verify path applies to MLA families too
    supports_batched_prefill = True

    # rope convention on the qk_rope dims: "interleaved" (deepseek
    # complex-pair) or "neox" (glm4-moe-lite's concat rotary)
    mla_rope_style = "interleaved"

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        assert cfg.kv_lora_rank > 0, "MLA requires kv_lora_rank"
        self.dk = cfg.kv_lora_rank + cfg.qk_rope_head_dim
        # lane-align the latent dim (Mosaic requires >128 dims to be 128
        # multiples); zero padding contributes nothing to scores
        self.dk_pad = -(-self.dk // 128) * 128 if self.dk > 128 else self.dk
        self.dv = cfg.kv_lora_rank
        self.qk_dim = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
        from xllm_tpu.ops.rope import rope_mscale

        self.scale = self.qk_dim**-0.5 * rope_mscale(cfg.rope_scaling) ** 2
        self.n_dense = cfg.first_k_dense_replace if cfg.num_experts > 0 else (
            cfg.num_hidden_layers
        )
        self.n_moe = cfg.num_hidden_layers - self.n_dense
        # DSA (deepseek-v3.2 sparse attention, reference deepseek_v32.h
        # :224-232 + indexer.cpp): lightning indexer + top-k selection
        self.dsa = cfg.index_topk > 0
        self.idx_heads = cfg.index_n_heads
        self.idx_dim = cfg.index_head_dim

    # ------------------------------------------------------------------
    def _attn_params(self, key, n_layers):
        c = self.cfg
        H, D = c.num_attention_heads, c.hidden_size
        qr, kvr = c.q_lora_rank, c.kv_lora_rank
        nope, rope, vh = c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        L = n_layers

        def w(k, *shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        ks = iter(jax.random.split(key, 8))
        p = {
            "input_layernorm": jnp.ones((L, D), self.dtype),
            "post_attention_layernorm": jnp.ones((L, D), self.dtype),
            "kv_a_proj_w": w(next(ks), L, D, kvr + rope),
            "kv_a_norm": jnp.ones((L, kvr), self.dtype),
            "kv_b_nope_w": w(next(ks), L, H, kvr, nope),
            "kv_b_v_w": w(next(ks), L, H, kvr, vh),
            "o_proj_w": w(next(ks), L, H * vh, D),
        }
        if qr > 0:
            p["q_a_proj_w"] = w(next(ks), L, D, qr)
            p["q_a_norm"] = jnp.ones((L, qr), self.dtype)
            p["q_b_proj_w"] = w(next(ks), L, qr, H * (nope + rope))
        else:
            p["q_proj_w"] = w(next(ks), L, D, H * (nope + rope))
        if self.dsa:
            # lightning indexer (reference indexer.cpp:54-92): wq_b on the
            # q_a-normed low-rank query, wk + layernorm on hidden, per-head
            # weights projection
            hi, di = self.idx_heads, self.idx_dim
            q_in = qr if qr > 0 else D
            kq = jax.random.split(key, 4)
            p["idx_wq_b"] = w(kq[0], L, q_in, hi * di)
            p["idx_wk"] = w(kq[1], L, D, di)
            p["idx_k_norm_w"] = jnp.ones((L, di), self.dtype)
            p["idx_k_norm_b"] = jnp.zeros((L, di), self.dtype)
            p["idx_weights_w"] = w(kq[2], L, D, hi)
        return p

    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        D, I, V = c.hidden_size, c.intermediate_size, c.vocab_size
        k_embed, k_dense, k_moe, k_head = jax.random.split(rng, 4)

        def w(k, *shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        params = {
            "embed_tokens": w(k_embed, V, D),
            "norm": jnp.ones((D,), self.dtype),
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = w(k_head, D, V)

        if self.n_dense > 0:
            ks = iter(jax.random.split(k_dense, 4))
            dense = self._attn_params(next(ks), self.n_dense)
            dense["gate_proj_w"] = w(next(ks), self.n_dense, D, I)
            dense["up_proj_w"] = w(next(ks), self.n_dense, D, I)
            dense["down_proj_w"] = w(next(ks), self.n_dense, I, D)
            params["dense_layers"] = dense
        if self.n_moe > 0:
            c_moe = c
            E, MI = c_moe.num_experts, c_moe.moe_intermediate_size
            SI = max(c_moe.n_shared_experts, 1) * MI
            ks = iter(jax.random.split(k_moe, 8))
            moe = self._attn_params(next(ks), self.n_moe)
            moe["router_w"] = w(next(ks), self.n_moe, D, E)
            if c_moe.scoring_func == "sigmoid":
                moe["router_bias"] = jnp.zeros((self.n_moe, E), jnp.float32)
            moe["experts_gate_up"] = w(next(ks), self.n_moe, E, D, 2 * MI)
            moe["experts_down"] = w(next(ks), self.n_moe, E, MI, D)
            moe["expert_placement"] = jnp.tile(
                jnp.arange(E, dtype=jnp.int32), (self.n_moe, 1)
            )
            if c_moe.n_shared_experts > 0:
                moe["shared_gate_proj_w"] = w(next(ks), self.n_moe, D, SI)
                moe["shared_up_proj_w"] = w(next(ks), self.n_moe, D, SI)
                moe["shared_down_proj_w"] = w(next(ks), self.n_moe, SI, D)
            params["moe_layers"] = moe
        return params

    def param_shardings(self) -> dict:
        c = self.cfg
        attn = {
            "input_layernorm": P(),
            "post_attention_layernorm": P(),
            "kv_a_proj_w": P(),
            "kv_a_norm": P(),
            "kv_b_nope_w": P(None, TP_AXIS, None, None),
            "kv_b_v_w": P(None, TP_AXIS, None, None),
            "o_proj_w": P(None, TP_AXIS, None),
        }
        if c.q_lora_rank > 0:
            attn["q_a_proj_w"] = P()
            attn["q_a_norm"] = P()
            attn["q_b_proj_w"] = P(None, None, TP_AXIS)
        else:
            attn["q_proj_w"] = P(None, None, TP_AXIS)
        if self.dsa:
            # the indexer is tiny and MQA-shaped: replicate
            attn["idx_wq_b"] = P()
            attn["idx_wk"] = P()
            attn["idx_k_norm_w"] = P()
            attn["idx_k_norm_b"] = P()
            attn["idx_weights_w"] = P()
        out = {"embed_tokens": P(TP_AXIS, None), "norm": P()}
        if not c.tie_word_embeddings:
            out["lm_head"] = P(None, TP_AXIS)
        if self.n_dense > 0:
            dense = dict(attn)
            dense["gate_proj_w"] = P(None, None, TP_AXIS)
            dense["up_proj_w"] = P(None, None, TP_AXIS)
            dense["down_proj_w"] = P(None, TP_AXIS, None)
            out["dense_layers"] = dense
        if self.n_moe > 0:
            moe = dict(attn)
            moe["router_w"] = P()
            if c.scoring_func == "sigmoid":
                moe["router_bias"] = P()
            moe["experts_gate_up"] = P(None, TP_AXIS, None, None)
            moe["experts_down"] = P(None, TP_AXIS, None, None)
            moe["expert_placement"] = P()
            if c.n_shared_experts > 0:
                moe["shared_gate_proj_w"] = P(None, None, TP_AXIS)
                moe["shared_up_proj_w"] = P(None, None, TP_AXIS)
                moe["shared_down_proj_w"] = P(None, TP_AXIS, None)
            out["moe_layers"] = moe
        return out

    # ------------------------------------------------------------------
    def kv_cache_shape(self, num_blocks: int, block_size: int):
        return (
            self.cfg.num_hidden_layers, num_blocks, 1, block_size, self.dk_pad
        )

    def kv_cache_sharding(self) -> P:
        # latent cache is MQA — replicated over tp; blocks shard over DP
        return P(None, "data", None, None, None)

    def kv_bytes_per_token(self, bytes_per_el: int | None = None) -> int:
        if bytes_per_el is None:
            bytes_per_el = 2 if self.dtype == jnp.bfloat16 else 4
        per = self.dk_pad + (self.idx_dim if self.dsa else 0)
        return self.cfg.num_hidden_layers * per * bytes_per_el

    def new_kv_cache(self, num_blocks, block_size, dtype=None):
        dt = dtype or self.dtype
        cache = jnp.zeros(self.kv_cache_shape(num_blocks, block_size), dt)
        if self.dsa:
            # the indexer-K cache rides the otherwise-unused v slot, so
            # donation / PD transfer / host offload treat it generically
            idx = jnp.zeros(
                (self.cfg.num_hidden_layers, num_blocks, 1, block_size,
                 self.idx_dim), dt,
            )
            return cache, idx
        # v-cache slot unused: latent pages serve both K and V
        return cache, jnp.zeros((1,), dt)

    # ------------------------------------------------------------------
    def _mla_qkv(self, lp, h, positions, inv_freq):
        """normed hidden [T, D] -> (q_eff [T, H, Dk], lat_new [T, Dk])."""
        c = self.cfg
        t = h.shape[0]
        H = c.num_attention_heads
        nope, rope, kvr = c.qk_nope_head_dim, c.qk_rope_head_dim, c.kv_lora_rank
        if c.q_lora_rank > 0:
            qa = self._linear(lp, "q_a_proj_w", h).astype(h.dtype)
            qa = rms_norm(qa, lp["q_a_norm"], c.rms_norm_eps)
            q = self._linear(lp, "q_b_proj_w", qa).astype(h.dtype)
        else:
            qa = h
            q = self._linear(lp, "q_proj_w", h).astype(h.dtype)
        q = q.reshape(t, H, nope + rope)
        q_nope, q_pe = q[..., :nope], q[..., nope:]

        kv_a = self._linear(lp, "kv_a_proj_w", h).astype(h.dtype)
        c_kv = rms_norm(kv_a[:, :kvr], lp["kv_a_norm"], c.rms_norm_eps)
        k_pe = kv_a[:, kvr:].reshape(t, 1, rope)

        if self.mla_rope_style == "neox":
            # glm4-moe-lite: "concat" rotary — rotate-half pairs
            # (reference get_concat_rotary_embedding,
            # rotary_embedding_util.cpp:363: cat({freqs, freqs}))
            from xllm_tpu.ops.rope import apply_rope

            q_pe, k_pe = apply_rope(q_pe, k_pe, positions, inv_freq)
        else:
            q_pe, k_pe = apply_rope_interleaved(
                q_pe, k_pe, positions, inv_freq
            )

        # absorb W_UK into q: [T, H, nope] x [H, kvr, nope] -> [T, H, kvr]
        q_lat = jnp.einsum(
            "thn,hkn->thk",
            q_nope,
            lp["kv_b_nope_w"],
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        q_eff = jnp.concatenate([q_lat, q_pe], axis=-1)  # [T, H, Dk]
        lat_new = jnp.concatenate([c_kv, k_pe[:, 0]], axis=-1)  # [T, Dk]
        if self.dk_pad != self.dk:
            pad = self.dk_pad - self.dk
            q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, pad)))
            lat_new = jnp.pad(lat_new, ((0, 0), (0, pad)))
        return q_eff, lat_new, qa

    def _mla_out(self, lp, out_lat, t):
        """[T, H, kvr] latent attention output -> [T, D] residual add."""
        c = self.cfg
        out = jnp.einsum(
            "thk,hkv->thv",
            out_lat,
            lp["kv_b_v_w"],
            preferred_element_type=jnp.float32,
        ).astype(out_lat.dtype)
        out = out.reshape(t, c.num_attention_heads * c.v_head_dim)
        return self._linear(lp, "o_proj_w", out)

    def _moe_block(self, lp, x):
        c = self.cfg
        routed = moe_mlp(
            x,
            lp["router_w"],
            lp["experts_gate_up"],
            lp["experts_down"],
            c.num_experts_per_tok,
            c.norm_topk_prob,
            mesh=getattr(self, "mesh", None),
            placement=lp.get("expert_placement"),
            gate_up_scale=lp.get("experts_gate_up_scale"),
            down_scale=lp.get("experts_down_scale"),
            scoring=c.scoring_func,
            bias=lp.get("router_bias"),
            n_group=c.n_group,
            topk_group=c.topk_group,
        )
        out = routed * c.routed_scaling_factor
        if c.n_shared_experts > 0:
            gate = self._linear(lp, "shared_gate_proj_w", x)
            up = self._linear(lp, "shared_up_proj_w", x)
            act = (jax.nn.silu(gate) * up).astype(x.dtype)
            out = out + self._linear(lp, "shared_down_proj_w", act).astype(
                x.dtype
            )
        return out.astype(x.dtype)

    def _run_stack(
        self, stack, layer0, x, cache, positions, attn_fn, mlp_fn
    ):
        c = self.cfg
        t = x.shape[0]
        inv_freq = rope_inv_freq(c.qk_rope_head_dim, c.rope_theta, c.rope_scaling)
        n = stack["input_layernorm"].shape[0]

        def body(carry, xs):
            x, cache = carry
            lp, li = xs
            self._cur_rel_layer = li - layer0
            h = rms_norm(x, lp["input_layernorm"], c.rms_norm_eps)
            q_eff, lat_new, qa = self._mla_qkv(lp, h, positions, inv_freq)
            idx = (
                self._indexer(lp, h, qa, positions) if self.dsa else None
            )
            out_lat, cache = attn_fn(q_eff, lat_new, cache, li, idx)
            x = x + self._mla_out(lp, out_lat, t).astype(x.dtype)
            h2 = rms_norm(x, lp["post_attention_layernorm"], c.rms_norm_eps)
            x = x + mlp_fn(lp, h2)
            return (x, cache), None

        lids = layer0 + jnp.arange(n, dtype=jnp.int32)
        # quantized projection stacks leave the scanned xs and are indexed
        # in HBM by the kernel (see DecoderModel._run_stack / ops/quant)
        qnames = [
            name
            for name in stack
            if name.endswith("_proj_w")
            and hasattr(stack[name], "dtype")
            and stack[name].dtype in (jnp.int8, jnp.float8_e4m3fn)
            and name + "_scale" in stack
        ]
        scanned = stack
        if qnames:
            pulled = set(qnames) | {name + "_scale" for name in qnames}
            scanned = {k: v for k, v in stack.items() if k not in pulled}
            self._quant_stacks = {k: stack[k] for k in pulled}
        try:
            (x, cache), _ = jax.lax.scan(body, (x, cache), (scanned, lids))
        finally:
            self._quant_stacks = None
        return x, cache

    def _forward(self, params, cache, x, positions, attn_fn):
        if self.n_dense > 0:
            x, cache = self._run_stack(
                params["dense_layers"], 0, x, cache, positions, attn_fn,
                lambda lp, h: self._mlp(lp, h),
            )
        if self.n_moe > 0:
            x, cache = self._run_stack(
                params["moe_layers"], self.n_dense, x, cache, positions,
                attn_fn, lambda lp, h: self._moe_block(lp, h),
            )
        self._prenorm_hidden = x  # pre-final-norm states (MTP head input)
        x = rms_norm(x, params["norm"], self.cfg.rms_norm_eps)
        return x, cache

    # ------------------------------------------------------------------
    def prefill(self, params, k_all, v_all, inp: PrefillInput, num_logits=1):
        if self.dsa:
            return self._dsa_prefill(params, k_all, v_all, inp, num_logits)

        def attn_fn(q_eff, lat_new, cache, li, idx=None):
            return mla_prefill_attention_write(
                q_eff, lat_new, cache, li, inp.slot_mapping, inp.block_table,
                inp.q_offset, inp.kv_len, self.scale, self.dv,
            )

        x = params["embed_tokens"][inp.token_ids]
        x, k_all = self._forward(params, k_all, x, inp.positions, attn_fn)
        hidden = jax.lax.dynamic_slice_in_dim(
            x, inp.logits_idx - (num_logits - 1), num_logits, axis=0
        )
        return hidden, k_all, v_all

    def prefill_batched(self, params, k_all, v_all, inp, num_logits=1,
                        return_hidden=False):
        """P latent chunks in one dispatch (dense twin:
        DenseDecoderModel.prefill_batched; reference whole-batch
        BatchInputBuilder, batch_input_builder.h:53)."""
        p, s = inp.token_ids.shape

        if self.dsa:
            return self._dsa_prefill_batched(
                params, k_all, v_all, inp, num_logits, return_hidden
            )

        def attn_fn(q_eff, lat_new, cache, li, idx=None):
            q4 = q_eff.reshape(p, s, *q_eff.shape[1:])
            l3 = lat_new.reshape(p, s, lat_new.shape[-1])
            out, cache = mla_prefill_attention_write_batched(
                q4, l3, cache, li, inp.slot_mapping, inp.block_tables,
                inp.q_offsets, inp.kv_lens, self.scale, self.dv,
            )
            return out.reshape(p * s, *out.shape[2:]), cache

        x = params["embed_tokens"][inp.token_ids.reshape(-1)]
        x, k_all = self._forward(
            params, k_all, x, inp.positions.reshape(-1), attn_fn
        )
        x = x.reshape(p, s, -1)
        idx = (
            inp.logits_idx[:, None]
            - (num_logits - 1)
            + jnp.arange(num_logits, dtype=jnp.int32)[None, :]
        ).clip(0)
        hidden = jnp.take_along_axis(x, idx[..., None], axis=1)
        if return_hidden:
            # pre-final-norm states (the MTP head applies its own hnorm)
            pre = self._prenorm_hidden.reshape(p, s, -1)
            return hidden, k_all, v_all, pre
        return hidden, k_all, v_all

    def decode(self, params, k_all, v_all, inp: DecodeInput, token_ids):
        if self.dsa:
            return self._dsa_decode(params, k_all, v_all, inp, token_ids)

        def attn_fn(q_eff, lat_new, cache, li, idx=None):
            return mla_decode_attention_write(
                q_eff, lat_new, cache, li, inp.slot_mapping, inp.block_tables,
                inp.seq_lens, self.scale, self.dv,
            )

        x = params["embed_tokens"][token_ids]
        x, k_all = self._forward(params, k_all, x, inp.positions, attn_fn)
        return x, k_all, v_all

    # ------------------------------------------------------------------
    # DSA: deepseek-v3.2 lightning indexer + top-k sparse attention
    # (reference indexer.cpp:33-340, deepseek_sparse_attention.cpp,
    # deepseek_v32.h:224-232)
    # ------------------------------------------------------------------
    def _indexer(self, lp, h, qa, positions):
        """-> (q_idx [T, Hi, Di], k_idx [T, Di], w_idx [T, Hi])."""
        from xllm_tpu.ops.dsa import (
            hadamard_matrix,
            rope_front,
            rotate_activation,
        )
        from xllm_tpu.ops.norms import layer_norm as _ln

        c = self.cfg
        t = h.shape[0]
        hi, di = self.idx_heads, self.idx_dim
        rope_dim = c.qk_rope_head_dim
        inv_freq = rope_inv_freq(rope_dim, c.rope_theta, None)
        had = jnp.asarray(hadamard_matrix(di))

        q = self._linear(lp, "idx_wq_b", qa).astype(h.dtype)
        q = q.reshape(t, hi, di)
        q = rope_front(q, positions, rope_dim, inv_freq)
        q = rotate_activation(q, had)

        k = self._linear(lp, "idx_wk", h).astype(jnp.float32)
        k = _ln(k, lp["idx_k_norm_w"], lp["idx_k_norm_b"], c.rms_norm_eps)
        k = k.astype(h.dtype)
        k = rope_front(k, positions, rope_dim, inv_freq)
        k = rotate_activation(k, had)

        w = self._linear(lp, "idx_weights_w", h).astype(jnp.float32)
        return q, k, w

    def _dsa_write(self, cache, li, slots, vals):
        """Scatter rows into a paged cache [L, NB, 1, bs, D]."""
        bs = cache.shape[3]
        return cache.at[li, slots // bs, 0, slots % bs, :].set(
            vals.astype(cache.dtype)
        )

    def _dsa_attend_rows(
        self, q_eff, idx_q, idx_w, lat_pages, idxk_pages, row_pos, kv_len
    ):
        """Masked top-k latent attention for one sequence's rows.

        q_eff [S, H, Dk], idx_q [S, Hi, Di], idx_w [S, Hi];
        lat_pages [KV, Dk], idxk_pages [KV, Di]; row_pos [S] absolute
        positions; kv_len scalar. -> out_lat [S, H, dv].
        """
        from xllm_tpu.ops.dsa import index_scores, topk_mask

        c = self.cfg
        kv = lat_pages.shape[0]
        pos = jnp.arange(kv, dtype=jnp.int32)
        valid = (pos[None, :] <= row_pos[:, None]) & (
            pos[None, :] < kv_len
        )  # [S, KV] causal + length
        scores = index_scores(idx_q, idx_w, idxk_pages)  # [S, KV]
        keep = topk_mask(scores, valid, c.index_topk)  # [S, KV]

        logits = jnp.einsum(
            "shd,jd->shj", q_eff, lat_pages,
            preferred_element_type=jnp.float32,
        ) * self.scale
        logits = jnp.where(keep[:, None, :], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.nan_to_num(probs, nan=0.0)  # all-masked pad rows
        out = jnp.einsum(
            "shj,jd->shd", probs.astype(lat_pages.dtype),
            lat_pages[:, : self.dv],
            preferred_element_type=jnp.float32,
        )
        return out.astype(q_eff.dtype)

    def _dsa_prefill_batched(self, params, k_all, v_all, inp, num_logits=1,
                             return_hidden=False):
        p, s = inp.token_ids.shape

        def attn_fn(q_eff, lat_new, cache, li, idx):
            lat_c, idxk_c = cache
            idx_q, idx_k, idx_w = idx
            slots = inp.slot_mapping.reshape(-1)
            lat_c = self._dsa_write(lat_c, li, slots, lat_new)
            idxk_c = self._dsa_write(idxk_c, li, slots, idx_k)
            # gather this batch's pages dense: [P, KV, D]
            lat_pages = lat_c[li][inp.block_tables][:, :, 0].reshape(
                p, -1, lat_c.shape[-1]
            )
            idxk_pages = idxk_c[li][inp.block_tables][:, :, 0].reshape(
                p, -1, idxk_c.shape[-1]
            )
            q4 = q_eff.reshape(p, s, *q_eff.shape[1:])
            iq = idx_q.reshape(p, s, *idx_q.shape[1:])
            iw = idx_w.reshape(p, s, idx_w.shape[-1])
            row_pos = inp.positions
            out = jax.vmap(self._dsa_attend_rows)(
                q4, iq, iw, lat_pages, idxk_pages, row_pos, inp.kv_lens
            )
            return out.reshape(p * s, *out.shape[2:]), (lat_c, idxk_c)

        x = params["embed_tokens"][inp.token_ids.reshape(-1)]
        x, (k_all, v_all) = self._forward(
            params, (k_all, v_all), x, inp.positions.reshape(-1), attn_fn
        )
        x = x.reshape(p, s, -1)
        idx = (
            inp.logits_idx[:, None]
            - (num_logits - 1)
            + jnp.arange(num_logits, dtype=jnp.int32)[None, :]
        ).clip(0)
        hidden = jnp.take_along_axis(x, idx[..., None], axis=1)
        if return_hidden:
            pre = self._prenorm_hidden.reshape(p, s, -1)
            return hidden, k_all, v_all, pre
        return hidden, k_all, v_all

    def _dsa_prefill(self, params, k_all, v_all, inp, num_logits=1):
        """Single-sequence prefill via the batched core (embed/sample)."""
        from xllm_tpu.runtime.forward_params import BatchedPrefillInput

        t = inp.token_ids.shape[0]
        binp = BatchedPrefillInput(
            token_ids=inp.token_ids[None],
            positions=inp.positions[None],
            slot_mapping=inp.slot_mapping[None],
            block_tables=inp.block_table[None],
            kv_lens=inp.kv_len[None],
            q_offsets=inp.q_offset[None],
            logits_idx=inp.logits_idx[None],
            sample_slots=jnp.zeros((1,), jnp.int32),
            hist_slots=jnp.zeros((1,), jnp.int32),
        )
        hidden, k_all, v_all = self._dsa_prefill_batched(
            params, k_all, v_all, binp, num_logits
        )
        return hidden[0], k_all, v_all

    def _dsa_decode(self, params, k_all, v_all, inp, token_ids):
        b = token_ids.shape[0]

        def attn_fn(q_eff, lat_new, cache, li, idx):
            lat_c, idxk_c = cache
            idx_q, idx_k, idx_w = idx
            bs = lat_c.shape[3]
            slots = inp.slot_mapping
            lat_c = self._dsa_write(lat_c, li, slots, lat_new)
            idxk_c = self._dsa_write(idxk_c, li, slots, idx_k)
            # index scores over the dense gathered index-K pages, then
            # gather ONLY the top-k latent rows (the HBM saving)
            idxk_pages = idxk_c[li][inp.block_tables][:, :, 0].reshape(
                b, -1, idxk_c.shape[-1]
            )  # [B, KV, Di]
            from xllm_tpu.ops.dsa import index_scores

            kv = idxk_pages.shape[1]
            scores = index_scores(
                idx_q[:, None], idx_w[:, None], idxk_pages
            )[:, 0]  # [B, KV]
            pos = jnp.arange(kv, dtype=jnp.int32)
            valid = pos[None, :] < inp.seq_lens[:, None]
            scores = jnp.where(valid, scores, -jnp.inf)
            kk = min(self.cfg.index_topk, kv)
            _, sel = jax.lax.top_k(scores, kk)  # [B, kk] positions
            sel_valid = jnp.take_along_axis(valid, sel, axis=1)
            # position -> global slot -> latent row gather
            sel_blocks = jnp.take_along_axis(
                inp.block_tables, sel // bs, axis=1
            )
            sel_slots = sel_blocks * bs + sel % bs  # [B, kk]
            lat_flat = lat_c[li][:, 0].reshape(-1, lat_c.shape[-1])
            lat_sel = lat_flat[sel_slots]  # [B, kk, Dk]

            logits = jnp.einsum(
                "bhd,bjd->bhj", q_eff, lat_sel,
                preferred_element_type=jnp.float32,
            ) * self.scale
            logits = jnp.where(sel_valid[:, None, :], logits, -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1)
            probs = jnp.nan_to_num(probs, nan=0.0)
            out = jnp.einsum(
                "bhj,bjd->bhd", probs.astype(lat_sel.dtype),
                lat_sel[..., : self.dv],
                preferred_element_type=jnp.float32,
            ).astype(q_eff.dtype)
            return out, (lat_c, idxk_c)

        x = params["embed_tokens"][token_ids]
        x, (k_all, v_all) = self._forward(
            params, (k_all, v_all), x, inp.positions, attn_fn
        )
        return x, k_all, v_all


class Glm4MoeLiteModel(MlaDecoderModel):
    """glm4-moe-lite: the MLA architecture with GLM's "concat" rotary.

    Reference xllm/models/llm/npu/glm4_moe_lite.h:105-127 (the commented
    deepseek-yarn block replaced by get_concat_rotary_embedding) +
    npu_glm4_moe_lite_decoder_layer / glm4_moe_lite_decoder_loader
    (q_a/kv_a low-rank projections, kv_b split into nope/v absorption —
    identical weight names to deepseek v2/v3). Differences from the
    deepseek family are config-level (noaux_tc sigmoid routing with
    n_group/topk_group, routed_scaling 1.8, one dense first layer) plus
    the rope convention: plain rotate-half on the qk_rope dims with no
    yarn scaling.
    """

    mla_rope_style = "neox"
