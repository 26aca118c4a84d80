"""Qwen3-Next: hybrid GatedDeltaNet / full-attention MoE decoder.

Counterpart of the reference's qwen3-next family
(reference xllm/models/llm/qwen3_next.h,
xllm/models/llm/qwen3_next_hybrid_base.h; GDN + causal-conv kernels in
xllm/core/kernels/ops_api.h). TPU-native design:

- the repeating layer pattern (``full_attention_interval - 1`` linear
  layers then one full-attention layer) becomes a two-level ``lax.scan``:
  an outer scan over the G = L / interval groups and an inner scan over
  the linear sublayers — compile time stays O(1) in depth;
- full-attention layers use the standard paged-KV Pallas path with the
  cache's layer axis = group index (only 1/interval of the layers pay for
  pages — the reference's CompositeBlockManager split, SURVEY §2);
- linear layers keep per-sequence recurrent state
  [groups, interval-1, slots, Hv, Dk, Dv] + conv tails indexed by the
  engine's stable per-sequence slot ids (the same ring that feeds
  last_tokens); chunk 0 of a prefill resets the slot, later chunks resume
  it, and RECOMPUTE preemption simply replays the prompt into a fresh
  slot. Both state tensors ride inside the (donated) ``v_cache`` pytree
  so every step updates them in place.
- qwen3-next's "centered" RMSNorm (weight stored as w, applied as 1 + w)
  is folded at load time: the loader adds 1, the runtime uses the
  ordinary rms_norm.

Not supported with this family (engine raises): speculative decoding and
beam forking (recurrent state cannot rewind past rejected tokens), prefix
-cache block reuse, context parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xllm_tpu.config import ModelConfig
from xllm_tpu.models.decoder import DenseDecoderModel
from xllm_tpu.models.registry import ModelRegistry
from xllm_tpu.ops.attention import (
    decode_attention_write,
    prefill_attention_write_batched,
)
from xllm_tpu.ops.gdn import gated_rms_norm, gdn_gate_params, gdn_scan
from xllm_tpu.ops.moe import moe_mlp
from xllm_tpu.ops.norms import rms_norm
from xllm_tpu.ops.rope import apply_rope, rope_inv_freq
from xllm_tpu.runtime.forward_params import BatchedPrefillInput, DecodeInput


@ModelRegistry.register("qwen3_next", "qwen3_5", "qwen3_5_text",
                        "qwen3_5_moe_text")
class Qwen3NextModel(DenseDecoderModel):
    # custom cache layout (latent / linear-state) — the GQA int8-KV
    # scale folding does not apply
    supports_int8_kv = False
    supports_interleaved_kv = False  # hybrid cache keeps the split layout

    supports_batched_prefill = True
    is_hybrid = True  # linear-attention state: engine disables spec/beam/
    # prefix-cache/CP for this family

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        c = cfg
        self.interval = c.full_attention_interval
        assert c.num_hidden_layers % self.interval == 0, (
            "num_hidden_layers must be a multiple of full_attention_interval"
        )
        self.n_groups = c.num_hidden_layers // self.interval
        self.n_lin = self.interval - 1
        self.hk = c.linear_num_key_heads
        self.hv = c.linear_num_value_heads
        self.dk_lin = c.linear_key_head_dim
        self.dv_lin = c.linear_value_head_dim
        self.key_dim = self.hk * self.dk_lin
        self.value_dim = self.hv * self.dv_lin
        self.conv_dim = 2 * self.key_dim + self.value_dim
        self.conv_k = c.linear_conv_kernel_dim
        self.qkvz_dim = 2 * self.key_dim + 2 * self.value_dim
        self.num_state_slots = 256  # overwritten by the runner (max_slots)

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        G, I1 = self.n_groups, self.n_lin
        D = c.hidden_size
        dh, hq, hkv = c.head_dim, c.num_attention_heads, c.num_kv_heads

        def w(key, *shape, scale=0.02):
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        ks = iter(jax.random.split(rng, 24))
        g = {
            # linear sublayers [G, I1, ...]
            "lin_input_layernorm": jnp.ones((G, I1, D), self.dtype),
            "lin_post_layernorm": jnp.ones((G, I1, D), self.dtype),
            "lin_qkvz_w": w(next(ks), G, I1, D, self.qkvz_dim),
            "lin_ba_w": w(next(ks), G, I1, D, 2 * self.hv),
            "lin_conv_w": w(next(ks), G, I1, self.conv_dim, self.conv_k,
                            scale=0.3),
            "lin_dt_bias": jnp.ones((G, I1, self.hv), jnp.float32),
            "lin_A_log": jnp.zeros((G, I1, self.hv), jnp.float32),
            "lin_norm_w": jnp.ones((G, I1, self.dv_lin), self.dtype),
            "lin_out_w": w(next(ks), G, I1, self.value_dim, D),
            # full-attention sublayer [G, ...]
            "full_input_layernorm": jnp.ones((G, D), self.dtype),
            "full_post_layernorm": jnp.ones((G, D), self.dtype),
            "full_q_w": w(next(ks), G, D, hq * dh * 2),
            "full_k_w": w(next(ks), G, D, hkv * dh),
            "full_v_w": w(next(ks), G, D, hkv * dh),
            "full_o_w": w(next(ks), G, hq * dh, D),
            "full_q_norm": jnp.ones((G, dh), self.dtype),
            "full_k_norm": jnp.ones((G, dh), self.dtype),
        }
        I = self.interval
        if c.num_experts > 0:
            E, MI = c.num_experts, c.moe_intermediate_size
            SI = c.shared_expert_intermediate_size or MI
            g["router_w"] = w(next(ks), G, I, D, E)
            g["experts_gate_up"] = w(next(ks), G, I, E, D, 2 * MI)
            g["experts_down"] = w(next(ks), G, I, E, MI, D)
            g["shared_gate_proj_w"] = w(next(ks), G, I, D, SI)
            g["shared_up_proj_w"] = w(next(ks), G, I, D, SI)
            g["shared_down_proj_w"] = w(next(ks), G, I, SI, D)
            g["shared_gate_w"] = w(next(ks), G, I, D)
        else:
            Isz = c.intermediate_size
            g["gate_proj_w"] = w(next(ks), G, I, D, Isz)
            g["up_proj_w"] = w(next(ks), G, I, D, Isz)
            g["down_proj_w"] = w(next(ks), G, I, Isz, D)

        params = {
            "embed_tokens": w(next(ks), c.vocab_size, D),
            "norm": jnp.ones((D,), self.dtype),
            "groups": g,
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = w(next(ks), D, c.vocab_size)
        return params

    def param_shardings(self) -> dict:
        # Linear-attention tensors stay replicated for now (the interleaved
        # per-key-head qkvz layout resists clean column sharding); the MoE
        # expert stacks and full-attention projections shard on tp.
        TP = "tp"
        c = self.cfg
        g = {k: P() for k in (
            "lin_input_layernorm", "lin_post_layernorm", "lin_qkvz_w",
            "lin_ba_w", "lin_conv_w", "lin_dt_bias", "lin_A_log",
            "lin_norm_w", "lin_out_w", "full_input_layernorm",
            "full_post_layernorm", "full_q_norm", "full_k_norm",
        )}
        g["full_q_w"] = P(None, None, TP)
        g["full_k_w"] = P(None, None, TP)
        g["full_v_w"] = P(None, None, TP)
        g["full_o_w"] = P(None, TP, None)
        if c.num_experts > 0:
            g["router_w"] = P()
            g["experts_gate_up"] = P(None, None, TP, None, None)
            g["experts_down"] = P(None, None, TP, None, None)
            g["shared_gate_proj_w"] = P(None, None, None, TP)
            g["shared_up_proj_w"] = P(None, None, None, TP)
            g["shared_down_proj_w"] = P(None, None, TP, None)
            g["shared_gate_w"] = P()
        else:
            g["gate_proj_w"] = P(None, None, None, TP)
            g["up_proj_w"] = P(None, None, None, TP)
            g["down_proj_w"] = P(None, None, TP, None)
        return {
            "embed_tokens": P(TP, None),
            "norm": P(),
            "lm_head": P(None, TP),
            "groups": g,
        }

    # ------------------------------------------------------------------
    # caches: paged KV for the G full layers + linear state tensors
    # ------------------------------------------------------------------
    def kv_cache_shape(self, num_blocks: int, block_size: int):
        c = self.cfg
        return (
            self.n_groups, num_blocks, c.num_kv_heads, block_size, c.head_dim
        )

    def new_kv_cache(self, num_blocks: int, block_size: int, dtype=None):
        dt = dtype or self.dtype
        shape = self.kv_cache_shape(num_blocks, block_size)
        k = jnp.zeros(shape, dt)
        v_pages = jnp.zeros(shape, dt)
        S = self.num_state_slots + 1  # + trash row
        conv_st = jnp.zeros(
            (self.n_groups, self.n_lin, S, self.conv_dim, self.conv_k - 1),
            jnp.float32,
        )
        rec_st = jnp.zeros(
            (self.n_groups, self.n_lin, S, self.hv, self.dk_lin, self.dv_lin),
            jnp.float32,
        )
        return k, (v_pages, conv_st, rec_st)

    def place_caches(self, k, v, mesh):
        from jax.sharding import NamedSharding

        page_spec = NamedSharding(
            mesh, P(None, None, "tp", None, None)
        )
        rep = NamedSharding(mesh, P())
        v_pages, conv_st, rec_st = v
        return (
            jax.device_put(k, page_spec),
            (
                jax.device_put(v_pages, page_spec),
                jax.device_put(conv_st, rep),
                jax.device_put(rec_st, rep),
            ),
        )

    # ------------------------------------------------------------------
    # layer bodies
    # ------------------------------------------------------------------
    def _lin_layer(self, lp, x, rows, slots, reset, lens, conv_st, rec_st):
        """One GatedDeltaNet layer over [P, S] rows.

        conv_st/rec_st: [slots+1, ...] for THIS layer; returns updated.
        """
        c = self.cfg
        p, s = rows
        h = rms_norm(x, lp["lin_input_layernorm"], c.rms_norm_eps)
        qkvz = jnp.dot(
            h, lp["lin_qkvz_w"], preferred_element_type=jnp.float32
        ).reshape(p, s, self.hk, -1)
        ba = jnp.dot(
            h, lp["lin_ba_w"], preferred_element_type=jnp.float32
        ).reshape(p, s, self.hk, -1)
        r = self.hv // self.hk
        dk, dv = self.dk_lin, self.dv_lin
        q = qkvz[..., :dk]
        k = qkvz[..., dk : 2 * dk]
        v = qkvz[..., 2 * dk : 2 * dk + r * dv]
        z = qkvz[..., 2 * dk + r * dv :].reshape(p, s, self.hv, dv)
        b = ba[..., :r].reshape(p, s, self.hv)
        a = ba[..., r:].reshape(p, s, self.hv)
        # conv input: concat of flattened q | k | v (head-major)
        x_qkv = jnp.concatenate(
            [
                q.reshape(p, s, self.key_dim),
                k.reshape(p, s, self.key_dim),
                v.reshape(p, s, self.value_dim),
            ],
            axis=-1,
        )
        g, beta = gdn_gate_params(a, b, lp["lin_A_log"], lp["lin_dt_bias"])
        valid = jnp.arange(s, dtype=jnp.int32)[None, :] < lens[:, None]

        tail0 = conv_st[slots]  # [P, conv_dim, K-1]
        st0 = rec_st[slots]  # [P, Hv, Dk, Dv]
        zero = reset[:, None, None]
        tail0 = jnp.where(zero, 0.0, tail0)
        st0 = jnp.where(zero[..., None], 0.0, st0)

        scan = jax.vmap(
            lambda xq, gg, bb, vv, t0, s0: gdn_scan(
                xq, gg, bb, vv, lp["lin_conv_w"], t0, s0,
                num_k_heads=self.hk, num_v_heads=self.hv,
                head_k_dim=dk, head_v_dim=dv,
            )
        )
        out, tail, st = scan(x_qkv, g, beta, valid, tail0, st0)
        conv_st = conv_st.at[slots].set(tail)
        rec_st = rec_st.at[slots].set(st)

        out = gated_rms_norm(out, z, lp["lin_norm_w"], c.rms_norm_eps)
        out = out.reshape(p * s, self.value_dim).astype(x.dtype)
        o = jnp.dot(
            out, lp["lin_out_w"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return x + o, conv_st, rec_st

    def _full_attn_layer(self, lp, x, positions, attn_fn, gidx):
        c = self.cfg
        t = x.shape[0]
        dh, hq = c.head_dim, c.num_attention_heads
        h = rms_norm(x, lp["full_input_layernorm"], c.rms_norm_eps)
        qg = jnp.dot(
            h, lp["full_q_w"], preferred_element_type=jnp.float32
        ).reshape(t, hq, 2 * dh)
        q, gate = qg[..., :dh], qg[..., dh:]
        k = jnp.dot(
            h, lp["full_k_w"], preferred_element_type=jnp.float32
        ).reshape(t, c.num_kv_heads, dh)
        v = jnp.dot(
            h, lp["full_v_w"], preferred_element_type=jnp.float32
        ).reshape(t, c.num_kv_heads, dh).astype(x.dtype)
        q = rms_norm(q.astype(x.dtype), lp["full_q_norm"], c.rms_norm_eps)
        k = rms_norm(k.astype(x.dtype), lp["full_k_norm"], c.rms_norm_eps)
        rd = int(dh * c.partial_rotary_factor)
        inv_freq = rope_inv_freq(rd, c.rope_theta, c.rope_scaling)
        qr, kr = apply_rope(q[..., :rd], k[..., :rd], positions, inv_freq)
        q = jnp.concatenate([qr, q[..., rd:]], axis=-1)
        k = jnp.concatenate([kr, k[..., rd:]], axis=-1)
        attn, k_pages, v_pages = attn_fn(
            q, k, v, self._carry_k, self._carry_v, gidx
        )
        attn = attn.reshape(t, hq * dh)
        attn = attn * jax.nn.sigmoid(
            gate.reshape(t, hq * dh).astype(jnp.float32)
        ).astype(x.dtype)
        o = jnp.dot(
            attn.astype(x.dtype), lp["full_o_w"],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return x + o, k_pages, v_pages

    @staticmethod
    def _mlp_dot(mlp_p, name, x):
        """MLP projection that consumes weight-only quantized stacks.

        The load-path catch-all (runtime/model_runner._quantize_params)
        quantizes every `*_proj_w` stack, including these raw-dot MLP
        weights — without folding the per-output-channel scale back the
        codes-only dot is garbage."""
        w = mlp_p[name]
        if w.dtype in (jnp.int8, jnp.float8_e4m3fn):
            from xllm_tpu.ops.quant import quant_matmul

            return quant_matmul(x, w, mlp_p[name + "_scale"])
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def _mlp_next(self, mlp_p, x):
        """Per-layer MLP slice: MoE + gated shared expert, or dense."""
        c = self.cfg
        h = x
        if c.num_experts > 0:
            routed = moe_mlp(
                h,
                mlp_p["router_w"],
                mlp_p["experts_gate_up"],
                mlp_p["experts_down"],
                c.num_experts_per_tok,
                c.norm_topk_prob,
                mesh=getattr(self, "mesh", None),
                gate_up_scale=mlp_p.get("experts_gate_up_scale"),
                down_scale=mlp_p.get("experts_down_scale"),
            )
            gate = jax.nn.silu(self._mlp_dot(mlp_p, "shared_gate_proj_w", h))
            up = self._mlp_dot(mlp_p, "shared_up_proj_w", h)
            shared = self._mlp_dot(
                mlp_p, "shared_down_proj_w", (gate * up).astype(h.dtype)
            )
            sg = jax.nn.sigmoid(
                jnp.dot(h.astype(jnp.float32), mlp_p["shared_gate_w"])
            )[:, None]
            return (routed.astype(jnp.float32) + sg * shared).astype(x.dtype)
        gate = jax.nn.silu(self._mlp_dot(mlp_p, "gate_proj_w", h))
        up = self._mlp_dot(mlp_p, "up_proj_w", h)
        return self._mlp_dot(
            mlp_p, "down_proj_w", (gate * up).astype(h.dtype)
        ).astype(x.dtype)

    # ------------------------------------------------------------------
    def _forward(
        self, params, k_all, v_all, x, positions, attn_fn,
        rows, slots, reset, lens,
    ):
        """Shared prefill/decode body.

        rows = (P, S); x [P*S, D]; slots/reset/lens [P].
        """
        c = self.cfg
        v_pages, conv_all, rec_all = v_all
        gp = params["groups"]
        mlp_keys = (
            ("router_w", "experts_gate_up", "experts_down",
             "shared_gate_proj_w", "shared_up_proj_w",
             "shared_down_proj_w", "shared_gate_w")
            if c.num_experts > 0
            else ("gate_proj_w", "up_proj_w", "down_proj_w")
        )
        # quantized stacks carry per-output-channel scale companions
        # that must ride the same layer scan (see _mlp_dot)
        mlp_keys = mlp_keys + tuple(
            k + "_scale" for k in mlp_keys if k + "_scale" in gp
        )

        def lin_body(carry, xs):
            x = carry
            lp, conv_l, rec_l = xs
            x, conv_l, rec_l = self._lin_layer(
                lp, x, rows, slots, reset, lens, conv_l, rec_l
            )
            h = rms_norm(x, lp["lin_post_layernorm"], c.rms_norm_eps)
            x = x + self._mlp_next({k: lp[k] for k in mlp_keys}, h)
            return x, (conv_l, rec_l)

        def group_body(carry, xs):
            x, k_pages, v_pages, conv_all, rec_all = carry
            gslice, gidx = xs
            lin_p = {
                k: gslice[k] for k in gslice if k.startswith("lin_")
            }
            for mk in mlp_keys:
                lin_p[mk] = gslice[mk][: self.n_lin]
            x, (conv_g, rec_g) = jax.lax.scan(
                lin_body, x, (lin_p, conv_all[gidx], rec_all[gidx]),
            )
            conv_all = conv_all.at[gidx].set(conv_g)
            rec_all = rec_all.at[gidx].set(rec_g)
            full_p = {k: gslice[k] for k in gslice if k.startswith("full_")}
            self._carry_k, self._carry_v = k_pages, v_pages
            x, k_pages, v_pages = self._full_attn_layer(
                full_p, x, positions, attn_fn, gidx
            )
            h = rms_norm(x, full_p["full_post_layernorm"], c.rms_norm_eps)
            x = x + self._mlp_next(
                {k: gslice[k][self.n_lin] for k in mlp_keys}, h
            )
            return (x, k_pages, v_pages, conv_all, rec_all), None

        gids = jnp.arange(self.n_groups, dtype=jnp.int32)
        (x, k_all, v_pages, conv_all, rec_all), _ = jax.lax.scan(
            group_body, (x, k_all, v_pages, conv_all, rec_all), (gp, gids)
        )
        self._prenorm_hidden = x
        x = rms_norm(x, params["norm"], c.rms_norm_eps)
        return x, k_all, (v_pages, conv_all, rec_all)

    # ------------------------------------------------------------------
    def prefill_batched(
        self, params, k_all, v_all, inp: BatchedPrefillInput,
        num_logits: int = 1, return_hidden: bool = False,
    ):
        p, s = inp.token_ids.shape

        def attn_fn(q, k, v, k_pages, v_pages, gidx):
            q4 = q.reshape(p, s, *q.shape[1:])
            k4 = k.reshape(p, s, *k.shape[1:])
            v4 = v.reshape(p, s, *v.shape[1:])
            out, k_pages, v_pages = prefill_attention_write_batched(
                q4, k4, v4, k_pages, v_pages, gidx, inp.slot_mapping,
                inp.block_tables, inp.q_offsets, inp.kv_lens, self.scale,
                force_ref=self.force_ref_attention,
                positions=inp.positions,
            )
            return out.reshape(p * s, *out.shape[2:]), k_pages, v_pages

        x = params["embed_tokens"][inp.token_ids.reshape(-1)]
        lens = jnp.maximum(inp.kv_lens - inp.q_offsets, 0)
        reset = inp.q_offsets == 0
        x, k_all, v_all = self._forward(
            params, k_all, v_all, x, inp.positions.reshape(-1), attn_fn,
            (p, s), inp.hist_slots, reset, lens,
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

    def decode(
        self, params, k_all, v_all, inp: DecodeInput, token_ids,
    ):
        b = token_ids.shape[0]

        page_maps = (
            (inp.page_cum, inp.page_seq)
            if inp.page_cum is not None and inp.page_seq is not None
            else None
        )

        def attn_fn(q, k, v, k_pages, v_pages, gidx):
            out, k_pages, v_pages = decode_attention_write(
                q, k, v, k_pages, v_pages, gidx, inp.slot_mapping,
                inp.block_tables, inp.seq_lens, self.scale,
                page_maps=page_maps,
            )
            return out, k_pages, v_pages

        x = params["embed_tokens"][token_ids]
        lens = (inp.seq_lens > 0).astype(jnp.int32)  # 1 real token per row
        reset = jnp.zeros((b,), bool)
        x, k_all, v_all = self._forward(
            params, k_all, v_all, x, inp.positions, attn_fn,
            (b, 1), inp.slot_ids, reset, lens,
        )
        return x, k_all, v_all
