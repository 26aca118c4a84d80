"""Dense decoder-only transformer (llama / qwen2 / qwen3 families).

Counterpart of the reference's LlmModelImplBase CRTP family
(reference xllm/models/llm/llm_model_base.h:37,60,169,191 and the per-family
decoder layers under xllm/core/layers/common/). TPU-native design decisions:

- Parameters are a plain pytree of arrays with the per-layer tensors stacked
  along a leading layer axis; the layer loop is one ``lax.scan``, so compile
  time and HLO size are O(1) in depth (the reference instead builds per-layer
  ATB graphs, xllm/core/layers/npu/npu_base_layer.h).
- The paged KV cache is threaded through the scan carry and updated with
  token-sparse scatters — donated at the jit boundary, so updates are
  in-place in HBM.
- Tensor parallelism is expressed as GSPMD shardings on the weight pytree
  (megatron-style column/row splits, reference
  xllm/core/layers/npu/npu_column_parallel_linear_impl.*) — collectives are
  inserted by XLA, not hand-written.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from xllm_tpu.config import ModelConfig
from xllm_tpu.ops.attention import (
    decode_attention_write,
    prefill_attention_write,
    prefill_attention_write_batched,
)
from xllm_tpu.ops.norms import rms_norm
from xllm_tpu.ops.rope import apply_rope, rope_inv_freq
from xllm_tpu.runtime.forward_params import DecodeInput, PrefillInput

# mesh axis names (SURVEY.md §2.6 TP/DP/EP/CP -> one named mesh)
DATA_AXIS = "data"
TP_AXIS = "tp"


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.bfloat16}[
        name
    ]


class DenseDecoderModel:
    """Functional model: all state lives in explicit pytrees."""

    # int8 KV is supported for the dense/MoE GQA families (the MLA
    # latent cache has its own fp8 path; hybrids keep linear state)
    supports_int8_kv = True
    supports_interleaved_kv = True  # GQA cache can use the interleaved layout

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.dtype = _dtype_of(cfg.dtype)
        from xllm_tpu.ops.rope import rope_mscale

        self.scale = cfg.head_dim**-0.5 * rope_mscale(cfg.rope_scaling) ** 2
        # sliding-window attention (mistral/qwen2 long-context families);
        # 0 = full attention
        self.window = int(cfg.sliding_window or 0)
        # int8 KV per-layer-per-head static scales, set by the runner
        # ((s_k, s_v) [L, Hkv] f32). Scaleless in-kernel: the K scale
        # folds into q, the V scale into the attention output, so the
        # kernels only int8->bf16 convert on the DMA-critical path
        # (fp8's upcast measured 4x slower than the bytes it saves on
        # v5e — scripts/probe_r8_fp8kv.py; reference int8 KV:
        # kv_cache_impl.h:29 quantized variants). Tiny closure constants
        # — safe to capture (unlike weight stacks, CLAUDE.md gotcha).
        self.kv_scales = None

    # ------------------------------------------------------------------
    # parameter tree
    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        """Random init (tests / synthetic benchmarks).

        Projections are fused for weight-streaming efficiency (one matmul
        streams one big weight): qkv_proj_w packs Q/K/V group-major —
        out dim = hkv groups x (G q-heads + 1 K + 1 V) x head_dim — so a
        TP shard of the out dim holds whole GQA groups; gate_up_proj_w is
        [D, 2, I] so a TP shard of I holds matching gate/up columns.
        """
        c = self.cfg
        hq, hkv, dh = c.num_attention_heads, c.num_kv_heads, c.head_dim
        g = hq // hkv
        L, D, I, V = c.num_hidden_layers, c.hidden_size, c.intermediate_size, c.vocab_size

        def w(key, *shape, scale=0.02):
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
                self.dtype
            )

        keys = iter(jax.random.split(rng, 16))
        layers = {
            "input_layernorm": jnp.ones((L, D), self.dtype),
            "post_attention_layernorm": jnp.ones((L, D), self.dtype),
            "qkv_proj_w": w(next(keys), L, D, hkv * (g + 2) * dh),
            "o_proj_w": w(next(keys), L, hq * dh, D),
            "gate_proj_w": w(next(keys), L, D, I),
            "up_proj_w": w(next(keys), L, D, I),
            "down_proj_w": w(next(keys), L, I, D),
        }
        if c.attention_bias:
            layers["qkv_proj_b"] = jnp.zeros((L, hkv * (g + 2) * dh), self.dtype)
        if c.qk_norm:
            layers["q_norm"] = jnp.ones((L, dh), self.dtype)
            layers["k_norm"] = jnp.ones((L, dh), self.dtype)
        if c.use_sandwich_norms:
            layers["post_self_attn_layernorm"] = jnp.ones((L, D), self.dtype)
            layers["post_mlp_layernorm"] = jnp.ones((L, D), self.dtype)
        params = {
            "embed_tokens": w(next(keys), V, D),
            "layers": layers,
            "norm": jnp.ones((D,), self.dtype),
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = w(next(keys), D, V)
        return params

    def param_shardings(self) -> dict:
        """PartitionSpec tree matching init_params (megatron TP layout)."""
        c = self.cfg
        layers = {
            "input_layernorm": P(),
            "post_attention_layernorm": P(),
            "qkv_proj_w": P(None, None, TP_AXIS),
            "o_proj_w": P(None, TP_AXIS, None),
            "gate_proj_w": P(None, None, TP_AXIS),
            "up_proj_w": P(None, None, TP_AXIS),
            "down_proj_w": P(None, TP_AXIS, None),
        }
        if c.attention_bias:
            layers["qkv_proj_b"] = P(None, TP_AXIS)
        if c.qk_norm:
            layers["q_norm"] = P()
            layers["k_norm"] = P()
        if c.use_sandwich_norms:
            layers["post_self_attn_layernorm"] = P()
            layers["post_mlp_layernorm"] = P()
        out = {
            "embed_tokens": P(TP_AXIS, None),
            "layers": layers,
            "norm": P(),
        }
        if not c.tie_word_embeddings:
            out["lm_head"] = P(None, TP_AXIS)
        return out

    # ------------------------------------------------------------------
    # KV cache
    # ------------------------------------------------------------------
    # "split": separate K and V arrays [L, NB, Hkv, bs, D].
    # "interleaved": ONE array [L, NB, 2, Hkv, bs, D] with a page's K and
    # V contiguous, so the Pallas kernels fetch both in a single DMA (the
    # r5 layout lever; v_all becomes a rank-1 placeholder like MLA's).
    # "interleaved_rm": interleaved + ROW-MAJOR TAIL pages — a sequence's
    # incomplete tail page stores token-major content so the decode
    # kernel persists each new token as one 4 KB tile instead of a
    # full-page rewrite (v12; the write-back was the measured decode
    # residual, 210 -> 148 us/layer with it removed).
    kv_layout = "split"

    @property
    def _rm_tail(self) -> bool:
        return self.kv_layout == "interleaved_rm"

    def kv_cache_shape(self, num_blocks: int, block_size: int) -> tuple[int, ...]:
        c = self.cfg
        if self.kv_layout.startswith("interleaved"):
            return (c.num_hidden_layers, num_blocks, 2, c.num_kv_heads,
                    block_size, c.head_dim)
        return (c.num_hidden_layers, num_blocks, c.num_kv_heads, block_size, c.head_dim)

    def kv_bytes_per_token(self, bytes_per_el: int | None = None) -> int:
        """Per-token KV bytes across all layers (capacity estimation).
        ``bytes_per_el`` overrides the model dtype's size when the cache
        is stored quantized (kv_cache_dtype=fp8_e4m3 -> 1)."""
        c = self.cfg
        if bytes_per_el is None:
            bytes_per_el = 2 if self.dtype == jnp.bfloat16 else 4
        return c.num_hidden_layers * 2 * c.num_kv_heads * c.head_dim * bytes_per_el

    def kv_cache_sharding(self) -> P:
        # blocks shard over attention-DP ranks, kv heads over TP
        # (reference per-DP-rank KV pools + TP head split)
        if self.kv_layout.startswith("interleaved"):
            return P(None, DATA_AXIS, None, TP_AXIS, None, None)
        return P(None, DATA_AXIS, TP_AXIS, None, None)

    def new_kv_cache(
        self, num_blocks: int, block_size: int, dtype=None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        shape = self.kv_cache_shape(num_blocks, block_size)
        dt = dtype or self.dtype
        if self.kv_layout.startswith("interleaved"):
            # v slot is a rank-1 placeholder (the MLA convention): K and
            # V share the interleaved array
            return jnp.zeros(shape, dt), jnp.zeros((1,), dt)
        return jnp.zeros(shape, dt), jnp.zeros(shape, dt)

    def place_caches(self, k, v, mesh):
        """Shard freshly-allocated caches on the mesh. Hybrid families
        override to place their extra state leaves."""
        from jax.sharding import NamedSharding

        from xllm_tpu.parallel.mesh import replicated

        spec = self.kv_cache_sharding()
        sh = NamedSharding(mesh, spec)
        rep = replicated(mesh)

        def put(x):  # MLA's latent pair carries a rank-1 placeholder
            return jax.device_put(x, sh if x.ndim >= len(spec) else rep)

        return jax.tree.map(put, k), jax.tree.map(put, v)

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    # quantized stacks excluded from the layer scan (the kernels index the
    # live layer in HBM instead — see ops/quant.quant_matmul_stacked);
    # _run_stack sets these during tracing, body() sets the relative index
    _quant_stacks = None
    _cur_rel_layer = None

    def _linear(self, lp: dict, name: str, x: jnp.ndarray) -> jnp.ndarray:
        """-> [T, N] f32; dispatches to the fused dequant matmul for int8
        weights (reference w8a8 path, SURVEY.md §2.8 cutlass row)."""
        qs = self._quant_stacks
        if qs is not None and name in qs:
            if qs[name].dtype == jnp.bfloat16:
                # bf16 stack on the split-DMA streamer (XLLM_BF16_MM=stacked)
                from xllm_tpu.ops.pallas.quant_matmul import (
                    matmul_bf16_stacked,
                )

                return matmul_bf16_stacked(x, qs[name], self._cur_rel_layer)
            from xllm_tpu.ops.quant import quant_matmul_stacked

            return quant_matmul_stacked(
                x, qs[name], qs[name + "_scale"], self._cur_rel_layer
            )
        w = lp[name]
        if w.dtype in (jnp.int8, jnp.float8_e4m3fn):
            from xllm_tpu.ops.quant import quant_matmul

            return quant_matmul(x, w, lp[name + "_scale"])
        if (
            os.environ.get("XLLM_BF16_MM") == "pallas"
            and w.dtype == jnp.bfloat16
            and x.shape[0] <= 256
            and jax.default_backend() == "tpu"
        ):
            # decode-shape dots: stream weights through the split-DMA
            # pipeline instead of XLA's (~660 GB/s) fetch
            from xllm_tpu.ops.pallas.quant_matmul import matmul_bf16_v2

            return matmul_bf16_v2(x, w)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    # per-layer scan side-channel (expert load counts for EPLB); dense
    # layers emit a zero-size placeholder so the scan ys stay uniform
    _scan_aux = None

    def _mlp(self, lp: dict, x: jnp.ndarray) -> jnp.ndarray:
        gate = self._linear(lp, "gate_proj_w", x)
        up = self._linear(lp, "up_proj_w", x)
        act = jax.nn.silu(gate) * up
        self._scan_aux = None
        return self._linear(lp, "down_proj_w", act.astype(x.dtype)).astype(
            x.dtype
        )

    def _attn_qkv(
        self,
        lp: dict,
        x: jnp.ndarray,  # [T, D] normed
        positions: jnp.ndarray,  # [T]
        inv_freq: jnp.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        t = x.shape[0]
        hkv, dh = c.num_kv_heads, c.head_dim
        g = c.num_attention_heads // hkv
        qkv = self._linear(lp, "qkv_proj_w", x)
        if c.attention_bias:
            qkv = qkv + lp["qkv_proj_b"]
        # group-major fused layout: [T, hkv, g+2, dh]
        qkv = qkv.astype(x.dtype).reshape(t, hkv, g + 2, dh)
        q = qkv[:, :, :g].reshape(t, c.num_attention_heads, dh)
        k = qkv[:, :, g]
        v = qkv[:, :, g + 1]
        if c.qk_norm:
            q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
        if c.partial_rotary_factor < 1.0:
            rd = int(dh * c.partial_rotary_factor)
            if c.rope_interleaved:
                from xllm_tpu.ops.rope import (
                    apply_rope_partial_interleaved_cos,
                )

                q, k = apply_rope_partial_interleaved_cos(
                    q, k, positions, inv_freq, rd
                )
            else:  # glm4-moe: rotate-half on the rotary slice
                from xllm_tpu.ops.rope import apply_rope_partial

                q, k = apply_rope_partial(q, k, positions, inv_freq, rd)
        else:
            q, k = apply_rope(q, k, positions, inv_freq)
        return q, k, v

    # ------------------------------------------------------------------
    # int8 KV folding (scales applied OUTSIDE the attention kernels)
    # ------------------------------------------------------------------
    def _kv_quant_in(self, q, k, v, layer_idx):
        """Fold s_k into q; quantize new K/V rows to int8 codes.

        logits: (q * s_k) . (k / s_k) == q . k — the softmax scale and
        all in-kernel math are unchanged; pages and new rows share the
        same code space."""
        if self.kv_scales is None:
            return q, k, v
        sk, sv = self.kv_scales
        skl = jax.lax.dynamic_index_in_dim(sk, layer_idx, keepdims=False)
        svl = jax.lax.dynamic_index_in_dim(sv, layer_idx, keepdims=False)
        g = self.cfg.num_attention_heads // self.cfg.num_kv_heads
        q = (
            q.astype(jnp.float32) * jnp.repeat(skl, g)[None, :, None]
        ).astype(q.dtype)

        def quant(x, s):
            codes = jnp.round(x.astype(jnp.float32) / s[None, :, None])
            return jnp.clip(codes, -127, 127).astype(jnp.int8)

        return q, quant(k, skl), quant(v, svl)

    def _kv_quant_out(self, out, layer_idx):
        """out = sum p * (v / s_v) -> multiply s_v back per kv head."""
        if self.kv_scales is None:
            return out
        _, sv = self.kv_scales
        svl = jax.lax.dynamic_index_in_dim(sv, layer_idx, keepdims=False)
        g = self.cfg.num_attention_heads // self.cfg.num_kv_heads
        return (
            out.astype(jnp.float32) * jnp.repeat(svl, g)[None, :, None]
        ).astype(out.dtype)

    def set_kv_scales(self, s_k, s_v) -> None:
        """Install per-layer-per-head int8-KV scales ([L, Hkv] f32 or
        scalars). Callers must rebuild the jitted step functions — the
        scales are closure constants."""
        c = self.cfg
        shape = (c.num_hidden_layers, c.num_kv_heads)
        self.kv_scales = (
            jnp.broadcast_to(jnp.asarray(s_k, jnp.float32), shape),
            jnp.broadcast_to(jnp.asarray(s_v, jnp.float32), shape),
        )

    def _run_stack(
        self,
        stack: dict,  # layer params stacked on a leading axis
        layer0: int,  # absolute index of the stack's first layer
        x: jnp.ndarray,
        k_all: jnp.ndarray,
        v_all: jnp.ndarray,
        positions: jnp.ndarray,
        attn_fn,
        mlp_fn,  # (lp, h) -> mlp output
        post_layer_fn=None,  # (x, layer_idx) -> x (DeepStack injection)
    ):
        """One lax.scan over a homogeneous layer stack -> (x, k, v, aux)."""
        c = self.cfg
        t = x.shape[0]
        rotary_dim = int(c.head_dim * c.partial_rotary_factor)
        inv_freq = rope_inv_freq(rotary_dim, c.rope_theta, c.rope_scaling)

        def body(carry, xs):
            x, k_all, v_all = carry
            lp, layer_idx = xs
            self._cur_rel_layer = layer_idx - layer0
            h = rms_norm(x, lp["input_layernorm"], c.rms_norm_eps)
            q, k, v = self._attn_qkv(lp, h, positions, inv_freq)
            attn, k_all, v_all = attn_fn(q, k, v, k_all, v_all, layer_idx)
            attn = attn.reshape(t, c.num_attention_heads * c.head_dim)
            attn_out = self._linear(lp, "o_proj_w", attn).astype(x.dtype)
            if c.use_sandwich_norms:  # glm4 post-attn norm before residual
                attn_out = rms_norm(
                    attn_out, lp["post_self_attn_layernorm"], c.rms_norm_eps
                )
            x = x + attn_out
            h = rms_norm(x, lp["post_attention_layernorm"], c.rms_norm_eps)
            mlp_out = mlp_fn(lp, h)
            if c.use_sandwich_norms:
                mlp_out = rms_norm(
                    mlp_out, lp["post_mlp_layernorm"], c.rms_norm_eps
                )
            x = x + mlp_out
            if post_layer_fn is not None:
                x = post_layer_fn(x, layer_idx)
            return (x, k_all, v_all), self._scan_aux

        n = stack["input_layernorm"].shape[0]
        layer_ids = layer0 + jnp.arange(n, dtype=jnp.int32)
        # pull quantized projection stacks out of the scanned xs: scanned
        # slices of a pallas operand materialize a per-layer weight copy
        # (3x the quantized bytes); the stacked kernels index HBM directly
        qnames = [
            name
            for name in stack
            if name.endswith("_proj_w")
            and hasattr(stack[name], "dtype")
            and stack[name].dtype in (jnp.int8, jnp.float8_e4m3fn)
            and name + "_scale" in stack
        ]
        # decode-shape bf16 stacks through the split-DMA streamer
        # (XLLM_BF16_MM=stacked): same pull-out-of-the-scan rationale —
        # a pallas operand sliced by the scan materializes a per-layer copy
        bf16_stream = (
            os.environ.get("XLLM_BF16_MM") == "stacked"
            and t <= 256
            and jax.default_backend() == "tpu"
        )
        if bf16_stream:
            qnames += [
                name
                for name in stack
                if name.endswith("_proj_w")
                and hasattr(stack[name], "dtype")
                and stack[name].dtype == jnp.bfloat16
            ]
        scanned = stack
        if qnames:
            pulled = (
                set(qnames) | {name + "_scale" for name in qnames}
            ) & set(stack)  # bf16-streamed stacks carry no scale
            scanned = {k: v for k, v in stack.items() if k not in pulled}
            self._quant_stacks = {k: stack[k] for k in pulled}
        try:
            (x, k_all, v_all), aux = jax.lax.scan(
                body, (x, k_all, v_all), (scanned, layer_ids)
            )
        finally:
            self._quant_stacks = None
        return x, k_all, v_all, aux

    def _run_layers(
        self,
        params: dict,
        k_all: jnp.ndarray,
        v_all: jnp.ndarray,
        x: jnp.ndarray,  # [T, D]
        positions: jnp.ndarray,
        slot_mapping: jnp.ndarray,
        attn_fn,  # (q, k, v, k_all, v_all, layer_idx) -> (attn, k_all, v_all)
        post_layer_fn=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x, k_all, v_all, aux = self._run_stack(
            params["layers"], 0, x, k_all, v_all, positions, attn_fn,
            self._mlp, post_layer_fn=post_layer_fn,
        )
        # stacked per-layer expert counts [L, E] (None for dense models)
        self._expert_counts = aux
        self._prenorm_hidden = x  # pre-final-norm states (MTP head input)
        x = rms_norm(x, params["norm"], self.cfg.rms_norm_eps)
        return x, k_all, v_all

    def prefill(
        self,
        params: dict,
        k_all: jnp.ndarray,
        v_all: jnp.ndarray,
        inp: PrefillInput,
        num_logits: int = 1,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """-> (hidden of the last num_logits real rows [num_logits, D], k, v).

        num_logits > 1 serves speculative verification (reference
        SpeculativeWorkerImpl target pass, speculative_worker_impl.h:128):
        the chunk is [last_token, draft_1..draft_k] and every row's logits
        feed the rejection sampler.
        """

        def attn_fn(q, k, v, k_all, v_all, layer_idx):
            q, k, v = self._kv_quant_in(q, k, v, layer_idx)
            out, k_all, v_all = prefill_attention_write(
                q,
                k,
                v,
                k_all,
                v_all,
                layer_idx,
                inp.slot_mapping,
                inp.block_table,
                inp.q_offset,
                inp.kv_len,
                self.scale,
                window=self.window,
                rowmajor_tail=self._rm_tail,
            )
            return self._kv_quant_out(out, layer_idx), k_all, v_all

        x = params["embed_tokens"][inp.token_ids]
        x, k_all, v_all = self._run_layers(
            params, k_all, v_all, x, inp.positions, inp.slot_mapping, attn_fn
        )
        hidden = jax.lax.dynamic_slice_in_dim(
            x, inp.logits_idx - (num_logits - 1), num_logits, axis=0
        )
        return hidden, k_all, v_all

    # whether prefill_batched is available (MLA overrides to False until
    # its latent kernels grow a chunk-batched grid)
    supports_batched_prefill = True
    # context parallel shards + permutes the prefill token dim — the XLA
    # attention path handles arbitrary order and GSPMD's allgather-KV;
    # the runner sets this when cp_size > 1 (parallel/cp.py)
    force_ref_attention = False

    def prefill_batched(
        self,
        params: dict,
        k_all: jnp.ndarray,
        v_all: jnp.ndarray,
        inp,  # BatchedPrefillInput
        num_logits: int = 1,
        return_hidden: bool = False,
    ) -> tuple:
        """-> (hidden [P, num_logits, D], k_all, v_all[, full_hidden]).

        P chunks from P sequences in one dispatch (reference whole-batch
        BatchInputBuilder, batch_input_builder.h:53). num_logits > 1 is
        the speculative batched-verify path: rows
        [logits_idx-num_logits+1 .. logits_idx] of each chunk feed the
        rejection sampler. return_hidden additionally yields the full
        [P, S, D] hidden states (consumed by the MTP draft head,
        reference mtp_worker_impl.h:34).
        """
        p, s = inp.token_ids.shape

        def attn_fn(q, k, v, k_all, v_all, layer_idx):
            q, k, v = self._kv_quant_in(q, k, v, layer_idx)
            q4 = q.reshape(p, s, *q.shape[1:])
            k4 = k.reshape(p, s, *k.shape[1:])
            v4 = v.reshape(p, s, *v.shape[1:])
            out, k_all, v_all = prefill_attention_write_batched(
                q4, k4, v4, k_all, v_all, layer_idx, inp.slot_mapping,
                inp.block_tables, inp.q_offsets, inp.kv_lens, self.scale,
                window=self.window,
                force_ref=self.force_ref_attention,
                positions=inp.positions,
                rowmajor_tail=self._rm_tail,
            )
            out = out.reshape(p * s, *out.shape[2:])
            return self._kv_quant_out(out, layer_idx), k_all, v_all

        x = params["embed_tokens"][inp.token_ids.reshape(-1)]
        if inp.extra_embeds is not None:
            # VLM: image rows take the vision tower's merged embeddings
            x = jnp.where(
                inp.extra_mask.reshape(p * s)[:, None],
                inp.extra_embeds.reshape(p * s, -1).astype(x.dtype),
                x,
            )
        if inp.mrope_positions is not None:
            pos = inp.mrope_positions.transpose(1, 0, 2).reshape(3, p * s)
        else:
            pos = inp.positions.reshape(-1)
        post_layer_fn = None
        if getattr(inp, "deepstack_embeds", None) is not None:
            # DeepStack (qwen3-vl / reference oxygen.h:36-95): add visual
            # feature map k at image rows after decoder layer k
            ds = inp.deepstack_embeds.reshape(
                inp.deepstack_embeds.shape[0], p * s, -1
            ).astype(x.dtype)
            n_ds = ds.shape[0]

            def post_layer_fn(h, layer_idx):
                feat = jax.lax.dynamic_index_in_dim(
                    ds, jnp.minimum(layer_idx, n_ds - 1), keepdims=False
                )
                return h + jnp.where(layer_idx < n_ds, feat, 0.0)

        x, k_all, v_all = self._run_layers(
            params, k_all, v_all, x, pos,
            inp.slot_mapping.reshape(-1), attn_fn,
            post_layer_fn=post_layer_fn,
        )
        x = x.reshape(p, s, -1)
        idx = (
            inp.logits_idx[:, None]
            - (num_logits - 1)
            + jnp.arange(num_logits, dtype=jnp.int32)[None, :]
        ).clip(0)  # [P, num_logits]
        hidden = jnp.take_along_axis(x, idx[..., None], axis=1)
        if return_hidden:
            # pre-final-norm states: the MTP head applies its own hnorm
            # (DeepSeek-V3 MTP convention)
            pre = self._prenorm_hidden.reshape(p, s, -1)
            return hidden, k_all, v_all, pre
        return hidden, k_all, v_all

    def decode(
        self,
        params: dict,
        k_all: jnp.ndarray,
        v_all: jnp.ndarray,
        inp: DecodeInput,
        token_ids: jnp.ndarray,  # [B] int32 (gathered from last_tokens ring)
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """-> (hidden [B, D], k_all, v_all)."""

        page_maps = (
            (inp.page_cum, inp.page_seq)
            if inp.page_cum is not None and inp.page_seq is not None
            else None
        )

        def attn_fn(q, k, v, k_all, v_all, layer_idx):
            q, k, v = self._kv_quant_in(q, k, v, layer_idx)
            out, k_all, v_all = decode_attention_write(
                q,
                k,
                v,
                k_all,
                v_all,
                layer_idx,
                inp.slot_mapping,
                inp.block_tables,
                inp.seq_lens,
                self.scale,
                window=self.window,
                page_maps=page_maps,
                rowmajor_tail=self._rm_tail,
            )
            return self._kv_quant_out(out, layer_idx), k_all, v_all

        x = params["embed_tokens"][token_ids]
        x, k_all, v_all = self._run_layers(
            params, k_all, v_all, x, inp.positions, inp.slot_mapping, attn_fn
        )
        return x, k_all, v_all

    def compute_logits(self, params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
        """[N, D] -> [N, V] in model dtype (f32 MXU accumulation).

        Materializing bf16 logits halves the sampler's HBM traffic — the
        write here plus every full-vocab reduction in ``sample`` — and the
        cast fuses into the matmul epilogue. Reductions that need f32
        (logsumexp) upcast per-tile without an extra [N, V] copy."""
        head = (
            params["embed_tokens"].T
            if self.cfg.tie_word_embeddings
            else params["lm_head"]
        )
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
        return logits.astype(self.dtype)
