"""Device execution: bucketed-jit forward steps + fused sampling.

Counterpart of the reference's WorkerImpl/LLMWorkerImpl + Executor stack
(reference xllm/core/runtime/worker_impl.h:54, llm_worker_impl.cpp:153,213,
executor.h:30). TPU-native collapse: there is no engine->worker RPC inside a
pod slice — the "worker step" is a jit call on (potentially) a multi-device
mesh, with GSPMD doing what the reference's per-rank worker processes +
HCCL/NCCL collectives do (SURVEY.md §7.1).

Graph-capture equivalence: every distinct input shape is one compiled XLA
program; the input builder pads to a bounded bucket set, so the jit cache
plays the role of the reference's AclGraphExecutorImpl bucket cache
(acl_graph_executor_impl.h:61-177). KV cache buffers are donated through
every step, so cache updates are in-place in HBM.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xllm_tpu.config import EngineConfig
from xllm_tpu.framework.request import Sequence
from xllm_tpu.models.registry import create_model
from xllm_tpu.parallel.mesh import build_mesh, make_named_shardings, replicated
from xllm_tpu.runtime.forward_params import (
    BatchedPrefillInput,
    DecodeInput,
    PrefillInput,
    SamplingInput,
)
from xllm_tpu.runtime.input_builder import (
    build_batched_prefill_input,
    build_batched_verify_input,
    build_decode_input,
    build_prefill_input,
    build_sampling_arrays,
    build_sampling_input,
    build_verify_input,
)
from xllm_tpu.runtime.rejection_sampler import rejection_sample
from xllm_tpu.runtime.sampler import sample
from xllm_tpu.utils import cdiv, get_logger

logger = get_logger(__name__)


class ModelRunner:
    def __init__(self, config: EngineConfig, mesh=None):
        self.config = config
        self.model = create_model(config.model)
        self.mesh = mesh if mesh is not None else build_mesh(config.parallel)
        self.model.mesh = self.mesh
        self.params = None
        self.k_cache = None
        self.v_cache = None
        self.num_blocks = 0
        c = config.model
        self.block_size = config.cache.block_size
        self.max_blocks_per_seq = cdiv(
            config.scheduler.max_model_len, self.block_size
        )
        # device-resident sampled-token ring for async schedule overlap
        # (reference async_schedule fake-token path, SURVEY.md §2.2): slot i
        # holds sequence-slot i's last sampled token; the extra trash slot
        # absorbs padded rows.
        # ring slack: a finished sequence holds its slot until its fixups
        # drain (overlap_depth steps) — admission during that window must
        # not underflow the pool
        self.max_slots = (
            config.scheduler.max_seqs_per_batch
            + 2 * max(config.scheduler.overlap_depth, 1)
        )
        self.trash_slot = self.max_slots
        # decode block-table column buckets (tight tables keep the decode
        # kernel's page grid proportional to live context length)
        self.nb_buckets = []
        nb = 4
        while nb < self.max_blocks_per_seq:
            self.nb_buckets.append(nb)
            nb *= 2
        self.nb_buckets.append(self.max_blocks_per_seq)
        # attention-DP over the mesh data axis (reference per-DP-rank
        # batches, batch_factory.h:30): forward-batch rows are rank-major
        # and sharded over "data"; each rank owns a contiguous KV block
        # range with its own null block
        self.dp_size = config.parallel.dp_size
        self.null_blocks = [0] * max(self.dp_size, 1)
        # incremental decode-input assembly (steady-state decode builds
        # are a +1 of the previous step); disabled on paths that can
        # mutate block tables in place without changing their length
        from xllm_tpu.runtime.input_builder import DecodeStepCache

        self._decode_cache = None
        if (
            self.dp_size == 1
            and not config.model.sliding_window
            and config.cache.num_host_blocks == 0
        ):
            self._decode_cache = DecodeStepCache()
        # packed decode dispatch: ONE int32 + ONE f32 buffer instead of
        # ~18 arrays per step (each host->device transfer pays tunnel
        # dispatch overhead). Single-device only — the sharded/multihost
        # paths keep the unpacked pytree (followers mirror it 1:1)
        self._packed_dispatch = (
            (self.mesh is None or self.mesh.size == 1)
            and os.environ.get("XLLM_PACKED_DISPATCH", "1") != "0"
        )
        # model-based speculative decoding (reference MTP/Eagle3 workers,
        # mtp_worker_impl.h:34, eagle3_worker_impl.h:23): a draft head
        # sharing the target's embed/lm_head, its own 1-layer paged KV,
        # and a device hidden ring feeding the in-jit draft scan
        self.draft_head = None
        self.head_params = None
        self.dk_cache = None
        self.dv_cache = None
        self.hidden_ring = None
        if config.speculative.method in ("mtp", "eagle3"):
            if not getattr(self.model, "supports_batched_prefill", False):
                raise NotImplementedError(
                    "MTP/Eagle3 needs a batched-prefill-capable family"
                )
            from xllm_tpu.models.mtp_head import MTPHead

            self.draft_head = MTPHead(config.model, self.model)
        self.last_tokens = None
        # live expert-load accumulation (EPLB); device-resident, fetched
        # periodically by the engine (reference eplb data flow,
        # llm_engine.cpp:994-1008)
        self.collect_expert_loads = (
            config.eplb.enable_eplb and config.model.num_experts > 0
        )
        if self.collect_expert_loads:
            self.model.collect_expert_loads = True
        if (
            config.eplb.redundant_experts > 0
            and config.model.num_experts > 0
        ):
            # replica slots for hot experts (reference eplb_policy.h:30-56)
            if hasattr(type(self.model), "num_redundant_experts"):
                self.model.num_redundant_experts = (
                    config.eplb.redundant_experts
                )
            else:
                logger.warning(
                    "redundant_experts unsupported for %s; ignoring",
                    type(self.model).__name__,
                )
        self._expert_loads_acc = None
        # host copy of the live expert placement per param group (the
        # relative re-place map is computed host-side; with replicas the
        # device placement is no longer an invertible permutation)
        self._host_expert_placement: dict[str, np.ndarray] = {}
        self._key_ctr = 0
        self._prefill_fn = None
        self._decode_fn = None
        self._embed_fn = None
        self._score_fn = None
        self._sample_slots_fn = None
        self._inject_fn = None
        self._seed_fn = None
        self._copy_blocks_fn = None
        self._beam_decode_fn = None
        self._gather_blocks_fn = None
        self._encode_image_fn = None
        # multi-host: the driver announces each dispatch so follower
        # processes issue identical jit calls (parallel/multihost.py)
        from xllm_tpu.parallel.multihost import StepBroadcaster

        self.broadcaster = StepBroadcaster()
        # context parallel (reference cp_input_partition.h:70): prefill
        # token dim shards over the mesh "cp" axis with a zigzag layout;
        # the XLA attention path does the allgather-KV (pallas stays for
        # cp == 1)
        self.cp_size = config.parallel.cp_size
        if self.cp_size > 1:
            self.model.force_ref_attention = True

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def load_model(self, params=None, rng: jax.Array | None = None) -> None:
        """Load weights (or random-init when no checkpoint path is given)."""
        shardings = make_named_shardings(self.mesh, self.model.param_shardings())
        quant = self.config.quant.method in ("int8", "fp8_e4m3")
        if params is not None:
            self.params = params
            if quant:
                self.params = self._quantize_params(self.params)
        elif self.config.model.model_path and self.config.load_format != "dummy":
            from xllm_tpu.models.loader import load_params

            self.params = load_params(
                self.config.model, shardings, dtype=self.model.dtype,
                stack_transform=(
                    self._rolling_quantize_transform() if quant else None
                ),
            )
            if quant:
                # catch-all for family loaders without the rolling hook
                # (qwen3_next, vision towers): quantizes any eligible
                # stack still in bf16; a no-op where the hook already ran
                self.params = self._quantize_params(self.params)
            self._expand_redundant_experts()
        elif quant:
            # random init directly in the quantized dtype: the
            # init-bf16-then-quantize path would materialize the full
            # precision model first (an 8B bf16 random init alone overflows
            # a 16 GiB chip before quantization can run)
            logger.info(
                "no model_path: initializing random %s weights",
                self.config.quant.method,
            )
            self.params = self._init_params_quantized(
                rng or jax.random.key(self.config.seed), shardings
            )
        else:
            logger.info("no model_path: initializing random weights")
            params = self.model.init_params(rng or jax.random.key(self.config.seed))
            if shardings is not None:
                params = jax.tree.map(jax.device_put, params, shardings)
            self.params = params
        # host-side key counter; seed-offset keeps streams distinct per
        # config.seed (sampler.as_key wraps the words on device)
        self._key_ctr = self.config.seed << 20
        self.last_tokens = self._put(jnp.zeros(self.max_slots + 1, jnp.int32))
        # device-resident token history ring (per-slot rows) feeding the
        # sampler's penalty pass — no [N, V] histograms, no host round trip
        # (reference keeps seen-token lists host-side, sampler.cpp:29)
        hist_cols = -(-self.config.scheduler.max_model_len // 128) * 128
        self.token_hist = self._put(
            jnp.zeros((self.max_slots + 1, hist_cols), jnp.int32)
        )
        if self.draft_head is not None:
            shardings = make_named_shardings(
                self.mesh, self.draft_head.param_shardings()
            )
            hp = self.draft_head.init_params(
                jax.random.key(self.config.seed + 1)
            )
            if self.config.speculative.draft_model_path:
                from xllm_tpu.models.loader import load_mtp_head_params

                hp = load_mtp_head_params(
                    self.config.speculative.draft_model_path, hp,
                    dtype=self.model.dtype, cfg=self.config.model,
                )
            if shardings is not None:
                hp = jax.tree.map(jax.device_put, hp, shardings)
            self.head_params = hp
            self.hidden_ring = self._put(
                jnp.zeros(
                    (self.max_slots + 1, self.config.model.hidden_size),
                    self.model.dtype,
                )
            )
        self._build_step_fns()

    def set_kv_scales(self, s_k, s_v) -> None:
        """Install calibrated int8-KV scales (ops/quant.py
        calibrate_kv_scales) and rebuild the step programs — the scales
        are closure constants of the jitted steps."""
        if self.k_cache is not None and self.k_cache.dtype != jnp.int8:
            raise ValueError("set_kv_scales applies to int8-KV engines")
        self.model.set_kv_scales(s_k, s_v)
        self._build_step_fns()

    # matmul weights eligible for weight-only quantization, any layer group
    # (dense "layers", MLA "dense_layers"/"moe_layers"). Router weights stay
    # high precision (routing sensitivity); routed expert stacks stay bf16
    # until the grouped quant GEMM lands (megablox is bf16/f32-only).
    # merger_proj_w: the GLM vision merger consumes its weight with a raw
    # dot (models/vision_glm.py:300) and is a single tiny [out, out]
    # matrix — skipping it keeps the tower's forward quant-agnostic
    _QUANT_SKIP = ("router_w", "merger_proj_w")
    # int8 experts would need int8 activations through the group GEMM;
    # fp8 experts are weight-only (in-kernel upcast), so only fp8 touches
    # the expert stacks (reference w8a8/fp8 group GEMM rows)
    _EXPERT_STACKS = ("experts_gate_up", "experts_down")

    def _rolling_quantize_transform(self):
        """Rolling quantized load (reference rolling_load_manager.h /
        base_loader.h:82-87): each eligible stack quantizes through a
        DONATED jit as it loads, so peak extra HBM stays under one bf16
        stack — the full-precision model never materializes (an 8B bf16
        intermediate alone would overflow the chip). Same numerics as
        _quantize_params (same quantize fn, per stack)."""
        from xllm_tpu.ops.quant import quantize_fp8, quantize_int8

        method = self.config.quant.method
        quantize = quantize_int8 if method == "int8" else quantize_fp8
        qfn = jax.jit(quantize, donate_argnums=(0,))

        def transform(dotted: str, w):
            leaf = dotted.rsplit(".", 1)[-1]
            is_expert = leaf in self._EXPERT_STACKS
            eligible = leaf.endswith("_proj_w") or (
                is_expert and method != "int8"
            )
            if (
                not eligible
                or leaf in self._QUANT_SKIP
                or w.dtype not in (jnp.bfloat16, jnp.float32)
            ):
                return None
            wq, scale = qfn(w)
            return {dotted: wq, dotted + "_scale": scale}

        return transform

    def _quantize_params(self, params):
        """Weight-only INT8/FP8 on the decoder matmuls (reference
        quant_args flow, hf_model_loader.h:44 + w8a8/fp8 kernels).
        Embeddings, lm_head, norms, and routers stay bf16."""
        from xllm_tpu.ops.quant import quantize_fp8, quantize_int8

        method = self.config.quant.method
        quantize = quantize_int8 if method == "int8" else quantize_fp8
        qfn = jax.jit(quantize)
        count = 0
        out = dict(params)
        for group_name, group in params.items():
            if not isinstance(group, dict):
                continue
            new_group = dict(group)
            for name, w in group.items():
                is_expert = name in self._EXPERT_STACKS
                eligible = name.endswith("_proj_w") or (
                    is_expert and method != "int8"
                )
                if (
                    not eligible
                    or name in self._QUANT_SKIP
                    or w.dtype not in (jnp.bfloat16, jnp.float32)
                ):
                    continue
                wq, scale = qfn(w)
                new_group[name] = wq
                new_group[name + "_scale"] = scale
                count += 1
            out[group_name] = new_group
        logger.info("quantized %d weight stacks to %s", count, method)
        return out

    def _init_params_quantized(self, key, shardings=None):
        """Random-init with eligible stacks created DIRECTLY in the
        quantized dtype (via eval_shape — no bf16 original ever exists).
        Dummy-load counterpart of the reference's quantized checkpoint
        load (hf_model_loader.h:44): dtypes/shapes/scales match a real
        quantized load, values are random."""
        method = self.config.quant.method
        qdtype = jnp.int8 if method == "int8" else jnp.float8_e4m3fn
        shapes = jax.eval_shape(self.model.init_params, key)

        def eligible(name, sds) -> bool:
            is_expert = name in self._EXPERT_STACKS
            return (
                (name.endswith("_proj_w") or (is_expert and method != "int8"))
                and name not in self._QUANT_SKIP
                and sds.dtype in (jnp.bfloat16, jnp.float32)
                and sds.ndim >= 2
            )

        def scale_spec(spec, ndim):
            # scale shape = weight shape minus axis -2: drop that axis
            # from the weight's PartitionSpec too
            entries = tuple(spec) + (None,) * (ndim - len(tuple(spec)))
            return jax.sharding.PartitionSpec(
                *(entries[: ndim - 2] + entries[ndim - 1 :])
            )

        keys = iter(jax.random.split(key, 1 << 12))

        def gen(sds, dtype=None, spec=None):
            dtype = dtype or sds.dtype
            out_sh = (
                jax.sharding.NamedSharding(self.mesh, spec)
                if (self.mesh is not None and spec is not None)
                else None
            )

            def init(k):
                if dtype == jnp.int8:
                    return jax.random.randint(
                        k, sds.shape, -127, 128, jnp.int8
                    )
                if jnp.issubdtype(dtype, jnp.integer):
                    return jnp.zeros(sds.shape, dtype)
                return (
                    jax.random.normal(k, sds.shape, jnp.float32) * 0.02
                ).astype(dtype)

            return jax.jit(init, out_shardings=out_sh)(next(keys))

        count = 0
        out = {}
        for group_name, group in shapes.items():
            gspec = (
                self.model.param_shardings().get(group_name)
                if shardings is not None
                else None
            )
            if not isinstance(group, dict):
                out[group_name] = gen(group, spec=gspec)
                continue
            new_group = {}
            for name, sds in group.items():
                spec = gspec.get(name) if isinstance(gspec, dict) else None
                if isinstance(sds, dict):  # deeper nesting: plain random init
                    new_group[name] = jax.tree.map(lambda s: gen(s), sds)
                    continue
                if eligible(name, sds):
                    new_group[name] = gen(sds, dtype=qdtype, spec=spec)
                    sshape = sds.shape[:-2] + sds.shape[-1:]
                    sspec = (
                        scale_spec(spec, sds.ndim)
                        if spec is not None
                        else None
                    )
                    # scale mapping the full quantized range back to the
                    # ~N(0, 0.02) effective weights the bf16 init would give
                    sval = 0.02 / 127.0 if method == "int8" else 1.0
                    ssh = (
                        jax.sharding.NamedSharding(self.mesh, sspec)
                        if (self.mesh is not None and sspec is not None)
                        else None
                    )
                    new_group[name + "_scale"] = jax.jit(
                        lambda: jnp.full(sshape, sval, jnp.float32),
                        out_shardings=ssh,
                    )()
                    count += 1
                else:
                    new_group[name] = gen(sds, spec=spec)
            out[group_name] = new_group
        logger.info(
            "random-initialized %d weight stacks directly in %s", count, method
        )
        return out

    def initialize_kv_cache(self, num_blocks: int | None = None) -> int:
        """Allocate the paged pool; returns num_blocks.

        Counterpart of estimate_kv_cache_capacity + allocate_kv_cache
        (reference xllm/core/distributed_runtime/llm_engine.cpp:382,473).
        """
        self.num_blocks = num_blocks or self._derive_num_blocks()
        if self.dp_size > 1:
            # block dim shards over "data": equal per-rank ranges
            self.num_blocks -= self.num_blocks % self.dp_size
            per = self.num_blocks // self.dp_size
            self.null_blocks = [r * per for r in range(self.dp_size)]
        kv_dtype = self._resolve_kv_dtype()
        if kv_dtype == jnp.int8:
            if not getattr(self.model, "supports_int8_kv", False):
                raise NotImplementedError(
                    "int8 KV needs the GQA decoder's scale folding; this "
                    "family lacks it (MLA uses its own fp8 latent cache)"
                )
            if self.model.kv_scales is None:
                cc = self.config.cache
                self.model.set_kv_scales(cc.kv_scale_k, cc.kv_scale_v)
        self.model.num_state_slots = self.max_slots
        layout = self.config.cache.kv_layout
        if layout.startswith("interleaved"):
            ok = getattr(self.model, "supports_interleaved_kv", False)
            if layout == "interleaved_rm" and ok:
                c = self.config.model
                if self.config.speculative.method:
                    # verify chunks claim kv slots past the true sequence
                    # length; a rejected draft would leave a page
                    # canonicalized early and later row-major writes
                    # would corrupt it — spec engines keep canonical
                    # tails
                    layout = "interleaved"
                # the 4 KB row write needs [2*Hkv, D] = whole (16, 128)
                # tiles dividing the page's (bs, D) planes; int8 tiles
                # are (32, 128), so rm tails are bf16/f32 caches only —
                # those degrade to plain interleaved (the int8 winner),
                # not split
                if (
                    (2 * c.num_kv_heads) % 16 != 0
                    or self.block_size % (2 * c.num_kv_heads) != 0
                    or self._resolve_kv_dtype() == jnp.int8
                ):
                    layout = "interleaved"
                    logger.info(
                        "kv_layout=interleaved_rm ineligible "
                        "(int8 KV or head/page tiling); using interleaved"
                    )
            if ok:
                self.model.kv_layout = layout
            else:
                logger.warning(
                    "kv_layout=%s unsupported for %s; using split",
                    layout, type(self.model).__name__,
                )
        k, v = self.model.new_kv_cache(self.num_blocks, self.block_size, kv_dtype)
        if self.mesh is not None:
            k, v = self.model.place_caches(k, v, self.mesh)
        self.k_cache, self.v_cache = k, v
        if self.draft_head is not None:
            dk, dv = self.draft_head.new_kv_cache(
                self.num_blocks, self.block_size
            )
            if self.mesh is not None:
                from jax.sharding import NamedSharding

                dsh = NamedSharding(
                    self.mesh, self.draft_head.kv_cache_sharding()
                )
                dk, dv = jax.device_put(dk, dsh), jax.device_put(dv, dsh)
            self.dk_cache, self.dv_cache = dk, dv
        logger.info(
            "KV cache: %d blocks x %d tokens (%s)",
            self.num_blocks,
            self.block_size,
            kv_dtype.__name__ if hasattr(kv_dtype, "__name__") else kv_dtype,
        )
        return self.num_blocks

    def _resolve_kv_dtype(self):
        """Cache storage dtype from config (reference kv_cache_impl.h:29
        quantized variants). int8 is the production 8-bit KV format on
        v5e: the fp8 in-kernel upcast measured 4x slower than the bytes
        it saves (819 vs 209 us/layer, scripts/probe_r8_fp8kv.py) while
        int8 converts ride the fast VPU path; per-head scales fold into
        q / the attention output outside the kernels. fp8_e4m3 stays for
        checkpoint compatibility on hardware with fast f8 upcasts."""
        if self.config.cache.kv_cache_dtype in ("auto", ""):
            return self.model.dtype
        table = {
            "bfloat16": jnp.bfloat16,
            "float32": jnp.float32,
            "fp8_e4m3": jnp.float8_e4m3fn,
            "int8": jnp.int8,
        }
        if self.config.cache.kv_cache_dtype not in table:
            raise ValueError(
                f"unsupported kv_cache_dtype "
                f"{self.config.cache.kv_cache_dtype!r}; "
                f"one of {sorted(table)}"
            )
        return table[self.config.cache.kv_cache_dtype]

    def _derive_num_blocks(self) -> int:
        cfg = self.config
        if cfg.cache.num_blocks > 0:
            return cfg.cache.num_blocks
        tp = cfg.parallel.tp_size
        # quantized KV halves/quarters the per-token footprint — derive
        # capacity from the cache storage dtype, not the model dtype
        kv_itemsize = jnp.dtype(self._resolve_kv_dtype()).itemsize
        per_block_per_dev = max(
            self.model.kv_bytes_per_token(kv_itemsize)
            * self.block_size // max(tp, 1),
            1,
        )
        try:
            stats = jax.local_devices()[0].memory_stats()
            free = (
                stats["bytes_limit"] * cfg.cache.memory_utilization
                - stats["bytes_in_use"]
            )
            n = max(int(free // per_block_per_dev), 16)
            return n
        except Exception:
            logger.warning("no memory stats; defaulting to 512 KV blocks")
            return 512

    # ------------------------------------------------------------------
    # jit step functions
    # ------------------------------------------------------------------
    def _build_step_fns(self) -> None:
        model = self.model
        mesh = self.mesh

        def rep_out(*xs):
            """Replicate small per-row outputs (tokens/logprobs/tops)
            across the mesh: under multi-process attention-DP the rows
            come out data-sharded, and a host fetch of an array spanning
            non-addressable devices raises — the driver must see every
            row (reference fan-in of worker outputs, llm_engine.cpp:933).
            No-op off-mesh; a trivial no-op collective when already
            replicated."""
            if mesh is None:
                return xs if len(xs) > 1 else xs[0]
            from xllm_tpu.parallel.mesh import replicated

            r = replicated(mesh)
            out = tuple(
                jax.lax.with_sharding_constraint(x, r)
                if x is not None else None
                for x in xs
            )
            return out if len(out) > 1 else out[0]

        @partial(
            jax.jit, donate_argnums=(1, 2, 5, 6),
            static_argnames=("need_logprobs",),
        )
        def prefill_step(
            params, k_cache, v_cache, inp: PrefillInput, si, last_tokens,
            token_hist, slot, hist_slot, need_logprobs=True,
        ):
            hidden, k_cache, v_cache = model.prefill(params, k_cache, v_cache, inp)
            logits = model.compute_logits(params, hidden)
            # pad columns repeat the last real position with token 0 —
            # divert them out of bounds so the duplicate-index scatter
            # can't race the real last token (mode="drop" discards them)
            col = jnp.arange(inp.token_ids.shape[0], dtype=jnp.int32)
            hist_pos = jnp.where(
                col <= inp.logits_idx, inp.positions, token_hist.shape[1]
            )
            token_hist = token_hist.at[hist_slot, hist_pos].set(
                inp.token_ids, mode="drop"
            )
            tokens, logprobs = sample(
                logits, si, need_logprobs=need_logprobs
            )
            # mid-prompt chunks pass slot = trash_slot
            last_tokens = last_tokens.at[slot].set(tokens[0])
            return k_cache, v_cache, tokens, logprobs, last_tokens, token_hist

        def decode_body(
            params, k_cache, v_cache, inp: DecodeInput, si, last_tokens,
            token_hist, use_penalties=False, num_top=0, need_logprobs=True,
        ):
            token_ids = last_tokens[inp.slot_ids]
            # record each row's input token (the previous sample) so the
            # device history ring holds every position < num_tokens;
            # keyed by TOKEN index, not the rope position (VLM rows carry
            # a rope_offset)
            hp = (
                inp.hist_positions
                if inp.hist_positions is not None
                else inp.positions
            )
            token_hist = token_hist.at[inp.slot_ids, hp].set(
                token_ids
            )
            hidden, k_cache, v_cache = model.decode(
                params, k_cache, v_cache, inp, token_ids
            )
            logits = model.compute_logits(params, hidden)
            hist = token_hist[inp.slot_ids] if use_penalties else None
            out = sample(logits, si, hist, num_top, need_logprobs)
            tokens, logprobs = out[0], out[1]
            tops = out[2:] if num_top else (None, None)
            tokens, logprobs, t0, t1 = rep_out(
                tokens, logprobs, tops[0], tops[1]
            )
            tops = (t0, t1)
            last_tokens = last_tokens.at[inp.slot_ids].set(tokens)
            counts = getattr(model, "_expert_counts", None)
            return (
                k_cache, v_cache, tokens, logprobs, last_tokens, token_hist,
                counts, tops,
            )

        decode_step = jax.jit(
            decode_body,
            donate_argnums=(1, 2, 5, 6),
            static_argnames=("use_penalties", "num_top", "need_logprobs"),
        )

        def _unpack_decode(ints, floats, b, nb, with_maps):
            """Static-offset slices of the packed dispatch buffers ->
            (DecodeInput, SamplingInput). Free inside the jit — the
            packing exists to collapse ~18 per-step host->device
            transfers into 2 (each transfer pays tunnel dispatch
            overhead; PERF.md r4)."""
            o = 0

            def take(n):
                nonlocal o
                v = jax.lax.slice_in_dim(ints, o, o + n)
                o += n
                return v

            slot_ids = take(b)
            positions = take(b)
            slot_mapping = take(b)
            seq_lens = take(b)
            hist_positions = take(b)
            block_tables = take(b * nb).reshape(b, nb)
            page_cum = page_seq = None
            if with_maps:
                page_cum = take(b + 1)
                page_seq = take(b * nb)
            top_k = take(b)
            seeds = take(b)
            steps = take(b)
            hist_len = take(b)
            key_raw = jax.lax.bitcast_convert_type(take(2), jnp.uint32)
            inp = DecodeInput(
                slot_ids=slot_ids,
                positions=positions,
                slot_mapping=slot_mapping,
                block_tables=block_tables,
                seq_lens=seq_lens,
                hist_positions=hist_positions,
                page_cum=page_cum,
                page_seq=page_seq,
            )
            si = SamplingInput(
                temperature=floats[0],
                top_k=top_k,
                top_p=floats[1],
                key=key_raw,
                seeds=seeds,
                steps=steps,
                repetition_penalty=floats[2],
                frequency_penalty=floats[3],
                presence_penalty=floats[4],
                hist_len=hist_len,
            )
            return inp, si

        @partial(
            jax.jit,
            donate_argnums=(1, 2, 5, 6),
            static_argnames=("b", "nb", "with_maps", "use_penalties",
                             "num_top", "need_logprobs"),
        )
        def decode_step_packed(
            params, k_cache, v_cache, ints, floats, last_tokens,
            token_hist, b, nb, with_maps, use_penalties=False, num_top=0,
            need_logprobs=True,
        ):
            inp, si = _unpack_decode(ints, floats, b, nb, with_maps)
            return decode_body(
                params, k_cache, v_cache, inp, si, last_tokens,
                token_hist, use_penalties=use_penalties, num_top=num_top,
                need_logprobs=need_logprobs,
            )

        @partial(
            jax.jit, donate_argnums=(1, 2, 6), static_argnames=("num_logits",)
        )
        def verify_step(
            params, k_cache, v_cache, inp: PrefillInput, draft_tokens,
            temperature, last_tokens, slot, key, num_logits,
        ):
            hidden, k_cache, v_cache = model.prefill(
                params, k_cache, v_cache, inp, num_logits=num_logits
            )
            logits = model.compute_logits(params, hidden)  # [k+1, V]
            tokens, num_acc = rejection_sample(
                draft_tokens[None],
                jnp.full((1,), num_logits - 1, jnp.int32),
                logits[None],
                temperature[None],
                key,
            )
            last_tokens = last_tokens.at[slot].set(tokens[0, num_acc[0] - 1])
            return k_cache, v_cache, tokens[0], num_acc[0], last_tokens

        @partial(
            jax.jit,
            donate_argnums=(1, 2, 5, 6),
            static_argnames=("use_penalties", "num_top", "need_logprobs"),
        )
        def batched_prefill_step(
            params, k_cache, v_cache, inp: BatchedPrefillInput, si,
            last_tokens, token_hist, use_penalties=False, num_top=0,
            need_logprobs=True,
        ):
            hidden, k_cache, v_cache = model.prefill_batched(
                params, k_cache, v_cache, inp
            )
            logits = model.compute_logits(params, hidden[:, 0])  # [P, V]
            # pad columns carry an out-of-bounds hist_pos sentinel and are
            # dropped — a duplicate-index scatter would otherwise
            # nondeterministically zero the last token's history entry.
            # hist_pos comes from the builder because under cp the token
            # columns are zigzag-permuted (col <= logits_idx would be
            # wrong there)
            token_hist = token_hist.at[
                inp.hist_slots[:, None], inp.hist_pos
            ].set(inp.token_ids, mode="drop")
            hist = token_hist[inp.hist_slots] if use_penalties else None
            out = sample(logits, si, hist, num_top, need_logprobs)
            tokens, logprobs = out[0], out[1]
            tops = out[2:] if num_top else (None, None)
            tokens, logprobs, t0, t1 = rep_out(
                tokens, logprobs, tops[0], tops[1]
            )
            tops = (t0, t1)
            last_tokens = last_tokens.at[inp.sample_slots].set(tokens)
            counts = getattr(model, "_expert_counts", None)
            return (
                k_cache, v_cache, tokens, logprobs, last_tokens, token_hist,
                counts, tops,
            )

        @partial(
            jax.jit, donate_argnums=(1, 2, 6, 7), static_argnames=("num_logits",)
        )
        def batched_verify_step(
            params, k_cache, v_cache, inp: BatchedPrefillInput, draft_tokens,
            draft_lens, last_tokens, token_hist, temperature, key, num_logits,
        ):
            hidden, k_cache, v_cache = model.prefill_batched(
                params, k_cache, v_cache, inp, num_logits=num_logits
            )
            p = hidden.shape[0]
            logits = model.compute_logits(
                params, hidden.reshape(p * num_logits, -1)
            ).reshape(p, num_logits, -1)
            # only the row's first token (the previous sample) is real
            # history; accepted drafts are recorded by later steps' inputs
            token_hist = token_hist.at[
                inp.hist_slots, inp.positions[:, 0]
            ].set(inp.token_ids[:, 0])
            tokens, num_acc = rejection_sample(
                draft_tokens, draft_lens, logits, temperature, key
            )
            final = jnp.take_along_axis(
                tokens, (num_acc - 1)[:, None], axis=1
            )[:, 0]
            last_tokens = last_tokens.at[inp.sample_slots].set(final)
            return k_cache, v_cache, tokens, num_acc, last_tokens, token_hist

        self._prefill_fn = prefill_step
        self._decode_fn = decode_step
        self._decode_fn_packed = decode_step_packed
        self._verify_fn = verify_step
        self._batched_prefill_fn = batched_prefill_step
        self._batched_verify_fn = batched_verify_step
        if self.draft_head is not None:
            self._build_mtp_step_fns()

    def _build_mtp_step_fns(self) -> None:
        """Draft-head-aware variants of the step fns (MTP/Eagle3).

        The draft loop, the target verify forward, the rejection sampler,
        and both head-KV passes run in ONE dispatch per step — draft
        tokens never reach the host (reference wraps the same pieces in
        SpeculativeWorkerImpl::step, speculative_worker_impl.h:31,128-130).
        """
        model = self.model
        head = self.draft_head

        @partial(
            jax.jit,
            donate_argnums=(2, 3, 4, 5, 8, 9, 10),
            static_argnames=("use_penalties", "need_logprobs"),
        )
        def mtp_prefill_step(
            params, head_params, k_cache, v_cache, dk, dv,
            inp: BatchedPrefillInput, si, last_tokens, token_hist,
            hidden_ring, use_penalties=False, need_logprobs=True,
        ):
            hidden, k_cache, v_cache, pre = model.prefill_batched(
                params, k_cache, v_cache, inp, return_hidden=True
            )
            dk, dv = head.prefill_batched(
                params, head_params, dk, dv, pre, inp
            )
            logits = model.compute_logits(params, hidden[:, 0])
            # pad columns carry OOB hist_pos — see batched_prefill_step
            token_hist = token_hist.at[
                inp.hist_slots[:, None], inp.hist_pos
            ].set(inp.token_ids, mode="drop")
            hist = token_hist[inp.hist_slots] if use_penalties else None
            tokens, logprobs = sample(
                logits, si, hist, need_logprobs=need_logprobs
            )
            last_tokens = last_tokens.at[inp.sample_slots].set(tokens)
            last_pre = jnp.take_along_axis(
                pre, inp.logits_idx[:, None, None], axis=1
            )[:, 0]
            hidden_ring = hidden_ring.at[inp.sample_slots].set(
                last_pre.astype(hidden_ring.dtype)
            )
            return (
                k_cache, v_cache, dk, dv, tokens, logprobs, last_tokens,
                token_hist, hidden_ring,
            )

        @partial(
            jax.jit,
            donate_argnums=(2, 3, 4, 5, 8, 9, 10),
            static_argnames=("num_logits",),
        )
        def mtp_verify_step(
            params, head_params, k_cache, v_cache, dk, dv,
            inp: BatchedPrefillInput, temperature, last_tokens, hidden_ring,
            token_hist, key, num_logits,
        ):
            spec_k = num_logits - 1
            seq_base = inp.kv_lens - spec_k  # N per row (0 pads -> junk)
            pos0 = inp.positions[:, 0]  # N - 1
            last_tok = last_tokens[inp.hist_slots]
            last_hid = hidden_ring[inp.hist_slots]
            drafts, dk, dv = head.draft_tokens(
                params, head_params, dk, dv, last_hid, last_tok, pos0,
                inp.slot_mapping[:, :spec_k], inp.block_tables, seq_base,
                spec_k,
            )
            token_ids = jnp.concatenate([last_tok[:, None], drafts], axis=1)
            inp = BatchedPrefillInput(
                token_ids=token_ids,
                positions=inp.positions,
                slot_mapping=inp.slot_mapping,
                block_tables=inp.block_tables,
                kv_lens=inp.kv_lens,
                q_offsets=inp.q_offsets,
                logits_idx=inp.logits_idx,
                sample_slots=inp.sample_slots,
                hist_slots=inp.hist_slots,
            )
            hidden, k_cache, v_cache, pre = model.prefill_batched(
                params, k_cache, v_cache, inp, num_logits=num_logits,
                return_hidden=True,
            )
            p = hidden.shape[0]
            logits = model.compute_logits(
                params, hidden.reshape(p * num_logits, -1)
            ).reshape(p, num_logits, -1)
            draft_lens = jnp.where(inp.kv_lens > 0, spec_k, 0)
            tokens, num_acc = rejection_sample(
                drafts, draft_lens, logits, temperature, key
            )
            # head-KV rewrite with the true (hidden_t, token_{t+1}) stream
            dk, dv = head.prefill_batched(
                params, head_params, dk, dv, pre, inp, tokens_next=tokens
            )
            final = jnp.take_along_axis(
                tokens, (num_acc - 1)[:, None], axis=1
            )[:, 0]
            last_tokens = last_tokens.at[inp.sample_slots].set(final)
            final_hid = jnp.take_along_axis(
                pre, (num_acc - 1)[:, None, None], axis=1
            )[:, 0]
            hidden_ring = hidden_ring.at[inp.sample_slots].set(
                final_hid.astype(hidden_ring.dtype)
            )
            token_hist = token_hist.at[
                inp.hist_slots, inp.positions[:, 0]
            ].set(inp.token_ids[:, 0])
            return (
                k_cache, v_cache, dk, dv, tokens, num_acc, last_tokens,
                hidden_ring, token_hist,
            )

        @partial(
            jax.jit,
            donate_argnums=(2, 3, 6, 7, 8),
            static_argnames=("use_penalties", "need_logprobs"),
        )
        def mtp_decode_step(
            params, head_params, k_cache, v_cache, inp: DecodeInput, si,
            last_tokens, token_hist, hidden_ring, use_penalties=False,
            need_logprobs=True,
        ):
            token_ids = last_tokens[inp.slot_ids]
            hp = (
                inp.hist_positions
                if inp.hist_positions is not None
                else inp.positions
            )
            token_hist = token_hist.at[inp.slot_ids, hp].set(
                token_ids
            )
            hidden, k_cache, v_cache = model.decode(
                params, k_cache, v_cache, inp, token_ids
            )
            logits = model.compute_logits(params, hidden)
            hist = token_hist[inp.slot_ids] if use_penalties else None
            tokens, logprobs = sample(
                logits, si, hist, need_logprobs=need_logprobs
            )
            last_tokens = last_tokens.at[inp.slot_ids].set(tokens)
            pre = model._prenorm_hidden
            hidden_ring = hidden_ring.at[inp.slot_ids].set(
                pre.astype(hidden_ring.dtype)
            )
            return (
                k_cache, v_cache, tokens, logprobs, last_tokens, token_hist,
                hidden_ring,
            )

        self._mtp_prefill_fn = mtp_prefill_step
        self._mtp_verify_fn = mtp_verify_step
        self._mtp_decode_fn = mtp_decode_step

    def _next_key(self) -> np.ndarray:
        """Raw uint32[2] key data for the device samplers.

        A numpy counter instead of jax.random.split: the split is a
        device op per dispatch (~0.8 ms of host time at the bench
        config); sampler.as_key wraps the raw words into a typed
        threefry key inside the jit for free.
        """
        self._key_ctr += 1
        c = self._key_ctr
        return np.array([c >> 32, c & 0xFFFFFFFF], dtype=np.uint32)

    def _put(self, tree):
        if self.mesh is None:
            return tree
        rep = replicated(self.mesh)
        return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

    def _put_prefill(self, inp, si, rows: int):
        """Prefill-input placement: rows over ``data``; with CP, the
        token dim of [P, S] arrays over ``cp`` (allgather-KV attention)."""
        if self.mesh is None or self.cp_size <= 1:
            return self._put_rows(inp, rows), self._put_rows(si, rows)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        def put_inp(x, token_major):
            if token_major:
                spec = P("data", "cp")
            elif hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == rows:
                spec = P("data", *([None] * (x.ndim - 1)))
            else:
                spec = P()
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        from xllm_tpu.runtime.forward_params import BatchedPrefillInput

        inp = BatchedPrefillInput(
            token_ids=put_inp(inp.token_ids, True),
            positions=put_inp(inp.positions, True),
            slot_mapping=put_inp(inp.slot_mapping, True),
            block_tables=put_inp(inp.block_tables, False),
            kv_lens=put_inp(inp.kv_lens, False),
            q_offsets=put_inp(inp.q_offsets, False),
            logits_idx=put_inp(inp.logits_idx, False),
            sample_slots=put_inp(inp.sample_slots, False),
            hist_slots=put_inp(inp.hist_slots, False),
            hist_pos=(
                put_inp(inp.hist_pos, True)
                if inp.hist_pos is not None
                else None
            ),
        )
        return inp, self._put_rows(si, rows)

    def _put_rows(self, tree, rows: int):
        """Shard leaves whose leading dim == rows over the mesh ``data``
        axis (attention-DP); everything else replicates. Collapses to
        _put on a single-device or dp=1 mesh."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        dp = self.mesh.shape.get("data", 1)
        if dp <= 1 or rows % dp != 0:
            return self._put(tree)
        rep = replicated(self.mesh)

        def put(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == rows:
                spec = P("data", *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(self.mesh, spec))
            return jax.device_put(x, rep)

        return jax.tree.map(put, tree)

    # ------------------------------------------------------------------
    # public step API (host numpy in/out)
    # ------------------------------------------------------------------
    def run_prefill(
        self, seq: Sequence, num_new_tokens: int
    ) -> tuple[jax.Array, jax.Array, bool]:
        """Run one prompt chunk asynchronously.

        Returns (token_dev [1], logprob_dev [1], samples_token) — device
        arrays, NOT fetched: the engine fixes up sequences with a lag
        (async schedule overlap). The sampled token is also written into
        the last_tokens ring at the sequence's slot so the next decode
        step can read it without a host round trip.
        """
        inp, samples_token = build_prefill_input(
            seq,
            num_new_tokens,
            self.block_size,
            self.config.scheduler.prefill_token_buckets,
            self.max_blocks_per_seq,
        )
        temperature, top_k, top_p = build_sampling_arrays([seq], 1)
        si = SamplingInput(
            temperature=temperature, top_k=top_k, top_p=top_p, key=self._next_key()
        )
        slot = seq.slot_id if samples_token else self.trash_slot
        (
            self.k_cache, self.v_cache, tokens, logprobs, self.last_tokens,
            self.token_hist,
        ) = self._prefill_fn(
            self.params,
            self.k_cache,
            self.v_cache,
            self._put(inp),
            self._put(si),
            self.last_tokens,
            self.token_hist,
            np.int32(slot),
            np.int32(seq.slot_id),
            need_logprobs=self._need_lp([seq]),
        )
        return tokens, logprobs, samples_token

    @property
    def supports_batched_prefill(self) -> bool:
        return getattr(self.model, "supports_batched_prefill", False)

    def run_prefill_batched(
        self, items: list[tuple[Sequence, int]]
    ) -> tuple[jax.Array, jax.Array, list[bool]]:
        """Run P prompt chunks in ONE dispatch (async, device out).

        Counterpart of the reference's whole-batch prefill
        (reference batch_input_builder.h:53 + llm_engine.cpp:923). Returns
        (tokens [P_pad], logprobs [P_pad], samples_flags) — device arrays
        for the lagged fixup; row i samples a real token iff
        samples_flags[i].
        """
        sc = self.config.scheduler
        inp, samples_flags, rows = build_batched_prefill_input(
            items,
            self.block_size,
            sc.prefill_token_buckets,
            sc.prefill_row_buckets,
            self.max_blocks_per_seq,
            self.trash_slot,
            self.dp_size,
            self.null_blocks,
            cp_size=self.cp_size,
            hidden_size=self.config.model.hidden_size,
        )
        p_pad = inp.kv_lens.shape[0]
        seqs_only = [seq for seq, _ in items]
        si, use_penalties = build_sampling_input(
            seqs_only, p_pad, rows, self._next_key()
        )
        self.broadcaster.announce_prefill(
            inp, si, use_penalties, self._num_top(seqs_only),
            self._need_lp(seqs_only),
        )
        inp_put, si_put = self._put_prefill(inp, si, p_pad)
        if self.draft_head is not None:
            (
                self.k_cache, self.v_cache, self.dk_cache, self.dv_cache,
                tokens, logprobs, self.last_tokens, self.token_hist,
                self.hidden_ring,
            ) = self._mtp_prefill_fn(
                self.params,
                self.head_params,
                self.k_cache,
                self.v_cache,
                self.dk_cache,
                self.dv_cache,
                inp_put,
                si_put,
                self.last_tokens,
                self.token_hist,
                self.hidden_ring,
                use_penalties=use_penalties,
                need_logprobs=self._need_lp([seq for seq, _ in items]),
            )
            return tokens, logprobs, samples_flags, rows, (None, None)
        num_top = self._num_top([seq for seq, _ in items])
        (
            self.k_cache, self.v_cache, tokens, logprobs, self.last_tokens,
            self.token_hist, counts, tops,
        ) = self._batched_prefill_fn(
            self.params,
            self.k_cache,
            self.v_cache,
            inp_put,
            si_put,
            self.last_tokens,
            self.token_hist,
            use_penalties=use_penalties,
            num_top=num_top,
            need_logprobs=self._need_lp([seq for seq, _ in items]),
        )
        self._accumulate_loads(counts)
        return tokens, logprobs, samples_flags, rows, tops

    def run_verify_batched(
        self, pairs: list[tuple[Sequence, list[int]]], spec_k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched speculative verify: ONE dispatch for all sequences.

        SYNCHRONOUS (fetches the result): multi-token yield per step is
        the fetch-latency amortizer (reference SpeculativeEngine step,
        speculative_engine.cpp:41-70). Returns (tokens [P, k+1],
        num_accepted [P]) as host arrays.
        """
        sc = self.config.scheduler
        inp, draft_tokens, draft_lens, rows = build_batched_verify_input(
            pairs,
            spec_k,
            self.block_size,
            sc.prefill_row_buckets,
            self.max_blocks_per_seq,
            self.trash_slot,
            self.dp_size,
            self.null_blocks,
        )
        p_pad = inp.kv_lens.shape[0]
        temperature = np.zeros(p_pad, np.float32)
        for (seq, _), i in zip(pairs, rows):
            temperature[i] = seq.sampling_params.temperature
        (
            self.k_cache, self.v_cache, tokens, num_acc, self.last_tokens,
            self.token_hist,
        ) = self._batched_verify_fn(
            self.params,
            self.k_cache,
            self.v_cache,
            self._put_rows(inp, p_pad),
            self._put_rows(jnp.asarray(draft_tokens), p_pad),
            self._put_rows(jnp.asarray(draft_lens), p_pad),
            self.last_tokens,
            self.token_hist,
            self._put_rows(jnp.asarray(temperature), p_pad),
            self._next_key(),
            num_logits=spec_k + 1,
        )
        return np.asarray(tokens), np.asarray(num_acc), rows

    def run_verify_mtp(
        self, seqs: list[Sequence], spec_k: int
    ) -> tuple[np.ndarray, np.ndarray, list[int]]:
        """Draft (MTP head) + verify + accept in ONE dispatch.

        Draft tokens are generated on device from the hidden/token rings
        (reference SpeculativeWorkerImpl draft->validate flow,
        speculative_worker_impl.h:31,128-130); only (tokens, num_accepted)
        come back to the host. Returns (tokens [P, k+1], num_acc [P], rows).
        """
        sc = self.config.scheduler
        pairs = [(seq, [0] * spec_k) for seq in seqs]  # token values unused
        inp, _dummy, _lens, rows = build_batched_verify_input(
            pairs,
            spec_k,
            self.block_size,
            sc.prefill_row_buckets,
            self.max_blocks_per_seq,
            self.trash_slot,
            self.dp_size,
            self.null_blocks,
        )
        p_pad = inp.kv_lens.shape[0]
        temperature = np.zeros(p_pad, np.float32)
        for seq, i in zip(seqs, rows):
            temperature[i] = seq.sampling_params.temperature
        (
            self.k_cache, self.v_cache, self.dk_cache, self.dv_cache,
            tokens, num_acc, self.last_tokens, self.hidden_ring,
            self.token_hist,
        ) = self._mtp_verify_fn(
            self.params,
            self.head_params,
            self.k_cache,
            self.v_cache,
            self.dk_cache,
            self.dv_cache,
            self._put_rows(inp, p_pad),
            self._put_rows(jnp.asarray(temperature), p_pad),
            self.last_tokens,
            self.hidden_ring,
            self.token_hist,
            self._next_key(),
            num_logits=spec_k + 1,
        )
        return np.asarray(tokens), np.asarray(num_acc), rows

    # ------------------------------------------------------------------
    # beam search (reference beam_searcher.cpp:21 + device block copy)
    # ------------------------------------------------------------------
    def copy_kv_blocks(self, pairs: list[tuple[int, int]]) -> None:
        """Device block copies for beam forks (dst gets src's content)."""
        if not pairs:
            return
        if self._copy_blocks_fn is None:
            paged_v = self.v_cache.ndim >= 5  # rank-1 = MLA/interleaved

            @partial(jax.jit, donate_argnums=(0, 1))
            def copy_blocks(k_all, v_all, src, dst):
                k_all = k_all.at[:, dst].set(k_all[:, src])
                if paged_v:
                    v_all = v_all.at[:, dst].set(v_all[:, src])
                return k_all, v_all

            self._copy_blocks_fn = copy_blocks
        src = jnp.asarray([s for s, _ in pairs], jnp.int32)
        dst = jnp.asarray([d for _, d in pairs], jnp.int32)
        self.k_cache, self.v_cache = self._copy_blocks_fn(
            self.k_cache, self.v_cache, src, dst
        )

    def run_beam_decode(
        self, seqs: list[Sequence], width: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """One decode step for beam rows -> per-row top-``width`` expansion
        candidates (token ids + logprobs), fetched SYNCHRONOUSLY (beam
        bookkeeping is host logic, reference beam_searcher.cpp:21).
        Input tokens come from the host (beam reorder invalidates the
        ring); KV rows are written as usual.
        """
        inp, rows = build_decode_input(
            seqs,
            self.block_size,
            self.config.scheduler.decode_batch_buckets,
            self.max_blocks_per_seq,
            self.trash_slot,
            self.nb_buckets,
            self.dp_size,
            self.null_blocks,
        )
        b_pad = inp.slot_ids.shape[0]
        token_ids = np.zeros(b_pad, np.int32)
        for seq, i in zip(seqs, rows):
            token_ids[i] = seq.token_ids[-1]
        if self._beam_decode_fn is None:
            model = self.model

            @partial(
                jax.jit, donate_argnums=(1, 2), static_argnames=("width",)
            )
            def beam_step(params, k_cache, v_cache, inp, token_ids, width):
                hidden, k_cache, v_cache = model.decode(
                    params, k_cache, v_cache, inp, token_ids
                )
                logits = model.compute_logits(params, hidden)
                logprobs = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1
                )
                vals, ids = jax.lax.top_k(logprobs, width)
                return k_cache, v_cache, vals, ids

            self._beam_decode_fn = beam_step
        self.k_cache, self.v_cache, vals, ids = self._beam_decode_fn(
            self.params,
            self.k_cache,
            self.v_cache,
            self._put_rows(inp, b_pad),
            self._put_rows(jnp.asarray(token_ids), b_pad),
            width=width,
        )
        vals, ids = np.asarray(vals), np.asarray(ids)
        out_v = np.zeros((len(seqs), width), np.float32)
        out_i = np.zeros((len(seqs), width), np.int32)
        for j, i in enumerate(rows):
            out_v[j] = vals[i]
            out_i[j] = ids[i]
        return out_i, out_v

    # ------------------------------------------------------------------
    # VLM: vision tower encode (reference VLM engine encode step,
    # vlm_engine.h:37; one jit per patch-grid shape)
    # ------------------------------------------------------------------
    def encode_image(
        self, patches: np.ndarray, grid: tuple[int, int, int]
    ) -> np.ndarray:
        if self._encode_image_fn is None:
            model = self.model

            @partial(jax.jit, static_argnames=("gh", "gw", "gt"))
            def enc(params, patches, gh, gw, gt):
                return model.vision.encode(
                    params["visual"], patches, gh, gw, grid_t=gt
                )

            self._encode_image_fn = enc
        gt, gh, gw = grid
        out = self._encode_image_fn(
            self.params, self._put(jnp.asarray(patches)), gh=gh, gw=gw, gt=gt
        )
        if isinstance(out, tuple):
            # qwen3-vl tower: (merged embeds, deepstack feature maps)
            return np.asarray(out[0]), np.asarray(out[1])
        return np.asarray(out)

    def run_prefill_embed(self, seq: Sequence, num_new_tokens: int) -> np.ndarray:
        """Final prompt chunk of an embed request -> pooled hidden state.

        Counterpart of the reference EmbeddingWorkerImpl / embedding LM path
        (reference xllm/core/runtime embed worker, /v1/embeddings). Pooling
        is last-token + L2 normalize. Synchronous fetch.
        """
        inp, samples_token = build_prefill_input(
            seq,
            num_new_tokens,
            self.block_size,
            self.config.scheduler.prefill_token_buckets,
            self.max_blocks_per_seq,
        )
        assert samples_token, "embed must run on the final chunk"
        if self._embed_fn is None:
            model = self.model

            @partial(jax.jit, donate_argnums=(1, 2))
            def embed_step(params, k_cache, v_cache, inp: PrefillInput):
                hidden, k_cache, v_cache = model.prefill(
                    params, k_cache, v_cache, inp
                )
                vec = hidden[0].astype(jnp.float32)
                vec = vec / jnp.maximum(jnp.linalg.norm(vec), 1e-12)
                return k_cache, v_cache, vec

            self._embed_fn = embed_step
        self.k_cache, self.v_cache, vec = self._embed_fn(
            self.params, self.k_cache, self.v_cache, self._put(inp)
        )
        return np.asarray(vec)

    def run_score_chunk(self, seq, num_new_tokens: int) -> np.ndarray:
        """Next-token logprobs for one prompt chunk (scoring / perplexity).

        Counterpart of the reference's logprob scoring flow (the OpenAI
        echo+logprobs path; accuracy harnesses drive it for perplexity,
        docs/en/accuracy_test.md). Returns lp [n] f32 where lp[i] is the
        logprob of the NEXT prompt token after chunk row i (the final
        prompt position scores 0 — there is no next token). Synchronous
        fetch: scoring is an offline path.
        """
        from xllm_tpu.runtime.input_builder import build_prefill_input

        inp, _ = build_prefill_input(
            seq,
            num_new_tokens,
            self.block_size,
            self.config.scheduler.prefill_token_buckets,
            self.max_blocks_per_seq,
        )
        s_pad = inp.token_ids.shape[0]
        start = seq.num_computed_tokens
        nxt = np.zeros(s_pad, np.int32)
        for i in range(num_new_tokens):
            j = start + i + 1
            nxt[i] = seq.token_ids[j] if j < seq.num_tokens else 0
        if self._score_fn is None:
            model = self.model

            @partial(
                jax.jit, donate_argnums=(1, 2),
                static_argnames=("num_logits",),
            )
            def score_step(params, k_cache, v_cache, inp, next_tokens,
                           num_logits):
                hidden, k_cache, v_cache = model.prefill(
                    params, k_cache, v_cache, inp, num_logits=num_logits
                )
                logits = model.compute_logits(params, hidden)
                logz = jax.nn.logsumexp(
                    logits.astype(jnp.float32), axis=-1
                )
                chosen = jnp.take_along_axis(
                    logits, next_tokens[:, None], axis=-1
                )[:, 0].astype(jnp.float32)
                return k_cache, v_cache, chosen - logz

            self._score_fn = score_step
        self.k_cache, self.v_cache, lp = self._score_fn(
            self.params, self.k_cache, self.v_cache, self._put(inp),
            self._put(jnp.asarray(nxt)), num_logits=s_pad,
        )
        return np.asarray(lp)[:num_new_tokens]

    def run_sample_slots(
        self,
        seq: Sequence,
        source_rows: np.ndarray,  # [n] prompt rows whose logits to sample
        temperature: float,
        top_k: int,
        top_p: float,
        seed: int,
        num_top: int = 0,
    ):
        """Multi-position sampling over ONE prompt forward.

        Counterpart of the reference's /v1/sample service (reference
        xllm/api_service/sample_service_impl.cpp:130-230 +
        sample_slot.cpp:49-52: each selector occurrence samples from the
        logits at token_position-1). One dispatch: batched prefill with
        the FULL hidden returned, gather the slot rows, final-norm +
        lm_head + the fused sampler. Synchronous fetch.
        Returns (tokens [n], logprobs [n], top_ids [n, num_top],
        top_lps [n, num_top])."""
        from xllm_tpu.ops.norms import rms_norm
        from xllm_tpu.runtime.sampler import sample as fused_sample

        sc = self.config.scheduler
        inp, _, rows = build_batched_prefill_input(
            [(seq, seq.num_tokens)],
            self.block_size,
            sc.prefill_token_buckets,
            sc.prefill_row_buckets,
            self.max_blocks_per_seq,
            self.trash_slot,
            self.dp_size,
            self.null_blocks,
            cp_size=self.cp_size,
            hidden_size=self.config.model.hidden_size,
        )
        if self._sample_slots_fn is None:
            model = self.model

            @partial(
                jax.jit, donate_argnums=(1, 2), static_argnames=("num_top",)
            )
            def step(params, k_cache, v_cache, inp, row_idx, srows, si,
                     num_top):
                _, k_cache, v_cache, pre = model.prefill_batched(
                    params, k_cache, v_cache, inp, return_hidden=True
                )
                hidden = rms_norm(
                    pre[row_idx], params["norm"],
                    self.config.model.rms_norm_eps,
                )[srows]  # [n, D]
                logits = model.compute_logits(params, hidden).astype(
                    jnp.float32
                )
                out = fused_sample(logits, si, num_top=num_top)
                return (k_cache, v_cache) + tuple(out)

            self._sample_slots_fn = step
        n = len(source_rows)
        si = SamplingInput(
            temperature=np.full(n, temperature, np.float32),
            top_k=np.full(n, top_k, np.int32),
            top_p=np.full(n, top_p, np.float32),
            key=(
                np.array([0, seed], dtype=np.uint32)
                if seed >= 0 else self._next_key()
            ),
        )
        srows = np.asarray(source_rows, np.int32)
        s_pad = inp.token_ids.shape[1]
        if self.cp_size > 1 and s_pad % (2 * self.cp_size) == 0:
            # the builder zigzag-permuted the token columns: slot rows
            # must be looked up at their permuted column
            from xllm_tpu.parallel.cp import inverse_order, zigzag_order

            inv = inverse_order(zigzag_order(s_pad, self.cp_size))
            srows = np.asarray(inv[srows], np.int32)
        res = self._sample_slots_fn(
            self.params, self.k_cache, self.v_cache, self._put(inp),
            np.int32(rows[0]), srows,
            self._put(si), num_top=num_top,
        )
        self.k_cache, self.v_cache = res[0], res[1]
        out = tuple(np.asarray(x) for x in res[2:])
        if num_top:
            return out  # tokens, logprobs, top_ids, top_lps
        return out[0], out[1], None, None

    def run_verify(
        self, seq: Sequence, draft_tokens: list[int]
    ) -> tuple[np.ndarray, int]:
        """Speculative verify: compute KV+logits for [last, drafts], accept.

        SYNCHRONOUS (fetches the result): speculative decoding trades the
        fetch round-trip against multi-token yield per step (reference
        SpeculativeEngine step, speculative_engine.cpp:41-70).
        Returns (tokens [<=k+1], num_accepted) — tokens[:num_accepted] are
        the emitted tokens; the ring slot is updated on device.
        """
        inp = build_verify_input(
            seq, draft_tokens, self.block_size, self.max_blocks_per_seq
        )
        sp = seq.sampling_params
        self.k_cache, self.v_cache, tokens, num_acc, self.last_tokens = (
            self._verify_fn(
                self.params,
                self.k_cache,
                self.v_cache,
                self._put(inp),
                jnp.asarray(draft_tokens, jnp.int32),
                jnp.float32(sp.temperature),
                self.last_tokens,
                np.int32(seq.slot_id),
                self._next_key(),
                num_logits=len(draft_tokens) + 1,
            )
        )
        n = int(num_acc)
        return np.asarray(tokens)[:n], n

    def run_decode(
        self, seqs: list[Sequence]
    ) -> tuple[jax.Array, jax.Array]:
        """One decode token for each running sequence (async, device out).

        Input tokens come from the last_tokens ring on device; returned
        arrays are un-fetched device arrays for lagged fixup.
        """
        if self._decode_cache is not None:
            inp, rows, si, use_penalties = self._decode_cache.build(
                seqs,
                self.block_size,
                self.config.scheduler.decode_batch_buckets,
                self.max_blocks_per_seq,
                self.trash_slot,
                self.nb_buckets,
                self._next_key(),
            )
            b_pad = inp.slot_ids.shape[0]
        else:
            inp, rows = build_decode_input(
                seqs,
                self.block_size,
                self.config.scheduler.decode_batch_buckets,
                self.max_blocks_per_seq,
                self.trash_slot,
                self.nb_buckets,
                self.dp_size,
                self.null_blocks,
            )
            b_pad = inp.slot_ids.shape[0]
            si, use_penalties = build_sampling_input(
                seqs, b_pad, rows, self._next_key()
            )
        num_top = self._num_top(seqs)
        need_lp = self._need_lp(seqs)
        self.broadcaster.announce_decode(
            inp, si, use_penalties, num_top, need_lp
        )
        if self._packed_dispatch and self.draft_head is None:
            with_maps = inp.page_cum is not None
            parts = [
                inp.slot_ids, inp.positions, inp.slot_mapping,
                inp.seq_lens, inp.hist_positions,
                inp.block_tables.ravel(),
            ]
            if with_maps:
                parts += [inp.page_cum, inp.page_seq]
            parts += [
                si.top_k, si.seeds, si.steps, si.hist_len,
                si.key.view(np.int32),
            ]
            ints = np.concatenate(parts)
            floats = np.stack([
                si.temperature, si.top_p, si.repetition_penalty,
                si.frequency_penalty, si.presence_penalty,
            ])
            (
                self.k_cache, self.v_cache, tokens, logprobs,
                self.last_tokens, self.token_hist, counts, tops,
            ) = self._decode_fn_packed(
                self.params,
                self.k_cache,
                self.v_cache,
                ints,
                floats,
                self.last_tokens,
                self.token_hist,
                b=b_pad,
                nb=int(inp.block_tables.shape[1]),
                with_maps=with_maps,
                use_penalties=use_penalties,
                num_top=num_top,
                need_logprobs=need_lp,
            )
            self._accumulate_loads(counts)
            return tokens, logprobs, rows, tops
        if self.draft_head is not None:
            (
                self.k_cache, self.v_cache, tokens, logprobs,
                self.last_tokens, self.token_hist, self.hidden_ring,
            ) = self._mtp_decode_fn(
                self.params,
                self.head_params,
                self.k_cache,
                self.v_cache,
                self._put_rows(inp, b_pad),
                self._put_rows(si, b_pad),
                self.last_tokens,
                self.token_hist,
                self.hidden_ring,
                use_penalties=use_penalties,
                need_logprobs=self._need_lp(seqs),
            )
            return tokens, logprobs, rows, (None, None)
        (
            self.k_cache, self.v_cache, tokens, logprobs, self.last_tokens,
            self.token_hist, counts, tops,
        ) = self._decode_fn(
            self.params,
            self.k_cache,
            self.v_cache,
            self._put_rows(inp, b_pad),
            self._put_rows(si, b_pad),
            self.last_tokens,
            self.token_hist,
            use_penalties=use_penalties,
            num_top=num_top,
            need_logprobs=need_lp,
        )
        self._accumulate_loads(counts)
        return tokens, logprobs, rows, tops

    # ------------------------------------------------------------------
    # EPLB: live load collection + weight shuffling
    # (reference EplbManager data flow llm_engine.cpp:994-1008 and
    # EplbExecutor, eplb_executor.h:29)
    # ------------------------------------------------------------------
    def _need_lp(self, seqs) -> bool:
        """Static logprobs flag for the batch: the exact logsumexp pass
        only runs when some request reports logprobs."""
        return any(
            seq.sampling_params.logprobs is not None for seq in seqs
        )

    def _num_top(self, seqs) -> int:
        """Static top-logprobs width for the batch: 0 or 20 (OpenAI cap)
        to bound compile variants."""
        want = max(
            (seq.sampling_params.logprobs or 0) for seq in seqs
        ) if seqs else 0
        return 20 if want > 0 else 0

    def _accumulate_loads(self, counts) -> None:
        if counts is None:
            return
        if self._expert_loads_acc is None:
            self._expert_loads_acc = counts
        else:
            self._expert_loads_acc = self._expert_loads_acc + counts

    def fetch_expert_loads(self):
        """-> accumulated per-layer PHYSICAL-slot loads [L, E] (host), or
        None; resets the window."""
        if self._expert_loads_acc is None:
            return None
        loads = np.asarray(self._expert_loads_acc)
        self._expert_loads_acc = None
        return loads


    # expert stacks the re-placer must move together (weights + any
    # weight-only quant scales; all have the expert dim at axis 1)
    _EXPERT_STACK_KEYS = (
        "experts_gate_up", "experts_down",
        "experts_gate_up_scale", "experts_down_scale",
    )

    def _reset_expert_placement(self) -> None:
        """After a weight swap the stacks are back in LOGICAL order: the
        host-tracked placement (relative-rebalance base) must reset or
        the next apply_expert_placement gathers per a stale map, and
        replica slots must re-expand (pushed stacks carry E rows while
        the EPLB manager's placement has E+R entries)."""
        self._host_expert_placement.clear()
        self._expand_redundant_experts()

    def _expand_redundant_experts(self) -> None:
        """Checkpoint stacks carry E logical experts; with
        redundant_experts > 0 gather them to E + R physical slots per the
        model's initial placement (the random-init path expands inside
        init_params)."""
        r = getattr(self.model, "num_redundant_experts", 0)
        if not r:
            return
        init = np.asarray(self.model.initial_expert_placement())
        for group in ("layers", "moe_layers"):
            lp = self.params.get(group)
            if not isinstance(lp, dict) or "experts_gate_up" not in lp:
                continue
            if lp["experts_gate_up"].shape[1] == len(init):
                continue
            idx = jnp.asarray(init)

            @jax.jit
            def expand(stack, idx=idx):
                # layer-at-a-time (donation can't apply — shapes grow),
                # bounding the transient to ONE layer's expanded stack
                # instead of a whole-model second copy (the same blowup
                # apply_expert_placement measured OOM at 8B-MoE scale)
                def one(li):
                    return jnp.take(stack[li], idx, axis=0)

                return jax.lax.map(one, jnp.arange(stack.shape[0]))

            lp = dict(lp)
            for key in self._EXPERT_STACK_KEYS:
                if key in lp:
                    lp[key] = expand(lp[key])
            lp["expert_placement"] = jnp.tile(
                idx, (lp["experts_gate_up"].shape[0], 1)
            )
            self.params = {**self.params, group: lp}
            logger.info(
                "expanded %s experts to %d physical slots (+%d replicas)",
                group, len(init), r,
            )

    def apply_expert_placement(
        self, placement: np.ndarray, group: str = "layers"
    ) -> None:
        """Re-place experts: stack slot s gets logical expert placement[l,s].

        One jitted gather over every expert stack (donated, stays on
        device) plus the router indirection update — the between-steps
        equivalent of the reference's async expert weight shuffling. The
        relative map (which CURRENT slot sources each new slot) is
        computed host-side from the tracked placement: with redundant
        slots (eplb_policy.h:30-56) the placement has repeats, so it is
        not an invertible permutation.
        """
        lp = self.params[group]
        cur = self._host_expert_placement.get(group)
        if cur is None:
            cur = np.asarray(lp["expert_placement"])
        placement = np.asarray(placement, np.int32)
        nl, ns = cur.shape
        e_log = int(cur.max()) + 1
        # first (any) current slot holding each logical expert
        first = np.full((nl, e_log), -1, np.int64)
        for layer in range(nl):
            first[layer, cur[layer, ::-1]] = np.arange(ns - 1, -1, -1)
        rel = np.take_along_axis(first, placement.astype(np.int64), axis=1)
        assert (rel >= 0).all(), "placement names an absent expert"
        rel_j = jnp.asarray(rel, jnp.int32)
        perm_j = jnp.asarray(placement, jnp.int32)

        @partial(jax.jit, donate_argnums=(0,))
        def permute(layers, rel, perm):
            # layer-at-a-time gather inside the donated buffers: a
            # whole-stack take_along_axis doubles expert HBM transiently
            # (an 8B-MoE rebalance measured 24.4 G > 15.75 G on chip);
            # per-layer the peak extra is ONE layer's stacks — the TPU
            # analog of the reference's buffered expert shuffling
            # (eplb_executor.h:29 shm expert buffers)
            def permute_stack(stack):
                def body(li, st):
                    layer = jnp.take(st[li], rel[li], axis=0)
                    return jax.lax.dynamic_update_index_in_dim(
                        st, layer, li, 0
                    )

                return jax.lax.fori_loop(0, stack.shape[0], body, stack)

            out = dict(layers)
            for key in self._EXPERT_STACK_KEYS:
                if key in layers:
                    out[key] = permute_stack(layers[key])
            out["expert_placement"] = perm
            return out

        layers = permute(lp, rel_j, perm_j)
        self.params = {**self.params, group: layers}
        self._host_expert_placement[group] = placement
        logger.info("applied EPLB expert placement (%s)", group)

    # ------------------------------------------------------------------
    # host-DRAM KV tier transfers (reference hierarchy_kv_cache_transfer,
    # HBM<->host offload/prefetch — Mooncake-lite over the host bus)
    # ------------------------------------------------------------------
    def init_host_kv(self, num_host_blocks: int) -> None:
        # shapes come from the LIVE cache arrays so latent families work:
        # MLA's v slot is a 1-d dummy (K/V share latent pages) and DSA's
        # holds the indexer-K cache — both ride the tier generically
        host_dt = np.float32 if self.model.dtype == jnp.float32 else np.float16
        k_shape = (self.k_cache.shape[0],) + self.k_cache.shape[2:]
        self.host_k = np.zeros((num_host_blocks,) + k_shape, host_dt)
        self._paged_v = self.v_cache.ndim == 5
        if self._paged_v:
            v_shape = (self.v_cache.shape[0],) + self.v_cache.shape[2:]
            self.host_v = np.zeros((num_host_blocks,) + v_shape, host_dt)
        else:
            self.host_v = np.zeros((num_host_blocks, 0), host_dt)
        paged_v = self._paged_v

        @partial(jax.jit, donate_argnums=(0, 1))
        def swapin(k_all, v_all, kc, vc, b):
            k_all = jax.lax.dynamic_update_slice_in_dim(
                k_all, kc[:, None], b, axis=1
            )
            if paged_v:
                v_all = jax.lax.dynamic_update_slice_in_dim(
                    v_all, vc[:, None], b, axis=1
                )
            return k_all, v_all

        self._swapin_fn = swapin
        logger.info("host KV tier: %d blocks", num_host_blocks)

    def swap_out_block(self, dev_block: int, host_idx: int) -> None:
        """HBM block -> host DRAM (synchronous device fetch)."""
        self.host_k[host_idx] = np.asarray(self.k_cache[:, dev_block])
        if self._paged_v:
            self.host_v[host_idx] = np.asarray(self.v_cache[:, dev_block])

    def write_host_block(
        self, host_idx: int, k_block: np.ndarray, v_block: np.ndarray
    ) -> None:
        """Fill a host-tier slot from wire bytes (global KV store fetch)."""
        self.host_k[host_idx] = k_block.astype(self.host_k.dtype, copy=False)
        if self._paged_v:
            self.host_v[host_idx] = v_block.astype(
                self.host_v.dtype, copy=False
            )

    def swap_in_block(self, host_idx: int, dev_block: int) -> None:
        """Host DRAM block -> HBM (async dispatch; ordered before reads)."""
        kc = jnp.asarray(self.host_k[host_idx], self.k_cache.dtype)
        vc = jnp.asarray(self.host_v[host_idx], self.v_cache.dtype)
        self.k_cache, self.v_cache = self._swapin_fn(
            self.k_cache, self.v_cache, kc, vc, np.int32(dev_block)
        )

    # ------------------------------------------------------------------
    # PD-disaggregation block movement (reference kv_cache_transfer
    # pull/push, mooncake_kv_cache_transfer.h:25 — host-staged on TPU)
    # ------------------------------------------------------------------
    def extract_blocks_async(self, block_ids: list[int]):
        """Start a device gather + async device->host copy of KV blocks.

        ONE jit gather + ONE host copy for the whole sequence (the old
        per-block np.asarray paid a full fetch round-trip per block); the
        returned handle materializes with ``np.asarray`` when the copy has
        landed, overlapping the transfer with continued serving — the
        TPU/DCN analog of the reference's layer-wise async KV push
        (llm_worker_impl.cpp:223-247).
        """
        if self._gather_blocks_fn is None:
            # MLA stores K and V in one latent page array; its v slot is a
            # 1-d dummy (or the DSA indexer-K cache) — gather paged arrays
            # only (reference: latent caches transfer as one tensor)
            paged_v = self.v_cache.ndim == 5

            @jax.jit
            def gather(k_all, v_all, ids):
                # -> [n, L, Hkv, bs, D]
                k = k_all[:, ids].swapaxes(0, 1)
                v = v_all[:, ids].swapaxes(0, 1) if paged_v else v_all
                return k, v

            self._gather_blocks_fn = gather
        # bucket the block count (bounded jit shapes); pad gathers the
        # null block and is sliced off at materialization
        n = len(block_ids)
        n_pad = 1
        while n_pad < n:
            n_pad *= 2
        ids = np.zeros(n_pad, np.int32)
        ids[:n] = block_ids
        k, v = self._gather_blocks_fn(
            self.k_cache, self.v_cache, jnp.asarray(ids)
        )
        k.copy_to_host_async()
        v.copy_to_host_async()
        return k, v, n

    def extract_blocks(
        self, block_ids: list[int]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Device KV blocks -> host arrays [n, L, Hkv, bs, D]."""
        k, v, n = self.extract_blocks_async(block_ids)
        return np.asarray(k)[:n], np.asarray(v)[:n]

    def inject_blocks(
        self, k_blocks: np.ndarray, v_blocks: np.ndarray, block_ids: list[int]
    ) -> None:
        """Host arrays -> device KV blocks in ONE batched scatter (async
        dispatch; XLA orders it before later cache reads)."""
        if self._inject_fn is None:
            paged_v = self.v_cache.ndim == 5

            @partial(jax.jit, donate_argnums=(0, 1))
            def inject(k_all, v_all, kc, vc, ids):
                k_all = k_all.at[:, ids].set(kc.swapaxes(0, 1))
                if paged_v:
                    v_all = v_all.at[:, ids].set(vc.swapaxes(0, 1))
                return k_all, v_all

            self._inject_fn = inject
        # pad the block count to a power-of-2 bucket (bounded jit shapes);
        # pad rows scatter harmlessly into the null block
        n = len(block_ids)
        n_pad = 1
        while n_pad < n:
            n_pad *= 2
        ids = np.zeros(n_pad, np.int32)
        ids[:n] = block_ids
        kc = np.zeros((n_pad,) + k_blocks.shape[1:], k_blocks.dtype)
        kc[:n] = k_blocks
        if self.v_cache.ndim == 5:
            vc = np.zeros((n_pad,) + v_blocks.shape[1:], v_blocks.dtype)
            vc[:n] = v_blocks
        else:  # MLA dummy v slot: pass it through untouched
            vc = np.asarray(self.v_cache)
        self.k_cache, self.v_cache = self._inject_fn(
            self.k_cache, self.v_cache,
            jnp.asarray(kc, self.k_cache.dtype),
            jnp.asarray(vc, self.v_cache.dtype),
            jnp.asarray(ids),
        )

    def seed_last_token(self, slot: int, token: int) -> None:
        """Write a token into the device ring (PD accept path)."""
        if self._seed_fn is None:
            self._seed_fn = jax.jit(
                lambda lt, s, t: lt.at[s].set(t), donate_argnums=(0,)
            )
        self.last_tokens = self._seed_fn(
            self.last_tokens, np.int32(slot), np.int32(token)
        )

    # ------------------------------------------------------------------
    # sleep / wakeup / weight update (RL rollouts; reference
    # SleepableAllocator platform/sleepable_allocator.h:41-112 and
    # engine sleep/wakeup + update_weights, engine.h:137-156)
    # ------------------------------------------------------------------
    def sleep(self, level: int = 1) -> None:
        """Free HBM: level 1 drops the KV cache, level 2 also the weights.

        TPU-native equivalent of deep sleep: deleting the backing jax
        arrays releases the HBM pages; virtual state (config, shapes,
        compiled programs) survives for wakeup.
        """
        for name in ("k_cache", "v_cache"):
            arr = getattr(self, name)
            if arr is not None:
                arr.delete()
                setattr(self, name, None)
        if level >= 2 and self.params is not None:
            jax.tree.map(lambda x: x.delete(), self.params)
            self.params = None
        logger.info("runner asleep (level %d)", level)

    def wakeup(self) -> None:
        """Reallocate what sleep() released (weights reload from disk)."""
        if self.params is None:
            self.load_model()
        if self.k_cache is None:
            self.initialize_kv_cache(self.num_blocks or None)
        logger.info("runner awake")

    def update_weights(
        self, model_path: str | None = None, params=None
    ) -> None:
        """Hot-swap weights from a checkpoint dir OR an in-memory pytree.

        ``params`` (host or device arrays matching the current tree
        structure) is the P2P/RL path: a trainer or peer instance pushes
        weights directly without touching disk (reference linked-instance
        weight transfer, engine.h:137-156 + Mooncake weight push)."""
        old = self.params
        self.params = None
        if old is not None and params is not old:
            jax.tree.map(lambda x: x.delete(), old)
        from xllm_tpu.parallel.mesh import make_named_shardings

        shardings = make_named_shardings(self.mesh, self.model.param_shardings())
        if params is not None:
            if shardings is not None:
                params = jax.tree.map(jax.device_put, params, shardings)
            else:
                params = jax.tree.map(jnp.asarray, params)
            self.params = params
            quantized_already = any(
                hasattr(x, "dtype")
                and x.dtype in (jnp.int8, jnp.float8_e4m3fn)
                for x in jax.tree.leaves(params)
            )
            if (
                self.config.quant.method in ("int8", "fp8_e4m3")
                and not quantized_already
            ):
                # trainer pushed full-precision weights into a
                # quantized-serving instance: re-quantize on ingest
                self.params = self._quantize_params(self.params)
            self._reset_expert_placement()
            logger.info("weights updated from pushed tensors")
            return
        if model_path:
            self.config.model.model_path = model_path
        from xllm_tpu.models.loader import load_params

        quant = self.config.quant.method in ("int8", "fp8_e4m3")
        self.params = load_params(
            self.config.model, shardings, dtype=self.model.dtype,
            stack_transform=(
                self._rolling_quantize_transform() if quant else None
            ),
        )
        if quant:
            self.params = self._quantize_params(self.params)
        self._reset_expert_placement()
        logger.info("weights updated from %s", self.config.model.model_path)

    def export_weights(self) -> dict:
        """Flatten params to {dotted-path: host ndarray} (the P2P wire
        format; reverse of the pushed-params update path)."""
        flat = {}

        def walk(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(f"{prefix}{k}/", v)
            else:
                flat[prefix[:-1]] = np.asarray(node)

        walk("", self.params)
        return flat

    def import_weights(self, flat: dict) -> None:
        """Install {dotted-path: ndarray} from export_weights on a peer."""

        def rebuild(prefix, node):
            if isinstance(node, dict):
                return {
                    k: rebuild(f"{prefix}{k}/", v) for k, v in node.items()
                }
            return flat[prefix[:-1]]

        tree = rebuild("", self.params)
        self.update_weights(params=tree)

    # ------------------------------------------------------------------
    # warmup: precompile all buckets (reference scheduler/profile/graph_warmup)
    # ------------------------------------------------------------------
    def warmup(self) -> float:
        """Compile every (bucket) shape ahead of serving.

        All dummy traffic writes into the reserved null block 0, so the
        real cache content is untouched.
        """
        t0 = time.perf_counter()
        sc = self.config.scheduler
        nb = self.max_blocks_per_seq
        key = jax.random.key(0)
        for s_pad in sc.prefill_token_buckets:
            if self.supports_batched_prefill:
                from xllm_tpu.runtime.input_builder import HIST_PAD

                binp = BatchedPrefillInput(
                    token_ids=np.zeros((1, s_pad), np.int32),
                    positions=np.zeros((1, s_pad), np.int32),
                    slot_mapping=np.zeros((1, s_pad), np.int32),
                    block_tables=np.zeros((1, nb), np.int32),
                    kv_lens=np.zeros(1, np.int32),
                    q_offsets=np.zeros(1, np.int32),
                    logits_idx=np.zeros(1, np.int32),
                    sample_slots=np.full(1, self.trash_slot, np.int32),
                    hist_slots=np.full(1, self.trash_slot, np.int32),
                    hist_pos=np.full((1, s_pad), HIST_PAD, np.int32),
                )
                si = SamplingInput(
                    temperature=np.zeros(1, np.float32),
                    top_k=np.zeros(1, np.int32),
                    top_p=np.ones(1, np.float32),
                    key=key,
                )
                (
                    self.k_cache, self.v_cache, tokens, _,
                    self.last_tokens, self.token_hist, _counts, _tops,
                ) = self._batched_prefill_fn(
                    self.params, self.k_cache, self.v_cache,
                    self._put(binp), self._put(si), self.last_tokens,
                    self.token_hist,
                )
                continue
            inp = PrefillInput(
                token_ids=np.zeros(s_pad, np.int32),
                positions=np.zeros(s_pad, np.int32),
                slot_mapping=np.zeros(s_pad, np.int32),
                block_table=np.zeros(nb, np.int32),
                kv_len=np.int32(1),
                q_offset=np.int32(0),
                logits_idx=np.int32(0),
            )
            si = SamplingInput(
                temperature=np.zeros(1, np.float32),
                top_k=np.zeros(1, np.int32),
                top_p=np.ones(1, np.float32),
                key=key,
            )
            (
                self.k_cache, self.v_cache, tokens, _, self.last_tokens,
                self.token_hist,
            ) = self._prefill_fn(
                self.params, self.k_cache, self.v_cache, self._put(inp),
                self._put(si), self.last_tokens, self.token_hist,
                np.int32(self.trash_slot), np.int32(self.trash_slot),
            )
        for b_pad in sc.decode_batch_buckets:
            # page maps present iff dp_size == 1, exactly like
            # build_decode_input — the warmup compile must hit the same
            # pytree structure the serving steps dispatch
            page_cum = page_seq = None
            if self.dp_size == 1:
                page_cum = np.zeros(b_pad + 1, np.int32)
                page_seq = np.full(b_pad * nb, b_pad - 1, np.int32)
            inp = DecodeInput(
                slot_ids=np.full(b_pad, self.trash_slot, np.int32),
                positions=np.zeros(b_pad, np.int32),
                slot_mapping=np.zeros(b_pad, np.int32),
                block_tables=np.zeros((b_pad, nb), np.int32),
                seq_lens=np.zeros(b_pad, np.int32),
                hist_positions=np.zeros(b_pad, np.int32),
                page_cum=page_cum,
                page_seq=page_seq,
            )
            si = SamplingInput(
                temperature=np.zeros(b_pad, np.float32),
                top_k=np.zeros(b_pad, np.int32),
                top_p=np.ones(b_pad, np.float32),
                key=key,
            )
            if self._packed_dispatch and self.draft_head is None:
                # warm the PRODUCTION program: serving dispatches the
                # packed variant (and the common need_logprobs=False
                # sampler variant)
                with_maps = page_cum is not None
                parts = [
                    inp.slot_ids, inp.positions, inp.slot_mapping,
                    inp.seq_lens, inp.hist_positions,
                    inp.block_tables.ravel(),
                ]
                if with_maps:
                    parts += [page_cum, page_seq]
                parts += [
                    si.top_k,
                    np.full(b_pad, -1, np.int32),
                    np.zeros(b_pad, np.int32),
                    np.zeros(b_pad, np.int32),
                    np.zeros(2, np.int32),
                ]
                ints = np.concatenate(parts)
                floats = np.stack([
                    si.temperature, si.top_p,
                    np.ones(b_pad, np.float32),
                    np.zeros(b_pad, np.float32),
                    np.zeros(b_pad, np.float32),
                ])
                for need_lp in (False, True):
                    (
                        self.k_cache, self.v_cache, tokens, _,
                        self.last_tokens, self.token_hist, _counts, _tops,
                    ) = self._decode_fn_packed(
                        self.params, self.k_cache, self.v_cache,
                        ints, floats, self.last_tokens, self.token_hist,
                        b=b_pad, nb=nb, with_maps=with_maps,
                        need_logprobs=need_lp,
                    )
                continue
            (
                self.k_cache, self.v_cache, tokens, _, self.last_tokens,
                self.token_hist, _counts, _tops,
            ) = self._decode_fn(
                self.params, self.k_cache, self.v_cache, self._put(inp),
                self._put(si), self.last_tokens, self.token_hist,
            )
        jax.block_until_ready(tokens)
        dt = time.perf_counter() - t0
        logger.info("warmup compiled all buckets in %.1fs", dt)
        return dt
