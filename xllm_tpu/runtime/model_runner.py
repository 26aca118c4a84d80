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

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xllm_tpu.config import EngineConfig
from xllm_tpu.framework.request import Sequence
from xllm_tpu.models.registry import create_model
from xllm_tpu.parallel.mesh import build_mesh, make_named_shardings, replicated
from xllm_tpu.runtime.forward_params import DecodeInput, PrefillInput, SamplingInput
from xllm_tpu.runtime.input_builder import (
    build_decode_input,
    build_prefill_input,
    build_sampling_arrays,
    build_verify_input,
)
from xllm_tpu.runtime.rejection_sampler import rejection_sample
from xllm_tpu.runtime.sampler import sample
from xllm_tpu.utils import cdiv, get_logger, next_bucket

logger = get_logger(__name__)


class ModelRunner:
    def __init__(self, config: EngineConfig, mesh=None):
        self.config = config
        self.model = create_model(config.model)
        self.mesh = mesh if mesh is not None else build_mesh(config.parallel)
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
        self.max_slots = config.scheduler.max_seqs_per_batch
        self.trash_slot = self.max_slots
        self.last_tokens = None
        self._key = None
        self._prefill_fn = None
        self._decode_fn = None
        self._embed_fn = None
        self._inject_fn = None
        self._seed_fn = None

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def load_model(self, params=None, rng: jax.Array | None = None) -> None:
        """Load weights (or random-init when no checkpoint path is given)."""
        shardings = make_named_shardings(self.mesh, self.model.param_shardings())
        if params is not None:
            self.params = params
        elif self.config.model.model_path and self.config.load_format != "dummy":
            from xllm_tpu.models.loader import load_params

            self.params = load_params(
                self.config.model, shardings, dtype=self.model.dtype
            )
        else:
            logger.info("no model_path: initializing random weights")
            params = self.model.init_params(rng or jax.random.key(self.config.seed))
            if shardings is not None:
                params = jax.tree.map(jax.device_put, params, shardings)
            self.params = params
        if self.config.quant.method == "int8":
            self.params = self._quantize_params(self.params)
        self._key = jax.random.key(self.config.seed)
        self.last_tokens = self._put(jnp.zeros(self.max_slots + 1, jnp.int32))
        self._build_step_fns()

    _QUANT_WEIGHTS = (
        "qkv_proj_w", "o_proj_w", "gate_proj_w", "up_proj_w", "down_proj_w",
    )

    def _quantize_params(self, params):
        """Weight-only INT8 on the decoder matmuls (reference quant_args
        flow, hf_model_loader.h:44). Embed/lm_head/norms stay bf16."""
        from xllm_tpu.ops.quant import quantize_int8

        if "layers" not in params:  # MLA stacks: int8 lands in a later round
            logger.warning("int8 quantization not yet wired for this family")
            return params
        layers = dict(params["layers"])
        for name in self._QUANT_WEIGHTS:
            if name in layers and layers[name].dtype != jnp.int8:
                wq, scale = jax.jit(quantize_int8)(layers[name])
                layers[name] = wq
                layers[name + "_scale"] = scale
        logger.info("quantized %s to int8", [
            n for n in self._QUANT_WEIGHTS if n in layers
        ])
        return {**params, "layers": layers}

    def initialize_kv_cache(self, num_blocks: int | None = None) -> int:
        """Allocate the paged pool; returns num_blocks.

        Counterpart of estimate_kv_cache_capacity + allocate_kv_cache
        (reference xllm/core/distributed_runtime/llm_engine.cpp:382,473).
        """
        self.num_blocks = num_blocks or self._derive_num_blocks()
        kv_dtype = self.model.dtype
        if self.config.cache.kv_cache_dtype not in ("auto", ""):
            kv_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
                self.config.cache.kv_cache_dtype
            ]
        k, v = self.model.new_kv_cache(self.num_blocks, self.block_size, kv_dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            sh = NamedSharding(self.mesh, self.model.kv_cache_sharding())
            k, v = jax.device_put(k, sh), jax.device_put(v, sh)
        self.k_cache, self.v_cache = k, v
        logger.info(
            "KV cache: %d blocks x %d tokens (%s)",
            self.num_blocks,
            self.block_size,
            kv_dtype.__name__ if hasattr(kv_dtype, "__name__") else kv_dtype,
        )
        return self.num_blocks

    def _derive_num_blocks(self) -> int:
        cfg = self.config
        if cfg.cache.num_blocks > 0:
            return cfg.cache.num_blocks
        tp = cfg.parallel.tp_size
        per_block_per_dev = max(
            self.model.kv_bytes_per_token() * self.block_size // max(tp, 1), 1
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

        @partial(jax.jit, donate_argnums=(1, 2, 5))
        def prefill_step(
            params, k_cache, v_cache, inp: PrefillInput, si, last_tokens, slot
        ):
            hidden, k_cache, v_cache = model.prefill(params, k_cache, v_cache, inp)
            logits = model.compute_logits(params, hidden)
            tokens, logprobs = sample(logits, si)
            # mid-prompt chunks pass slot = trash_slot
            last_tokens = last_tokens.at[slot].set(tokens[0])
            return k_cache, v_cache, tokens, logprobs, last_tokens

        @partial(jax.jit, donate_argnums=(1, 2, 5))
        def decode_step(
            params, k_cache, v_cache, inp: DecodeInput, si, last_tokens
        ):
            token_ids = last_tokens[inp.slot_ids]
            hidden, k_cache, v_cache = model.decode(
                params, k_cache, v_cache, inp, token_ids
            )
            logits = model.compute_logits(params, hidden)
            tokens, logprobs = sample(logits, si)
            last_tokens = last_tokens.at[inp.slot_ids].set(tokens)
            return k_cache, v_cache, tokens, logprobs, last_tokens

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

        self._prefill_fn = prefill_step
        self._decode_fn = decode_step
        self._verify_fn = verify_step

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _put(self, tree):
        if self.mesh is None:
            return tree
        rep = replicated(self.mesh)
        return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

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
        self.k_cache, self.v_cache, tokens, logprobs, self.last_tokens = (
            self._prefill_fn(
                self.params,
                self.k_cache,
                self.v_cache,
                self._put(inp),
                self._put(si),
                self.last_tokens,
                np.int32(slot),
            )
        )
        return tokens, logprobs, samples_token

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
        inp = build_decode_input(
            seqs,
            self.block_size,
            self.config.scheduler.decode_batch_buckets,
            self.max_blocks_per_seq,
            self.trash_slot,
        )
        b_pad = inp.slot_ids.shape[0]
        temperature, top_k, top_p = build_sampling_arrays(seqs, b_pad)
        si = SamplingInput(
            temperature=temperature, top_k=top_k, top_p=top_p, key=self._next_key()
        )
        self.k_cache, self.v_cache, tokens, logprobs, self.last_tokens = (
            self._decode_fn(
                self.params,
                self.k_cache,
                self.v_cache,
                self._put(inp),
                self._put(si),
                self.last_tokens,
            )
        )
        return tokens, logprobs

    # ------------------------------------------------------------------
    # EPLB weight shuffling (reference EplbExecutor, eplb_executor.h:29)
    # ------------------------------------------------------------------
    def apply_expert_placement(
        self, placement: np.ndarray, group: str = "layers"
    ) -> None:
        """Re-place experts: stack slot s gets logical expert placement[l,s].

        One jitted gather per expert stack (donated, stays on device) plus
        the router indirection update — the between-steps equivalent of the
        reference's async expert weight shuffling.
        """
        perm = jnp.asarray(placement, jnp.int32)

        @partial(jax.jit, donate_argnums=(0,))
        def permute(layers, perm):
            out = dict(layers)
            out["experts_gate_up"] = jnp.take_along_axis(
                layers["experts_gate_up"], perm[:, :, None, None], axis=1
            )
            out["experts_down"] = jnp.take_along_axis(
                layers["experts_down"], perm[:, :, None, None], axis=1
            )
            out["expert_placement"] = perm
            return out

        layers = permute(self.params[group], perm)
        self.params = {**self.params, group: layers}
        logger.info("applied EPLB expert placement (%s)", group)

    # ------------------------------------------------------------------
    # host-DRAM KV tier transfers (reference hierarchy_kv_cache_transfer,
    # HBM<->host offload/prefetch — Mooncake-lite over the host bus)
    # ------------------------------------------------------------------
    def init_host_kv(self, num_host_blocks: int) -> None:
        c = self.config.model
        shape = (
            num_host_blocks,
            c.num_hidden_layers,
            c.num_kv_heads,
            self.block_size,
            c.head_dim,
        )
        host_dt = np.float32 if self.model.dtype == jnp.float32 else np.float16
        self.host_k = np.zeros(shape, host_dt)
        self.host_v = np.zeros(shape, host_dt)

        @partial(jax.jit, donate_argnums=(0, 1))
        def swapin(k_all, v_all, kc, vc, b):
            k_all = jax.lax.dynamic_update_slice_in_dim(
                k_all, kc[:, None], b, axis=1
            )
            v_all = jax.lax.dynamic_update_slice_in_dim(
                v_all, vc[:, None], b, axis=1
            )
            return k_all, v_all

        self._swapin_fn = swapin
        logger.info("host KV tier: %d blocks", num_host_blocks)

    def swap_out_block(self, dev_block: int, host_idx: int) -> None:
        """HBM block -> host DRAM (synchronous device fetch)."""
        self.host_k[host_idx] = np.asarray(self.k_cache[:, dev_block])
        self.host_v[host_idx] = np.asarray(self.v_cache[:, dev_block])

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
    def extract_blocks(
        self, block_ids: list[int]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Device KV blocks -> host arrays [n, L, Hkv, bs, D]."""
        k = np.stack([np.asarray(self.k_cache[:, b]) for b in block_ids])
        v = np.stack([np.asarray(self.v_cache[:, b]) for b in block_ids])
        return k, v

    def inject_blocks(
        self, k_blocks: np.ndarray, v_blocks: np.ndarray, block_ids: list[int]
    ) -> None:
        """Host arrays -> device KV blocks (ordered before later reads)."""
        if self._inject_fn is None:

            @partial(jax.jit, donate_argnums=(0, 1))
            def inject(k_all, v_all, kc, vc, b):
                k_all = jax.lax.dynamic_update_slice_in_dim(
                    k_all, kc[:, None], b, axis=1
                )
                v_all = jax.lax.dynamic_update_slice_in_dim(
                    v_all, vc[:, None], b, axis=1
                )
                return k_all, v_all

            self._inject_fn = inject
        for i, b in enumerate(block_ids):
            kc = jnp.asarray(k_blocks[i], self.k_cache.dtype)
            vc = jnp.asarray(v_blocks[i], self.v_cache.dtype)
            self.k_cache, self.v_cache = self._inject_fn(
                self.k_cache, self.v_cache, kc, vc, np.int32(b)
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

    def update_weights(self, model_path: str | None = None) -> None:
        """Hot-swap weights from a checkpoint dir (reference engine.h:153)."""
        if model_path:
            self.config.model.model_path = model_path
        old = self.params
        self.params = None
        if old is not None:
            jax.tree.map(lambda x: x.delete(), old)
        from xllm_tpu.models.loader import load_params
        from xllm_tpu.parallel.mesh import make_named_shardings

        shardings = make_named_shardings(self.mesh, self.model.param_shardings())
        self.params = load_params(
            self.config.model, shardings, dtype=self.model.dtype
        )
        if self.config.quant.method == "int8":
            self.params = self._quantize_params(self.params)
        logger.info("weights updated from %s", self.config.model.model_path)

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
            self.k_cache, self.v_cache, tokens, _, self.last_tokens = (
                self._prefill_fn(
                    self.params, self.k_cache, self.v_cache, self._put(inp),
                    self._put(si), self.last_tokens, np.int32(self.trash_slot),
                )
            )
        for b_pad in sc.decode_batch_buckets:
            inp = DecodeInput(
                slot_ids=np.full(b_pad, self.trash_slot, np.int32),
                positions=np.zeros(b_pad, np.int32),
                slot_mapping=np.zeros(b_pad, np.int32),
                block_tables=np.zeros((b_pad, nb), np.int32),
                seq_lens=np.zeros(b_pad, np.int32),
            )
            si = SamplingInput(
                temperature=np.zeros(b_pad, np.float32),
                top_k=np.zeros(b_pad, np.int32),
                top_p=np.ones(b_pad, np.float32),
                key=key,
            )
            self.k_cache, self.v_cache, tokens, _, self.last_tokens = (
                self._decode_fn(
                    self.params, self.k_cache, self.v_cache, self._put(inp),
                    self._put(si), self.last_tokens,
                )
            )
        jax.block_until_ready(tokens)
        dt = time.perf_counter() - t0
        logger.info("warmup compiled all buckets in %.1fs", dt)
        return dt
