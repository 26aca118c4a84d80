"""Typed configuration for the engine.

The reference partitions 181 gflags into 17 config singletons
(reference xllm/core/framework/config/*.h, initialized at xllm/xllm.cpp:74-92).
Here the same knobs are typed dataclasses composed into one ``EngineConfig``;
groups that are NPU-/brpc-specific (rank tables, shm channels, ACL graphs)
have TPU-native replacements (mesh shape, jit bucket policy) instead.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field


def _bucket_list(max_value: int, start: int = 8) -> list[int]:
    """Power-of-two buckets up to max_value (inclusive).

    Mirrors the reference's graph-capture token buckets
    (reference xllm/core/runtime/acl_graph_executor_impl.h:172-175: sizes
    1/2/4/8 then multiples of 8 up to the max) — on TPU the bucket set is the
    set of compiled jit shapes, so we keep it logarithmic to bound compiles.
    """
    buckets = []
    b = start
    while b < max_value:
        buckets.append(b)
        b *= 2
    buckets.append(max_value)
    return buckets


@dataclass
class ModelConfig:
    """Model identity + architecture args parsed from HF config.json.

    Counterpart of the reference's ModelArgs / hf_model_loader
    (reference xllm/core/framework/hf_model_loader.h:32-59).
    """

    model_path: str = ""
    model_type: str = "qwen3"
    dtype: str = "bfloat16"

    # Architecture (filled from config.json by models.model_args.load_model_args)
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5504
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 0  # 0 -> hidden_size // num_attention_heads
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: dict | None = None
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # qwen2 uses qkv bias; qwen3/llama do not
    qk_norm: bool = False  # qwen3 per-head q/k RMSNorm
    partial_rotary_factor: float = 1.0  # glm4 ropes only the first half
    # partial-rope pair convention: True = interleaved even/odd pairs
    # (glm4, minimax-m2), False = llama rotate-half on the rotary slice
    # (glm4-moe). Full-dim rope ignores this (always rotate-half).
    rope_interleaved: bool = True
    use_sandwich_norms: bool = False  # glm4 post-attn/post-mlp extra norms
    sliding_window: int | None = None
    # MoE (qwen3-moe / deepseek style); 0 experts = dense
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = False
    decoder_sparse_step: int = 1
    mlp_only_layers: list[int] = field(default_factory=list)
    # MLA (deepseek)
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # DSA: deepseek-v3.2 sparse attention (reference deepseek_v32.h:224-232
    # — lightning indexer + per-query top-k token selection). 0 = dense.
    index_topk: int = 0
    index_n_heads: int = 64
    index_head_dim: int = 128
    # deepseek MoE structure
    first_k_dense_replace: int = 0
    n_shared_experts: int = 0
    routed_scaling_factor: float = 1.0
    # deepseek-v3 / kimi-k2 "noaux_tc" routing (sigmoid scores +
    # e_score_correction_bias + group-limited top-k)
    scoring_func: str = "softmax"
    n_group: int = 1
    topk_group: int = 1
    eos_token_ids: list[int] = field(default_factory=list)
    # qwen3-next hybrid GDN (linear attention) family
    full_attention_interval: int = 4
    linear_conv_kernel_dim: int = 4
    linear_key_head_dim: int = 128
    linear_num_key_heads: int = 16
    linear_value_head_dim: int = 128
    linear_num_value_heads: int = 32
    shared_expert_intermediate_size: int = 0
    # VLM (qwen2-vl family): vision tower config dict + M-RoPE sections
    # and the image placeholder token (reference vlm model registry rows)
    vision: dict | None = None
    mrope_section: list[int] = field(default_factory=list)
    image_token_id: int = -1
    video_token_id: int = -1
    vision_start_token_id: int = -1

    def __post_init__(self) -> None:
        if self.head_dim == 0:
            self.head_dim = self.hidden_size // self.num_attention_heads

    @property
    def num_kv_heads(self) -> int:
        return self.num_key_value_heads


@dataclass
class CacheConfig:
    """Paged KV cache sizing.

    Counterpart of the reference's KVCacheConfig + BlockManagerPool options
    (reference xllm/core/framework/block/block_manager_pool.h:27,
    kv_cache_estimation.*). TPU: the paged pool is a pre-allocated HBM array
    per layer; there is no VMM/xtensor trick (block tables already give
    non-contiguity, SURVEY.md §7.1).
    """

    block_size: int = 64  # tokens per block; multiple of dtype sublane tile
    num_blocks: int = 0  # 0 -> derived from memory_utilization at init
    # "split": separate K/V arrays [L, NB, Hkv, bs, D].
    # "interleaved": one array [L, NB, 2, Hkv, bs, D] — a page's K and V
    # are contiguous, so the decode/prefill kernels fetch both in ONE DMA
    # (halves the DMA issue count; the r5 layout lever, PERF.md). GQA
    # families only; MLA/hybrid models keep their own layouts.
    # "interleaved_rm": interleaved + row-major tail pages — incomplete
    # tail pages hold token-major content so decode persists each token
    # as one 4 KB tile instead of rewriting the page (v12 kernel; the
    # write-back was the measured decode residual). bf16/f32 caches with
    # 2*Hkv a multiple of 16 dividing block_size.
    kv_layout: str = "split"
    memory_utilization: float = 0.9
    kv_cache_dtype: str = "auto"  # auto|bfloat16|float32|int8|fp8_e4m3
    # int8 is the production 8-bit KV format on v5e (fp8's in-kernel
    # upcast measured 4x slower than the bytes it saves,
    # scripts/probe_r8_fp8kv.py); per-head scales fold into q / the
    # attention output outside the kernels (models/decoder.py)
    # int8-KV quantization step (code = round(x / scale)); defaults
    # cover qk-normed K (|K| <~ 4 rms units) and O(1) V activations.
    # Override per checkpoint, or install calibrated per-layer-per-head
    # arrays via model.set_kv_scales + runner rebuild.
    kv_scale_k: float = 4.0 / 127.0
    kv_scale_v: float = 4.0 / 127.0
    enable_prefix_cache: bool = True
    # block manager backend: "python" | "native" (C++ core) | "auto"
    # (native when the toolchain can build it — reference keeps this
    # subsystem in C++, SURVEY.md §2.4)
    block_backend: str = "auto"
    # host (CPU DRAM) tier, reference HierarchyBlockManagerPool
    # (xllm/core/framework/block/hierarchy_block_manager_pool.h:40)
    num_host_blocks: int = 0
    # global (cross-instance) KV block store URL — Mooncake-store analog
    # (reference kv_cache_store.h:26; disagg/kv_store.py). Requires
    # num_host_blocks > 0 (the host tier stages store traffic).
    kv_store_url: str = ""


@dataclass
class SchedulerConfig:
    """Continuous batching budget knobs.

    Counterpart of reference --max_tokens_per_batch/--max_seqs_per_batch and
    chunked prefill (reference xllm/core/scheduler/continuous_scheduler.*,
    chunked_prefill_scheduler.h:34).
    """

    max_seqs_per_batch: int = 256
    max_tokens_per_batch: int = 8192
    max_tokens_per_chunk_for_prefill: int = 2048
    enable_chunked_prefill: bool = True
    # async schedule overlap (reference --enable_schedule_overlap,
    # docs/en/features/async_schedule.md): sampled tokens feed the next step
    # on device; host fixes sequences up overlap_depth steps later.
    # Depth must cover the device->host fetch round-trip: the loop blocks
    # on step (t - depth)'s tokens, so steady-state TPOT is lower-bounded
    # by RTT / depth. This rig's tunnel RTT is ~27 ms — depth 2 capped
    # decode at ~13.5 ms/step regardless of device speed (the r4 bench
    # regression); 4 puts the wall at ~7 ms, below the device step.
    # Cost: token fixup (and stop detection) lags `depth` steps — bounded
    # overrun is already handled by trim_unfixed.
    enable_schedule_overlap: bool = True
    overlap_depth: int = 4
    # shallower drain while prefills are in flight: first tokens reach
    # the host ~overlap_depth_prefill dispatches after sampling instead
    # of inheriting the full decode-depth lag (TTFT vs the wall trade)
    overlap_depth_prefill: int = 2
    # latency-aware scheduling (reference --enable_latency_aware_schedule):
    # when > 0, prefill chunk budgets shrink to fit the predicted TTFT
    ttft_budget_ms: float = 0.0
    # scheduler policy (reference scheduler_factory.cpp:34-63):
    # "continuous" = decode-first + chunked prefill (default);
    # "mix" = one priority queue mixing P+D under a latency budget
    # (reference MixScheduler / ProSched, mix_scheduler.h:29)
    policy: str = "continuous"
    # per-step latency budget for the mix policy; work beyond the budget
    # (by predicted step time) waits for the next step. 0 = unbounded.
    step_latency_budget_ms: float = 0.0
    # zero-eviction admission (reference ZeroEvictionScheduler,
    # zero_eviction_scheduler.h:22-35): admit a prompt only if the pool can
    # hold its whole projected footprint, avoiding mid-stream preemption
    enable_zero_eviction: bool = False
    # preempt running offline requests at the next step boundary when an
    # interruption is published (reference --enable_forward_interruption,
    # interruption_bus.h:22, pd_ooc_scheduler.cpp:885-888)
    enable_forward_interruption: bool = False
    max_model_len: int = 0  # 0 -> model max_position_embeddings
    # decode-batch and prefill-length jit buckets (graph-mode equivalent)
    decode_batch_buckets: list[int] = field(default_factory=list)
    prefill_token_buckets: list[int] = field(default_factory=list)
    # rows (chunks) per batched-prefill dispatch (reference whole-batch
    # BatchInputBuilder, batch_input_builder.h:53); kept tiny to bound the
    # (P, S) jit-shape product
    prefill_row_buckets: list[int] = field(default_factory=list)

    def resolve_buckets(self) -> None:
        if not self.decode_batch_buckets:
            self.decode_batch_buckets = _bucket_list(self.max_seqs_per_batch)
        elif max(self.decode_batch_buckets) < self.max_seqs_per_batch:
            # the scheduler caps decode batches at max_seqs_per_batch; a
            # smaller largest bucket would overflow row assignment
            import logging

            logging.getLogger(__name__).warning(
                "max_seqs_per_batch=%d exceeds the largest decode batch "
                "bucket %d; clamping concurrency to the bucket",
                self.max_seqs_per_batch, max(self.decode_batch_buckets),
            )
            self.max_seqs_per_batch = max(self.decode_batch_buckets)
        if not self.prefill_token_buckets:
            self.prefill_token_buckets = _bucket_list(
                max(self.max_tokens_per_chunk_for_prefill, 128), start=128
            )
        # chunk budget must fit the largest compiled prefill shape
        self.max_tokens_per_chunk_for_prefill = min(
            self.max_tokens_per_chunk_for_prefill,
            max(self.prefill_token_buckets),
        )
        if not self.prefill_row_buckets:
            self.prefill_row_buckets = [1, 2, 4, 8]


@dataclass
class ParallelConfig:
    """Mesh shape for TP/DP/EP/CP.

    The reference factorizes world = dp x cp x tp with separate moe_ep/moe_tp
    groups (reference xllm/core/framework/parallel_state/parallel_args.h:31-226,
    collective_communicator.h:22-50). TPU-native: one jax.sharding.Mesh with
    named axes; collectives are inserted by GSPMD.
    """

    dp_size: int = 1
    tp_size: int = 1
    ep_size: int = 1
    cp_size: int = 1
    # multi-host (reference DistManager multi-node world,
    # dist_manager.cpp:145; jax.distributed is the rendezvous)
    num_nodes: int = 1
    node_rank: int = 0
    coordinator_address: str = ""  # host:port of process 0

    @property
    def world_size(self) -> int:
        return self.dp_size * self.cp_size * self.tp_size

    def mesh_shape(self) -> tuple[int, ...]:
        return (self.dp_size, self.cp_size, self.tp_size)


@dataclass
class QuantConfig:
    """Weight/KV quantization.

    Counterpart of reference quant_args from config.json + w8a8 kernels
    (reference xllm/core/framework/hf_model_loader.h:44, kernels cutlass w8a8).
    """

    method: str = ""  # ""|int8|fp8_e4m3  (weight-only for now)
    # per-channel scales are always used; group-wise later
    quantize_kv: bool = False


@dataclass
class SpeculativeConfig:
    """Speculative decoding (MTP/Eagle3/Suffix).

    Counterpart of reference SpeculativeEngine selection
    (reference xllm/core/distributed_runtime/speculative_engine.h:30,
    llm_master.cpp:47-51).
    """

    method: str = ""  # ""|mtp|eagle3|suffix|ngram
    draft_model_path: str = ""
    num_speculative_tokens: int = 0


@dataclass
class EplbConfig:
    """Expert-parallel load balancing (reference EplbManager/Policy/
    Executor, eplb_manager.h:28; engine hooks llm_engine.cpp:942-945)."""

    enable_eplb: bool = False
    rebalance_interval: int = 256  # engine steps per evaluation window
    imbalance_threshold: float = 1.25  # max/mean device load that triggers
    # extra physical expert slots holding REPLICAS of hot experts
    # (reference redundant_experts, eplb_policy.h:30-56): a single
    # too-hot expert that no permutation can fix splits its tokens
    # across replicas round-robin. num_experts + redundant_experts
    # should stay divisible by the EP axis size.
    redundant_experts: int = 0


@dataclass
class EngineConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    quant: QuantConfig = field(default_factory=QuantConfig)
    speculative: SpeculativeConfig = field(default_factory=SpeculativeConfig)
    eplb: EplbConfig = field(default_factory=EplbConfig)
    seed: int = 0
    enforce_eager: bool = False  # skip bucketing/jit caching (debug)
    # "auto": load safetensors from model_path; "dummy": random init (tests,
    # synthetic benchmarks — reference --load_format dummy equivalent)
    load_format: str = "auto"
    # online profiler output dir (reference --enable_online_profile +
    # /start_profile RPC; here a jax.profiler trace directory)
    profile_dir: str = "/tmp/xllm_trace"

    def __post_init__(self) -> None:
        if self.scheduler.max_model_len == 0:
            self.scheduler.max_model_len = self.model.max_position_embeddings
        self.scheduler.resolve_buckets()

    def to_json(self) -> str:
        """Startup config dump, reference xllm/xllm.cpp:412."""
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


def load_hf_config(model_path: str) -> dict:
    cfg_path = os.path.join(model_path, "config.json")
    with open(cfg_path) as f:
        return json.load(f)
