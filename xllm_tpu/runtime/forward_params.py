"""Device-side forward inputs.

Counterpart of the reference's ForwardInput/RawForwardInput
(reference xllm/core/framework/batch/batch_input_builder.h:53,
xllm/core/framework/model/model_input_params.h). Two static shapes exist per
engine step — one for the prefill call, one for the decode call — each padded
to a jit bucket so the set of compiled programs stays bounded (the TPU
equivalent of the reference's multi-graph capture cache,
xllm/core/runtime/acl_graph_executor_impl.h:61-177).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class PrefillInput:
    """One sequence's prompt chunk, padded to a token bucket.

    All tokens belong to a single sequence (batched ragged prefill arrives
    with the Pallas ragged kernel). ``kv_len`` counts all KV tokens of the
    sequence *including* this chunk; ``positions[0] == kv_len - num_actual``.
    """

    token_ids: jnp.ndarray  # [S] int32
    positions: jnp.ndarray  # [S] int32 (padding repeats last position)
    slot_mapping: jnp.ndarray  # [S] int32 (padding -> 0 = null block)
    block_table: jnp.ndarray  # [NB] int32
    kv_len: jnp.ndarray  # [] int32
    q_offset: jnp.ndarray  # [] int32: absolute position of token 0
    logits_idx: jnp.ndarray  # [] int32: row of last real token


@jax.tree_util.register_dataclass
@dataclass
class BatchedPrefillInput:
    """P prompt chunks — one per sequence — in one dispatch.

    Counterpart of the reference's whole-batch ForwardInput built by
    BatchInputBuilder (reference
    xllm/core/framework/batch/batch_input_builder.h:53): the per-sequence
    prefill loop lives in the kernel grid, not in Python. Rows are padded
    to a (P, S) bucket pair; padded rows carry kv_len == 0.
    """

    token_ids: jnp.ndarray  # [P, S] int32
    positions: jnp.ndarray  # [P, S] int32
    slot_mapping: jnp.ndarray  # [P, S] int32 (pad -> 0 = null block)
    block_tables: jnp.ndarray  # [P, NB] int32
    kv_lens: jnp.ndarray  # [P] int32 (incl. chunk; 0 = padded row)
    q_offsets: jnp.ndarray  # [P] int32 chunk start position
    logits_idx: jnp.ndarray  # [P] int32 row of last real token in chunk
    sample_slots: jnp.ndarray  # [P] int32 last_tokens ring slot (pad/mid ->
    # trash slot: the sampled token is discarded)
    hist_slots: jnp.ndarray  # [P] int32 token-history ring row (every real
    # chunk records its tokens, mid-prompt included; pad -> trash row)
    # history-ring column per token: the absolute TOKEN index for real
    # entries, out-of-bounds sentinel for pads (scatter mode="drop").
    # Built host-side because the column order may be zigzag-permuted
    # under cp — the jit cannot infer real-vs-pad from logits_idx there
    hist_pos: jnp.ndarray | None = None  # [P, S] int32
    # VLM embedding-override path (reference mm-embedding splicing,
    # mm_handler.h:31,104): rows where extra_mask is set take their input
    # embedding from extra_embeds instead of the token embedding table
    extra_embeds: jnp.ndarray | None = None  # [P, S, D]
    extra_mask: jnp.ndarray | None = None  # [P, S] bool
    # M-RoPE explicit (t, h, w) position ids (qwen2-vl prefill rows)
    mrope_positions: jnp.ndarray | None = None  # [P, 3, S] int32
    # DeepStack (qwen3-vl, reference oxygen.h:36-95): map k is added to
    # the hidden states at image rows after decoder layer k
    deepstack_embeds: jnp.ndarray | None = None  # [K, P, S, D]


@jax.tree_util.register_dataclass
@dataclass
class DecodeInput:
    """One decode step for a padded batch of sequences (1 token each).

    Token values are NOT part of the input: each row's input token is read
    on device from the runner's ``last_tokens`` ring via ``slot_ids`` —
    the device-resident feedback that lets the host dispatch step i+1
    before fetching step i's sampled tokens (the reference's async
    schedule-overlap, xllm/core/scheduler/continuous_scheduler.cpp:1293,
    with fake-token fixup llm_engine.cpp:979 — here the "fake" token is
    simply never materialized on host).
    """

    slot_ids: jnp.ndarray  # [B] int32 index into last_tokens (pad -> trash)
    positions: jnp.ndarray  # [B] int32 rope position (token index +
    # rope_offset for M-RoPE text continuation)
    slot_mapping: jnp.ndarray  # [B] int32
    block_tables: jnp.ndarray  # [B, NB] int32
    seq_lens: jnp.ndarray  # [B] int32 (0 for padded rows)
    # un-offset token index (num_tokens - 1) for the history ring — the
    # rope position is the wrong key for VLM rows (rope_offset != 0)
    hist_positions: jnp.ndarray | None = None  # [B] int32
    # host-precomputed page maps for the decode-attention global page ring
    # (ops/pallas/decode_attention v5/v6): cumulative page counts [B+1] and
    # owning sequence of each global page [B*NB]. Computing these on device
    # put a jnp.searchsorted (a sequential binary-search loop on TPU) inside
    # EVERY layer of the decode scan — the r2->r3 "v6 regression" was this
    # prep, not the kernel.
    page_cum: jnp.ndarray | None = None  # [B+1] int32
    page_seq: jnp.ndarray | None = None  # [B*NB] int32


@jax.tree_util.register_dataclass
@dataclass
class SamplingInput:
    """Per-row sampling parameters for the fused on-device sampler.

    Counterpart of the reference SamplingParameters
    (xllm/core/framework/sampling/sampling_params.h).
    """

    temperature: jnp.ndarray  # [N] f32 (0 = greedy)
    top_k: jnp.ndarray  # [N] int32 (0 = disabled)
    top_p: jnp.ndarray  # [N] f32 (1.0 = disabled)
    key: jnp.ndarray  # PRNG key
    # per-request reproducible sampling (reference per-request seed)
    seeds: jnp.ndarray | None = None  # [N] int32 (-1 = unseeded)
    steps: jnp.ndarray | None = None  # [N] int32 tokens generated so far
    # penalties (reference sampler.cpp:29 penalty logits pass); applied on
    # the pruned candidate set against the device token-history ring
    repetition_penalty: jnp.ndarray | None = None  # [N] f32 (1.0 = off)
    frequency_penalty: jnp.ndarray | None = None  # [N] f32
    presence_penalty: jnp.ndarray | None = None  # [N] f32
    hist_len: jnp.ndarray | None = None  # [N] int32 valid history length
