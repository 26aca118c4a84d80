"""Host-side forward-input assembly (numpy, allocation-light).

Counterpart of the reference's BatchInputBuilder
(reference xllm/core/framework/batch/batch_input_builder.h:53): turns
scheduled Sequences + their block tables into padded device inputs. Padding
goes to jit buckets — the shape-bucketing that replaces the reference's
multi-graph capture cache (acl_graph_executor_impl.h:67-77).
"""

from __future__ import annotations

import numpy as np

from xllm_tpu.framework.request import Sequence
from xllm_tpu.runtime.forward_params import DecodeInput, PrefillInput
from xllm_tpu.utils import next_bucket


def _np(x, dtype=np.int32):
    return np.asarray(x, dtype=dtype)


def build_prefill_input(
    seq: Sequence,
    num_new_tokens: int,
    block_size: int,
    token_buckets: list[int],
    num_block_table_cols: int,
) -> tuple[PrefillInput, bool]:
    """Build one sequence's prompt-chunk input.

    Returns (input, samples_token): samples_token is True when the chunk
    reaches the last known token, so the returned sample is a real next
    token (otherwise it is discarded — same contract as the reference's
    chunked prefill, chunked_prefill_scheduler.h:34).
    """
    start = seq.num_computed_tokens
    end = start + num_new_tokens
    assert end <= seq.num_tokens
    s_pad = next_bucket(token_buckets, num_new_tokens)

    token_ids = np.zeros(s_pad, np.int32)
    token_ids[:num_new_tokens] = seq.token_ids[start:end]
    positions = np.full(s_pad, max(end - 1, 0), np.int32)
    positions[:num_new_tokens] = np.arange(start, end, dtype=np.int32)
    slot_mapping = np.zeros(s_pad, np.int32)
    for i, pos in enumerate(range(start, end)):
        slot_mapping[i] = seq.block_ids[pos // block_size] * block_size + (
            pos % block_size
        )
    block_table = np.zeros(num_block_table_cols, np.int32)
    block_table[: len(seq.block_ids)] = seq.block_ids

    inp = PrefillInput(
        token_ids=token_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        block_table=block_table,
        kv_len=_np(end),
        q_offset=_np(start),
        logits_idx=_np(num_new_tokens - 1),
    )
    return inp, end == seq.num_tokens


def build_decode_input(
    seqs: list[Sequence],
    block_size: int,
    batch_buckets: list[int],
    num_block_table_cols: int,
    trash_slot: int,
) -> DecodeInput:
    """Padded rows point at the trash slot of the last_tokens ring."""
    b = len(seqs)
    b_pad = next_bucket(batch_buckets, b)
    slot_ids = np.full(b_pad, trash_slot, np.int32)
    positions = np.zeros(b_pad, np.int32)
    slot_mapping = np.zeros(b_pad, np.int32)
    block_tables = np.zeros((b_pad, num_block_table_cols), np.int32)
    seq_lens = np.zeros(b_pad, np.int32)
    for i, seq in enumerate(seqs):
        pos = seq.num_tokens - 1
        slot_ids[i] = seq.slot_id
        positions[i] = pos
        slot_mapping[i] = seq.block_ids[pos // block_size] * block_size + (
            pos % block_size
        )
        nb = len(seq.block_ids)
        block_tables[i, :nb] = seq.block_ids
        seq_lens[i] = seq.num_tokens
    return DecodeInput(
        slot_ids=slot_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        block_tables=block_tables,
        seq_lens=seq_lens,
    )


def build_verify_input(
    seq: Sequence,
    draft_tokens: list[int],
    block_size: int,
    num_block_table_cols: int,
) -> PrefillInput:
    """Speculative-verify chunk: [last_token, draft_1..draft_k].

    Requires the invariant num_computed == num_tokens - 1 (the last token
    was sampled but its KV not yet computed) and k+1 tokens of block
    capacity already allocated. Shapes are exact (k+1 rows, no bucket
    padding) — one compiled program per spec_k.
    """
    start = seq.num_computed_tokens
    assert start == seq.num_tokens - 1, "verify needs sample-then-compute state"
    chunk = [seq.token_ids[start], *draft_tokens]
    s = len(chunk)
    positions = np.arange(start, start + s, dtype=np.int32)
    slot_mapping = np.asarray(
        [
            seq.block_ids[p // block_size] * block_size + p % block_size
            for p in range(start, start + s)
        ],
        np.int32,
    )
    block_table = np.zeros(num_block_table_cols, np.int32)
    block_table[: len(seq.block_ids)] = seq.block_ids
    return PrefillInput(
        token_ids=_np(chunk),
        positions=positions,
        slot_mapping=slot_mapping,
        block_table=block_table,
        kv_len=_np(start + s),
        q_offset=_np(start),
        logits_idx=_np(s - 1),
    )


def build_sampling_arrays(
    seqs: list[Sequence], n_pad: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (temperature, top_k, top_p) padded to n_pad (pad rows = greedy)."""
    temperature = np.zeros(n_pad, np.float32)
    top_k = np.zeros(n_pad, np.int32)
    top_p = np.ones(n_pad, np.float32)
    for i, seq in enumerate(seqs):
        sp = seq.sampling_params
        temperature[i] = sp.temperature
        top_k[i] = max(sp.top_k, 0)
        top_p[i] = sp.top_p
    return temperature, top_k, top_p
