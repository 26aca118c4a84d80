"""Multi-host serving: rendezvous + per-step input broadcast.

Counterpart of the reference's multi-node stack — DistManager worker
spawning (dist_manager.cpp:145 setup_multi_node_workers), the
CollectiveService comm-id rendezvous (collective_service.cpp:43), and the
engine->worker ForwardInput fan-out (llm_engine.cpp:933-937). The
TPU-native collapse (SURVEY.md §2.7): ``jax.distributed.initialize`` is
the rendezvous, the (data, tp) mesh spans every process's devices over
ICI/DCN, and GSPMD inserts all collectives; what remains of the
reference's brpc plumbing is ONE primitive — broadcasting the host-built
step inputs from the driver process to the followers so every process
issues identical jit calls (the multi-controller contract).

Protocol: each step is two fabric broadcasts — a fixed-size int32 header
(kind + padded shapes, so followers can allocate matching buffers), then
the flat input arrays. The reference ships RawForwardInput over brpc/shm
per DP rank (remote_worker.cpp:176, shm_channel.h:23); here one broadcast
covers every process because GSPMD handles the per-device split.

Driver (process 0) runs the scheduler and API server; followers run
``FollowerEngine.run``. With one process everything degenerates to a
no-op passthrough, which is how the logic is unit-tested without a
cluster (tests/test_multihost.py).
"""

from __future__ import annotations

import numpy as np

import jax

from xllm_tpu.utils import get_logger

logger = get_logger(__name__)

STEP_DECODE = 1
STEP_PREFILL = 2
STEP_STOP = 3

_HDR = 8  # kind, a, b, c + reserved


def init_distributed(
    coordinator_address: str | None,
    num_processes: int = 1,
    process_id: int = 0,
) -> None:
    """Join the multi-host world (reference CollectiveService::Sync
    rendezvous, collective_service.cpp:43-90; the JAX coordinator plays
    the master role)."""
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "joined distributed world: process %d/%d, %d global devices",
        process_id, num_processes, len(jax.devices()),
    )


def is_driver() -> bool:
    return jax.process_index() == 0


def _bcast(tree):
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


class StepBroadcaster:
    """Driver-side announcements; no-ops in a single-process world.

    The header carries the per-batch STATIC jit flags (use_penalties,
    num_top, need_logprobs) — every process must select the same
    compiled variant or the GSPMD collectives desync (the reference
    ships the same flags inside RawForwardInput, remote_worker.cpp:176).
    """

    @property
    def active(self) -> bool:
        return jax.process_count() > 1

    def announce_decode(
        self, inp, si, use_penalties=False, num_top=0, need_logprobs=False
    ) -> None:
        if not self.active:
            return
        b_pad = int(inp.slot_ids.shape[0])
        nbt = int(inp.block_tables.shape[1])
        hdr = np.zeros(_HDR, np.int32)
        # hdr[3]: page maps present (dp_size == 1 inputs carry
        # DecodeInput.page_cum/page_seq — the pytree shape must match)
        hdr[:7] = (
            STEP_DECODE, b_pad, nbt, int(inp.page_cum is not None),
            int(use_penalties), int(num_top), int(need_logprobs),
        )
        _bcast(hdr)
        _bcast(tuple(jax.tree.leaves((inp, si))))

    def announce_prefill(
        self, inp, si, use_penalties=False, num_top=0, need_logprobs=False
    ) -> None:
        if not self.active:
            return
        p_pad, s_pad = (int(x) for x in inp.token_ids.shape)
        nbt = int(inp.block_tables.shape[1])
        hdr = np.zeros(_HDR, np.int32)
        hdr[:4] = (STEP_PREFILL, p_pad, s_pad, nbt)
        hdr[4:7] = (int(use_penalties), int(num_top), int(need_logprobs))
        _bcast(hdr)
        _bcast(tuple(jax.tree.leaves((inp, si))))

    def announce_stop(self) -> None:
        if not self.active:
            return
        hdr = np.zeros(_HDR, np.int32)
        hdr[0] = STEP_STOP
        _bcast(hdr)


def _zero_decode(b_pad: int, nbt: int, with_maps: bool = False):
    from xllm_tpu.runtime.forward_params import DecodeInput

    return DecodeInput(
        slot_ids=np.zeros(b_pad, np.int32),
        positions=np.zeros(b_pad, np.int32),
        slot_mapping=np.zeros(b_pad, np.int32),
        block_tables=np.zeros((b_pad, nbt), np.int32),
        seq_lens=np.zeros(b_pad, np.int32),
        hist_positions=np.zeros(b_pad, np.int32),
        page_cum=np.zeros(b_pad + 1, np.int32) if with_maps else None,
        page_seq=np.zeros(b_pad * nbt, np.int32) if with_maps else None,
    )


def _zero_prefill(p_pad: int, s_pad: int, nbt: int):
    from xllm_tpu.runtime.forward_params import BatchedPrefillInput

    from xllm_tpu.runtime.input_builder import HIST_PAD

    return BatchedPrefillInput(
        token_ids=np.zeros((p_pad, s_pad), np.int32),
        positions=np.zeros((p_pad, s_pad), np.int32),
        slot_mapping=np.zeros((p_pad, s_pad), np.int32),
        block_tables=np.zeros((p_pad, nbt), np.int32),
        kv_lens=np.zeros(p_pad, np.int32),
        q_offsets=np.zeros(p_pad, np.int32),
        logits_idx=np.zeros(p_pad, np.int32),
        sample_slots=np.zeros(p_pad, np.int32),
        hist_slots=np.zeros(p_pad, np.int32),
        hist_pos=np.full((p_pad, s_pad), HIST_PAD, np.int32),
    )


def _zero_sampling(n: int):
    from xllm_tpu.runtime.forward_params import SamplingInput

    return SamplingInput(
        temperature=np.zeros(n, np.float32),
        top_k=np.zeros(n, np.int32),
        top_p=np.zeros(n, np.float32),
        # raw uint32 key data, matching the driver's host-side key
        # counter (ModelRunner._next_key / sampler.as_key)
        key=np.zeros(2, np.uint32),
        seeds=np.zeros(n, np.int32),
        steps=np.zeros(n, np.int32),
        repetition_penalty=np.zeros(n, np.float32),
        frequency_penalty=np.zeros(n, np.float32),
        presence_penalty=np.zeros(n, np.float32),
        hist_len=np.zeros(n, np.int32),
    )


class FollowerEngine:
    """Follower-process loop: mirror the driver's jit dispatches.

    Every process holds the same ModelRunner (same mesh, same donated
    buffers); the driver broadcasts each step's host inputs, every process
    calls the identical jit function, and GSPMD keeps sharded state
    consistent.
    """

    def __init__(self, runner) -> None:
        self.runner = runner

    def run_one(self, hdr=None) -> bool:
        """Receive + execute one step; False on STOP. ``hdr`` injectable
        for the degenerate single-process test."""
        import jax.tree_util as jtu

        r = self.runner
        if hdr is None:
            hdr = np.asarray(_bcast(np.zeros(_HDR, np.int32)))
        kind = int(hdr[0])
        if kind == STEP_STOP:
            return False
        if kind == STEP_DECODE:
            b_pad, nbt = int(hdr[1]), int(hdr[2])
            proto = (
                _zero_decode(b_pad, nbt, with_maps=bool(hdr[3])),
                _zero_sampling(b_pad),
            )
            leaves = _bcast(tuple(jax.tree.leaves(proto)))
            inp, si = jtu.tree_unflatten(
                jtu.tree_structure(proto), list(leaves)
            )
            (
                r.k_cache, r.v_cache, _t, _l, r.last_tokens, r.token_hist,
                _c, _tops,
            ) = r._decode_fn(
                r.params, r.k_cache, r.v_cache,
                r._put_rows(inp, b_pad), r._put_rows(si, b_pad),
                r.last_tokens, r.token_hist,
                use_penalties=bool(hdr[4]), num_top=int(hdr[5]),
                need_logprobs=bool(hdr[6]),
            )
        elif kind == STEP_PREFILL:
            p_pad, s_pad, nbt = int(hdr[1]), int(hdr[2]), int(hdr[3])
            proto = (_zero_prefill(p_pad, s_pad, nbt), _zero_sampling(p_pad))
            leaves = _bcast(tuple(jax.tree.leaves(proto)))
            inp, si = jtu.tree_unflatten(
                jtu.tree_structure(proto), list(leaves)
            )
            # placement must MATCH the driver's (input shardings select
            # the compiled executable — a replicated follower put against
            # a cp-sharded driver put desyncs the collectives and hangs)
            inp_put, si_put = r._put_prefill(inp, si, p_pad)
            (
                r.k_cache, r.v_cache, _t, _l, r.last_tokens, r.token_hist,
                _c, _tops,
            ) = r._batched_prefill_fn(
                r.params, r.k_cache, r.v_cache,
                inp_put, si_put,
                r.last_tokens, r.token_hist,
                use_penalties=bool(hdr[4]), num_top=int(hdr[5]),
                need_logprobs=bool(hdr[6]),
            )
        return True

    def run(self) -> None:
        while self.run_one():
            pass
        logger.info("follower: stop")
