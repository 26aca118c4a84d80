"""DecodeStepCache: incremental build must equal the full build.

Simulates the engine's decode-loop contract over many steps with block
growth, membership churn (finish/join), seeded rows, and bucket jumps,
asserting field-exact equality against a fresh full build every step.
"""

import numpy as np
import pytest

from xllm_tpu.framework.request import Sequence, StoppingChecker
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.runtime.input_builder import (
    DecodeStepCache,
    build_decode_input,
    build_sampling_input,
)

BS = 4  # block size
BUCKETS = [4, 8, 16]
NB_BUCKETS = [2, 4, 8, 16, 32, 64, 128, 256]
MAX_COLS = 256
TRASH = 99


def _mk_seq(rng, ntok, slot, seed=None):
    sp = SamplingParams(
        temperature=float(rng.uniform(0, 1.5)),
        top_k=int(rng.choice([-1, 5, 20])),
        top_p=float(rng.uniform(0.5, 1.0)),
        seed=seed,
        repetition_penalty=float(rng.choice([1.0, 1.2])),
        max_tokens=512,
    )
    seq = Sequence(
        list(rng.integers(1, 100, size=ntok)),
        sp,
        StoppingChecker(max_new_tokens=512, max_model_len=1024),
    )
    seq.slot_id = slot
    nb = -(-ntok // BS)
    seq.block_ids = list(rng.integers(0, 64, size=nb))
    seq.num_computed_tokens = ntok - 1
    return seq


def _advance(rng, seq):
    """One engine decode step's worth of sequence mutation."""
    seq.token_ids.append(int(rng.integers(1, 100)))
    seq.num_fixed_tokens = len(seq.token_ids)
    seq.num_computed_tokens += 1
    while len(seq.block_ids) * BS < seq.num_tokens:
        seq.block_ids.append(int(rng.integers(0, 64)))


def _full(seqs, key):
    inp, rows = build_decode_input(
        seqs, BS, BUCKETS, MAX_COLS, TRASH, NB_BUCKETS
    )
    si, up = build_sampling_input(seqs, inp.slot_ids.shape[0], rows, key)
    return inp, rows, si, up


def _assert_equal(a, b):
    for f in (
        "slot_ids", "positions", "slot_mapping", "block_tables",
        "seq_lens", "hist_positions", "page_cum", "page_seq",
    ):
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f
        )


def _assert_si_equal(a, b):
    for f in (
        "temperature", "top_k", "top_p", "seeds", "steps",
        "repetition_penalty", "frequency_penalty", "presence_penalty",
        "hist_len",
    ):
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f
        )


def test_incremental_matches_full_over_steps():
    rng = np.random.default_rng(0)
    cache = DecodeStepCache()
    seqs = [
        _mk_seq(rng, int(rng.integers(3, 30)), slot=i,
                seed=(7 if i % 3 == 0 else None))
        for i in range(6)
    ]
    key = np.array([0, 1], np.uint32)
    for step in range(200):
        inp_c, rows_c, si_c, up_c = cache.build(
            seqs, BS, BUCKETS, MAX_COLS, TRASH, NB_BUCKETS, key
        )
        inp_f, rows_f, si_f, up_f = _full(seqs, key)
        assert rows_c == rows_f
        assert up_c == up_f
        _assert_equal(inp_c, inp_f)
        _assert_si_equal(si_c, si_f)
        # steps must track num_generated for seeded rows (sampler
        # reproducibility contract)
        for seq, r in zip(seqs, rows_c):
            if seq.sampling_params.seed is not None:
                assert si_c.steps[r] == seq.num_generated_tokens
        # mutate like the engine does
        for seq in seqs:
            _advance(rng, seq)
        # membership churn every few steps
        if step % 17 == 5 and len(seqs) > 2:
            seqs.pop(int(rng.integers(0, len(seqs))))
        if step % 23 == 7:
            seqs.append(
                _mk_seq(rng, int(rng.integers(3, 40)),
                        slot=10 + step, seed=None)
            )


def test_anomalous_advance_falls_back():
    rng = np.random.default_rng(1)
    cache = DecodeStepCache()
    seqs = [_mk_seq(rng, 10, slot=0), _mk_seq(rng, 11, slot=1)]
    key = np.array([0, 1], np.uint32)
    cache.build(seqs, BS, BUCKETS, MAX_COLS, TRASH, NB_BUCKETS, key)
    # a verify step advanced one seq by 3 tokens
    for _ in range(3):
        _advance(rng, seqs[0])
    _advance(rng, seqs[1])
    inp_c, rows_c, si_c, _ = cache.build(
        seqs, BS, BUCKETS, MAX_COLS, TRASH, NB_BUCKETS, key
    )
    inp_f, rows_f, si_f, _ = _full(seqs, key)
    _assert_equal(inp_c, inp_f)
    _assert_si_equal(si_c, si_f)


def test_in_place_arrays_not_mutated():
    """Previous step's arrays may back an in-flight dispatch."""
    rng = np.random.default_rng(2)
    cache = DecodeStepCache()
    seqs = [_mk_seq(rng, 7, slot=0)]
    key = np.array([0, 1], np.uint32)
    inp0, _, si0, _ = cache.build(
        seqs, BS, BUCKETS, MAX_COLS, TRASH, NB_BUCKETS, key
    )
    snap = {
        "positions": inp0.positions.copy(),
        "block_tables": inp0.block_tables.copy(),
        "steps": si0.steps.copy(),
    }
    for _ in range(10):
        _advance(rng, seqs[0])
        cache.build(seqs, BS, BUCKETS, MAX_COLS, TRASH, NB_BUCKETS, key)
    np.testing.assert_array_equal(inp0.positions, snap["positions"])
    np.testing.assert_array_equal(inp0.block_tables, snap["block_tables"])
    np.testing.assert_array_equal(si0.steps, snap["steps"])
