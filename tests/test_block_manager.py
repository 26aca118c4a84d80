"""Block manager + prefix cache unit tests.

Mirrors the reference's host-side block tests
(reference tests/core/framework/block/*, tests/core/framework/prefix_cache/*).
"""

import pytest

from xllm_tpu.framework.block_manager import BlockManager
from xllm_tpu.framework.request import Sequence, StoppingChecker
from xllm_tpu.framework.sampling_params import SamplingParams


def make_seq(tokens):
    sp = SamplingParams(max_tokens=4)
    stop = StoppingChecker(max_new_tokens=4, max_model_len=1024)
    return Sequence(list(tokens), sp, stop)


def test_allocate_and_free():
    bm = BlockManager(num_blocks=8, block_size=4, enable_prefix_cache=False)
    assert bm.num_free_blocks == 7  # block 0 reserved
    seq = make_seq(range(10))
    assert bm.allocate(seq, 10)  # 10 tokens -> 3 blocks
    assert len(seq.block_ids) == 3
    assert bm.num_free_blocks == 4
    assert 0 not in seq.block_ids
    bm.free(seq)
    assert bm.num_free_blocks == 7
    assert seq.block_ids == []


def test_allocate_insufficient():
    bm = BlockManager(num_blocks=4, block_size=4)
    seq = make_seq(range(20))
    assert not bm.allocate(seq, 20)  # needs 5 blocks, only 3 free
    assert seq.block_ids == []


def test_incremental_allocate():
    bm = BlockManager(num_blocks=8, block_size=4)
    seq = make_seq(range(4))
    assert bm.allocate(seq, 4)
    assert len(seq.block_ids) == 1
    seq.num_computed_tokens = 4
    # decode: one more token needs a new block
    assert bm.allocate(seq, 1)
    assert len(seq.block_ids) == 2


def test_prefix_cache_hit_and_refcount():
    bm = BlockManager(num_blocks=16, block_size=4)
    seq1 = make_seq(range(100, 109))  # 9 tokens -> 2 full blocks + tail
    assert bm.allocate(seq1, 9)
    seq1.num_computed_tokens = 9
    bm.cache_computed_blocks(seq1)

    seq2 = make_seq(range(100, 109))
    matched = bm.match_prefix(seq2)
    assert matched == 8  # 2 full blocks
    assert seq2.block_ids == seq1.block_ids[:2]
    assert bm.ref_counts[seq1.block_ids[0]] == 2

    bm.free(seq1)
    # shared blocks still referenced by seq2
    assert bm.ref_counts[seq2.block_ids[0]] == 1
    bm.free(seq2)
    assert bm.num_free_blocks == 15


def test_prefix_cache_never_matches_full_prompt():
    bm = BlockManager(num_blocks=16, block_size=4)
    seq1 = make_seq(range(8))  # exactly 2 blocks
    assert bm.allocate(seq1, 8)
    seq1.num_computed_tokens = 8
    bm.cache_computed_blocks(seq1)
    bm.free(seq1)

    seq2 = make_seq(range(8))
    matched = bm.match_prefix(seq2)
    assert matched == 4  # only 1 block: one token must remain to compute


def test_lru_eviction_of_cached_blocks():
    bm = BlockManager(num_blocks=4, block_size=4)  # 3 usable
    seq1 = make_seq(range(50, 59))
    assert bm.allocate(seq1, 9)
    seq1.num_computed_tokens = 9
    bm.cache_computed_blocks(seq1)
    bm.free(seq1)
    assert len(bm.cached_blocks) == 2

    # new allocation evicts the oldest freed blocks
    seq2 = make_seq(range(200, 212))
    assert bm.allocate(seq2, 12)
    assert len(seq2.block_ids) == 3
    # all cached content evicted (3 blocks reused)
    seq3 = make_seq(range(50, 59))
    bm.free(seq2)
    assert bm.match_prefix(seq3) == 0


def test_freed_cached_block_rematch_removes_from_free_lru():
    bm = BlockManager(num_blocks=8, block_size=4)
    seq1 = make_seq(range(10, 19))
    assert bm.allocate(seq1, 9)
    seq1.num_computed_tokens = 9
    bm.cache_computed_blocks(seq1)
    bm.free(seq1)
    free_before = bm.num_free_blocks
    seq2 = make_seq(range(10, 19))
    assert bm.match_prefix(seq2) == 8
    assert bm.num_free_blocks == free_before - 2
    bm.free(seq2)


def test_slot_for_token():
    bm = BlockManager(num_blocks=8, block_size=4)
    seq = make_seq(range(6))
    assert bm.allocate(seq, 6)
    b0, b1 = seq.block_ids
    assert bm.slot_for_token(seq, 0) == b0 * 4
    assert bm.slot_for_token(seq, 5) == b1 * 4 + 1


def test_double_free_assertion():
    bm = BlockManager(num_blocks=8, block_size=4)
    seq = make_seq(range(4))
    assert bm.allocate(seq, 4)
    bids = list(seq.block_ids)
    bm.free(seq)
    seq.block_ids = bids
    with pytest.raises(AssertionError):
        bm.free(seq)


def test_sliding_window_release_bounds_kv():
    """Sliding-window page recycling (reference SlidingWindowBlockManager):
    a window-attention model generating far past its window keeps only
    ~window tokens of KV live, and the recycled pages don't change the
    output vs an unbounded pool."""
    import numpy as np

    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    def cfg(num_blocks):
        return EngineConfig(
            model=ModelConfig(
                model_type="llama", dtype="float32", vocab_size=97,
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                sliding_window=16, max_position_embeddings=512,
                eos_token_ids=[0],
            ),
            cache=CacheConfig(block_size=4, num_blocks=num_blocks,
                              enable_prefix_cache=False),
            scheduler=SchedulerConfig(
                max_seqs_per_batch=2, max_tokens_per_chunk_for_prefill=32,
                max_model_len=512, decode_batch_buckets=[2],
                prefill_token_buckets=[8, 32],
            ),
        )

    rng = np.random.default_rng(5)
    prompt = [int(x) for x in rng.integers(1, 90, 24)]
    sp = SamplingParams(temperature=0.0, max_tokens=96, ignore_eos=True)

    def run(num_blocks):
        eng = LLMEngine(cfg(num_blocks))
        eng.add_request(prompt_token_ids=prompt, sampling_params=sp,
                        request_id="w")
        peak = 0
        outs = []
        while eng.has_unfinished():
            for o in eng.step():
                if o.finished:
                    outs.append(o)
            peak = max(peak, eng.block_manager.num_used_blocks)
        assert eng.block_manager.num_used_blocks == 0
        return outs[0].outputs[0].token_ids, peak

    # 24 prompt + 96 generated = 120 tokens = 30 pages unbounded; a
    # 16-block pool (15 usable) only works if out-of-window pages recycle
    toks_small, peak_small = run(16)
    toks_big, peak_big = run(64)
    assert toks_small == toks_big
    assert len(toks_small) == 96
    # live pages stay near the window footprint (window 16 tokens = 4
    # pages + the growing tail page + fixup lag slack)
    assert peak_small <= 10, peak_small


def test_sliding_window_release_via_dp_pool():
    """BlockManagerPool routes release_out_of_window to the owning rank's
    manager (attention-DP + window models compose)."""
    from xllm_tpu.framework.block_manager import BlockManagerPool

    pool = BlockManagerPool(num_blocks=32, block_size=4, dp_size=2,
                            enable_prefix_cache=False)
    s = make_seq(list(range(1, 30)))
    s.dp_rank = 1
    assert pool.allocate(s, 29)
    s.num_computed_tokens = 29
    used_before = pool.num_used_blocks
    released = pool.release_out_of_window(s, window=8)
    assert released >= 4
    assert pool.num_used_blocks == used_before - released
    null = pool.null_block_of(1)
    assert all(b == null for b in s.block_ids[:released])
    pool.free(s)
    assert pool.num_used_blocks == 0


def test_fork_blocks_tail_boundary():
    """Regression: fork keyed the partial-tail decision on num_tokens %
    bs, sharing a still-writable block at the % bs == 0 boundary (both
    beams then wrote different tokens into the same physical slot) and
    copying an immutable block at % bs == 1."""
    from xllm_tpu.framework.block_manager import BlockManager
    from xllm_tpu.framework.request import Request
    from xllm_tpu.framework.sampling_params import SamplingParams

    def mk_seqs(n_tokens):
        req = Request(
            request_id="f",
            prompt_token_ids=list(range(1, n_tokens + 1)),
            sampling_params=SamplingParams(
                use_beam_search=True, n=2, best_of=2, max_tokens=8,
                ignore_eos=True,
            ),
            max_model_len=64,
        )
        parent, child = req.sequences[0], req.sequences[1]
        parent.num_computed_tokens = n_tokens - 1
        child.token_ids = list(parent.token_ids)
        child.num_computed_tokens = n_tokens - 1
        return parent, child

    # boundary: next write (position 3) lands INSIDE the last block ->
    # the tail must be copied, not shared
    bm = BlockManager(16, 4, enable_prefix_cache=False)
    parent, child = mk_seqs(4)
    assert bm.allocate(parent, 4)
    pair = bm.fork_blocks(parent, child)
    assert pair is not None, "tail block shared at the % bs == 0 boundary"
    assert child.block_ids[-1] != parent.block_ids[-1]
    assert pair == (parent.block_ids[-1], child.block_ids[-1])

    # one past the boundary: position 4 starts a FRESH block -> all of
    # the parent's blocks are immutable and fully sharable
    bm2 = BlockManager(16, 4, enable_prefix_cache=False)
    parent2, child2 = mk_seqs(5)
    assert bm2.allocate(parent2, 5)
    used_before = bm2.num_used_blocks
    pair2 = bm2.fork_blocks(parent2, child2)
    assert pair2 is None, "immutable tail was copied needlessly"
    assert child2.block_ids == parent2.block_ids
    assert bm2.num_used_blocks == used_before  # pure ref++, no new block
