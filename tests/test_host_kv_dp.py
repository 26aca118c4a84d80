"""Host-KV tier composed with attention-DP (VERDICT r3 missing #4).

Reference: HierarchyBlockManagerPool wraps per-DP-rank device pools
over one shared host store (hierarchy_block_manager_pool.h:40,74). The
TPU design mirrors it: BlockManagerPool passes ONE HierarchyController
to every rank manager — content hashes are global and device ids carry
the rank base, so a block evicted on rank 0 can prefetch on rank 1.
"""

import numpy as np

from xllm_tpu.framework.block_manager import BlockManagerPool
from xllm_tpu.framework.host_kv import HierarchyController, HostKVPool
from xllm_tpu.framework.request import Request
from xllm_tpu.framework.sampling_params import SamplingParams


def _seq(tokens, rank=None):
    req = Request("r", list(tokens), SamplingParams(max_tokens=4),
                  max_model_len=256)
    seq = req.sequences[0]
    if rank is not None:
        seq.dp_rank = rank
    return seq


def test_cross_rank_offload_prefetch():
    """Evict on rank 0 -> host; prefetch onto rank 1's device range."""
    swaps_out, swaps_in = [], []
    ctrl = HierarchyController(
        HostKVPool(8),
        swap_out=lambda dev, host: swaps_out.append((dev, host)),
        swap_in=lambda host, dev: swaps_in.append((host, dev)),
    )
    pool = BlockManagerPool(
        num_blocks=16, block_size=4, dp_size=2,
        enable_prefix_cache=True, hierarchy=ctrl,
    )
    per = pool.blocks_per_rank  # 8; rank 0 ids [0, 8), rank 1 ids [8, 16)

    # rank 0: compute + cache a 2-block prefix, then free
    s1 = _seq(list(range(1, 10)), rank=0)
    assert pool.allocate(s1, 9)
    s1.num_computed_tokens = 9
    pool.cache_computed_blocks(s1)
    pool.free(s1)

    # churn rank 0's pool so the cached blocks are recycled -> offloaded
    # (7 usable blocks per rank after the reserved null block; 28 tokens
    # claim all of them, recycling the 2 cached prefix blocks)
    s2 = _seq(list(range(50, 78)), rank=0)
    assert pool.allocate(s2, 28)
    assert ctrl.offloads == 2
    assert all(dev < per for dev, _ in swaps_out)  # rank-0 device ids
    pool.free(s2)

    # rank 1: same prefix must come back from the SHARED host tier into
    # rank 1's device range
    s3 = _seq(list(range(1, 10)), rank=1)
    n = pool.match_prefix(s3)
    assert n == 8
    assert ctrl.fetches == 2
    assert all(dev >= per for _, dev in swaps_in)  # rank-1 device ids
    assert all(b >= per for b in s3.block_ids)
    pool.free(s3)


def test_dp_engine_with_host_tier_end_to_end():
    """dp=2 engine with a host tier: offload + prefetch round-trip keeps
    outputs identical (the r3 engine.py fence is gone)."""
    from tests.test_dp_engine import _cfg
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    cfg = _cfg(dp=2)
    cfg.cache.num_blocks = 16  # tiny per-rank pools force eviction
    cfg.cache.num_host_blocks = 32
    eng = LLMEngine(cfg)
    assert eng.block_manager.hierarchy is not None
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    prompt = list(range(1, 40))

    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp,
                    request_id="a")
    out1 = eng.generate_all()[0].outputs[0].token_ids

    # churn BOTH ranks with junk to recycle the cached prefix
    rng = np.random.default_rng(5)
    for j in range(4):
        for i in range(2):
            eng.add_request(
                prompt_token_ids=[int(x) for x in rng.integers(60, 400, 40)],
                sampling_params=sp, request_id=f"junk-{j}-{i}",
            )
        eng.generate_all()
    hier = eng.block_manager.hierarchy
    assert hier.offloads > 0

    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp,
                    request_id="b")
    out2 = eng.generate_all()[0].outputs[0].token_ids
    assert out1 == out2
    assert hier.fetches > 0
    assert eng.block_manager.num_used_blocks == 0
