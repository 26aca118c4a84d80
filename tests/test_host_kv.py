"""Host-DRAM KV tier: pool LRU, offload-on-evict, prefetch-on-miss, E2E."""

import numpy as np

from xllm_tpu.framework.block_manager import BlockManager, hash_block
from xllm_tpu.framework.host_kv import HierarchyController, HostKVPool
from xllm_tpu.framework.request import Request
from xllm_tpu.framework.sampling_params import SamplingParams


def _seq(tokens):
    req = Request("r", list(tokens), SamplingParams(max_tokens=4), max_model_len=256)
    return req.sequences[0]


def test_host_pool_lru():
    p = HostKVPool(2)
    a = p.reserve(11)
    b = p.reserve(22)
    assert {a, b} == {0, 1}
    assert p.lookup(11) == a  # touch 11 -> 22 becomes LRU
    c = p.reserve(33)  # evicts 22
    assert c == b
    assert p.lookup(22) is None
    assert p.lookup(11) == a


def test_offload_then_prefetch_roundtrip():
    """Evicted device block lands on host; later match pulls it back."""
    copies = {}

    def swap_out(dev, host):
        copies[host] = ("content-of", dev)

    fetched = []

    def swap_in(host, dev):
        fetched.append((host, dev))

    ctrl = HierarchyController(HostKVPool(4), swap_out, swap_in)
    bm = BlockManager(num_blocks=4, block_size=4, hierarchy=ctrl)

    # seq1 computes 8 tokens -> 2 full cached blocks
    s1 = _seq(list(range(1, 10)))
    assert bm.allocate(s1, 9)
    s1.num_computed_tokens = 9
    bm.cache_computed_blocks(s1)
    bm.free(s1)

    # exhaust the device pool so the cached blocks are recycled (offloaded)
    s2 = _seq(list(range(50, 62)))
    assert bm.allocate(s2, 12)
    assert ctrl.offloads == 2
    bm.free(s2)

    # the recycled blocks lost their device cache entries; a new seq with
    # seq1's prefix must now fetch from the host tier
    s3 = _seq(list(range(1, 10)))
    n = bm.match_prefix(s3)
    assert n == 8  # two blocks of 4 pulled back from host
    assert ctrl.fetches == 2
    assert len(s3.block_ids) == 2
    bm.free(s3)


def test_e2e_engine_with_host_tier():
    """Engine round-trip: prefix offloaded to host, refetched, same output."""
    from tests.test_engine import tiny_config
    from xllm_tpu.engine import LLMEngine

    cfg = tiny_config(num_host_blocks=32)
    cfg.cache.num_blocks = 16  # tiny device pool forces eviction
    eng = LLMEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    prompt = list(range(1, 30))

    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    out1 = eng.generate_all()[0].outputs[0].token_ids

    # churn the pool with different content to evict the cached prefix
    rng = np.random.default_rng(1)
    for _ in range(3):
        eng.add_request(
            prompt_token_ids=[int(x) for x in rng.integers(30, 90, 40)],
            sampling_params=sp,
        )
        eng.generate_all()
    hier = eng.block_manager.hierarchy
    assert hier.offloads > 0

    # same prompt again: host tier restores the prefix; output identical
    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    out2 = eng.generate_all()[0].outputs[0].token_ids
    assert out1 == out2
    assert hier.fetches > 0
    assert eng.block_manager.num_used_blocks == 0


def test_e2e_mla_host_tier():
    """Host tier with a latent-cache (MLA) family: the dummy v slot must
    ride offload/prefetch untouched. Regression: init_host_kv sized the
    host buffers from num_kv_heads/head_dim (wrong for latent pages) and
    swap_out crashed on the 1-d dummy v array."""
    from tests.test_disagg_pd import _mla_config
    from xllm_tpu.engine import LLMEngine

    cfg = _mla_config()
    cfg.cache.num_blocks = 12  # tiny device pool forces eviction
    cfg.cache.num_host_blocks = 32
    eng = LLMEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    prompt = list(range(1, 30))

    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    out1 = eng.generate_all()[0].outputs[0].token_ids

    rng = np.random.default_rng(2)
    for _ in range(3):
        eng.add_request(
            prompt_token_ids=[int(x) for x in rng.integers(30, 250, 40)],
            sampling_params=sp,
        )
        eng.generate_all()
    hier = eng.block_manager.hierarchy
    assert hier.offloads > 0

    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    out2 = eng.generate_all()[0].outputs[0].token_ids
    assert out1 == out2
    assert hier.fetches > 0
    assert eng.block_manager.num_used_blocks == 0
