"""Native (C++) components: equivalence with the Python implementations.

Mirrors the reference's C++ unit tests for BlockManager/PrefixCache/
SuffixTree (SURVEY.md §4) — here the Python implementations are the
oracles and the native backends must match them operation-for-operation.
"""

import numpy as np
import pytest

from xllm_tpu import native
from xllm_tpu.framework.block_manager import BlockManager
from xllm_tpu.framework.native_block_manager import NativeBlockManager
from xllm_tpu.framework.request import Request
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.framework.suffix_cache import SuffixProposer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def _seq(tokens):
    req = Request(
        "r", list(tokens), SamplingParams(max_tokens=4), max_model_len=4096
    )
    return req.sequences[0]


def test_suffix_index_equivalence_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(20):
        toks = [int(x) for x in rng.integers(0, 12, size=60)]  # repetitive
        py = SuffixProposer()
        cc = native.NativeSuffixIndex()
        for upto in (10, 25, 40, 60):
            py.extend(toks[:upto], upto)
            cc.extend(toks[:upto], upto)
            for k in (1, 3, 5):
                assert py.propose(toks[:upto], k) == cc.propose(
                    toks[:upto], k
                ), (trial, upto, k)


def test_block_manager_equivalence_fuzz():
    """Random allocate/free/match/insert sequences give identical results."""
    rng = np.random.default_rng(1)
    py = BlockManager(num_blocks=32, block_size=4)
    cc = NativeBlockManager(num_blocks=32, block_size=4)
    live: list[tuple] = []  # (py_seq, cc_seq)

    for step in range(300):
        op = rng.random()
        if op < 0.45 and py.num_free_blocks > 4:
            toks = [int(x) for x in rng.integers(0, 6, size=rng.integers(3, 20))]
            s_py, s_cc = _seq(toks), _seq(toks)
            m_py = py.match_prefix(s_py)
            m_cc = cc.match_prefix(s_cc)
            assert m_py == m_cc, step
            n = s_py.num_tokens - s_py.num_computed_tokens
            ok_py = py.allocate(s_py, n)
            ok_cc = cc.allocate(s_cc, n)
            assert ok_py == ok_cc, step
            if ok_py:
                s_py.num_computed_tokens = s_py.num_tokens
                s_cc.num_computed_tokens = s_cc.num_tokens
                py.cache_computed_blocks(s_py)
                cc.cache_computed_blocks(s_cc)
                live.append((s_py, s_cc))
            else:
                py.free(s_py)
                cc.free(s_cc)
        elif op < 0.7 and live:
            # sliding-window release on a random live sequence
            i = int(rng.integers(0, len(live)))
            s_py, s_cc = live[i]
            w = int(rng.integers(1, 14))
            r_py = py.release_out_of_window(s_py, w)
            r_cc = cc.release_out_of_window(s_cc, w)
            assert r_py == r_cc, step
            assert s_py.block_ids == s_cc.block_ids or (
                [b == py.null_block for b in s_py.block_ids]
                == [b == cc.null_block for b in s_cc.block_ids]
            ), step
        elif live:
            i = int(rng.integers(0, len(live)))
            s_py, s_cc = live.pop(i)
            py.free(s_py)
            cc.free(s_cc)
        assert py.num_free_blocks == cc.num_free_blocks, step

    # same prefix hits for a probe prompt on both managers
    probe = [0, 1, 2, 3, 4, 5, 0, 1]
    a, b = _seq(probe), _seq(probe)
    assert py.match_prefix(a) == cc.match_prefix(b)
    py.free(a)
    cc.free(b)


def test_engine_native_backend_matches_python():
    from tests.test_engine import tiny_config
    from xllm_tpu.engine import LLMEngine

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = [int(x) for x in np.random.default_rng(2).integers(1, 90, 21)]
    outs = {}
    for backend in ("python", "native"):
        cfg = tiny_config(block_backend=backend)
        eng = LLMEngine(cfg)
        eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
        # twice: second run exercises the prefix cache
        outs[backend] = eng.generate_all()[0].outputs[0].token_ids
        eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
        assert eng.generate_all()[0].outputs[0].token_ids == outs[backend]
        assert eng.block_manager.num_used_blocks == 0
        assert type(eng.block_manager).__name__ == (
            "NativeBlockManager" if backend == "native" else "BlockManager"
        )
    assert outs["python"] == outs["native"]


def test_native_host_tier_roundtrip():
    from tests.test_engine import tiny_config
    from xllm_tpu.engine import LLMEngine

    cfg = tiny_config(num_host_blocks=32, block_backend="native")
    cfg.cache.num_blocks = 16
    eng = LLMEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    prompt = list(range(1, 30))
    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    out1 = eng.generate_all()[0].outputs[0].token_ids
    rng = np.random.default_rng(3)
    for _ in range(3):
        eng.add_request(
            prompt_token_ids=[int(x) for x in rng.integers(30, 90, 40)],
            sampling_params=sp,
        )
        eng.generate_all()
    assert eng.block_manager.hierarchy.offloads > 0
    eng.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    out2 = eng.generate_all()[0].outputs[0].token_ids
    assert out1 == out2
    assert eng.block_manager.hierarchy.fetches > 0
