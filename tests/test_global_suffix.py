"""GlobalSuffixCache (VERDICT r3 #7): cross-request draft proposals.

Reference counterpart: the global SuffixDecodingCache suffix tree over
finished generations (xllm/core/util/suffix_tree.h:129,144).
"""

import numpy as np
import pytest

from xllm_tpu.framework.suffix_cache import GlobalSuffixCache


def _mk(native: bool, **kw) -> GlobalSuffixCache:
    c = GlobalSuffixCache(**kw)
    if not native:
        c._idx = None  # force the python index
        if c._n:
            raise RuntimeError("reset after construction only")
    return c


def test_python_native_equivalence_fuzz():
    from xllm_tpu import native

    if not native.available():
        pytest.skip("native backend unavailable")
    rng = np.random.default_rng(0)
    py = _mk(False)
    nat = _mk(True)
    assert nat._idx is not None
    gens = [rng.integers(0, 30, size=int(rng.integers(5, 60))).tolist()
            for _ in range(40)]
    for g in gens:
        py.add(g)
        nat.add(g)
    for _ in range(300):
        q = rng.integers(0, 30, size=int(rng.integers(2, 12))).tolist()
        k = int(rng.integers(1, 8))
        assert py.propose(q, k) == nat.propose(q, k), (q, k)


def test_draft_never_crosses_generation_boundary():
    c = _mk(False)
    c.add([1, 2, 3, 4, 5])
    c.add([9, 9, 9])
    d = c.propose([1, 2, 3], 8)
    # continuation of [2, 3] is [4, 5], then the separator stops it
    assert d == [4, 5]


def test_epoch_reset_bounds_memory():
    c = _mk(False, max_tokens=50)
    for i in range(20):
        c.add(list(range(10)))
    assert c._n <= 50


def test_engine_accepts_cross_request_drafts():
    """Second identical request drafts from the first's finished
    generation: spec acceptance (tokens per verify) must beat the
    cold first request's."""
    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        ParallelConfig,
        SchedulerConfig,
        SpeculativeConfig,
    )
    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    cfg = EngineConfig(
        model=ModelConfig(
            model_type="qwen3",
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            qk_norm=True,
            tie_word_embeddings=True,
            dtype="float32",
            max_position_embeddings=256,
        ),
        cache=CacheConfig(block_size=16, num_blocks=64,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2,
            max_tokens_per_batch=256,
            max_tokens_per_chunk_for_prefill=64,
            max_model_len=128,
            decode_batch_buckets=[2],
            prefill_token_buckets=[64],
            prefill_row_buckets=[1, 2],
        ),
        parallel=ParallelConfig(),
        speculative=SpeculativeConfig(method="suffix",
                                      num_speculative_tokens=3),
    )
    engine = LLMEngine(config=cfg, tokenizer=None)
    assert engine._global_suffix is not None
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 120, size=20).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)

    def run(tag):
        engine.add_request(prompt_token_ids=list(ids), sampling_params=sp,
                           request_id=tag)
        steps = 0
        while engine.has_unfinished():
            engine.step()
            steps += 1
        return steps

    s1 = run("cold")
    assert engine._global_suffix._n > 0  # finished gen was indexed
    # count global-cache hits during the warm run
    gs = engine._global_suffix
    orig = gs.propose
    hits = []

    def counting(q, k):
        d = orig(q, k)
        if d:
            hits.append(len(d))
        return d

    gs.propose = counting
    s2 = run("warm")
    # the warm run drafts the identical greedy continuation from the
    # global cache: it must actually consult it successfully, and never
    # take more steps than the cold run (random-weight models repeat, so
    # the cold run also self-drafts — equality is acceptable)
    assert hits, "global suffix cache never produced a draft"
    assert s2 <= s1, (s1, s2)
