"""Engine end-to-end tests on a tiny random model (CPU)."""

import numpy as np
import pytest

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams


def tiny_config(**cache_kw):
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3",
            dtype="float32",
            vocab_size=97,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            qk_norm=True,
            max_position_embeddings=128,
            eos_token_ids=[0],
        ),
        cache=CacheConfig(block_size=4, num_blocks=64, **cache_kw),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=8,
            max_tokens_per_chunk_for_prefill=16,
            max_model_len=128,
            decode_batch_buckets=[2, 4, 8],
            prefill_token_buckets=[4, 8, 16],
        ),
    )


@pytest.fixture(scope="module")
def engine():
    return LLMEngine(tiny_config())


def _prompts(n, lens=(5, 13, 3, 29)):
    rng = np.random.default_rng(0)
    return [[int(x) for x in rng.integers(1, 97, size=lens[i % len(lens)])] for i in range(n)]


def test_greedy_batch_and_block_release(engine):
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    for p in _prompts(4):
        engine.add_request(prompt_token_ids=p, sampling_params=sp)
    outs = engine.generate_all(timeout_s=300)
    assert len(outs) == 4
    for ro in outs:
        assert len(ro.outputs[0].token_ids) == 8
        assert ro.outputs[0].finish_reason == "length"
    assert engine.block_manager.num_used_blocks == 0


def test_chunked_prefill_equals_single_shot(engine):
    """A prompt longer than the chunk budget must decode identically."""
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 97, size=40)]  # > chunk 16

    engine.add_request(prompt_token_ids=prompt, sampling_params=sp)
    chunked = engine.generate_all(timeout_s=300)[0].outputs[0].token_ids

    # same prompt through an engine with a huge chunk budget
    cfg = tiny_config()
    cfg.scheduler.max_tokens_per_chunk_for_prefill = 64
    cfg.scheduler.prefill_token_buckets = [64]
    eng2 = LLMEngine(cfg, runner=None)
    eng2.add_request(prompt_token_ids=prompt, sampling_params=sp)
    single = eng2.generate_all(timeout_s=300)[0].outputs[0].token_ids
    assert chunked == single


def test_stop_token_id(engine):
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    # discover the greedy continuation, then stop on its 3rd token
    p = _prompts(1)[0]
    engine.add_request(prompt_token_ids=p, sampling_params=sp)
    full = engine.generate_all(timeout_s=300)[0].outputs[0].token_ids
    stop_tok = full[2]
    sp2 = SamplingParams(
        temperature=0.0, max_tokens=20, ignore_eos=True, stop_token_ids=[stop_tok]
    )
    engine.add_request(prompt_token_ids=p, sampling_params=sp2)
    out = engine.generate_all(timeout_s=300)[0].outputs[0]
    assert out.token_ids[-1] == stop_tok
    assert len(out.token_ids) == 3
    assert out.finish_reason == "stop"


def test_sampling_with_seed_is_plausible(engine):
    sp = SamplingParams(temperature=1.0, top_k=10, max_tokens=12, ignore_eos=True)
    p = _prompts(1)[0]
    engine.add_request(prompt_token_ids=p, sampling_params=sp)
    out = engine.generate_all(timeout_s=300)[0].outputs[0]
    assert len(out.token_ids) == 12
    assert all(0 <= t < 97 for t in out.token_ids)


def test_many_requests_exceeding_batch(engine):
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    for p in _prompts(12):
        engine.add_request(prompt_token_ids=p, sampling_params=sp)
    outs = engine.generate_all(timeout_s=600)
    assert len(outs) == 12
    assert engine.block_manager.num_used_blocks == 0


def test_sleep_wakeup_cycle():
    """Sleep frees the KV pool; wakeup restores a clean, working engine."""
    eng = LLMEngine(tiny_config())
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    eng.add_request(prompt_token_ids=[3, 5, 7], sampling_params=sp)
    out1 = eng.generate_all()[0].outputs[0].token_ids
    eng.sleep(level=1)
    assert eng.runner.k_cache is None
    eng.wakeup()
    eng.add_request(prompt_token_ids=[3, 5, 7], sampling_params=sp)
    out2 = eng.generate_all()[0].outputs[0].token_ids
    assert out1 == out2  # same weights -> same greedy tokens
    assert eng.block_manager.num_used_blocks == 0


def test_sleep_refuses_when_busy():
    eng = LLMEngine(tiny_config())
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    eng.add_request(prompt_token_ids=[3, 5, 7], sampling_params=sp)
    with pytest.raises(RuntimeError):
        eng.sleep()
    eng.generate_all()


def test_engine_embed_request():
    eng = LLMEngine(tiny_config())
    req = eng.add_request(prompt_token_ids=[3, 5, 7, 9, 11], embed=True)
    finals = eng.generate_all()
    ro = [r for r in finals if r.request_id == req.request_id][0]
    assert ro.embedding is not None and len(ro.embedding) == 64
    assert abs(sum(v * v for v in ro.embedding) - 1.0) < 1e-3
    assert eng.block_manager.num_used_blocks == 0


def test_n_greater_than_one_sampling():
    eng = LLMEngine(tiny_config())
    sp = SamplingParams(n=2, best_of=2, temperature=0.8, top_p=0.95,
                        max_tokens=6, ignore_eos=True, seed=1)
    req = eng.add_request(prompt_token_ids=[4, 8, 15, 16, 23], sampling_params=sp)
    finals = eng.generate_all()
    ro = [r for r in finals if r.request_id == req.request_id][0]
    assert len(ro.outputs) == 2
    for o in ro.outputs:
        assert len(o.token_ids) == 6
    assert eng.block_manager.num_used_blocks == 0


def test_logprobs_returned():
    eng = LLMEngine(tiny_config())
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True, logprobs=1)
    eng.add_request(prompt_token_ids=[3, 5, 7], sampling_params=sp)
    ro = eng.generate_all()[0]
    lp = ro.outputs[0].logprobs
    assert lp is not None and len(lp) == 4
    assert all(v <= 0.0 for v in lp)  # log-probabilities


def test_engine_penalties_and_seed():
    """Penalized + seeded sampling through the full engine path."""
    import numpy as np

    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    rng = np.random.default_rng(7)
    prompt = rng.integers(1, 500, size=12).tolist()

    def run(seed, rep=1.0):
        eng = LLMEngine(tiny_config())
        eng.add_request(
            prompt_token_ids=prompt,
            sampling_params=SamplingParams(
                temperature=0.8, seed=seed, repetition_penalty=rep,
                max_tokens=10, ignore_eos=True,
            ),
            request_id="r0",
        )
        outs = eng.generate_all(timeout_s=120)
        return outs[0].outputs[0].token_ids

    a = run(seed=1234)
    b = run(seed=1234)
    c = run(seed=99)
    assert a == b, "same seed must reproduce"
    assert len(c) == 10
    d = run(seed=1234, rep=5.0)
    assert len(d) == 10  # penalized path runs end-to-end


def test_engine_rejects_beam_with_penalties():
    """Beam search is supported (tests/test_beam.py); the unsupported
    COMBINATION with penalties must be rejected, not silently wrong."""
    import pytest as _pytest

    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    eng = LLMEngine(tiny_config())
    with _pytest.raises(ValueError, match="beam"):
        eng.add_request(
            prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                use_beam_search=True, repetition_penalty=1.5
            ),
        )


def test_top_logprobs():
    """OpenAI top_logprobs: per-token alternatives with the chosen token
    inside its own top set (greedy => rank 1)."""
    import numpy as np

    from xllm_tpu.engine import LLMEngine
    from xllm_tpu.framework.sampling_params import SamplingParams

    eng = LLMEngine(tiny_config())
    rng = np.random.default_rng(3)
    eng.add_request(
        prompt_token_ids=rng.integers(1, 96, size=9).tolist(),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=6, ignore_eos=True, logprobs=5
        ),
        request_id="lp",
    )
    out = eng.generate_all(timeout_s=120)[0].outputs[0]
    assert out.top_logprobs is not None
    assert len(out.top_logprobs) == 6
    for tok, alts in zip(out.token_ids, out.top_logprobs):
        assert len(alts) == 5
        assert tok in alts  # greedy choice is its own argmax
        assert max(alts.values()) == alts[tok]


def test_token_history_records_last_prompt_token():
    """Regression: the batched-prefill history scatter's pad columns
    (position = chunk's last real position, token 0) used to race the
    real last token via duplicate scatter indices — wrong penalty counts
    for the whole generation when the prompt pads inside its bucket."""
    eng = LLMEngine(tiny_config())
    rng = np.random.default_rng(5)
    prompt = [int(x) for x in rng.integers(1, 97, size=13)]  # pads to 16
    sp = SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True,
        repetition_penalty=1.3,
    )
    eng.add_request(
        prompt_token_ids=prompt, sampling_params=sp, request_id="hist"
    )
    req = eng._active_requests["hist"]
    seq = req.sequences[0]
    for _ in range(40):
        eng.step()
        if seq.num_generated_tokens >= 2:
            break
    hist = np.asarray(eng.runner.token_hist)[seq.slot_id]
    np.testing.assert_array_equal(hist[: len(prompt)], np.asarray(prompt))
    eng.generate_all(timeout_s=300)
    assert eng.block_manager.num_used_blocks == 0
