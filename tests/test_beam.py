"""Beam search (VERDICT r1 item 10; reference beam_searcher.cpp:21)."""

import numpy as np
import pytest

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams


def _cfg():
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
        cache=CacheConfig(num_blocks=64, block_size=4),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=8,
            max_tokens_per_chunk_for_prefill=32,
            max_model_len=128,
            decode_batch_buckets=[2, 4, 8],
            prefill_token_buckets=[8, 32],
            prefill_row_buckets=[1, 4],
        ),
    )


def test_beam_width1_equals_greedy():
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, 96, size=9).tolist()
    eng = LLMEngine(_cfg())
    eng.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True
        ),
        request_id="greedy",
    )
    greedy = eng.generate_all(timeout_s=300)[0].outputs[0].token_ids

    eng2 = LLMEngine(_cfg())
    eng2.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            use_beam_search=True, n=1, best_of=1, max_tokens=8,
            ignore_eos=True,
        ),
        request_id="beam1",
    )
    outs = eng2.generate_all(timeout_s=300)
    beam = outs[0].outputs[0].token_ids
    assert beam == greedy
    assert eng2.block_manager.num_used_blocks == 0


def test_beam_width3_structure_and_leaks():
    rng = np.random.default_rng(5)
    prompt = rng.integers(1, 96, size=7).tolist()
    eng = LLMEngine(_cfg())
    eng.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            use_beam_search=True, n=3, best_of=3, max_tokens=10,
            ignore_eos=True,
        ),
        request_id="beam3",
    )
    # also run a normal request concurrently: beams must not disturb it
    eng.add_request(
        prompt_token_ids=rng.integers(1, 96, size=11).tolist(),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=6, ignore_eos=True
        ),
        request_id="plain",
    )
    outs = {o.request_id: o for o in eng.generate_all(timeout_s=300)}
    beams = outs["beam3"].outputs
    assert len(beams) == 3
    assert all(len(b.token_ids) == 10 for b in beams)
    # hypotheses are distinct and scores descend
    scores = [
        s.beam_score for s in eng._active_requests.get("x", []) or []
    ]
    hyps = [tuple(b.token_ids) for b in beams]
    assert len(set(hyps)) >= 2
    assert len(outs["plain"].outputs[0].token_ids) == 6
    assert eng.block_manager.num_used_blocks == 0


def test_beam_frontier_logic_with_scripted_scores():
    """Unit-level: drive BeamRunner with scripted logprobs and check the
    exact frontier, forks, and final ranking against hand computation."""
    from xllm_tpu.framework.beam import BeamRunner
    from xllm_tpu.framework.block_manager import BlockManager
    from xllm_tpu.framework.request import Request
    from xllm_tpu.framework.sampling_params import SamplingParams

    script = {
        # step 1 from prompt: candidates 10 (-0.1), 20 (-0.5)
        (): [(10, -0.1), (20, -0.5)],
        # step 2 expansions
        (10,): [(11, -2.0), (12, -2.1)],
        (20,): [(21, -0.2), (22, -0.3)],
    }

    class FakeRunner:
        def run_beam_decode(self, seqs, width):
            ids = np.zeros((len(seqs), width), np.int32)
            lps = np.full((len(seqs), width), -99.0, np.float32)
            for j, s in enumerate(seqs):
                key = tuple(s.token_ids[4:])  # generated part (prompt len 4)
                for c, (tok, lp) in enumerate(script.get(key, [(1, -90.0)])):
                    ids[j, c] = tok
                    lps[j, c] = lp
            return ids, lps

        def copy_kv_blocks(self, pairs):
            self.copied = getattr(self, "copied", []) + list(pairs)

    class FakeEngine:
        pass

    eng = FakeEngine()
    eng.runner = FakeRunner()
    eng.block_manager = BlockManager(32, 4, enable_prefix_cache=False)
    beam = BeamRunner(eng)

    req = Request(
        request_id="r",
        prompt_token_ids=[1, 2, 3, 4],
        sampling_params=SamplingParams(
            use_beam_search=True, n=2, best_of=2, max_tokens=2,
            ignore_eos=True,
        ),
        max_model_len=64,
    )
    seq0 = req.sequences[0]
    # simulate completed prefill + one sampled token (to be popped)
    assert eng.block_manager.allocate(seq0, 5)
    seq0.num_computed_tokens = 4
    seq0.append_token(99)
    beam.start(req)
    assert seq0.token_ids == [1, 2, 3, 4]

    beam.step_all()  # step 1: beams = [10 (-0.1), 20 (-0.5)], fork happened
    state = beam.states["r"]
    frontier = sorted(
        (tuple(b.seq.token_ids[4:]), round(b.cum_logprob, 3))
        for b in state.active
    )
    assert frontier == [((10,), -0.1), ((20,), -0.5)]

    beam.step_all()  # step 2: candidates 10+21? no — (10,)->-2.1/-2.2; (20,)->-0.7/-0.8
    # best two: (20,21) = -0.7 and (20,22) = -0.8; both reach max_tokens=2
    assert "r" not in beam.states  # finished
    hyps = [tuple(s.token_ids[4:]) for s in req.sequences]
    assert hyps[0] == (20, 21)
    assert hyps[1] == (20, 22)
    assert eng.block_manager.num_used_blocks == 0


def test_beam_matches_hf_generate(tmp_path):
    """Beam outputs == HF generate(num_beams=W) on the same checkpoint
    (raw cumulative-logprob scoring, early stop at W finished hypotheses
    — HF length_penalty=0.0, early_stopping=True)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(Qwen3Config(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )).eval().float()
    path = tmp_path / "beam_model"
    hf.save_pretrained(path, safe_serialization=True)

    from xllm_tpu.models.model_args import load_model_config

    mc = load_model_config(str(path))
    mc.dtype = "float32"
    cfg = _cfg()
    cfg.model = mc
    eng = LLMEngine(cfg)

    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 90, 13)]
    w, n_new = 3, 6
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            num_beams=w, num_return_sequences=w, do_sample=False,
            max_new_tokens=n_new, length_penalty=0.0, early_stopping=True,
            eos_token_id=None, pad_token_id=0,
        )
    want = [row[len(prompt):].tolist() for row in out]

    eng.add_request(
        prompt_token_ids=list(prompt),
        sampling_params=SamplingParams(
            use_beam_search=True, best_of=w, n=w, max_tokens=n_new,
            temperature=0.0, ignore_eos=True,
        ),
        request_id="beam",
    )
    outs = eng.generate_all(timeout_s=300)
    got = [s.token_ids for s in outs[0].outputs]
    assert got == want, (got, want)
    assert eng.block_manager.num_used_blocks == 0


def test_beam_oom_finishes_every_starved_beam_without_skips():
    """Regression: the OOM loop removed beams from the list being
    iterated, skipping the beam after each finished one — the skipped
    beam then decoded without a page for its next token."""
    from xllm_tpu.framework.beam import BeamRunner, BeamState, _Beam
    from xllm_tpu.framework.block_manager import BlockManager
    from xllm_tpu.framework.request import Request
    from xllm_tpu.framework.sampling_params import SamplingParams

    import numpy as np

    class FakeRunner:
        def run_beam_decode(self, seqs, width):
            # every surviving beam MUST hold capacity for its next token
            # (the old bug skipped a beam's allocate after an OOM finish)
            bm = eng.block_manager
            for s in seqs:
                assert bm.blocks_needed(s, 1) == 0, (
                    f"beam seq {s.seq_id} decoding without a page"
                )
            ids = np.full((len(seqs), width), 7, np.int32)
            lps = np.full((len(seqs), width), -0.5, np.float32)
            return ids, lps

        def copy_kv_blocks(self, pairs):
            pass

    class FakeEngine:
        pass

    eng = FakeEngine()
    eng.runner = FakeRunner()
    # pool with zero free blocks after setup (one block is the null
    # block): a beam's allocate(seq, 1) only succeeds once another
    # starved beam has finished and released its pages
    eng.block_manager = BlockManager(5, 2, enable_prefix_cache=False)
    beam = BeamRunner(eng)
    req = Request(
        request_id="r",
        prompt_token_ids=[1, 2, 3],
        sampling_params=SamplingParams(
            use_beam_search=True, n=2, best_of=2, max_tokens=4,
            ignore_eos=True,
        ),
        max_model_len=64,
    )
    s0, s1 = req.sequences[0], req.sequences[1]
    # both beams sit at a full, fully-computed tail page -> the next
    # decode (allocate(seq, 1) = capacity for computed+1 tokens) needs a
    # page neither can get
    for s in (s0, s1):
        assert eng.block_manager.allocate(s, 4)  # 2 blocks, capacity 4
        s.token_ids = [1, 2, 3, 9, 9]
        s.num_fixed_tokens = 5
        s.num_computed_tokens = 4
    state = BeamState(
        request=req, width=2,
        active=[_Beam(s0, -0.5), _Beam(s1, -0.7)],
    )
    beam.states["r"] = state
    beam.step_all()
    # the first starved beam finishes and frees its pages; the second is
    # NOT skipped: it re-allocates from the freed pages and keeps going
    # (the FakeRunner asserts it held capacity)
    assert len(state.finished) >= 1
    for b in state.active:
        assert eng.block_manager.blocks_needed(b.seq, 0) == 0
    # run the search to completion: everything drains without a leak
    for _ in range(10):
        if "r" not in beam.states:
            break
        beam.step_all()
    assert "r" not in beam.states
    assert eng.block_manager.num_used_blocks == 0


def test_beam_abort_drops_state_and_frees_blocks():
    """Regression: aborting a mid-beam request left its BeamState active,
    so the next step decoded freed pages."""
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 96, size=9).tolist()
    eng = LLMEngine(_cfg())
    eng.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            use_beam_search=True, n=2, best_of=2, max_tokens=16,
            ignore_eos=True,
        ),
        request_id="ab",
    )
    # step until the beam activates, then abort mid-search
    for _ in range(40):
        eng.step()
        if "ab" in eng._beam.states:
            break
    assert "ab" in eng._beam.states
    eng.abort_request("ab")
    assert "ab" not in eng._beam.states
    for _ in range(5):
        eng.step()  # must not touch the aborted request
    assert not eng.has_unfinished()
    assert eng.block_manager.num_used_blocks == 0
