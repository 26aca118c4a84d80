"""TimePredictor/ProfileManager fits + zero-eviction admission."""

import numpy as np

from tests.test_engine import tiny_config
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.scheduler.profile import ProfileManager, TimePredictor


def test_time_predictor_fits_quadratic():
    tp = TimePredictor(degree=2)
    for x in range(1, 20):
        tp.add_sample(x, 0.5 + 0.1 * x + 0.01 * x * x)
    assert tp.fit()
    got = tp.predict(10.0)
    assert abs(got - (0.5 + 1.0 + 1.0)) < 1e-6


def test_profile_manager_ttft_inversion():
    pm = ProfileManager(refit_every=4)
    # prefill time ~ 1ms + 10us/token
    for n in (64, 128, 256, 512, 1024, 2048):
        pm.observe_prefill(n, 1e-3 + 1e-5 * n)
    pm.prefill.fit()
    cap = pm.max_prefill_tokens_for_ttft(ttft_budget_s=6e-3)
    assert cap is not None
    # budget 6ms -> ~(6-1)/0.01 = 500 tokens
    assert 400 <= cap <= 600
    assert pm.predict_prefill_s(100) is not None


def test_zero_eviction_admission_never_preempts():
    cfg = tiny_config()
    cfg.scheduler.enable_zero_eviction = True
    cfg.cache.num_blocks = 24  # tiny pool
    cfg.cache.enable_prefix_cache = False
    eng = LLMEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    rng = np.random.default_rng(0)
    # each request needs ceil((20+24)/4)=11 blocks; pool holds 23 -> the
    # scheduler must run at most 2 at a time and never preempt
    for _ in range(4):
        eng.add_request(
            prompt_token_ids=[int(x) for x in rng.integers(1, 90, 20)],
            sampling_params=sp,
        )
    preempted = []
    orig = eng.scheduler._preempt

    def spy(req, out):
        preempted.append(req)
        return orig(req, out)

    eng.scheduler._preempt = spy
    outs = eng.generate_all()
    assert len(outs) == 4
    for o in outs:
        assert len(o.outputs[0].token_ids) == 24
    assert not preempted, "zero-eviction admission must prevent preemption"
    assert eng.block_manager.num_used_blocks == 0
