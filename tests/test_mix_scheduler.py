"""MixScheduler unit tests (ProSched mixed P+D priority queue).

Mirrors the reference's MixScheduler semantics
(reference xllm/core/scheduler/mix_scheduler.h:29-90, mix_scheduler.cpp:
prepare_batch / handle_running_queue_requests / get_max_chunk): one
service-class ordering over prefill AND decode work, latency-budgeted
chunk sizing via the fitted step-time models, lower-class-only
preemption.
"""

from xllm_tpu.config import SchedulerConfig
from xllm_tpu.framework.block_manager import BlockManager
from xllm_tpu.framework.request import Request
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.scheduler.mix import MixScheduler
from xllm_tpu.scheduler.profile import ProfileManager


def make_request(rid, prompt_len, max_tokens=8, priority=0, offline=False):
    return Request(
        request_id=rid,
        prompt_token_ids=list(range(1, prompt_len + 1)),
        sampling_params=SamplingParams(max_tokens=max_tokens, ignore_eos=True),
        max_model_len=256,
        priority=priority,
        offline=offline,
    )


def make_scheduler(
    num_blocks=64, block_size=4, chunk=16, max_seqs=8,
    latency_ms=0.0, profile=None,
):
    bm = BlockManager(num_blocks, block_size)
    cfg = SchedulerConfig(
        max_seqs_per_batch=max_seqs,
        max_tokens_per_chunk_for_prefill=chunk,
        max_model_len=256,
        policy="mix",
        step_latency_budget_ms=latency_ms,
    )
    cfg.resolve_buckets()
    return MixScheduler(cfg, bm, profile), bm


def complete_prefill(out):
    for seq, n in out.prefill_items:
        seq.num_computed_tokens += n
        if seq.num_computed_tokens == seq.num_tokens:
            seq.append_token(7)


def complete_decode(out):
    for seq in out.decode_seqs:
        seq.num_computed_tokens += 1
        seq.append_token(7)


def fitted_profile(prefill_us_per_tok=10.0, decode_us_per_seq=100.0):
    """A ProfileManager with linear models fitted from synthetic samples."""
    pm = ProfileManager(refit_every=1)
    for n in (1, 64, 128, 512, 1024):
        pm.observe_prefill(n, n * prefill_us_per_tok / 1e6)
    for b in (1, 2, 8, 32, 128):
        pm.observe_decode(b, b * decode_us_per_seq / 1e6)
    return pm


def test_mixed_step_emits_prefill_and_decode():
    sched, _ = make_scheduler()
    sched.add_request(make_request("a", 8))
    out = sched.schedule()
    assert {s.request_id for s, _ in out.prefill_items} == {"a"}
    complete_prefill(out)

    sched.add_request(make_request("b", 8))
    out = sched.schedule()
    # one step carries b's prefill AND a's decode
    assert {s.request_id for s, _ in out.prefill_items} == {"b"}
    assert {s.request_id for s in out.decode_seqs} == {"a"}


def test_high_priority_prefill_crowds_out_low_priority_decode():
    """Under a tight latency budget a high-priority waiting prefill is
    served BEFORE low-priority running decodes — the ProSched behavior
    the continuous scheduler (decode always runs) cannot express."""
    pm = fitted_profile(prefill_us_per_tok=50.0, decode_us_per_seq=50.0)
    sched, _ = make_scheduler(latency_ms=1.0, profile=pm, chunk=64)

    # two low-priority requests reach decode stage
    for rid in ("low-1", "low-2"):
        sched.add_request(make_request(rid, 8))
    out = sched.schedule()
    complete_prefill(out)

    # a high-priority prompt arrives; its prefill alone nearly fills the
    # 1 ms budget (16 tok * 50 us = 0.8 ms), leaving room for at most
    # ~4 marginal decodes (50 us each) — but the walk order guarantees
    # the prefill is budgeted FIRST
    sched.add_request(make_request("hi", 16, priority=9))
    out = sched.schedule()
    assert {s.request_id for s, _ in out.prefill_items} == {"hi"}
    # decodes fit in the remaining 0.2 ms (2-4 of them) — all are same
    # class so whichever fit were taken after the priority walk
    assert all(s.request_id.startswith("low") for s in out.decode_seqs)


def test_latency_budget_caps_chunk_size():
    """get_max_chunk analog: the chunk shrinks to fit the remaining
    latency budget even when the token budget is larger."""
    pm = fitted_profile(prefill_us_per_tok=100.0)
    # 0.5 ms budget / 100 us per token -> ~5 tokens -> page-aligned 4
    sched, _ = make_scheduler(latency_ms=0.5, profile=pm, chunk=64)
    sched.add_request(make_request("a", 40))
    out = sched.schedule()
    assert len(out.prefill_items) == 1
    seq, n = out.prefill_items[0]
    assert n == 4  # floor(5 / block_size) * block_size


def test_unfitted_profile_means_unbounded_latency():
    """Before the step-time models fit, only token/seq budgets apply
    (reference TimePredictor warm-up behavior)."""
    sched, _ = make_scheduler(latency_ms=0.1, profile=ProfileManager())
    sched.add_request(make_request("a", 16))
    out = sched.schedule()
    assert [(s.request_id, n) for s, n in out.prefill_items] == [("a", 16)]


def test_decode_preempts_only_lower_class():
    """A decode allocation under OOM preempts offline/lower-priority
    requests, never same-or-higher class."""
    sched, bm = make_scheduler(num_blocks=8, block_size=4, chunk=16,
                               max_seqs=4)
    sched.add_request(make_request("off", 4, offline=True))
    out = sched.schedule()
    complete_prefill(out)
    sched.add_request(make_request("on", 4))
    out = sched.schedule()
    complete_prefill(out)

    # exhaust the pool: the next decode of "on" must evict "off",
    # while "off"'s own decode never evicts "on"
    bm.free_lru.clear()
    out = sched.schedule()
    assert [r.request_id for r in out.preempted_requests] == ["off"]
    assert {s.request_id for s in out.decode_seqs} == {"on"}


def test_offline_waits_for_online_admission():
    sched, _ = make_scheduler(max_seqs=1)
    sched.add_request(make_request("off", 8, offline=True))
    sched.add_request(make_request("on", 8))
    out = sched.schedule()
    assert {s.request_id for s, _ in out.prefill_items} == {"on"}


def test_engine_selects_mix_policy():
    """LLMEngine wires MixScheduler + a live ProfileManager when
    scheduler.policy == 'mix', and observation samples accumulate."""
    from tests.test_engine import tiny_config
    from xllm_tpu.engine import LLMEngine

    cfg = tiny_config()
    cfg.scheduler.policy = "mix"
    eng = LLMEngine(cfg)
    assert isinstance(eng.scheduler, MixScheduler)
    assert eng.profile_manager is not None

    import numpy as np

    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    eng.add_request(
        prompt_token_ids=[int(x) for x in rng.integers(1, 90, 12)],
        sampling_params=sp,
    )
    eng.add_request(
        prompt_token_ids=[int(x) for x in rng.integers(1, 90, 9)],
        sampling_params=sp,
    )
    while eng.has_unfinished():
        eng.step()
    assert eng.profile_manager.decode.num_samples > 0
    assert eng.block_manager.num_used_blocks == 0
