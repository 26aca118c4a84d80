"""Forward interruption (reference interruption_bus.h:22 +
pd_ooc_scheduler.cpp:432-465,885-888): publishing an interruption makes
the engine preempt running OFFLINE requests at the next step boundary so
online prompts take the chunk budget immediately."""

import numpy as np

from xllm_tpu.common.interruption import InterruptionBus
from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.request import SequenceStatus
from xllm_tpu.framework.sampling_params import SamplingParams


def _config():
    return EngineConfig(
        model=ModelConfig(
            model_type="qwen3", dtype="float32", vocab_size=97,
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            qk_norm=True, max_position_embeddings=256, eos_token_ids=[0],
        ),
        cache=CacheConfig(block_size=4, num_blocks=128),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=8,
            max_tokens_per_chunk_for_prefill=8,  # long prompts span many chunks
            max_model_len=256,
            decode_batch_buckets=[2, 4, 8],
            prefill_token_buckets=[4, 8],
            enable_forward_interruption=True,
        ),
    )


def test_bus_latch_and_subscribe():
    bus = InterruptionBus()
    seen = []
    bus.subscribe(seen.append)
    assert not bus.consume()
    bus.publish(True)
    assert seen == [True]
    assert bus.pending
    assert bus.consume()
    assert not bus.consume()  # latched flag clears on consume


def test_interruption_preempts_offline_for_online():
    eng = LLMEngine(_config())
    rng = np.random.default_rng(3)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)

    off = eng.add_request(
        prompt_token_ids=[int(x) for x in rng.integers(1, 90, 64)],
        sampling_params=sp, request_id="off-0", offline=True,
    )
    eng.step()  # first chunk of the offline prefill runs
    off_seq = off.sequences[0]
    assert 0 < off_seq.num_computed_tokens < off_seq.num_prompt_tokens

    eng.add_request(
        prompt_token_ids=[int(x) for x in rng.integers(1, 90, 8)],
        sampling_params=sp, request_id="on-0",
    )
    eng.interruption_bus.publish(True)
    out = eng.step()
    # the offline request was preempted (blocks freed, RECOMPUTE requeue)
    assert off_seq.status in (
        SequenceStatus.PREEMPTED, SequenceStatus.WAITING,
    )
    assert off not in eng.scheduler.running
    del out

    # both requests still complete correctly afterwards
    results = {}
    for _ in range(600):
        for o in eng.step():
            if o.finished:
                results[o.request_id] = o
        if len(results) == 2:
            break
    assert set(results) == {"off-0", "on-0"}
    for o in results.values():
        assert len(o.outputs[0].token_ids) == 4
    assert eng.block_manager.num_used_blocks == 0


def test_ooc_interruption_publishes_and_online_cuts_ahead():
    """OOC prefill node: online arrival mid-OFFLINE_PREFILL publishes the
    interruption (instead of draining offline first) and the online
    handoff completes before the interrupted offline one."""
    from xllm_tpu.disagg.ooc import OOCPrefillNode
    from xllm_tpu.disagg.pd import AsyncPrefillInstance

    rng = np.random.default_rng(9)
    node = OOCPrefillNode(AsyncPrefillInstance(LLMEngine(_config())))
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)

    node.submit_offline(
        [int(x) for x in rng.integers(1, 90, 64)], sp, request_id="off-0"
    )
    node.pump()  # offline prefill starts (chunked: still in flight)
    assert node._inflight_kind.get("off-0") is True

    online_ready = []
    node.submit_online(
        [int(x) for x in rng.integers(1, 90, 8)], sp,
        online_ready.append, request_id="on-0",
    )
    published = []
    node.prefill.engine.interruption_bus.subscribe(published.append)
    order = []
    for _ in range(400):
        node.pump()
        if online_ready and "on" not in order:
            order.append("on")
        if node.offline_backlog and "off" not in order:
            order.append("off")
        if len(order) == 2:
            break
    assert order == ["on", "off"], order  # online cut ahead
    assert published  # the OOC node published the interruption
