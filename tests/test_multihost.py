"""Multi-host structure: broadcast protocol + follower step execution.

A real cluster is unavailable; these tests exercise the degenerate
single-process path (broadcasts no-op) and drive FollowerEngine.run_one
with injected headers + inputs to prove a follower's dispatch reproduces
the driver's state transition exactly.
"""

import numpy as np

from tests.test_engine import tiny_config
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.parallel.multihost import (
    STEP_DECODE,
    STEP_STOP,
    FollowerEngine,
    StepBroadcaster,
    init_distributed,
)


def test_single_process_passthrough():
    init_distributed(None, num_processes=1)  # no-op
    b = StepBroadcaster()
    assert not b.active
    b.announce_stop()  # no-op without a world


def test_follower_replays_driver_decode():
    """Follower executing the same (header, inputs) reaches the same
    last_tokens ring state as the driver's own dispatch."""
    import jax

    eng_a = LLMEngine(tiny_config())
    eng_b = LLMEngine(tiny_config())
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 90, size=9).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    # drive A normally for a couple of steps
    eng_a.add_request(prompt_token_ids=prompt, sampling_params=sp,
                      request_id="r")
    eng_b.add_request(prompt_token_ids=prompt, sampling_params=sp,
                      request_id="r")
    for _ in range(3):
        eng_a.step()
        eng_b.step()
    # now replay one decode on B via the follower path with the same
    # inputs A would build
    from xllm_tpu.runtime.input_builder import (
        build_decode_input,
        build_sampling_input,
    )

    seqs = [
        s for r in eng_a.scheduler.running for s in r.sequences
        if not s.in_prefill and not s.is_finished
    ]
    assert seqs
    ra, rb = eng_a.runner, eng_b.runner
    inp, rows = build_decode_input(
        seqs, ra.block_size, ra.config.scheduler.decode_batch_buckets,
        ra.max_blocks_per_seq, ra.trash_slot, ra.nb_buckets,
    )
    b_pad = inp.slot_ids.shape[0]
    si, _pen = build_sampling_input(seqs, b_pad, rows, jax.random.key(7))

    # driver A dispatch
    (
        ra.k_cache, ra.v_cache, _t, _l, ra.last_tokens, ra.token_hist, _c,
        _tops,
    ) = ra._decode_fn(
        ra.params, ra.k_cache, ra.v_cache, inp, si,
        ra.last_tokens, ra.token_hist,
    )
    # follower B replay via injected header + monkeypatched receive
    hdr = np.zeros(8, np.int32)
    hdr[:4] = (
        STEP_DECODE, b_pad, inp.block_tables.shape[1],
        int(inp.page_cum is not None),
    )
    f = FollowerEngine(rb)
    import xllm_tpu.parallel.multihost as mh

    leaves = tuple(jax.tree.leaves((inp, si)))
    orig = mh._bcast
    mh._bcast = lambda tree: leaves
    try:
        assert f.run_one(hdr=hdr)
    finally:
        mh._bcast = orig
    np.testing.assert_array_equal(
        np.asarray(ra.last_tokens), np.asarray(rb.last_tokens)
    )

    # stop header terminates
    hdr2 = np.zeros(8, np.int32)
    hdr2[0] = STEP_STOP
    assert not f.run_one(hdr=hdr2)
