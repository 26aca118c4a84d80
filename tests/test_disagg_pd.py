"""Disaggregated PD: handoff wire format + PD output == single-engine output."""

import numpy as np

from tests.test_engine import tiny_config
from xllm_tpu.disagg.pd import (
    DecodeInstance,
    PDOrchestrator,
    PrefillHandoff,
    PrefillInstance,
)
from xllm_tpu.engine import LLMEngine
from xllm_tpu.framework.sampling_params import SamplingParams


def test_handoff_wire_roundtrip():
    h = PrefillHandoff(
        request_id="r1",
        prompt_token_ids=[1, 2, 3],
        first_token=42,
        sampling_params=SamplingParams(temperature=0.5, max_tokens=9),
        k_blocks=np.arange(24, dtype=np.float32).reshape(1, 2, 1, 4, 3),
        v_blocks=np.zeros((1, 2, 1, 4, 3), np.float32),
    )
    h2 = PrefillHandoff.from_bytes(h.to_bytes())
    assert h2.request_id == "r1"
    assert h2.prompt_token_ids == [1, 2, 3]
    assert h2.first_token == 42
    assert h2.sampling_params.temperature == 0.5
    np.testing.assert_array_equal(h2.k_blocks, h.k_blocks)


def test_pd_matches_single_engine_greedy():
    """Prefill on engine A, decode on engine B == one engine end-to-end."""
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompt = [int(x) for x in np.random.default_rng(0).integers(1, 90, 23)]

    single = LLMEngine(tiny_config())
    single.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    expect = single.generate_all()[0].outputs[0].token_ids

    pre = PrefillInstance(LLMEngine(tiny_config()))
    dec = DecodeInstance(LLMEngine(tiny_config()))
    orch = PDOrchestrator(pre, dec)
    out = orch.generate(list(prompt), sp)
    got = out.outputs[0].token_ids
    assert got == expect, (got, expect)
    assert pre.engine.block_manager.num_used_blocks == 0
    assert dec.engine.block_manager.num_used_blocks == 0


def test_pd_multiple_requests_interleaved():
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    pre = PrefillInstance(LLMEngine(tiny_config()))
    dec = DecodeInstance(LLMEngine(tiny_config()))
    orch = PDOrchestrator(pre, dec)
    rng = np.random.default_rng(1)
    for _ in range(3):
        prompt = [int(x) for x in rng.integers(1, 90, 11)]
        out = orch.generate(prompt, sp)
        assert len(out.outputs[0].token_ids) == 6
    assert dec.engine.block_manager.num_used_blocks == 0


def test_pd_over_http():
    """Two aiohttp nodes: prefill front relays through the decode service."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.disagg.service import make_decode_app, make_prefill_app

    sp_prompt = [int(x) for x in np.random.default_rng(2).integers(1, 90, 9)]
    single = LLMEngine(tiny_config())
    single.add_request(
        prompt_token_ids=list(sp_prompt),
        sampling_params=SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
    )
    expect = single.generate_all()[0].outputs[0].token_ids

    pre = PrefillInstance(LLMEngine(tiny_config()))
    dec = DecodeInstance(LLMEngine(tiny_config()))

    loop = asyncio.new_event_loop()

    async def go():
        decode_client = TestClient(TestServer(make_decode_app(dec)))
        await decode_client.start_server()
        decode_url = str(decode_client.make_url("")).rstrip("/")
        front_client = TestClient(
            TestServer(make_prefill_app(pre, decode_url))
        )
        await front_client.start_server()
        r = await front_client.post(
            "/v1/completions",
            json={
                "prompt": sp_prompt,
                "max_tokens": 5,
                "temperature": 0,
                "ignore_eos": True,
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        await front_client.close()
        await decode_client.close()
        return data

    data = loop.run_until_complete(go())
    loop.close()
    assert data["choices"][0]["token_ids"] == expect


def _mk_engines():
    return LLMEngine(tiny_config()), LLMEngine(tiny_config())


def test_async_prefill_concurrent_handoffs():
    """VERDICT r1 item 8: the prefill node serves multiple requests
    concurrently (no per-request engine stall) and extraction overlaps
    serving via the single-gather async fetch."""
    from xllm_tpu.disagg.pd import AsyncPrefillInstance, DecodeInstance, PrefillHandoff

    p_eng, d_eng = _mk_engines()
    pre = AsyncPrefillInstance(p_eng)
    dec = DecodeInstance(d_eng)

    rng = np.random.default_rng(0)
    ready: dict[str, PrefillHandoff] = {}

    def on_ready(h: PrefillHandoff):
        ready[h.request_id] = h

    rids = []
    for i in range(3):
        rids.append(pre.submit(
            rng.integers(1, 96, size=10 + 7 * i).tolist(),
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
            on_ready,
            request_id=f"apd-{i}",
        ))
    guard = 0
    while pre.busy:
        pre.pump()
        guard += 1
        assert guard < 500
    assert set(ready) == set(rids)
    assert p_eng.block_manager.num_used_blocks == 0

    # decode side accepts all three (wire round trip) and finishes them
    outs = {}
    for rid in rids:
        h = PrefillHandoff.from_bytes(ready[rid].to_bytes())
        dec.accept(h)
    while d_eng.has_unfinished():
        for ro in d_eng.step():
            if ro.finished:
                outs[ro.request_id] = ro
    assert set(outs) == set(rids)
    for rid in rids:
        assert len(outs[rid].outputs[0].token_ids) == 6
    assert d_eng.block_manager.num_used_blocks == 0


def test_async_prefill_chunk_overlapped_extraction():
    """Long chunked prompts push finalized pages mid-prefill (the TPU shape
    of the reference's layer-wise KV push, llm_worker_impl.cpp:223-247):
    extraction starts BEFORE the first token lands and the assembled
    handoff still matches the blocking path exactly."""
    from xllm_tpu.disagg.pd import (
        AsyncPrefillInstance,
        DecodeInstance,
        PrefillInstance,
    )

    rng = np.random.default_rng(7)
    # 50 tokens = 4 prefill chunks of 16 (block_size 4): plenty of pumps
    # between the first full page and the first token
    prompt = rng.integers(1, 96, size=50).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    p1, d1 = _mk_engines()
    h_sync = PrefillInstance(p1).prefill(prompt, sp, request_id="x")

    p2, d2 = _mk_engines()
    pre = AsyncPrefillInstance(p2)
    calls = []
    orig = p2.runner.extract_blocks_async

    def counting(block_ids):
        calls.append(list(block_ids))
        return orig(block_ids)

    p2.runner.extract_blocks_async = counting
    got = {}
    pre.submit(prompt, sp, lambda h: got.update(h=h), request_id="x")
    saw_midprefill_extract = False
    guard = 0
    while pre.busy:
        pre.pump()
        if pre._partial and "h" not in got:
            saw_midprefill_extract = True
        guard += 1
        assert guard < 500
    assert saw_midprefill_extract, "no extraction overlapped the prefill"
    assert len(calls) >= 2, calls  # incremental pushes, not one blob
    h = got["h"]
    np.testing.assert_array_equal(h.k_blocks, h_sync.k_blocks)
    np.testing.assert_array_equal(h.v_blocks, h_sync.v_blocks)
    assert h.first_token == h_sync.first_token
    assert p2.block_manager.num_used_blocks == 0

    # and the decode side continues identically
    r1 = DecodeInstance(d1).accept(h_sync)
    while d1.has_unfinished():
        d1.step()
    r2 = DecodeInstance(d2).accept(h)
    while d2.has_unfinished():
        d2.step()
    assert r2.sequences[0].token_ids == r1.sequences[0].token_ids


def test_async_prefill_matches_blocking_path():
    """Async handoff produces the same continuation as the blocking one."""
    from xllm_tpu.disagg.pd import (
        AsyncPrefillInstance,
        DecodeInstance,
        PrefillHandoff,
        PrefillInstance,
    )

    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 96, size=13).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    p1, d1 = _mk_engines()
    h_sync = PrefillInstance(p1).prefill(prompt, sp, request_id="x")
    r1 = DecodeInstance(d1).accept(h_sync)
    while d1.has_unfinished():
        d1.step()
    toks_sync = r1.sequences[0].token_ids

    p2, d2 = _mk_engines()
    pre = AsyncPrefillInstance(p2)
    got = {}
    pre.submit(prompt, sp, lambda h: got.update(h=h), request_id="x")
    guard = 0
    while pre.busy:
        pre.pump()
        guard += 1
        assert guard < 500
    r2 = DecodeInstance(d2).accept(got["h"])
    while d2.has_unfinished():
        d2.step()
    assert r2.sequences[0].token_ids == toks_sync


def test_pd_ooc_online_offline_colocation():
    """PD-OOC (reference pd_ooc_scheduler.cpp): the prefill node runs
    all-online or all-offline steps with online first; the decode node
    pulls offline work only under TPOT slack; offline requests carry the
    preempt-first service class."""
    from xllm_tpu.disagg.ooc import OOCDecodeNode, OOCPrefillNode, StepStatus
    from xllm_tpu.disagg.pd import AsyncPrefillInstance, DecodeInstance

    rng = np.random.default_rng(5)
    pre = OOCPrefillNode(AsyncPrefillInstance(LLMEngine(tiny_config())))
    dec = OOCDecodeNode(
        DecodeInstance(LLMEngine(tiny_config())), tpot_budget_s=10.0
    )
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    online_ready = []
    for i in range(2):
        pre.submit_online(
            [int(x) for x in rng.integers(1, 90, 17 + i)], sp,
            online_ready.append, request_id=f"on-{i}",
        )
    for i in range(3):
        pre.submit_offline(
            [int(x) for x in rng.integers(1, 90, 11 + i)], sp,
            request_id=f"off-{i}",
        )

    statuses = []
    for _ in range(200):
        pre.pump()
        statuses.append(pre.last_status)
        if len(online_ready) == 2 and len(pre.offline_backlog) == 3:
            break
    assert len(online_ready) == 2
    assert len(pre.offline_backlog) == 3
    # online steps strictly precede offline steps (all-online first)
    first_off = statuses.index(StepStatus.OFFLINE_PREFILL)
    assert StepStatus.ONLINE_PREFILL not in statuses[first_off:]

    # decode node: online requests in, then pulls offline under slack
    for h in online_ready:
        dec.accept(h, offline=False)
    for _ in range(400):
        dec.pump(pre)
        if not dec.decode.engine.has_unfinished() and not pre.offline_backlog:
            break
    eng = dec.decode.engine
    while eng.has_unfinished():
        dec.pump(pre)
    assert dec.pulls == 3
    assert eng.block_manager.num_used_blocks == 0
    # offline requests were marked with the preempt-first service class
    # (they finished, so check the bookkeeping flag on their Request)
    assert all(
        r.offline for rid, r in eng._active_requests.items()
        if rid.startswith("off-")
    )


def _mla_config(dsa=False):
    from xllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )

    kw = dict(index_topk=24, index_n_heads=4, index_head_dim=32) if dsa else {}
    return EngineConfig(
        model=ModelConfig(
            model_type="deepseek_v32" if dsa else "deepseek_v2",
            dtype="float32", vocab_size=256, hidden_size=128,
            intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            q_lora_rank=96, kv_lora_rank=64, qk_nope_head_dim=32,
            qk_rope_head_dim=16, v_head_dim=32,
            max_position_embeddings=256, eos_token_ids=[0], **kw),
        cache=CacheConfig(block_size=8, num_blocks=32),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=2, decode_batch_buckets=[2],
            prefill_token_buckets=[32], max_model_len=128),
    )


def test_pd_mla_and_dsa_latent_cache():
    """PD handoff for latent-cache families: MLA's dummy v slot (K and V
    share latent pages) and DSA's indexer-K cache riding the v slot must
    both survive extract -> wire -> inject with single-engine parity.
    Regression: the generic gather crashed on MLA's 1-d dummy v array."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    rng = np.random.default_rng(4)
    for dsa in (False, True):
        prompt = [int(x) for x in rng.integers(1, 250, 29)]
        single = LLMEngine(_mla_config(dsa))
        single.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
        expect = single.generate_all()[0].outputs[0].token_ids

        pre = PrefillInstance(LLMEngine(_mla_config(dsa)))
        dec = DecodeInstance(LLMEngine(_mla_config(dsa)))
        out = PDOrchestrator(pre, dec).generate(list(prompt), sp)
        got = out.outputs[0].token_ids
        assert got == expect, ("dsa" if dsa else "mla", got, expect)
        assert dec.engine.block_manager.num_used_blocks == 0


def test_pd_ooc_perfmodel_pull_quota():
    """VERDICT r4 item 5: the offline pull quota is SOLVED against the
    fitted step-time model (reference perf_model.h:50,
    pd_ooc_scheduler.cpp:337-340) — largest admissible batch under the
    online TPOT budget minus the live batch — not a fixed count."""
    from xllm_tpu.disagg.ooc import OOCDecodeNode, OOCPrefillNode
    from xllm_tpu.disagg.pd import AsyncPrefillInstance, DecodeInstance
    from xllm_tpu.scheduler.profile import ProfileManager

    # known linear model: tpot(batch) = (1 + batch) ms
    prof = ProfileManager(refit_every=1)
    for b in range(1, 20):
        prof.observe_decode(b, (1 + b) * 1e-3)
    prof.refit_every = 10 ** 9  # freeze: observed CPU steps must not
    # perturb the known model this test asserts against
    assert prof.max_decode_batch_for_tpot(10e-3) == 9

    dec = OOCDecodeNode(
        DecodeInstance(LLMEngine(tiny_config())), tpot_budget_s=10e-3,
        headroom=1.0, profile=prof, max_pull=100,
    )
    assert dec.pull_quota() == 9  # empty engine: the full model budget

    # install online work, then the quota shrinks by the live batch
    rng = np.random.default_rng(9)
    pre = OOCPrefillNode(AsyncPrefillInstance(LLMEngine(tiny_config())))
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    ready = []
    for i in range(4):
        pre.submit_online(
            [int(x) for x in rng.integers(1, 90, 9 + i)], sp,
            ready.append, request_id=f"on-{i}",
        )
    for _ in range(200):
        pre.pump()
        if len(ready) == 4:
            break
    for h in ready:
        dec.accept(h, offline=False)
    assert dec.pull_quota() == 5  # 9 admissible - 4 online

    # budget below the live batch's predicted step time: no pulls
    dec.tpot_budget_s = 2e-3  # max batch 1 < any live online batch
    assert dec.pull_quota() == 0 and not dec.able_to_pull()

    # offline work waits under the tight budget, drains once online ends
    for i in range(3):
        pre.submit_offline(
            [int(x) for x in rng.integers(1, 90, 7)], sp,
            request_id=f"off-{i}",
        )
    for _ in range(200):
        pre.pump()
        if len(pre.offline_backlog) == 3:
            break
    eng = dec.decode.engine
    while eng.has_unfinished():
        dec.pump(pre)
        assert dec.pulls == 0  # online still running: budget blocks pulls
    dec.tpot_budget_s = 10e-3
    for _ in range(400):
        dec.pump(pre)
        if not eng.has_unfinished() and not pre.offline_backlog:
            break
    assert dec.pulls == 3
    assert eng.block_manager.num_used_blocks == 0


def test_pd_cross_page_size_handoff():
    """Prefill node on BIG pages, decode node on small pages (VERDICT r4
    item 3: page-128 prefill pools measured +21%, PERF.md r4c; the wire
    blocks split along the token axis at accept). Output must equal a
    single engine at the decode page size."""
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompt = [int(x) for x in np.random.default_rng(4).integers(1, 90, 23)]

    single = LLMEngine(tiny_config())  # block_size=4
    single.add_request(prompt_token_ids=list(prompt), sampling_params=sp)
    expect = single.generate_all()[0].outputs[0].token_ids

    big = tiny_config()
    big.cache.block_size = 8  # prefill node: 2x the decode page
    big.scheduler.prefill_token_buckets = [8, 16]
    pre = PrefillInstance(LLMEngine(big))
    dec = DecodeInstance(LLMEngine(tiny_config()))
    orch = PDOrchestrator(pre, dec)
    out = orch.generate(list(prompt), sp)
    got = out.outputs[0].token_ids
    assert got == expect, (got, expect)
    assert pre.engine.block_manager.num_used_blocks == 0
    assert dec.engine.block_manager.num_used_blocks == 0


def test_rechunk_blocks_layouts():
    from xllm_tpu.disagg.pd import DecodeInstance

    rng = np.random.default_rng(0)
    # split layout [n, L, H, bs, D]
    kb = rng.standard_normal((2, 3, 2, 8, 4)).astype(np.float32)
    out = DecodeInstance._rechunk_blocks(kb, 4)
    assert out.shape == (4, 3, 2, 4, 4)
    np.testing.assert_array_equal(out[0], kb[0, :, :, :4])
    np.testing.assert_array_equal(out[1], kb[0, :, :, 4:])
    np.testing.assert_array_equal(out[2], kb[1, :, :, :4])
    # interleaved layout [n, L, 2, H, bs, D]
    kb6 = rng.standard_normal((1, 2, 2, 2, 8, 4)).astype(np.float32)
    out6 = DecodeInstance._rechunk_blocks(kb6, 4)
    assert out6.shape == (2, 2, 2, 2, 4, 4)
    np.testing.assert_array_equal(out6[1], kb6[0, :, :, :, 4:])


def test_handoff_wire_bf16_roundtrip():
    """npz cannot carry ml_dtypes natively (bfloat16 loads back as void
    bytes and the decode-side cast explodes — caught by the r5 on-chip
    verify drive); the wire ships a uint view + dtype name."""
    import ml_dtypes

    a = (np.arange(24, dtype=np.float32)
         .reshape(1, 2, 1, 4, 3).astype(ml_dtypes.bfloat16))
    h = PrefillHandoff(
        request_id="r", prompt_token_ids=[1], first_token=2,
        sampling_params=SamplingParams(), k_blocks=a, v_blocks=a.copy(),
    )
    h2 = PrefillHandoff.from_bytes(h.to_bytes())
    assert h2.k_blocks.dtype == a.dtype
    np.testing.assert_array_equal(
        h2.k_blocks.view(np.uint16), a.view(np.uint16))
    import jax.numpy as jnp

    jnp.asarray(h2.k_blocks, jnp.bfloat16)
