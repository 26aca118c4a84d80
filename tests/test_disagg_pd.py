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
