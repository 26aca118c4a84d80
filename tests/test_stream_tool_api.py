"""SSE chat path emits OpenAI tool_calls deltas (VERDICT r3 #4).

Drives APIServer._pump_stream directly with a scripted cumulative
generation whose text contains a hermes tool call split across many
chunks, asserting the stream reconstructs the call exactly and flips
finish_reason to "tool_calls" (reference stream_output_parser.h:30).
"""

import asyncio
import json

from xllm_tpu.framework.request import RequestOutput, SequenceOutput
from xllm_tpu.server.api import APIServer

FULL = (
    "calling now "
    '<tool_call>\n{"name": "search", "arguments": '
    '{"q": "tpu pallas", "k": 3}}\n</tool_call>'
)


def _outputs(step_chars: int):
    """Cumulative RequestOutputs growing step_chars per step."""
    outs = []
    for end in range(step_chars, len(FULL) + step_chars, step_chars):
        text = FULL[:end]
        done = end >= len(FULL)
        outs.append(RequestOutput(
            request_id="r1", prompt="", finished=done,
            outputs=[SequenceOutput(
                index=0, text=text, token_ids=[1] * (end // 4),
                finish_reason="stop" if done else None,
            )],
        ))
    return outs


async def _agen(items):
    for it in items:
        yield it


def _run(step_chars: int):
    srv = object.__new__(APIServer)
    srv.model_name = "tiny"
    srv.tool_call_parser = "hermes"
    srv.reasoning_parser = False
    sent = []

    async def send(payload):
        sent.append(payload)

    async def go():
        await srv._pump_stream(
            _agen(_outputs(step_chars)), True, "r1", 0,
            "chat.completion.chunk", send, {}, 0.0,
        )

    asyncio.new_event_loop().run_until_complete(go())
    return sent


def _reassemble(sent):
    content = ""
    calls = {}
    finishes = []
    for ev in sent:
        for ch in ev["choices"]:
            d = ch["delta"]
            content += d.get("content", "")
            for tc in d.get("tool_calls", []):
                slot = calls.setdefault(
                    tc["index"], {"name": "", "arguments": ""}
                )
                if "id" in tc:
                    slot["name"] = tc["function"]["name"]
                    slot["id"] = tc["id"]
                slot["arguments"] += tc["function"].get("arguments", "")
            if ch.get("finish_reason"):
                finishes.append(ch["finish_reason"])
    return content, calls, finishes


def test_streamed_tool_call_reconstructs_and_finishes_tool_calls():
    for step in (3, 7, 17, len(FULL)):
        sent = _run(step)
        content, calls, finishes = _reassemble(sent)
        assert "calling now" in content
        assert "<tool_call>" not in content
        assert list(calls) == [0]
        assert calls[0]["name"] == "search"
        assert calls[0]["id"].startswith("call_")
        assert json.loads(calls[0]["arguments"]) == {
            "q": "tpu pallas", "k": 3,
        }
        assert finishes == ["tool_calls"], (step, finishes)


def test_stream_without_tool_call_keeps_stop():
    srv = object.__new__(APIServer)
    srv.model_name = "tiny"
    srv.tool_call_parser = "hermes"
    srv.reasoning_parser = False
    sent = []

    async def send(payload):
        sent.append(payload)

    outs = [RequestOutput(
        request_id="r1", prompt="", finished=True,
        outputs=[SequenceOutput(index=0, text="plain text",
                                token_ids=[1, 2], finish_reason="stop")],
    )]

    async def go():
        await srv._pump_stream(
            _agen(outs), True, "r1", 0, "chat.completion.chunk",
            send, {}, 0.0,
        )

    asyncio.new_event_loop().run_until_complete(go())
    content, calls, finishes = _reassemble(sent)
    assert content == "plain text"
    assert not calls
    assert finishes == ["stop"]
