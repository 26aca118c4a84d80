"""StreamingToolCallParser: incremental tool-call deltas (VERDICT r3 #4).

Reference counterpart: StreamOutputParser's incremental tool-call
tracking on the SSE path (xllm/api_service/stream_output_parser.h:30).
The core property: feeding ANY chunking of the model text reconstructs
exactly the same (content, name, arguments) as the one-shot detector.
"""

import json

import pytest

from xllm_tpu.parser.function_call import (
    StreamingToolCallParser,
    get_detector,
)

TEXT_ONE = (
    'Let me check the weather.\n<tool_call>\n{"name": "get_weather", '
    '"arguments": {"city": "Paris", "unit": "celsius"}}\n</tool_call>'
)
TEXT_TWO = (
    '<tool_call>{"name": "a", "arguments": {"x": 1}}</tool_call>'
    "between\n"
    '<tool_call>{"name": "b", "arguments": {"y": [1, 2, 3]}}</tool_call>'
    "after"
)


def drive(text: str, sizes) -> tuple[str, dict]:
    """Feed text in the given chunk sizes; reassemble per-index calls."""
    p = StreamingToolCallParser("hermes")
    content = []
    calls: dict[int, dict] = {}
    i = 0
    s = 0
    while i < len(text):
        n = sizes[s % len(sizes)]
        s += 1
        c, deltas = p.feed(text[i : i + n])
        i += n
        content.append(c)
        for d in deltas:
            slot = calls.setdefault(
                d["index"], {"name": "", "arguments": "", "id": None}
            )
            if "id" in d:
                slot["id"] = d["id"]
                slot["name"] = d["function"]["name"]
            if d.get("function", {}).get("arguments"):
                slot["arguments"] += d["function"]["arguments"]
    c, deltas = p.finish()
    content.append(c)
    for d in deltas:
        slot = calls.setdefault(
            d["index"], {"name": "", "arguments": "", "id": None}
        )
        if "id" in d:
            slot["id"] = d["id"]
            slot["name"] = d["function"]["name"]
        if d.get("function", {}).get("arguments"):
            slot["arguments"] += d["function"]["arguments"]
    return "".join(content), calls


@pytest.mark.parametrize("sizes", [[1], [3], [7], [1000], [2, 5, 11]])
def test_chunked_reconstruction_matches_oneshot(sizes):
    content, calls = drive(TEXT_ONE, sizes)
    ref = get_detector("hermes").parse(TEXT_ONE)
    assert content.strip() == ref.content
    assert len(calls) == 1
    got = calls[0]
    assert got["name"] == "get_weather"
    assert got["id"].startswith("call_")
    assert json.loads(got["arguments"]) == {
        "city": "Paris", "unit": "celsius",
    }


@pytest.mark.parametrize("sizes", [[1], [4], [9], [1000]])
def test_multiple_calls_and_interleaved_content(sizes):
    content, calls = drive(TEXT_TWO, sizes)
    assert "between" in content and "after" in content
    assert len(calls) == 2
    assert calls[0]["name"] == "a"
    assert json.loads(calls[0]["arguments"]) == {"x": 1}
    assert calls[1]["name"] == "b"
    assert json.loads(calls[1]["arguments"]) == {"y": [1, 2, 3]}


def test_arguments_stream_incrementally():
    """The arguments must arrive in >1 fragment when fed char-by-char —
    i.e. truly streamed, not buffered to the end."""
    p = StreamingToolCallParser("hermes")
    frags = []
    for ch in TEXT_ONE:
        _, deltas = p.feed(ch)
        for d in deltas:
            if d.get("function", {}).get("arguments"):
                frags.append(d["function"]["arguments"])
    p.finish()
    assert len(frags) > 5
    assert json.loads("".join(frags)) == {"city": "Paris", "unit": "celsius"}


def test_truncated_call_flushes_on_finish():
    p = StreamingToolCallParser("hermes")
    _, d1 = p.feed('<tool_call>{"name": "f", "arguments": {"a": "xyz')
    _, d2 = p.finish()
    deltas = d1 + d2
    names = [d["function"]["name"] for d in deltas if "id" in d]
    assert names == ["f"]
    args = "".join(
        d["function"]["arguments"] for d in deltas
        if d.get("function", {}).get("arguments")
    )
    assert args.startswith('{"a": "xyz')


def test_fallback_format_emits_before_done():
    """Non-marker formats buffer and emit complete calls at finish."""
    p = StreamingToolCallParser("llama3_json")
    text = '{"name": "f", "parameters": {"k": 1}}'
    for ch in text:
        c, d = p.feed(ch)
        assert not d
    content, deltas = p.finish()
    assert any("id" in d for d in deltas)
    args = "".join(
        d["function"]["arguments"] for d in deltas
        if d.get("function", {}).get("arguments")
    )
    assert json.loads(args) == {"k": 1}


def test_plain_content_passthrough():
    p = StreamingToolCallParser("hermes")
    out = []
    for ch in "hello world, no tools here <not a marker>":
        c, d = p.feed(ch)
        assert not d
        out.append(c)
    c, d = p.finish()
    out.append(c)
    assert "".join(out) == "hello world, no tools here <not a marker>"
    assert not p.emitted_any


DS_TEXT = (
    "thinking done. "
    "<｜tool▁calls▁begin｜>"
    "<｜tool▁call▁begin｜>function<｜tool▁sep｜>get_weather\n"
    '```json\n{"city": "Beijing", "days": 2}\n```'
    "<｜tool▁call▁end｜>"
    "<｜tool▁calls▁end｜> after."
)

GLM_TEXT = (
    "check this "
    "<tool_call>lookup\n"
    "<arg_key>q</arg_key>\n<arg_value>tpu</arg_value>\n"
    "<arg_key>n</arg_key>\n<arg_value>3</arg_value>\n"
    "</tool_call> done"
)


def drive_fmt(fmt, text, sizes):
    p = StreamingToolCallParser(fmt)
    content = []
    calls = {}

    def absorb(c, deltas):
        content.append(c)
        for d in deltas:
            slot = calls.setdefault(
                d["index"], {"name": "", "arguments": "", "id": None}
            )
            if "id" in d:
                slot["id"] = d["id"]
                slot["name"] = d["function"]["name"]
            if d.get("function", {}).get("arguments"):
                slot["arguments"] += d["function"]["arguments"]

    i = s = 0
    while i < len(text):
        n = sizes[s % len(sizes)]
        s += 1
        absorb(*p.feed(text[i : i + n]))
        i += n
    absorb(*p.finish())
    return "".join(content), calls, p


@pytest.mark.parametrize("sizes", [[1], [5], [13], [1000]])
def test_deepseek_streaming(sizes):
    content, calls, p = drive_fmt("deepseek_v3", DS_TEXT, sizes)
    assert "thinking done." in content
    assert "tool▁call" not in content  # markers swallowed
    assert len(calls) == 1
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Beijing",
                                                 "days": 2}
    assert p.emitted_any


def test_deepseek_args_stream_incrementally():
    p = StreamingToolCallParser("deepseek_v3")
    frags = []
    for ch in DS_TEXT:
        _, deltas = p.feed(ch)
        frags += [d["function"]["arguments"] for d in deltas
                  if d.get("function", {}).get("arguments")]
    p.finish()
    assert len(frags) > 5  # raw args streamed char-wise, not buffered
    assert json.loads("".join(frags)) == {"city": "Beijing", "days": 2}


@pytest.mark.parametrize("sizes", [[1], [4], [1000]])
def test_glm_streaming(sizes):
    content, calls, p = drive_fmt("glm45", GLM_TEXT, sizes)
    assert "check this" in content and "done" in content
    assert len(calls) == 1
    assert calls[0]["name"] == "lookup"
    assert json.loads(calls[0]["arguments"]) == {"q": "tpu", "n": 3}


def test_glm_name_streams_before_call_ends():
    """The glm name must be emitted while the call is still open."""
    p = StreamingToolCallParser("glm45")
    _, d = p.feed("<tool_call>lookup\n<arg_key>")
    assert any("id" in x and x["function"]["name"] == "lookup" for x in d)
