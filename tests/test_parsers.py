"""Reasoning splitter + function-call detectors + partial JSON.

Mirrors the reference's tests/function_call suite incl. the property-based
partial-JSON tests (SURVEY.md §4).
"""

import json
import random
import string

from xllm_tpu.parser.function_call import (
    HermesDetector,
    LlamaJsonDetector,
    QwenCoderXMLDetector,
    get_detector,
    parse_partial_json,
)
from xllm_tpu.parser.reasoning_parser import ReasoningParser


def test_reasoning_basic_split():
    p = ReasoningParser()
    out = p.feed("<think>step one</think>the answer")
    assert out.reasoning == "step one"
    assert out.content == "the answer"


def test_reasoning_streaming_chunks():
    p = ReasoningParser()
    chunks = ["<th", "ink>rea", "soning</th", "ink>ans", "wer"]
    reasoning = content = ""
    for c in chunks:
        d = p.feed(c)
        reasoning += d.reasoning
        content += d.content
    d = p.finish()
    reasoning += d.reasoning
    content += d.content
    assert reasoning == "reasoning"
    assert content == "answer"


def test_reasoning_forced_open():
    p = ReasoningParser(force_reasoning=True)
    d1 = p.feed("inner monologue</think>done")
    assert d1.reasoning == "inner monologue"
    assert d1.content == "done"


def test_reasoning_false_alarm_tag_prefix():
    p = ReasoningParser()
    d1 = p.feed("a < b and <thin air")
    d2 = p.finish()
    assert d1.content + d2.content == "a < b and <thin air"
    assert d1.reasoning == d2.reasoning == ""


def test_hermes_detector():
    det = HermesDetector()
    text = (
        'let me check.\n<tool_call>\n{"name": "get_weather", '
        '"arguments": {"city": "Paris"}}\n</tool_call>'
    )
    r = det.parse(text)
    assert r.content == "let me check."
    assert len(r.tool_calls) == 1
    assert r.tool_calls[0].name == "get_weather"
    assert json.loads(r.tool_calls[0].arguments) == {"city": "Paris"}


def test_hermes_multiple_calls():
    det = get_detector("qwen25")
    text = (
        '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
        '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>'
    )
    r = det.parse(text)
    assert [c.name for c in r.tool_calls] == ["a", "b"]


def test_qwen_coder_xml_detector():
    det = QwenCoderXMLDetector()
    text = (
        "<tool_call><function=search><parameter=query>tpu kernels</parameter>"
        "<parameter=limit>5</parameter></function></tool_call>"
    )
    r = det.parse(text)
    assert r.tool_calls[0].name == "search"
    assert json.loads(r.tool_calls[0].arguments) == {
        "query": "tpu kernels", "limit": 5,
    }


def test_llama_json_detector():
    det = LlamaJsonDetector()
    r = det.parse('{"name": "lookup", "parameters": {"id": 7}}')
    assert r.tool_calls[0].name == "lookup"
    assert json.loads(r.tool_calls[0].arguments) == {"id": 7}
    r2 = det.parse("just text")
    assert r2.tool_calls == [] and r2.content == "just text"


def test_partial_json_complete():
    v, used = parse_partial_json('{"a": 1, "b": [2, 3]}')
    assert v == {"a": 1, "b": [2, 3]}


def test_partial_json_truncations():
    cases = [
        ('{"a": 1, "b"', {"a": 1}),
        ('{"a": {"b": [1, 2', {"a": {"b": [1, 2]}}),
        ('{"name": "get_w', {"name": "get_w"}),
        ('{"a": 1,', {"a": 1}),
    ]
    for s, expect in cases:
        v, _ = parse_partial_json(s)
        assert v == expect, (s, v)


def test_partial_json_property_random_prefixes():
    """Every prefix of a valid doc parses to None or a dict/list (no crash)."""
    rng = random.Random(0)
    doc = json.dumps(
        {
            "name": "fn_" + "".join(rng.choices(string.ascii_letters, k=8)),
            "arguments": {"a": [1, 2.5, "x\"y"], "b": {"c": None, "d": True}},
        }
    )
    for i in range(1, len(doc) + 1):
        v, _ = parse_partial_json(doc[:i])
        assert v is None or isinstance(v, (dict, list, str, int, float))
    v, _ = parse_partial_json(doc)
    assert v == json.loads(doc)


def test_deepseek_v3_detector():
    from xllm_tpu.parser.function_call import get_detector

    text = (
        "let me check｜x"  # noise
        "<｜tool▁calls▁begin｜>"
        "<｜tool▁call▁begin｜>function"
        "<｜tool▁sep｜>get_weather\n"
        '```json\n{"city": "Beijing"}\n```'
        "<｜tool▁call▁end｜>"
        "<｜tool▁calls▁end｜>"
    )
    res = get_detector("deepseek_v3").parse(text)
    assert len(res.tool_calls) == 1
    assert res.tool_calls[0].name == "get_weather"
    import json as _json

    assert _json.loads(res.tool_calls[0].arguments) == {"city": "Beijing"}
    assert "tool" not in res.content


def test_glm45_detector():
    from xllm_tpu.parser.function_call import get_detector

    text = (
        "<tool_call>get_weather\n"
        "<arg_key>city</arg_key>\n<arg_value>Beijing</arg_value>\n"
        "<arg_key>days</arg_key>\n<arg_value>3</arg_value>\n"
        "</tool_call>"
    )
    res = get_detector("glm45").parse(text)
    assert len(res.tool_calls) == 1
    import json as _json

    args = _json.loads(res.tool_calls[0].arguments)
    assert args == {"city": "Beijing", "days": 3}


def test_kimi_k2_detector():
    from xllm_tpu.parser.function_call import get_detector

    text = (
        "thinking...<|tool_calls_section_begin|>"
        "<|tool_call_begin|>functions.search:0"
        '<|tool_call_argument_begin|>{"q": "tpu"}<|tool_call_end|>'
        "<|tool_calls_section_end|>done"
    )
    res = get_detector("kimi_k2").parse(text)
    assert len(res.tool_calls) == 1
    assert res.tool_calls[0].name == "search"
    assert "thinking" in res.content


def test_partial_json_property_fuzz():
    """Property-based sweep matching the reference's partial_json_parser
    property suite (tests/function_call/partial_json_parser/
    test_property_based.cpp): for random JSON documents, every streaming
    prefix must parse without raising, and the full document must parse
    to exactly json.loads' value."""
    import json

    import numpy as np

    from xllm_tpu.parser.function_call import parse_partial_json

    rng = np.random.default_rng(17)

    def rand_value(depth=0):
        kind = rng.integers(0, 7 if depth < 3 else 5)
        if kind == 0:
            return None
        if kind == 1:
            return bool(rng.integers(0, 2))
        if kind == 2:
            return int(rng.integers(-10**6, 10**6))
        if kind == 3:
            return round(float(rng.normal() * 100), 6)
        if kind == 4:
            chars = ' abc"\\\n\tüñ{}[],:'
            n = int(rng.integers(0, 12))
            return "".join(chars[i] for i in rng.integers(0, len(chars), n))
        if kind == 5:
            return [rand_value(depth + 1) for _ in range(rng.integers(0, 4))]
        return {
            f"k{i}": rand_value(depth + 1)
            for i in range(rng.integers(0, 4))
        }

    for _ in range(60):
        doc = json.dumps({"name": rand_value(), "args": rand_value()})
        for cut in range(len(doc) + 1):
            obj, used = parse_partial_json(doc[:cut])  # must never raise
            assert used <= cut
        obj, used = parse_partial_json(doc)
        assert used == len(doc)
        assert obj == json.loads(doc)
