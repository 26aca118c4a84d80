"""OpenAI API server end-to-end on a tiny CPU model.

Counterpart of the reference's tests/api_service suite (SURVEY.md §4):
drives /v1/completions, /v1/chat/completions (stream + non-stream),
/v1/models, /health, /metrics against a random-weight model with a
word-level tokenizer built on the fly.
"""

import asyncio
import json
import os

import pytest

from xllm_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig


def _make_tokenizer_dir(tmp_path) -> str:
    """Word-level HF tokenizer + ChatML template, no checkpoint."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {f"w{i}": i for i in range(200)}
    vocab["<unk>"] = 200
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    d = str(tmp_path)
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"eos_token": "w0"}, f)
    return d


def _config(model_dir: str) -> EngineConfig:
    return EngineConfig(
        model=ModelConfig(
            model_path=model_dir,
            model_type="qwen3",
            dtype="float32",
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            qk_norm=True,
            max_position_embeddings=128,
        ),
        cache=CacheConfig(block_size=16, num_blocks=32),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=4,
            max_tokens_per_batch=256,
            decode_batch_buckets=[4],
            prefill_token_buckets=[32, 64],
            max_model_len=128,
        ),
        load_format="dummy",
    )


@pytest.fixture(scope="module")
def server_client(tmp_path_factory):
    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.server.api import APIServer

    model_dir = _make_tokenizer_dir(tmp_path_factory.mktemp("model"))
    api = APIServer(_config(model_dir), served_model_name="tiny")

    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(api.app()), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop
    loop.run_until_complete(client.close())
    loop.close()


def test_health_and_models(server_client):
    client, loop = server_client

    async def go():
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "tiny"

    loop.run_until_complete(go())


def test_completions_non_stream(server_client):
    client, loop = server_client

    async def go():
        r = await client.post(
            "/v1/completions",
            json={
                "prompt": "w1 w2 w3 w4",
                "max_tokens": 8,
                "temperature": 0,
                "ignore_eos": True,
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "text_completion"
        assert data["usage"]["completion_tokens"] == 8
        assert data["choices"][0]["finish_reason"] == "length"

    loop.run_until_complete(go())


def test_completions_token_ids_and_errors(server_client):
    client, loop = server_client

    async def go():
        r = await client.post(
            "/v1/completions",
            json={"prompt": [5, 6, 7], "max_tokens": 4, "temperature": 0,
                  "ignore_eos": True},
        )
        assert r.status == 200
        data = await r.json()
        assert data["usage"]["completion_tokens"] == 4

        r = await client.post("/v1/completions", json={})
        assert r.status == 400
        # overlong prompt -> 400 through intake error propagation
        r = await client.post(
            "/v1/completions",
            json={"prompt": [1] * 500, "max_tokens": 4},
        )
        assert r.status == 400

    loop.run_until_complete(go())


def test_completions_stream(server_client):
    client, loop = server_client

    async def go():
        r = await client.post(
            "/v1/completions",
            json={
                "prompt": "w1 w2",
                "max_tokens": 6,
                "temperature": 0,
                "ignore_eos": True,
                "stream": True,
                "stream_options": {"include_usage": True},
            },
        )
        assert r.status == 200
        raw = await r.text()
        events = [
            json.loads(line[6:])
            for line in raw.splitlines()
            if line.startswith("data: ") and line != "data: [DONE]"
        ]
        assert raw.rstrip().endswith("data: [DONE]")
        assert any(e["choices"] and e["choices"][0]["text"] for e in events)
        finals = [e for e in events if e.get("usage")]
        assert finals and finals[-1]["usage"]["completion_tokens"] == 6

    loop.run_until_complete(go())


def test_chat_completions(server_client):
    client, loop = server_client

    async def go():
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "w3 w4 w5"}],
                "max_tokens": 5,
                "temperature": 0,
                "ignore_eos": True,
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "chat.completion"
        assert data["choices"][0]["message"]["role"] == "assistant"
        assert data["usage"]["completion_tokens"] == 5

    loop.run_until_complete(go())


def test_metrics_endpoint(server_client):
    client, loop = server_client

    async def go():
        r = await client.get("/metrics")
        assert r.status == 200
        body = await r.text()
        assert "xllm_generated_tokens_total" in body

    loop.run_until_complete(go())


def test_profile_endpoints(server_client, tmp_path):
    """start_profile/stop_profile control the jax.profiler trace
    (reference xllm_server.cpp:54-55, api_service.cpp:1253-1305)."""
    client, loop = server_client

    async def go():
        # stop without start -> 409
        r = await client.post("/stop_profile")
        assert r.status == 409
        r = await client.post("/start_profile")
        assert r.status == 200
        data = await r.json()
        assert data["status"] == "profiling"
        # double start -> 409
        r = await client.post("/start_profile")
        assert r.status == 409
        r = await client.post("/stop_profile")
        assert r.status == 200
        import os

        assert os.path.isdir(data["dir"])

    loop.run_until_complete(go())


def test_embeddings_endpoint(server_client):
    client, loop = server_client

    async def go():
        r = await client.post(
            "/v1/embeddings",
            json={"input": ["w1 w2 w3", "w4 w5"]},
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert len(data["data"]) == 2
        vec = data["data"][0]["embedding"]
        assert len(vec) == 64  # hidden_size
        import math
        assert abs(sum(v * v for v in vec) - 1.0) < 1e-3  # L2-normalized
        assert data["usage"]["prompt_tokens"] > 0

    loop.run_until_complete(go())


def test_registry_register_heartbeat_expiry():
    import time as _time

    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.server.registry import make_registry_app

    loop = asyncio.new_event_loop()

    async def go():
        client = TestClient(TestServer(make_registry_app(ttl_s=0.5)))
        await client.start_server()
        r = await client.post(
            "/registry/register",
            json={"address": "http://a:1", "model": "m", "role": "prefill"},
        )
        iid = (await r.json())["instance_id"]
        r = await client.get("/registry/instances")
        assert len((await r.json())["instances"]) == 1
        r = await client.get("/registry/instances?role=decode")
        assert len((await r.json())["instances"]) == 0
        # heartbeat keeps it alive past the ttl
        await asyncio.sleep(0.3)
        await client.post(f"/registry/heartbeat/{iid}")
        await asyncio.sleep(0.3)
        r = await client.get("/registry/instances")
        assert len((await r.json())["instances"]) == 1
        # expiry without heartbeats
        await asyncio.sleep(0.6)
        r = await client.get("/registry/instances")
        assert len((await r.json())["instances"]) == 0
        await client.close()

    loop.run_until_complete(go())
    loop.close()


def test_health_manager_flips_on_failure():
    from xllm_tpu.common.health import HealthCheckManager

    hm = HealthCheckManager(interval_s=0.05)
    ok = {"v": True}
    hm.register("probe", lambda: ok["v"])
    assert hm.run_checks_once() is True and hm.healthy
    ok["v"] = False
    assert hm.run_checks_once() is False
    assert hm.failed_checks == ["probe"]
    ok["v"] = True
    assert hm.run_checks_once() is True


def test_chat_stream_reasoning_split(tmp_path_factory):
    """A server with reasoning_parser streams reasoning_content deltas."""
    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.server.api import APIServer

    model_dir = _make_tokenizer_dir(tmp_path_factory.mktemp("m2"))
    api = APIServer(_config(model_dir), served_model_name="tiny2",
                    reasoning_parser=True)
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(api.app()), loop=loop)
    loop.run_until_complete(client.start_server())

    async def go():
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "w3 w4"}],
                "max_tokens": 5, "temperature": 0, "ignore_eos": True,
                "stream": True,
            },
        )
        assert r.status == 200
        raw = await r.text()
        events = [
            json.loads(line[6:])
            for line in raw.splitlines()
            if line.startswith("data: ") and line != "data: [DONE]"
        ]
        # random tokens won't contain <think>, so all deltas are content;
        # the split path must still produce a well-formed stream
        deltas = [e["choices"][0]["delta"] for e in events if e["choices"]]
        assert any("content" in d and d["content"] for d in deltas)
        assert raw.rstrip().endswith("data: [DONE]")

    loop.run_until_complete(go())
    loop.run_until_complete(client.close())
    loop.close()


def test_rerank_endpoint(server_client):
    client, loop = server_client

    async def go():
        r = await client.post(
            "/v1/rerank",
            json={
                "query": "w3 w4 w5",
                "documents": ["w3 w4 w5 w6", "w90 w91 w92", "w3 w4"],
                "top_n": 2,
                "return_documents": True,
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert len(data["results"]) == 2
        assert all("relevance_score" in x for x in data["results"])
        assert data["results"][0]["relevance_score"] >= data["results"][1][
            "relevance_score"
        ]
        assert "document" in data["results"][0]

        r = await client.post("/v1/rerank", json={"query": "w1"})
        assert r.status == 400

    loop.run_until_complete(go())


def test_rerank_model_scored_matches_score_prompt(server_client):
    """Default rerank mode scores (query, doc) pairs THROUGH the model
    (reference rerank_service_impl.cpp): the endpoint's scores must
    equal mean doc-token logprobs from engine.score_prompt, and the
    embedding mode must stay available as the documented fast path."""
    client, loop = server_client

    async def go():
        docs = ["w3 w4 w5 w6", "w90 w91 w92"]
        r = await client.post(
            "/v1/rerank",
            json={"query": "w3 w4 w5", "documents": docs},
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        by_index = {x["index"]: x["relevance_score"] for x in data["results"]}

        # independent reference scores through the same engine
        eng = client.server.app["api_server"].engine
        tok = eng.tokenizer
        for i, d in enumerate(docs):
            q_ids = tok.encode("w3 w4 w5")
            ids = q_ids + tok.encode(d)
            lps = await eng.call("score_prompt", ids)
            doc_lps = lps[max(len(q_ids) - 1, 0):]
            want = float(sum(doc_lps) / len(doc_lps))
            assert abs(by_index[i] - want) < 1e-5

        r = await client.post(
            "/v1/rerank",
            json={"query": "w3 w4 w5", "documents": docs,
                  "mode": "embedding"},
        )
        assert r.status == 200, await r.text()

    loop.run_until_complete(go())


def test_anthropic_messages(server_client):
    client, loop = server_client

    async def go():
        # the ChatML fallback template kicks in for templateless models
        r = await client.post(
            "/v1/messages",
            json={
                "model": "tiny",
                "max_tokens": 8,
                "messages": [{"role": "user", "content": "w3 w4"}],
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["type"] == "message"
        assert data["role"] == "assistant"
        assert data["content"][0]["type"] == "text"

    loop.run_until_complete(go())


def test_anthropic_messages_with_template(tmp_path_factory):
    """Full anthropic flow against a fixture WITH a ChatML template."""
    import asyncio as aio

    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.server.api import APIServer

    model_dir = _make_tokenizer_dir(tmp_path_factory.mktemp("amodel"))
    with open(os.path.join(model_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "eos_token": "w0",
                "chat_template": (
                    "{% for m in messages %}{{ m['content'] }} "
                    "{% endfor %}"
                ),
            },
            f,
        )
    api = APIServer(_config(model_dir), served_model_name="tiny")
    loop = aio.new_event_loop()
    client = TestClient(TestServer(api.app()), loop=loop)
    loop.run_until_complete(client.start_server())
    try:

        async def go():
            r = await client.post(
                "/v1/messages",
                json={
                    "model": "tiny",
                    "max_tokens": 6,
                    "system": "w9 w9",
                    "messages": [
                        {"role": "user", "content": [
                            {"type": "text", "text": "w3 w4 w5"}
                        ]}
                    ],
                    "ignore_eos": True,
                },
            )
            assert r.status == 200, await r.text()
            data = await r.json()
            assert data["type"] == "message"
            assert data["content"][0]["type"] == "text"
            assert data["stop_reason"] in ("end_turn", "max_tokens")

            # streaming
            r = await client.post(
                "/v1/messages",
                json={
                    "model": "tiny",
                    "max_tokens": 5,
                    "stream": True,
                    "messages": [{"role": "user", "content": "w3 w4"}],
                },
            )
            assert r.status == 200
            body = (await r.read()).decode()
            assert "message_start" in body
            assert "content_block_delta" in body
            assert "message_stop" in body

        loop.run_until_complete(go())
    finally:
        loop.run_until_complete(client.close())
        loop.close()


def test_chat_image_url_extraction():
    """OpenAI multi-part image_url content: base64 data URLs decode to
    numpy images and are replaced by vision placeholder markup; non-data
    URLs are rejected (zero-egress server)."""
    import base64
    import io
    import types

    import numpy as np
    import pytest
    from PIL import Image

    from xllm_tpu.server.api import APIServer

    buf = io.BytesIO()
    Image.fromarray(
        np.zeros((28, 28, 3), np.uint8)
    ).save(buf, format="PNG")
    url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    srv = types.SimpleNamespace(
        config=types.SimpleNamespace(
            model=types.SimpleNamespace(
                image_token_id=-1, vision_start_token_id=-1
            )
        ),
        engine=types.SimpleNamespace(tokenizer=None),
    )
    srv._image_placeholder = lambda: APIServer._image_placeholder(srv)
    srv._decode_data_image = APIServer._decode_data_image
    messages = [
        {"role": "user", "content": [
            {"type": "text", "text": "look: "},
            {"type": "image_url", "image_url": {"url": url}},
            {"type": "text", "text": " ok?"},
        ]},
    ]
    norm, images, _videos = APIServer._extract_images(srv, messages)
    assert len(images) == 1 and images[0].shape == (28, 28, 3)
    assert norm[0]["content"] == "look: <|vision_start|><|image_pad|> ok?"

    with pytest.raises(ValueError, match="data"):
        APIServer._extract_images(srv, [
            {"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": "http://example.com/x.png"}},
            ]},
        ])


def test_sample_endpoint(server_client):
    """/v1/sample (reference sample_service_impl.cpp): each occurrence of
    the selector literal samples the model's distribution at the position
    before it — one forward, one choice per slot."""
    client, loop = server_client

    async def go():
        # 'w9' appears twice -> two slots; greedy + top_logprobs
        r = await client.post("/v1/sample", json={
            "prompt": "w1 w2 w9 w3 w4 w9 w5",
            "selector": {"type": "literal", "value": "w9"},
            "temperature": 0.0,
            "top_logprobs": 3,
        })
        assert r.status == 200, await r.text()
        body = await r.json()
        assert body["object"] == "sample_completion"
        assert len(body["choices"]) == 2
        for c in body["choices"]:
            assert c["finish_reason"] == "selector_match"
            assert len(c["logprobs"]["token_ids"]) == 3
            assert c["logprobs"]["token_logprobs"][0] >= \
                c["logprobs"]["token_logprobs"][1]
        assert body["usage"]["completion_tokens"] == 2

        # greedy sampling is deterministic across calls
        r2 = await client.post("/v1/sample", json={
            "prompt": "w1 w2 w9 w3 w4 w9 w5",
            "selector": {"value": "w9"},
            "temperature": 0.0,
        })
        b2 = await r2.json()
        assert [c["logprobs"]["token_ids"][0] for c in b2["choices"]] == [
            c["logprobs"]["token_ids"][0] for c in body["choices"]
        ]

        # validation errors
        r = await client.post("/v1/sample", json={"prompt": "w1"})
        assert r.status == 400
        r = await client.post("/v1/sample", json={
            "prompt": "w1", "selector": {"type": "regex", "value": "x"},
        })
        assert r.status == 400
        # selector absent from the prompt -> empty choices
        r = await client.post("/v1/sample", json={
            "prompt": "w1 w2", "selector": {"value": "w9"},
        })
        assert (await r.json())["choices"] == []

    loop.run_until_complete(go())


async def _collect_sse(resp):
    chunks = []
    async for line in resp.content:
        line = line.decode().strip()
        if line.startswith("data: ") and line != "data: [DONE]":
            chunks.append(json.loads(line[6:]))
    return chunks


def test_completions_echo(server_client):
    """OpenAI `echo`: the prompt text precedes the completion (non-stream)
    and arrives as the first chunk (stream)."""
    client, loop = server_client

    async def go():
        body = {"prompt": "w1 w2 w3", "max_tokens": 4, "echo": True,
                "temperature": 0.0}
        r = await client.post("/v1/completions", json=body)
        assert r.status == 200
        full = await r.json()
        assert full["choices"][0]["text"].startswith("w1 w2 w3")

        r2 = await client.post(
            "/v1/completions", json={**body, "stream": True}
        )
        assert r2.status == 200
        chunks = await _collect_sse(r2)
        texts = [
            c["choices"][0]["text"] for c in chunks if c.get("choices")
        ]
        assert texts and texts[0] == "w1 w2 w3"

        # echo off: no prompt prefix
        r3 = await client.post(
            "/v1/completions",
            json={"prompt": "w1 w2 w3", "max_tokens": 4, "temperature": 0.0},
        )
        full3 = await r3.json()
        assert not full3["choices"][0]["text"].startswith("w1 w2 w3")

    loop.run_until_complete(go())


def test_completions_prompt_scoring(server_client):
    """echo + logprobs + max_tokens=0: OpenAI prompt-scoring form returns
    per-token logprobs of the prompt itself."""
    client, loop = server_client

    async def go():
        r = await client.post("/v1/completions", json={
            "prompt": "w1 w2 w3 w4 w5", "max_tokens": 0, "echo": True,
            "logprobs": 1,
        })
        assert r.status == 200
        out = await r.json()
        lp = out["choices"][0]["logprobs"]
        assert lp["token_logprobs"][0] is None
        assert len(lp["token_logprobs"]) == len(lp["tokens"]) == 5
        assert all(v < 0 for v in lp["token_logprobs"][1:])
        assert out["usage"]["completion_tokens"] == 0

    loop.run_until_complete(go())


def test_stream_overlong_prompt_is_clean_400(server_client):
    """Regression: stream=true requests raised intake ValueErrors only
    after 200 + SSE headers were already sent, producing a broken
    response instead of a clean 400."""
    client, loop = server_client

    async def run():
        r = await client.post("/v1/completions", json={
            "model": "tiny",
            "prompt": "w1 " * 300,  # tokenizes past max_model_len=128
            "stream": True,
            "max_tokens": 4,
        })
        assert r.status == 400
        body = await r.json()
        assert "error" in body

    loop.run_until_complete(run())


def test_engine_step_exception_fails_streams_not_hangs(server_client):
    """Regression: an exception in the engine loop silently killed the
    thread and every in-flight await hung forever; it must surface to the
    client instead."""
    import asyncio as aio

    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.server.api import APIServer

    client, loop = server_client

    import tempfile
    from pathlib import Path

    async def run():
        # a dedicated server instance so we can break its engine safely
        model_dir = _make_tokenizer_dir(
            Path(tempfile.mkdtemp(prefix="tok2-"))
        )
        api = APIServer(_config(model_dir), served_model_name="tiny2")
        c2 = TestClient(TestServer(api.app()))
        await c2.start_server()
        try:
            eng = api.engine.engine

            def boom():
                raise RuntimeError("injected step failure")

            eng.step = boom  # next step explodes
            r = await aio.wait_for(
                c2.post("/v1/completions", json={
                    "model": "tiny2", "prompt": "w1 w2 w3",
                    "max_tokens": 8,
                }),
                timeout=30,
            )
            # the request must terminate (500), not hang
            assert r.status == 500
        finally:
            await c2.close()

    loop.run_until_complete(run())
