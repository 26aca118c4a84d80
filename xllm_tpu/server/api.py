"""OpenAI-compatible HTTP server (aiohttp).

Counterpart of the reference's brpc XllmServer + APIService stack
(reference xllm/server/xllm_server.cpp:40-49 URL mapping,
xllm/api_service/api_service.cpp per-endpoint ServiceImpls,
chat_service_impl.cpp:723 process_async_impl). Endpoints:

    POST /v1/completions        (stream + non-stream)
    POST /v1/chat/completions   (stream + non-stream, chat template)
    GET  /v1/models
    GET  /health                (reference HealthReporter, xllm_server.cpp:148)
    GET  /metrics               (prometheus, reference bvar/brpc metrics)

Run: python -m xllm_tpu.server.api --model /path/to/hf-model [--port 8000]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time
import uuid

from aiohttp import web

from xllm_tpu.common import metrics
from xllm_tpu.common.rate_limiter import RateLimiter
from xllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ParallelConfig,
    QuantConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from xllm_tpu.framework.chat_template import ChatTemplate
from xllm_tpu.framework.sampling_params import SamplingParams
from xllm_tpu.server.async_engine import AsyncLLMEngine
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)


def _error(status: int, message: str, etype: str = "invalid_request_error"):
    return web.json_response(
        {"error": {"message": message, "type": etype}}, status=status
    )


def _sampling_from_body(body: dict, max_model_len: int) -> SamplingParams:
    stop = body.get("stop") or []
    if isinstance(stop, str):
        stop = [stop]
    return SamplingParams(
        max_tokens=int(body.get("max_tokens") or body.get("max_completion_tokens") or 512),
        temperature=float(body.get("temperature", 1.0)),
        top_p=float(body.get("top_p", 1.0)),
        top_k=int(body.get("top_k", -1)),
        n=int(body.get("n", 1)),
        best_of=int(body.get("best_of", body.get("n", 1))),
        stop=stop,
        ignore_eos=bool(body.get("ignore_eos", False)),
        logprobs=body.get("logprobs"),
    )


class APIServer:
    def __init__(
        self,
        config: EngineConfig,
        served_model_name: str = "",
        tool_call_parser: str = "",
        reasoning_parser: bool = False,
    ):
        self.config = config
        self.engine = AsyncLLMEngine(config)
        self.model_name = served_model_name or config.model.model_path or "xllm-tpu"
        self.rate_limiter = RateLimiter(0)
        self.tool_call_parser = tool_call_parser
        self.reasoning_parser = reasoning_parser
        self.chat_template: ChatTemplate | None = None
        if config.model.model_path:
            try:
                self.chat_template = ChatTemplate.from_model_path(
                    config.model.model_path
                )
            except Exception as e:
                logger.warning("no chat template: %s", e)

    # ------------------------------------------------------------------
    def app(self) -> web.Application:
        app = web.Application()
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/v1/embeddings", self.embeddings)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/health", self.health)
        app.router.add_get("/metrics", self.metrics_endpoint)
        app.on_startup.append(self._on_start)
        app.on_cleanup.append(self._on_stop)
        return app

    async def _on_start(self, app):
        self.engine.start()
        # watchdog: engine loop thread aliveness + device reachability
        # (reference HealthCheckManager polls registered checks every 3s)
        from xllm_tpu.common.health import HealthCheckManager

        self.health_manager = HealthCheckManager()
        self.health_manager.register(
            "engine_thread",
            lambda: self.engine._thread is not None
            and self.engine._thread.is_alive(),
        )
        self.health_manager.start()

    async def _on_stop(self, app):
        if getattr(self, "health_manager", None) is not None:
            self.health_manager.stop()
        self.engine.stop()

    # ------------------------------------------------------------------
    async def health(self, request: web.Request) -> web.Response:
        hm = getattr(self, "health_manager", None)
        if hm is not None and not hm.healthy:
            return web.json_response(
                {"status": "unhealthy", "failed": hm.failed_checks},
                status=503,
            )
        return web.json_response({"status": "ok"})

    async def metrics_endpoint(self, request: web.Request) -> web.Response:
        return web.Response(
            body=metrics.render(), content_type="text/plain", charset="utf-8"
        )

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": self.model_name,
                        "object": "model",
                        "created": int(time.time()),
                        "owned_by": "xllm-tpu",
                    }
                ],
            }
        )

    # ------------------------------------------------------------------
    async def embeddings(self, request: web.Request) -> web.Response:
        """OpenAI /v1/embeddings (reference EmbeddingServiceImpl)."""
        try:
            body = await request.json()
        except Exception:
            return _error(400, "invalid JSON body")
        inputs = body.get("input")
        if inputs is None:
            return _error(400, "missing 'input'")
        if isinstance(inputs, str):
            inputs = [inputs]
        if inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        data = []
        total_tokens = 0
        try:
            for i, item in enumerate(inputs):
                kwargs = (
                    {"prompt_token_ids": item}
                    if isinstance(item, list)
                    else {"prompt": item}
                )
                final = None
                async for out in self.engine.generate(embed=True, **kwargs):
                    final = out
                data.append(
                    {
                        "object": "embedding",
                        "index": i,
                        "embedding": final.embedding or [],
                    }
                )
                if final.usage:
                    total_tokens += final.usage.get("prompt_tokens", 0)
        except ValueError as e:
            return _error(400, str(e))
        metrics.REQUESTS_TOTAL.labels("embeddings", "200").inc()
        return web.json_response(
            {
                "object": "list",
                "data": data,
                "model": self.model_name,
                "usage": {
                    "prompt_tokens": total_tokens,
                    "total_tokens": total_tokens,
                },
            }
        )

    async def completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except Exception:
            return _error(400, "invalid JSON body")
        prompt = body.get("prompt")
        if prompt is None:
            return _error(400, "missing 'prompt'")
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            kwargs = {"prompt_token_ids": prompt}
        elif isinstance(prompt, str):
            kwargs = {"prompt": prompt}
        else:
            return _error(400, "'prompt' must be a string or token id list")
        return await self._run(
            request, body, kwargs, chat=False, endpoint="completions"
        )

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except Exception:
            return _error(400, "invalid JSON body")
        messages = body.get("messages")
        if not messages:
            return _error(400, "missing 'messages'")
        if self.chat_template is None:
            return _error(400, "server has no chat template; use /v1/completions")
        try:
            prompt = self.chat_template.apply(
                messages, add_generation_prompt=True, tools=body.get("tools")
            )
        except Exception as e:
            return _error(400, f"chat template error: {e}")
        return await self._run(
            request, body, {"prompt": prompt}, chat=True, endpoint="chat"
        )

    # ------------------------------------------------------------------
    async def _run(
        self,
        request: web.Request,
        body: dict,
        gen_kwargs: dict,
        chat: bool,
        endpoint: str,
    ) -> web.StreamResponse:
        if not self.rate_limiter.try_acquire():
            metrics.REQUESTS_TOTAL.labels(endpoint, "429").inc()
            return _error(429, "too many requests", "rate_limit_exceeded")
        request_id = (
            ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:24]
        )
        created = int(time.time())
        sp = _sampling_from_body(body, self.config.scheduler.max_model_len)
        stream = bool(body.get("stream", False))
        try:
            gen = self.engine.generate(
                sampling_params=sp, request_id=request_id, **gen_kwargs
            )
            if stream:
                return await self._stream_response(
                    request, gen, request_id, created, chat, endpoint,
                    include_usage=bool(
                        (body.get("stream_options") or {}).get("include_usage")
                    ),
                )
            return await self._full_response(
                gen, request_id, created, chat, endpoint
            )
        except ValueError as e:
            metrics.REQUESTS_TOTAL.labels(endpoint, "400").inc()
            return _error(400, str(e))
        finally:
            self.rate_limiter.release()

    def _postprocess_chat_text(self, text: str) -> dict:
        """Split reasoning + detect tool calls (reference StreamOutputParser
        + FunctionCallParser on the non-stream path)."""
        msg: dict = {"role": "assistant", "content": text}
        if self.reasoning_parser:
            from xllm_tpu.parser.reasoning_parser import ReasoningParser

            p = ReasoningParser()
            d = p.feed(text)
            f = p.finish()
            reasoning = d.reasoning + f.reasoning
            if reasoning:
                msg["reasoning_content"] = reasoning
                msg["content"] = d.content + f.content
        if self.tool_call_parser:
            from xllm_tpu.parser.function_call import get_detector

            r = get_detector(self.tool_call_parser).parse(msg["content"])
            if r.tool_calls:
                msg["content"] = r.content or None
                msg["tool_calls"] = [
                    {
                        "id": c.id,
                        "type": "function",
                        "function": {"name": c.name, "arguments": c.arguments},
                    }
                    for c in r.tool_calls
                ]
        return msg

    async def _full_response(self, gen, request_id, created, chat, endpoint):
        final = None
        async for out in gen:
            final = out
        metrics.REQUESTS_TOTAL.labels(endpoint, "200").inc()
        choices = []
        for o in final.outputs:
            if chat:
                msg = self._postprocess_chat_text(o.text)
                finish = o.finish_reason
                if msg.get("tool_calls") and finish == "stop":
                    finish = "tool_calls"
                choices.append(
                    {
                        "index": o.index,
                        "message": msg,
                        "finish_reason": finish,
                    }
                )
            else:
                logprobs = None
                if o.logprobs is not None:
                    logprobs = {
                        "tokens": [str(t) for t in o.token_ids],
                        "token_logprobs": o.logprobs,
                        "top_logprobs": None,
                        "text_offset": [],
                    }
                choices.append(
                    {
                        "index": o.index,
                        "text": o.text,
                        "finish_reason": o.finish_reason,
                        "logprobs": logprobs,
                    }
                )
        usage = final.usage or {}
        return web.json_response(
            {
                "id": request_id,
                "object": "chat.completion" if chat else "text_completion",
                "created": created,
                "model": self.model_name,
                "choices": choices,
                "usage": {
                    "prompt_tokens": usage.get("prompt_tokens", 0),
                    "completion_tokens": usage.get("completion_tokens", 0),
                    "total_tokens": usage.get("prompt_tokens", 0)
                    + usage.get("completion_tokens", 0),
                },
            }
        )

    async def _stream_response(
        self, request, gen, request_id, created, chat, endpoint, include_usage
    ):
        resp = web.StreamResponse(
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
            }
        )
        await resp.prepare(request)
        obj = "chat.completion.chunk" if chat else "text_completion"

        async def send(payload: dict) -> None:
            await resp.write(f"data: {json.dumps(payload)}\n\n".encode())

        if chat:
            await send(
                {
                    "id": request_id, "object": obj, "created": created,
                    "model": self.model_name,
                    "choices": [
                        {"index": 0, "delta": {"role": "assistant", "content": ""},
                         "finish_reason": None}
                    ],
                }
            )
        sent_text_len: dict[int, int] = {}
        final = None
        last_t = time.monotonic()
        try:
            final = await self._pump_stream(
                gen, chat, request_id, created, obj, send,
                sent_text_len, last_t,
            )
        except (ConnectionResetError, asyncio.CancelledError, OSError):
            # client went away mid-stream: stop generating for it
            # (reference disconnect -> abort path in the brpc Call wrappers)
            self.engine.abort(request_id)
            metrics.REQUESTS_TOTAL.labels(endpoint, "499").inc()
            raise
        if include_usage and final is not None and final.usage:
            await send(
                {
                    "id": request_id, "object": obj, "created": created,
                    "model": self.model_name, "choices": [],
                    "usage": {
                        "prompt_tokens": final.usage["prompt_tokens"],
                        "completion_tokens": final.usage["completion_tokens"],
                        "total_tokens": final.usage["prompt_tokens"]
                        + final.usage["completion_tokens"],
                    },
                }
            )
        await resp.write(b"data: [DONE]\n\n")
        metrics.REQUESTS_TOTAL.labels(endpoint, "200").inc()
        await resp.write_eof()
        return resp

    async def _pump_stream(
        self, gen, chat, request_id, created, obj, send, sent_text_len, last_t
    ):
        final = None
        # streaming <think> splitter per choice (reference StreamOutputParser
        # + reasoning_parser.h:26 on the stream path)
        reasoners: dict[int, object] = {}
        if chat and self.reasoning_parser:
            from xllm_tpu.parser.reasoning_parser import ReasoningParser

            def reasoner(i):
                if i not in reasoners:
                    reasoners[i] = ReasoningParser()
                return reasoners[i]

        async for out in gen:
            final = out
            for o in out.outputs:
                prev = sent_text_len.get(o.index, 0)
                delta = o.text[prev:]
                if not delta and not (out.finished and o.finish_reason):
                    continue
                sent_text_len[o.index] = len(o.text)
                now = time.monotonic()
                metrics.TPOT.observe(now - last_t)
                last_t = now
                if chat:
                    d: dict = {}
                    if self.reasoning_parser:
                        r = reasoner(o.index)
                        rd = r.feed(delta)
                        if out.finished:
                            tail = r.finish()
                            rd.reasoning += tail.reasoning
                            rd.content += tail.content
                        if rd.reasoning:
                            d["reasoning_content"] = rd.reasoning
                        if rd.content:
                            d["content"] = rd.content
                    elif delta:
                        d = {"content": delta}
                    choice = {
                        "index": o.index,
                        "delta": d,
                        "finish_reason": o.finish_reason if out.finished else None,
                    }
                else:
                    choice = {
                        "index": o.index,
                        "text": delta,
                        "finish_reason": o.finish_reason if out.finished else None,
                    }
                await send(
                    {
                        "id": request_id, "object": obj, "created": created,
                        "model": self.model_name, "choices": [choice],
                    }
                )
        return final


def build_config(args) -> EngineConfig:
    """CLI flags -> EngineConfig (reference xllm.cpp:94 create_options)."""
    from xllm_tpu.models.model_args import load_model_config

    model_cfg = load_model_config(args.model)
    return EngineConfig(
        model=model_cfg,
        cache=CacheConfig(
            block_size=args.block_size,
            num_blocks=args.num_blocks,
            memory_utilization=args.memory_utilization,
            enable_prefix_cache=not args.no_prefix_cache,
        ),
        scheduler=SchedulerConfig(
            max_seqs_per_batch=args.max_seqs,
            max_tokens_per_batch=args.max_tokens_per_batch,
            max_tokens_per_chunk_for_prefill=args.max_prefill_chunk,
            max_model_len=args.max_model_len,
            enable_schedule_overlap=not args.no_schedule_overlap,
        ),
        parallel=ParallelConfig(tp_size=args.tp, dp_size=args.dp),
        speculative=SpeculativeConfig(
            method=args.speculative_method,
            num_speculative_tokens=args.num_speculative_tokens,
        ),
        quant=QuantConfig(method=args.quantization),
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser("xllm_tpu.server.api")
    p.add_argument("--model", required=True)
    p.add_argument("--served-model-name", default="")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--block-size", type=int, default=64)
    p.add_argument("--num-blocks", type=int, default=0)
    p.add_argument("--memory-utilization", type=float, default=0.9)
    p.add_argument("--max-seqs", type=int, default=256)
    p.add_argument("--max-tokens-per-batch", type=int, default=8192)
    p.add_argument("--max-prefill-chunk", type=int, default=2048)
    p.add_argument("--max-model-len", type=int, default=0)
    p.add_argument("--max-concurrency", type=int, default=0)
    p.add_argument("--no-prefix-cache", action="store_true")
    p.add_argument("--no-schedule-overlap", action="store_true")
    p.add_argument("--warmup", action="store_true")
    p.add_argument(
        "--tool-call-parser", default="",
        help="hermes|qwen25|qwen3|qwen3_coder|llama3_json",
    )
    p.add_argument("--reasoning-parser", action="store_true",
                   help="split <think> blocks into reasoning_content")
    p.add_argument("--speculative-method", default="",
                   help="''|suffix|ngram (model-free speculative decoding)")
    p.add_argument("--num-speculative-tokens", type=int, default=4)
    p.add_argument("--quantization", default="", help="''|int8 (w8a8)")
    p.add_argument("--registry-url", default="",
                   help="instance registry to register/heartbeat with")
    p.add_argument("--instance-role", default="mixed",
                   help="mixed|prefill|decode (PD disaggregation role)")
    args = p.parse_args(argv)

    config = build_config(args)
    logger.info("engine config:\n%s", config.to_json())
    server = APIServer(
        config,
        args.served_model_name,
        tool_call_parser=args.tool_call_parser,
        reasoning_parser=args.reasoning_parser,
    )
    server.rate_limiter.max_concurrency = args.max_concurrency
    if args.warmup:
        server.engine.engine.runner.warmup()
    client = None
    if args.registry_url:
        from xllm_tpu.server.registry import InstanceClient

        client = InstanceClient(
            args.registry_url,
            address=f"http://{args.host}:{args.port}",
            model=server.model_name,
            role=args.instance_role,
        )
        client.start()
    try:
        web.run_app(server.app(), host=args.host, port=args.port)
    finally:
        if client is not None:
            client.stop()


if __name__ == "__main__":
    main()
