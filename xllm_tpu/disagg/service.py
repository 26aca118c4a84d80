"""HTTP transport for disaggregated PD (prefill node -> decode node).

Counterpart of the reference's brpc DisaggPD services
(reference xllm/core/distributed_runtime/disagg_pd_service_impl.cpp,
disagg_pd.proto): the decode node exposes POST /disagg/generate taking the
binary PrefillHandoff; the prefill node runs the prompt, ships the
handoff over DCN, and relays the completion back to its client (the
reference's first-generation dispatch + response relay).
"""

from __future__ import annotations

import asyncio
import threading

from aiohttp import web

from xllm_tpu.disagg.pd import DecodeInstance, PrefillHandoff, PrefillInstance
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)


def make_decode_app(decode: DecodeInstance) -> web.Application:
    """Decode-role server. One engine, steps driven per accepted request."""
    lock = threading.Lock()

    async def generate(request: web.Request) -> web.Response:
        raw = await request.read()
        handoff = PrefillHandoff.from_bytes(raw)

        def run():
            with lock:  # engine is single-threaded
                req = decode.accept(handoff)
                eng = decode.engine
                final = None
                while eng.has_unfinished():
                    for ro in eng.step():
                        if ro.request_id == req.request_id and ro.finished:
                            final = ro
                if req.is_finished and final is None:
                    return {"token_ids": [], "finish_reason": "stop"}
                o = final.outputs[0]
                return {
                    "token_ids": o.token_ids,
                    "text": o.text,
                    "finish_reason": o.finish_reason,
                }

        result = await asyncio.get_running_loop().run_in_executor(None, run)
        return web.json_response(result)

    async def health(request: web.Request) -> web.Response:
        return web.json_response({"status": "ok", "role": "decode"})

    app = web.Application(client_max_size=1 << 30)
    app.router.add_post("/disagg/generate", generate)
    app.router.add_get("/health", health)
    return app


def make_prefill_app(
    prefill: PrefillInstance, decode_url: str, session_factory=None
) -> web.Application:
    """Prefill-role front: /v1/completions -> local prefill -> remote decode."""
    import aiohttp

    lock = threading.Lock()

    async def completions(request: web.Request) -> web.Response:
        from xllm_tpu.server.api import _error, _sampling_from_body

        body = await request.json()
        prompt = body.get("prompt")
        if not isinstance(prompt, list) or not prompt:
            return _error(400, "PD front takes 'prompt' as a token id list")
        sp = _sampling_from_body(
            body, prefill.engine.config.scheduler.max_model_len
        )

        def do_prefill():
            with lock:
                return prefill.prefill(prompt, sp)

        handoff = await asyncio.get_running_loop().run_in_executor(
            None, do_prefill
        )
        session = (
            session_factory() if session_factory else aiohttp.ClientSession()
        )
        async with session as s:
            async with s.post(
                decode_url + "/disagg/generate", data=handoff.to_bytes()
            ) as resp:
                result = await resp.json()
        return web.json_response(
            {
                "id": handoff.request_id,
                "object": "text_completion",
                "choices": [
                    {
                        "index": 0,
                        "text": result.get("text", ""),
                        "token_ids": result["token_ids"],
                        "finish_reason": result["finish_reason"],
                    }
                ],
            }
        )

    async def health(request: web.Request) -> web.Response:
        return web.json_response({"status": "ok", "role": "prefill"})

    app = web.Application()
    app.router.add_post("/v1/completions", completions)
    app.router.add_get("/health", health)
    return app
