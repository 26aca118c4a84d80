"""Recommendation HTTP service over the RecEngine.

Counterpart of the reference's rec completion endpoint
(reference xllm/api_service/rec_completion_service_impl.cpp:91-269 —
"text_completion"-shaped responses whose choices are emitted
recommendation items with scores, capped by a total threshold; RecMaster
flow rec_engine.cpp). POST /v1/rec/completions with the user's behavior
token sequence; choices carry catalog item ids, semantic-id codes and
beam log-prob scores.

Run: python -m xllm_tpu.rec.service [--port 8003]
"""

from __future__ import annotations

import argparse
import asyncio
import time
import uuid

from aiohttp import web

from xllm_tpu.rec.engine import RecEngine, RecRequest
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)


def _error(status: int, message: str):
    return web.json_response(
        {"error": {"message": message, "type": "invalid_request_error"}},
        status=status)


class RecServer:
    def __init__(self, engine: RecEngine, model_name: str = "onerec"):
        self.engine = engine
        self.model_name = model_name

    def build_app(self) -> web.Application:
        app = web.Application()
        app.router.add_post("/v1/rec/completions", self.completions)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/health", self.health)
        return app

    async def health(self, request: web.Request):
        return web.json_response({"status": "ok"})

    async def models(self, request: web.Request):
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "owned_by": "xllm_tpu"}],
        })

    async def completions(self, request: web.Request):
        try:
            body = await request.json()
        except Exception:
            return _error(400, "invalid JSON body")
        behavior = body.get("behavior_tokens") or body.get("prompt_token_ids")
        if not behavior or not isinstance(behavior, list):
            return _error(400, "behavior_tokens is required")
        top_k = int(body.get("n", body.get("top_k", 10)))
        if top_k <= 0:
            return _error(400, "n must be positive")

        req = RecRequest(
            behavior_tokens=[int(t) for t in behavior], top_k=top_k
        )
        loop = asyncio.get_running_loop()

        def run():
            self.engine.submit(req)
            req.done.wait(timeout=300.0)
            return req

        req = await loop.run_in_executor(None, run)
        if req.error:
            return _error(400, req.error)
        if req.items is None:
            return _error(500, "rec engine timed out")
        choices = []
        for i in range(len(req.items)):
            if int(req.items[i]) < 0:
                continue  # padded beam (no catalog match)
            choices.append({
                "index": len(choices),
                "item_id": int(req.items[i]),
                "semantic_ids": [int(c) for c in req.codes[i]],
                "score": float(req.scores[i]),
                "finish_reason": "stop",
            })
        return web.json_response({
            "id": "reccmpl-" + uuid.uuid4().hex[:20],
            "object": "text_completion",
            "created": int(time.time()),
            "model": self.model_name,
            "choices": choices,
            "usage": {
                "prompt_tokens": len(behavior),
                "completion_tokens": len(choices),
                "total_tokens": len(behavior) + len(choices),
            },
        })


def main(argv=None) -> None:
    import numpy as np

    from xllm_tpu.rec.model import OneRecConfig
    from xllm_tpu.rec.vocab import RecVocab

    p = argparse.ArgumentParser("xllm_tpu.rec.service")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8003)
    p.add_argument("--beam-width", type=int, default=32)
    p.add_argument("--levels", type=int, default=3)
    p.add_argument("--vocab-size", type=int, default=512)
    p.add_argument("--num-items", type=int, default=1000)
    args = p.parse_args(argv)

    cfg = OneRecConfig(vocab_size=args.vocab_size)
    rng = np.random.default_rng(0)
    codes = rng.integers(
        0, args.vocab_size, size=(args.num_items, args.levels)
    )
    vocab = RecVocab(codes, vocab_size=args.vocab_size)
    engine = RecEngine(cfg, vocab, beam_width=args.beam_width)
    engine.start()
    server = RecServer(engine)
    logger.info("rec service on %s:%d", args.host, args.port)
    web.run_app(server.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
