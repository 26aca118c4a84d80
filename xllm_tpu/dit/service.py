"""DiT HTTP service: OpenAI images API over the DiTEngine.

Counterpart of the reference's DiTMaster + image-generation service
(xllm/core/distributed_runtime/ dit master; api_service image
endpoints; started via the master factory when the model type is a DiT
pipeline — xllm.cpp backend selection).

Run: python -m xllm_tpu.dit.service [--port 8001] [--cache-policy fbcache]
"""

from __future__ import annotations

import argparse
import asyncio
import time
import uuid

from aiohttp import web

from xllm_tpu.dit.cache import DiTCacheConfig
from xllm_tpu.dit.engine import DiTEngine, DiTRequest, png_b64
from xllm_tpu.dit.model import DiTConfig
from xllm_tpu.dit.pipeline import PipelineConfig
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)


def _error(status: int, message: str):
    return web.json_response(
        {"error": {"message": message, "type": "invalid_request_error"}},
        status=status)


class DiTServer:
    def __init__(self, engine: DiTEngine, model_name: str = "dit"):
        self.engine = engine
        self.model_name = model_name

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=64 * 1024 * 1024)
        app.router.add_post("/v1/images/generations", self.generations)
        app.router.add_post("/v1/images/edits", self.edits)
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

    async def generations(self, request: web.Request):
        try:
            body = await request.json()
        except Exception:
            return _error(400, "invalid JSON body")
        prompt = body.get("prompt")
        if not prompt:
            return _error(400, "prompt is required")
        size = body.get("size", "256x256")
        try:
            w, h = (int(x) for x in size.lower().split("x"))
        except Exception:
            return _error(400, f"bad size {size!r}; expected WxH")
        mult = 8 * self.engine.cfg.model.patch_size
        if w % mult or h % mult:
            return _error(400, f"size must be a multiple of {mult}")
        n = int(body.get("n", 1))
        steps = body.get("num_inference_steps")
        seed = int(body.get("seed", 0))
        neg = body.get("negative_prompt")

        loop = asyncio.get_running_loop()
        reqs = [DiTRequest(prompt=prompt, negative_prompt=neg, height=h,
                           width=w, num_inference_steps=steps, seed=seed + i)
                for i in range(n)]
        results = await asyncio.gather(*[
            loop.run_in_executor(None, self.engine.generate, r)
            for r in reqs])
        data = [{"b64_json": png_b64(img),
                 "revised_prompt": prompt} for img, _ in results]
        return web.json_response({
            "created": int(time.time()),
            "id": f"img-{uuid.uuid4().hex[:20]}",
            "data": data,
            "usage": {"steps": results[0][1]["steps"],
                      "cache_skips": results[0][1]["cache_skips"]},
        })


    async def edits(self, request: web.Request):
        """OpenAI images-edits-shaped endpoint over the fill transformer
        (reference pipeline_flux_fill.h + ImageGeneration service rows):
        JSON body {prompt, image: b64 PNG, mask: b64 PNG, strength?,
        num_inference_steps?, seed?, negative_prompt?}. The mask's
        nonzero pixels are repainted."""
        try:
            body = await request.json()
        except Exception:
            return _error(400, "invalid JSON body")
        prompt = body.get("prompt")
        if not prompt:
            return _error(400, "prompt is required")
        if not getattr(self.engine, "is_fill", False):
            return _error(400, "this model is not a fill transformer")
        try:
            import base64
            import io as _io

            import numpy as _np
            from PIL import Image

            def _img(field):
                raw = base64.b64decode(body[field])
                return _np.asarray(Image.open(_io.BytesIO(raw)).convert(
                    "RGB" if field == "image" else "L"))

            image = _img("image")
            mask = _img("mask")
        except KeyError as e:
            return _error(400, f"missing field {e}")
        except Exception as e:
            return _error(400, f"bad image payload: {e}")
        if mask.shape[:2] != image.shape[:2]:
            return _error(400, "mask and image sizes differ")
        mult = (self.engine.pipeline.vae_scale
                * self.engine.cfg.model.patch_size)
        h, w = image.shape[:2]
        if h % mult or w % mult:
            return _error(400, f"image dims must be multiples of {mult}")

        loop = asyncio.get_running_loop()
        try:
            img, stats = await loop.run_in_executor(
                None,
                lambda: self.engine.edit(
                    prompt, image, mask,
                    negative_prompt=body.get("negative_prompt"),
                    num_inference_steps=body.get("num_inference_steps"),
                    strength=float(body.get("strength", 1.0)),
                    seed=int(body.get("seed", 0)),
                ),
            )
        except Exception as e:
            return _error(500, str(e))
        return web.json_response({
            "created": int(time.time()),
            "id": f"img-{uuid.uuid4().hex[:20]}",
            "data": [{"b64_json": png_b64(img), "revised_prompt": prompt}],
            "usage": {"steps": stats["steps"],
                      "cache_skips": stats["cache_skips"]},
        })


def main(argv=None) -> None:
    p = argparse.ArgumentParser("xllm_tpu.dit.service")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8001)
    p.add_argument("--cache-policy", default="none",
                   choices=["none", "fbcache", "taylorseer",
                            "fbcache_taylorseer", "residual"])
    p.add_argument("--residual-diff-threshold", type=float, default=0.09)
    p.add_argument("--num-inference-steps", type=int, default=28)
    p.add_argument("--guidance-scale", type=float, default=3.5)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--hidden-size", type=int, default=1024)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--double-blocks", type=int, default=4)
    p.add_argument("--single-blocks", type=int, default=8)
    args = p.parse_args(argv)

    hd = args.hidden_size // args.num_heads
    cfg = PipelineConfig(
        model=DiTConfig(hidden_size=args.hidden_size,
                        num_heads=args.num_heads,
                        num_double_blocks=args.double_blocks,
                        num_single_blocks=args.single_blocks,
                        axes_dim=(hd // 2, hd // 2)),
        cache=DiTCacheConfig(
            policy=args.cache_policy,
            residual_diff_threshold=args.residual_diff_threshold),
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale)
    engine = DiTEngine(cfg, max_batch=args.max_batch)
    engine.start()
    server = DiTServer(engine)
    logger.info("dit service on %s:%d (policy=%s)", args.host, args.port,
                args.cache_policy)
    web.run_app(server.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
