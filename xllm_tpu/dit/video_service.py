"""Video generation HTTP service over the WanPipeline.

Counterpart of the reference's video generation endpoint
(reference xllm/server/xllm_server.cpp URL map `/v1/video/generation`,
api_service/video_generation_service_impl.cpp; pipeline
pipelines/pipeline_wan_i2v.h). Accepts an optional first frame (base64
image) for image→video; returns a base64 animated GIF (PIL — the
zero-egress image has no video codecs).

Run: python -m xllm_tpu.dit.video_service [--port 8004]
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import time
import uuid

import numpy as np

from aiohttp import web

from xllm_tpu.dit.audio_service import HashAudioTextEncoder
from xllm_tpu.dit.video import WanPipeline, WanPipelineConfig
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)


def gif_b64(frames: np.ndarray, fps: float = 8.0) -> str:
    """[F, H, W, 3] float [-1, 1] -> base64 animated GIF."""
    from PIL import Image

    imgs = [
        Image.fromarray(
            np.clip((f + 1.0) * 127.5, 0, 255).astype(np.uint8)
        )
        for f in frames
    ]
    buf = io.BytesIO()
    imgs[0].save(
        buf, format="GIF", save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return base64.b64encode(buf.getvalue()).decode()


class VideoServer:
    def __init__(self, pipeline: WanPipeline, params, text_encoder=None,
                 model_name: str = "wan-video"):
        self.pipeline = pipeline
        self.params = params
        self.text_encoder = text_encoder or HashAudioTextEncoder(
            pipeline.cfg.model.text_dim
        )
        self.model_name = model_name

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=64 * 1024 * 1024)
        app.router.add_post("/v1/videos/generations", self.generations)
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
            return web.json_response(
                {"error": {"message": "invalid JSON body",
                           "type": "invalid_request_error"}}, status=400)
        prompt = body.get("prompt")
        if not prompt:
            return web.json_response(
                {"error": {"message": "prompt is required",
                           "type": "invalid_request_error"}}, status=400)
        sf = self.pipeline.cfg.vae.spatial_factor
        tf = self.pipeline.cfg.vae.temporal_factor
        size = body.get("size", f"{sf * 4}x{sf * 4}")
        try:
            w, h = (int(x) for x in size.lower().split("x"))
        except Exception:
            return web.json_response(
                {"error": {"message": f"bad size {size!r}; expected WxH",
                           "type": "invalid_request_error"}}, status=400)
        if w % sf or h % sf:
            return web.json_response(
                {"error": {"message": f"size must be a multiple of {sf}",
                           "type": "invalid_request_error"}}, status=400)
        num_frames = int(body.get("num_frames", 1 + 2 * tf))
        if (num_frames - 1) % tf:
            return web.json_response(
                {"error": {
                    "message": f"num_frames must be 1 mod {tf}",
                    "type": "invalid_request_error"}}, status=400)
        seed = int(body.get("seed", 0))
        fps = float(body.get("fps", 8.0))

        first = np.zeros((h, w, 3), np.float32)
        url = body.get("image") or body.get("first_frame")
        if url:
            if not str(url).startswith("data:"):
                return web.json_response(
                    {"error": {
                        "message": "only base64 data: images are supported",
                        "type": "invalid_request_error"}}, status=400)
            from PIL import Image

            raw = base64.b64decode(str(url).split(",", 1)[1])
            img = Image.open(io.BytesIO(raw)).convert("RGB").resize((w, h))
            first = np.asarray(img).astype(np.float32) / 127.5 - 1.0

        def run():
            states, lens = self.text_encoder.encode([prompt])
            return self.pipeline.generate(
                self.params, first, states, num_frames=num_frames, seed=seed
            )

        loop = asyncio.get_running_loop()
        frames = await loop.run_in_executor(None, run)
        video = np.transpose(frames[0], (1, 2, 3, 0))  # [F, H, W, 3]
        return web.json_response({
            "created": int(time.time()),
            "id": f"video-{uuid.uuid4().hex[:20]}",
            "data": [{
                "b64_gif": gif_b64(video, fps),
                "num_frames": int(video.shape[0]),
                "size": f"{w}x{h}",
            }],
        })


def main(argv=None) -> None:
    import jax

    from xllm_tpu.dit.video import WanConfig, WanVaeConfig

    p = argparse.ArgumentParser("xllm_tpu.dit.video_service")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8004)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=8)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    args = p.parse_args(argv)

    cfg = WanPipelineConfig(
        model=WanConfig(num_layers=args.layers, dim=args.dim,
                        num_heads=args.heads, ffn_dim=args.dim * 4),
        vae=WanVaeConfig(),
        num_steps=args.num_steps,
        guidance_scale=args.guidance_scale,
    )
    pipeline = WanPipeline(cfg)
    params = pipeline.init_params(jax.random.key(0))
    server = VideoServer(pipeline, params)
    logger.info("video service on %s:%d", args.host, args.port)
    web.run_app(server.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
