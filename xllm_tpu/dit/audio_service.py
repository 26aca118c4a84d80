"""Audio generation HTTP service over the AudioPipeline.

Counterpart of the reference's audio generation endpoint + LongCat
audio DiT master flow (reference xllm/server/xllm_server.cpp URL map
`/v1/audio/generation`; pipelines/pipeline_longcat_audiodit.h:130).
Returns base64 WAV (stdlib ``wave`` — zero-egress image has no audio
codecs).

Run: python -m xllm_tpu.dit.audio_service [--port 8002]
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import io
import time
import uuid
import wave

import numpy as np

from aiohttp import web

from xllm_tpu.dit.audio import (
    AudioDiTConfig,
    AudioPipeline,
    AudioPipelineConfig,
    AudioVaeConfig,
    approx_duration_from_text,
)
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)


def wav_b64(samples: np.ndarray, sample_rate: int) -> str:
    """float32 [-1, 1] mono -> base64 16-bit PCM WAV."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return base64.b64encode(buf.getvalue()).decode()


class HashAudioTextEncoder:
    """Deterministic prompt→states stub (same pattern as the DiT image
    engine's HashTextEncoder); real checkpoints plug a UMT5-style JAX
    encoder with encode(prompts) -> (states [B,S,text_dim], lens [B])."""

    def __init__(self, text_dim: int, seq_len: int = 24):
        self.text_dim = text_dim
        self.seq_len = seq_len

    def encode(self, prompts: list[str]):
        outs, lens = [], []
        for p in prompts:
            seed = abs(hash(p)) % (2**31)
            r = np.random.RandomState(seed)
            n = min(max(len(p.split()), 2), self.seq_len)
            states = np.zeros((self.seq_len, self.text_dim), np.float32)
            states[:n] = r.randn(n, self.text_dim) * 0.1
            outs.append(states)
            lens.append(n)
        return np.stack(outs), lens


class AudioServer:
    def __init__(self, pipeline: AudioPipeline, params, text_encoder=None,
                 model_name: str = "audio-dit"):
        self.pipeline = pipeline
        self.params = params
        self.text_encoder = text_encoder or HashAudioTextEncoder(
            pipeline.cfg.dit.text_dim
        )
        self.model_name = model_name

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=64 * 1024 * 1024)
        app.router.add_post("/v1/audio/generations", self.generations)
        app.router.add_post("/v1/audio/speech", self.generations)  # alias
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
        prompt = body.get("prompt") or body.get("input")
        if not prompt:
            return web.json_response(
                {"error": {"message": "prompt is required",
                           "type": "invalid_request_error"}}, status=400)
        duration = float(
            body.get("duration_s")
            or approx_duration_from_text(prompt)
        )
        seed = int(body.get("seed", 0))

        def run():
            states, lens = self.text_encoder.encode([prompt])
            return self.pipeline.generate(
                self.params, states, lens, duration_s=duration, seed=seed
            )

        loop = asyncio.get_running_loop()
        wav = await loop.run_in_executor(None, run)
        sr = self.pipeline.cfg.sampling_rate
        return web.json_response({
            "created": int(time.time()),
            "id": f"audio-{uuid.uuid4().hex[:20]}",
            "data": [{
                "b64_wav": wav_b64(wav[0], sr),
                "sample_rate": sr,
                "duration_s": wav.shape[1] / sr,
            }],
        })


def main(argv=None) -> None:
    p = argparse.ArgumentParser("xllm_tpu.dit.audio_service")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8002)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=16)
    p.add_argument("--guidance-scale", type=float, default=3.0)
    p.add_argument("--sampling-rate", type=int, default=44100)
    args = p.parse_args(argv)

    import jax

    cfg = AudioPipelineConfig(
        dit=AudioDiTConfig(dim=args.dim, depth=args.depth, heads=args.heads,
                           repa_layer=max(args.depth // 3, 1)),
        vae=AudioVaeConfig(),
        sampling_rate=args.sampling_rate,
        num_steps=args.num_steps,
        guidance_scale=args.guidance_scale,
    )
    pipeline = AudioPipeline(cfg)
    params = pipeline.init_params(jax.random.key(0))
    server = AudioServer(pipeline, params)
    logger.info("audio service on %s:%d", args.host, args.port)
    web.run_app(server.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
