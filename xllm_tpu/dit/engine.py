"""DiT engine + scheduler: batched text→image serving.

Counterpart of the reference's DiTEngine / DiTScheduler / DiTMaster
(xllm/core/distributed_runtime/dit_engine.h, scheduler/dit_scheduler.h:60,
dit_master) and the image-generation API service.

TPU-native notes: requests are grouped by (latent height, width, steps,
cfg) so each batch is ONE jitted denoise scan at a static shape — the
scheduler prefers filling a batch bucket over FIFO fairness, like the
reference's DiTScheduler size-grouping. Text encoding runs on host
(pluggable encoder), the denoise scan + VAE decode on device.
"""

from __future__ import annotations

import base64
import io
import logging
import queue
import threading
import time
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.dit.pipeline import (
    DiTPipeline,
    FluxFillPipeline,
    PipelineConfig,
)
from xllm_tpu.dit.vae import VAEConfig, VAEDecoder, VAEEncoder

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# text encoders (reference: CLIP/T5 encoder stack in xllm/models/dit/)
# ---------------------------------------------------------------------------

class HashTextEncoder:
    """Deterministic prompt→embedding stub for tests and weightless runs.

    Real checkpoints plug in a CLIP/T5 JAX encoder with the same
    interface: encode(prompts) -> (txt_embeds [B,T,text_dim],
    pooled [B,pooled_dim]).
    """

    def __init__(self, text_dim: int, pooled_dim: int, seq_len: int = 16):
        self.text_dim = text_dim
        self.pooled_dim = pooled_dim
        self.seq_len = seq_len

    def encode(self, prompts: list[str]):
        outs, pools = [], []
        for p in prompts:
            seed = abs(hash(p)) % (2**31)
            r = np.random.RandomState(seed)
            outs.append(r.randn(self.seq_len, self.text_dim) * 0.1)
            pools.append(r.randn(self.pooled_dim) * 0.1)
        return (jnp.asarray(np.stack(outs), jnp.float32),
                jnp.asarray(np.stack(pools), jnp.float32))


# ---------------------------------------------------------------------------
# requests
# ---------------------------------------------------------------------------

@dataclass
class DiTRequest:
    prompt: str
    negative_prompt: str | None = None
    # pixel dims; latent dims = //8 (VAE) — must be multiples of
    # 8 * patch_size
    height: int = 256
    width: int = 256
    num_inference_steps: int | None = None
    seed: int = 0
    arrival: float = field(default_factory=time.monotonic)
    done: threading.Event = field(default_factory=threading.Event)
    result: np.ndarray | None = None   # [H,W,3] uint8
    stats: dict | None = None
    error: str | None = None

    def batch_key(self):
        return (self.height, self.width, self.num_inference_steps,
                self.negative_prompt is not None)


class DiTEngine:
    """Owns the pipeline, params and the batching loop."""

    def __init__(self, cfg: PipelineConfig, *, dtype=jnp.float32,
                 mesh=None, max_batch: int = 4, use_vae: bool = True,
                 vae_cfg: VAEConfig | None = None, seed: int = 0):
        self.cfg = cfg
        self.max_batch = max_batch
        vcfg = vae_cfg or VAEConfig(latent_channels=cfg.model.in_channels)
        vae = VAEDecoder(vcfg, dtype) if use_vae else None
        # cond_dim > 0 = a fill transformer (reference
        # pipeline_flux_fill.h:21): the pipeline gains generate_fill and
        # the engine an image+mask edit path through the VAE encoder
        self.is_fill = cfg.model.cond_dim > 0
        pipe_cls = FluxFillPipeline if self.is_fill else DiTPipeline
        self.pipeline = pipe_cls(cfg, dtype=dtype, mesh=mesh, vae=vae)
        self.vae_encoder = (
            VAEEncoder(vcfg, dtype) if (use_vae and self.is_fill) else None
        )
        self.encoder = HashTextEncoder(cfg.model.text_dim,
                                       cfg.model.pooled_dim)
        rng = jax.random.PRNGKey(seed)
        r1, r2, r3 = jax.random.split(rng, 3)
        # checkpoint loading plugs in here (flux safetensors mapping);
        # random init keeps the serving path exercisable without weights
        self.params = self.pipeline.model.init_params(r1)
        self.vae_params = vae.init_params(r2) if vae else None
        self.vae_encoder_params = (
            self.vae_encoder.init_params(r3) if self.vae_encoder else None
        )
        if self.is_fill:
            # SD/flux VAEs downsample 8x; the tiny test VAE (one
            # downsample) spans 2^(len(mults)-1)
            self.pipeline.vae_scale = 2 ** (len(vcfg.channel_mults) - 1)
        self._queue: "queue.Queue[DiTRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- serving loop ---------------------------------------------------
    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def submit(self, req: DiTRequest) -> DiTRequest:
        self._queue.put(req)
        return req

    def _loop(self):
        pending: list[DiTRequest] = []
        while not self._stop.is_set():
            try:
                pending.append(self._queue.get(timeout=0.05))
            except queue.Empty:
                if not pending:
                    continue
            # drain without blocking, then group by compatible shape
            while len(pending) < self.max_batch:
                try:
                    pending.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            key = pending[0].batch_key()
            batch = [r for r in pending if r.batch_key() == key]
            batch = batch[: self.max_batch]
            for r in batch:
                pending.remove(r)
            try:
                self._run_batch(batch)
            except Exception as e:  # noqa: BLE001 — fail the batch, not the loop
                logger.exception("dit batch failed")
                for r in batch:
                    r.error = str(e)
                    r.done.set()

    # -- execution ------------------------------------------------------
    def _run_batch(self, batch: list[DiTRequest]):
        lat_h = batch[0].height // 8
        lat_w = batch[0].width // 8
        txt, pooled = self.encoder.encode([r.prompt for r in batch])
        neg_txt = neg_pooled = None
        if batch[0].negative_prompt is not None:
            neg_txt, neg_pooled = self.encoder.encode(
                [r.negative_prompt or "" for r in batch])
        out, stats = self.pipeline.generate(
            self.params, txt, pooled,
            neg_txt_embeds=neg_txt, neg_pooled=neg_pooled,
            height=lat_h, width=lat_w,
            num_inference_steps=batch[0].num_inference_steps,
            seed=batch[0].seed, vae_params=self.vae_params)
        arr = np.asarray(out)  # forces sync (axon: block_until_ready lies)
        if self.vae_params is not None:
            imgs = ((arr + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        else:
            imgs = arr  # raw latents
        for i, r in enumerate(batch):
            r.result = imgs[i]
            r.stats = stats
            r.done.set()

    # -- sync convenience ----------------------------------------------
    def generate(self, req: DiTRequest, timeout: float = 600.0):
        if self._thread is None:
            self.start()
        self.submit(req)
        if not req.done.wait(timeout):
            raise TimeoutError("dit generation timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result, req.stats

    # -- image editing (fill transformer; /v1/images/edits) -------------
    def edit(self, prompt: str, image: np.ndarray, mask: np.ndarray, *,
             negative_prompt: str | None = None,
             num_inference_steps: int | None = None,
             strength: float = 1.0, seed: int = 0):
        """Inpaint ``image`` (uint8 [H,W,3]) where ``mask`` (uint8/bool
        [H,W], nonzero = repaint) under ``prompt`` (reference
        pipeline_flux_fill.h forward: mask the pixels, VAE-encode the
        masked image, condition every denoise step on the packed
        latents+mask). Returns (uint8 image, stats) synchronously — edits
        are single requests, not batched with text->image traffic."""
        if not self.is_fill or self.vae_encoder is None:
            raise RuntimeError(
                "image edits need a fill transformer (model.cond_dim > 0)"
                " and a VAE"
            )
        img = image.astype(np.float32) / 127.5 - 1.0  # [-1, 1]
        m = (np.asarray(mask) > 0).astype(np.float32)
        masked = img * (1.0 - m[..., None])
        lat = self.vae_encoder.encode(
            self.vae_encoder_params, jnp.asarray(masked[None])
        )
        txt, pooled = self.encoder.encode([prompt])
        neg_txt = neg_pooled = None
        if negative_prompt is not None:
            neg_txt, neg_pooled = self.encoder.encode([negative_prompt])
        out, stats = self.pipeline.generate_fill(
            self.params, txt, pooled,
            image_latents=lat,
            mask=jnp.asarray(m[None]),
            neg_txt_embeds=neg_txt, neg_pooled=neg_pooled,
            num_inference_steps=num_inference_steps,
            strength=strength, seed=seed,
            vae_params=self.vae_params,
        )
        arr = np.asarray(out[0])
        img8 = ((arr + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        return img8, stats


def png_b64(img: np.ndarray) -> str:
    """uint8 [H,W,3] -> base64 PNG (OpenAI images API b64_json field)."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()
