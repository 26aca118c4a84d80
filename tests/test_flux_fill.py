"""Flux-fill pipeline (reference pipeline_flux_fill.h): mask packing
parity against a torch mirror of the reference code, fill-pipeline
semantics, the VAE encoder, and the /v1/images/edits route."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xllm_tpu.dit.model import DiTConfig
from xllm_tpu.dit.pipeline import (
    DiTCacheConfig,
    FluxFillPipeline,
    PipelineConfig,
    pack_fill_mask,
)
from xllm_tpu.dit.vae import VAEConfig, VAEDecoder, VAEEncoder


def _tiny_cfg(cond=True):
    model = DiTConfig(
        in_channels=4, patch_size=2, hidden_size=64, num_heads=2,
        num_double_blocks=1, num_single_blocks=2, text_dim=32,
        pooled_dim=16, guidance_embed=True, axes_dim=(16, 16),
        cond_dim=(4 * 4 + 2 * 2 * 2 * 2) if cond else 0,  # 16 + 16
    )
    return PipelineConfig(
        model=model, cache=DiTCacheConfig(policy="none"),
        num_inference_steps=3, use_dynamic_shifting=False, shift=1.0,
    )


def test_pack_fill_mask_matches_reference_torch_mirror():
    """Torch mirror of pipeline_flux_fill.h:190-198 (channels-first view/
    permute/reshape + pack_latents) vs our channels-last packing."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B, H, W, vs, p = 2, 16, 24, 2, 2
    h, w = H // vs, W // vs
    mask_np = rng.integers(0, 2, (B, H, W)).astype(np.float32)

    # ---- reference (channels-first, torch) ----
    mask = torch.from_numpy(mask_np)  # already the selected channel 0
    m = mask.view(B, h, vs, w, vs)
    m = m.permute(0, 2, 4, 1, 3)
    m = m.reshape(B, vs * vs, h, w)
    # pack_latents: [B, C, h, w] -> [B, (h/2)*(w/2), C*4]
    m = m.view(B, vs * vs, h // p, p, w // p, p)
    m = m.permute(0, 2, 4, 1, 3, 5)
    ref = m.reshape(B, (h // p) * (w // p), vs * vs * p * p).numpy()

    ours = np.asarray(pack_fill_mask(jnp.asarray(mask_np), vs, p))
    assert ours.shape == ref.shape
    # both orderings carry identical per-token sub-pixel sets; our
    # channel-last layout permutes features within a token relative to
    # the reference (consistent with our own img_in weight layout), so
    # compare as per-token SETS and pin our exact layout separately
    np.testing.assert_array_equal(np.sort(ours, -1), np.sort(ref, -1))
    # exact layout pin: feature index = ((pi*p + pj) * vs + si) * vs + sj
    B0, t = 0, 1
    gh, gw = h // p, w // p
    ti, tj = t // gw, t % gw
    for pi in range(p):
        for pj in range(p):
            for si in range(vs):
                for sj in range(vs):
                    feat = ((pi * p + pj) * vs + si) * vs + sj
                    pix = mask_np[B0, (ti * p + pi) * vs + si,
                                  (tj * p + pj) * vs + sj]
                    assert ours[B0, t, feat] == pix


def test_fill_pipeline_conditions_on_mask():
    """The fill pipeline runs end-to-end and the conditioning MATTERS:
    different masks change the output; strength slices the schedule."""
    cfg = _tiny_cfg()
    pipe = FluxFillPipeline(cfg, dtype=jnp.float32)
    pipe.vae_scale = 2
    params = pipe.model.init_params(jax.random.PRNGKey(0))
    # the final projection is zero-init (adaLN-zero): a random-init
    # model would emit a constant velocity and mask sensitivity could
    # not show — give it weights
    params["final_w"] = (
        jax.random.normal(jax.random.PRNGKey(9),
                          params["final_w"].shape) * 0.05
    ).astype(params["final_w"].dtype)
    rng = np.random.default_rng(1)
    B, h, w = 1, 8, 8
    H, W = h * 2, w * 2
    txt = jnp.asarray(rng.standard_normal((B, 5, 32)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
    lat = jnp.asarray(rng.standard_normal((B, h, w, 4)), jnp.float32)
    mask1 = np.zeros((B, H, W), np.float32)
    mask1[:, :8, :8] = 1.0
    mask2 = np.ones((B, H, W), np.float32)

    out1, stats = pipe.generate_fill(
        params, txt, pooled, image_latents=lat,
        mask=jnp.asarray(mask1), seed=3)
    out2, _ = pipe.generate_fill(
        params, txt, pooled, image_latents=lat,
        mask=jnp.asarray(mask2), seed=3)
    assert out1.shape == (B, h, w, 4)
    assert np.isfinite(np.asarray(out1)).all()
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6
    assert stats["steps"] == cfg.num_inference_steps

    # strength < 1 runs fewer steps from a noised copy of the input
    out3, stats3 = pipe.generate_fill(
        params, txt, pooled, image_latents=lat,
        mask=jnp.asarray(mask2), strength=2 / 3, seed=3)
    assert stats3["steps"] == 2
    assert np.isfinite(np.asarray(out3)).all()


def test_vae_encoder_shapes_and_determinism():
    cfg = VAEConfig(latent_channels=4, base_channels=8,
                    channel_mults=(1, 2), layers_per_block=1, norm_groups=4)
    enc = VAEEncoder(cfg)
    dec = VAEDecoder(cfg)
    ep = enc.init_params(jax.random.PRNGKey(0))
    dp = dec.init_params(jax.random.PRNGKey(1))
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 16, 3)),
        jnp.float32).clip(-1, 1)
    z = enc.encode(ep, img)
    assert z.shape == (1, 8, 8, 4)  # one 2x downsample (mults len 2)
    np.testing.assert_array_equal(np.asarray(z),
                                  np.asarray(enc.encode(ep, img)))
    z2 = enc.encode(ep, img, rng=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(z) - np.asarray(z2)).max() > 0  # sampled
    out = dec.decode(dp, z)
    assert out.shape == (1, 16, 16, 3)


def test_images_edits_route():
    """/v1/images/edits end-to-end over the fill engine (reference
    ImageGeneration service + pipeline_flux_fill pairing)."""
    import asyncio
    import base64
    import io

    from PIL import Image

    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.dit.engine import DiTEngine
    from xllm_tpu.dit.service import DiTServer as DiTService

    engine = DiTEngine(
        _tiny_cfg(), use_vae=True,
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8,
                          channel_mults=(1, 2), layers_per_block=1,
                          norm_groups=4),
    )
    assert engine.is_fill and engine.pipeline.vae_scale == 2

    def b64_png(arr, mode):
        buf = io.BytesIO()
        Image.fromarray(arr, mode).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    H = W = 16  # multiple of vae_scale * patch = 4
    img = (np.random.default_rng(0)
           .integers(0, 255, (H, W, 3)).astype(np.uint8))
    mask = np.zeros((H, W), np.uint8)
    mask[:8] = 255

    async def drive():
        app = DiTService(engine).build_app()
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/v1/images/edits", json={
                "prompt": "a red roof", "image": b64_png(img, "RGB"),
                "mask": b64_png(mask, "L"), "num_inference_steps": 2,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            out = Image.open(io.BytesIO(
                base64.b64decode(body["data"][0]["b64_json"])))
            assert out.size == (W, H)
            # bad requests reject cleanly
            r2 = await client.post("/v1/images/edits", json={
                "prompt": "x", "image": b64_png(img, "RGB"),
                "mask": b64_png(np.zeros((8, 8), np.uint8), "L"),
            })
            assert r2.status == 400
        finally:
            await client.close()

    asyncio.run(drive())
