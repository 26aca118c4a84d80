"""DiT stack tests: model, caches, pipeline, Ulysses SP, engine.

Coverage model follows the reference's dit_cache tests + pipeline smoke
(xllm/core/framework/dit_cache/, xllm/models/dit/).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xllm_tpu.dit import (DiTCacheConfig, DiTConfig, DiTEngine, DiTModel,
                          DiTPipeline, DiTRequest, PipelineConfig,
                          VAEConfig, VAEDecoder, flow_match_sigmas,
                          make_dit_cache, png_b64)
from xllm_tpu.dit.cache import _TaylorStack
from xllm_tpu.dit.engine import HashTextEncoder
from xllm_tpu.dit.pipeline import PipelineConfig


def tiny_cfg(**kw):
    base = dict(in_channels=4, patch_size=2, hidden_size=64, num_heads=4,
                num_double_blocks=2, num_single_blocks=2, text_dim=32,
                pooled_dim=16, axes_dim=(8, 8))
    base.update(kw)
    return DiTConfig(**base)


def make_inputs(cfg, rng, b=2, h=8, w=8, t=6):
    ks = jax.random.split(rng, 4)
    lat = jax.random.normal(ks[0], (b, h, w, cfg.in_channels))
    txt = jax.random.normal(ks[1], (b, t, cfg.text_dim)) * 0.2
    pooled = jax.random.normal(ks[2], (b, cfg.pooled_dim)) * 0.2
    return lat, txt, pooled


class TestModel:
    def test_forward_shape_and_finite(self):
        cfg = tiny_cfg()
        model = DiTModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        lat, txt, pooled = make_inputs(cfg, jax.random.PRNGKey(1))
        t = jnp.full((2,), 0.5)
        g = jnp.full((2,), 3.5)
        out = model.forward(params, lat, txt, t, pooled, g)
        assert out.shape == lat.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_token_space_matches_image_space(self):
        """embed_tokens/final_tokens path == embed/final path."""
        cfg = tiny_cfg()
        model = DiTModel(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        lat, txt, pooled = make_inputs(cfg, jax.random.PRNGKey(1))
        t = jnp.full((2,), 0.7)
        g = jnp.full((2,), 1.0)

        ref = model.forward(params, lat, txt, t, pooled, g)

        toks = model.patchify(lat)
        gh = gw = 8 // cfg.patch_size
        ang = model.rope_img(gh, gw)
        full = jnp.concatenate(
            [jnp.zeros((txt.shape[1], ang.shape[-1])), ang])
        rope = (jnp.cos(full), jnp.sin(full))
        img, txt_e, vec = model.embed_tokens(params, toks, txt, t, pooled, g)
        img, txt_e = model.block0(params, img, txt_e, vec, rope)
        img, txt_e = model.rest(params, img, txt_e, vec, rope)
        out = model.unpatchify(model.final_tokens(params, img, vec), (gh, gw))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=2e-5, atol=2e-5)

    def test_patchify_roundtrip(self):
        cfg = tiny_cfg()
        model = DiTModel(cfg)
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        toks = model.patchify(lat)
        back = model.unpatchify(toks, (4, 4))
        np.testing.assert_array_equal(np.asarray(lat), np.asarray(back))


class TestTaylorStack:
    def test_exact_on_linear(self):
        """The reference's d^i/i! Taylor form (taylorseer.cpp:84) with
        backward differences is exact for linear sequences."""
        stack = _TaylorStack(2)
        st = stack.init((1,), jnp.float32)

        def y(t):
            return jnp.asarray([4.0 * t - 1.5], jnp.float32)

        for s in range(3):
            st = stack.update(st, y(s), jnp.asarray(s, jnp.int32))
        for probe in (3, 4, 6):
            pred = stack.predict(st, jnp.asarray(probe, jnp.int32))
            np.testing.assert_allclose(np.asarray(pred), np.asarray(y(probe)),
                                       rtol=1e-5, atol=1e-5)

    def test_quadratic_uses_second_derivative(self):
        """On a quadratic the order-2 prediction beats order-1 (the
        formula is approximate, matching taylorseer.cpp, not Newton)."""

        def y(t):
            return jnp.asarray([0.5 * t * t - 3.0 * t + 2.0], jnp.float32)

        preds = {}
        for order in (1, 2):
            stack = _TaylorStack(order)
            st = stack.init((1,), jnp.float32)
            for s in range(3):
                st = stack.update(st, y(s), jnp.asarray(s, jnp.int32))
            preds[order] = float(
                stack.predict(st, jnp.asarray(3, jnp.int32))[0])
        truth = float(y(3)[0])
        assert abs(preds[2] - truth) <= abs(preds[1] - truth)


def _run_cache(policy_cfg, num_steps=8, seed=0):
    """Drive a cache policy through a toy 'model' inside lax.scan."""
    cache = make_dit_cache(policy_cfg, num_steps)
    img0 = jax.random.normal(jax.random.PRNGKey(seed), (1, 4, 8))
    txt0 = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, 3, 8))
    state = cache.init(img0.shape, txt0.shape, jnp.float32)

    def rest_fn(i, t):
        return i * 1.01 + 0.1, t * 0.99

    def body(carry, idx):
        (img, txt), st = carry
        r0 = img * 0.01  # slowly-varying probe
        (img, txt), st = cache.step(st, idx, img, txt, r0, rest_fn)
        return ((img, txt), st), img.sum()

    ((img, txt), state), trace = jax.lax.scan(
        body, ((img0, txt0), state), jnp.arange(num_steps))
    return np.asarray(img), int(state["skips"]), np.asarray(trace)


class TestCachePolicies:
    def test_fbcache_zero_threshold_matches_none(self):
        none_img, none_skips, none_trace = _run_cache(
            DiTCacheConfig(policy="none"))
        fb_img, fb_skips, fb_trace = _run_cache(
            DiTCacheConfig(policy="fbcache", residual_diff_threshold=0.0))
        assert fb_skips == 0
        np.testing.assert_allclose(none_img, fb_img, rtol=1e-6)
        np.testing.assert_allclose(none_trace, fb_trace, rtol=1e-6)

    def test_fbcache_huge_threshold_skips(self):
        _, skips, _ = _run_cache(
            DiTCacheConfig(policy="fbcache", residual_diff_threshold=1e9,
                           warmup_steps=2))
        # steps 0 and 1 compute (warmup covers the cold cache); 2..7 skip
        assert skips == 6

    def test_taylorseer_interval_one_matches_none(self):
        none_img, _, none_trace = _run_cache(DiTCacheConfig(policy="none"))
        ts_img, ts_skips, ts_trace = _run_cache(
            DiTCacheConfig(policy="taylorseer", skip_interval_steps=1))
        assert ts_skips == 0
        np.testing.assert_allclose(none_img, ts_img, rtol=1e-6)

    def test_taylorseer_skips_on_interval(self):
        _, skips, _ = _run_cache(
            DiTCacheConfig(policy="taylorseer", skip_interval_steps=3,
                           warmup_steps=1))
        # steps 0,3,6 full (interval) + final step 7 full -> 4 computes
        assert skips == 4

    def test_fbcache_taylorseer_runs(self):
        img, skips, _ = _run_cache(
            DiTCacheConfig(policy="fbcache_taylorseer",
                           residual_diff_threshold=1e9, warmup_steps=2))
        assert np.isfinite(img).all()
        assert skips > 0

    def test_residual_policy_positional(self):
        _, skips, _ = _run_cache(
            DiTCacheConfig(policy="residual", start_steps=2, end_steps=2,
                           skip_interval_steps=2), num_steps=10)
        # window = steps 2..7; computes at 2,4,6 (even), skips 3,5,7
        assert skips == 3

    def test_unknown_policy_rejected(self):
        with pytest.raises(ValueError):
            make_dit_cache(DiTCacheConfig(policy="bogus"), 4)


class TestScheduler:
    def test_sigma_schedule_monotone(self):
        s = flow_match_sigmas(16, image_seq_len=256)
        assert s[0] > s[-2] > s[-1] == 0.0
        assert (np.diff(s) < 0).all()
        s2 = flow_match_sigmas(8, use_dynamic_shifting=False, shift=3.0)
        assert s2.shape == (9,)
        assert abs(s2[0] - 1.0) < 1e-6


class TestPipeline:
    def test_generate_latents_finite(self):
        cfg = PipelineConfig(model=tiny_cfg(), num_inference_steps=4)
        pipe = DiTPipeline(cfg)
        params = pipe.model.init_params(jax.random.PRNGKey(0))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32)) * 0.2
        pooled = jnp.zeros((1, 16))
        lat, stats = pipe.generate(params, txt, pooled, height=8, width=8)
        assert lat.shape == (1, 8, 8, 4)
        assert np.isfinite(np.asarray(lat)).all()
        assert stats["steps"] == 4

    def test_fbcache_skips_in_pipeline(self):
        cfg = PipelineConfig(
            model=tiny_cfg(),
            cache=DiTCacheConfig(policy="fbcache",
                                 residual_diff_threshold=1e9,
                                 warmup_steps=1),
            num_inference_steps=6)
        pipe = DiTPipeline(cfg)
        params = pipe.model.init_params(jax.random.PRNGKey(0))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32)) * 0.2
        pooled = jnp.zeros((1, 16))
        lat, stats = pipe.generate(params, txt, pooled, height=8, width=8)
        assert stats["cache_skips"] >= 3
        assert np.isfinite(np.asarray(lat)).all()

    def test_true_cfg(self):
        cfg = PipelineConfig(model=tiny_cfg(), num_inference_steps=3,
                             true_cfg_scale=2.0)
        pipe = DiTPipeline(cfg)
        params = pipe.model.init_params(jax.random.PRNGKey(0))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32)) * 0.2
        neg = jnp.zeros_like(txt)
        pooled = jnp.zeros((1, 16))
        lat, _ = pipe.generate(params, txt, pooled, neg_txt_embeds=neg,
                               neg_pooled=pooled, height=8, width=8)
        assert np.isfinite(np.asarray(lat)).all()


class TestUlyssesSP:
    def test_sp_parity_with_single_device(self):
        """4-way Ulysses SP == single-device, same seed/params."""
        from jax.sharding import Mesh

        cfg = PipelineConfig(model=tiny_cfg(), num_inference_steps=3)
        ref_pipe = DiTPipeline(cfg)
        params = ref_pipe.model.init_params(jax.random.PRNGKey(0))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32)) * 0.2
        pooled = jnp.zeros((1, 16))
        ref, _ = ref_pipe.generate(params, txt, pooled, height=8, width=8)

        mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
        sp_pipe = DiTPipeline(cfg, mesh=mesh)
        out, _ = sp_pipe.generate(params, txt, pooled, height=8, width=8)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=2e-4, atol=2e-4)

    def test_sp_parity_with_fbcache(self):
        """The pmean'd similarity gate keeps ranks consistent."""
        from jax.sharding import Mesh

        cfg = PipelineConfig(
            model=tiny_cfg(),
            cache=DiTCacheConfig(policy="fbcache",
                                 residual_diff_threshold=0.3,
                                 warmup_steps=1),
            num_inference_steps=4)
        ref_pipe = DiTPipeline(cfg)
        params = ref_pipe.model.init_params(jax.random.PRNGKey(0))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32)) * 0.2
        pooled = jnp.zeros((1, 16))
        ref, rstats = ref_pipe.generate(params, txt, pooled,
                                        height=8, width=8)

        mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
        sp_pipe = DiTPipeline(cfg, mesh=mesh)
        out, sstats = sp_pipe.generate(params, txt, pooled,
                                       height=8, width=8)
        assert rstats["cache_skips"] == sstats["cache_skips"]
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=2e-4, atol=2e-4)


class TestVAE:
    def test_decode_shape(self):
        cfg = VAEConfig(latent_channels=4, base_channels=8,
                        channel_mults=(1, 2), norm_groups=4)
        vae = VAEDecoder(cfg)
        params = vae.init_params(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
        img = vae.decode(params, z)
        assert img.shape == (1, 8, 8, 3)
        assert np.abs(np.asarray(img)).max() <= 1.0


class TestEngine:
    def test_engine_end_to_end(self):
        cfg = PipelineConfig(model=tiny_cfg(), num_inference_steps=2)
        # pixel 16 -> latent 2; VAE must upsample 8x -> 4 mult levels
        eng = DiTEngine(cfg, max_batch=2, use_vae=True,
                        vae_cfg=VAEConfig(latent_channels=4,
                                          base_channels=8,
                                          channel_mults=(1, 1, 1, 1),
                                          norm_groups=4))
        img, stats = eng.generate(
            DiTRequest(prompt="a red fox", height=16, width=16), timeout=120)
        assert img.shape == (16, 16, 3)
        assert img.dtype == np.uint8
        b64 = png_b64(img)
        assert len(b64) > 100
        eng.stop()

    def test_hash_encoder_deterministic(self):
        enc = HashTextEncoder(32, 16)
        a1, p1 = enc.encode(["hello"])
        a2, p2 = enc.encode(["hello"])
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


class TestService:
    def test_images_generations_endpoint(self):
        import asyncio
        import base64

        from aiohttp.test_utils import TestClient, TestServer

        from xllm_tpu.dit.service import DiTServer

        cfg = PipelineConfig(model=tiny_cfg(), num_inference_steps=2)
        eng = DiTEngine(cfg, max_batch=2, use_vae=True,
                        vae_cfg=VAEConfig(latent_channels=4,
                                          base_channels=8,
                                          channel_mults=(1, 1, 1, 1),
                                          norm_groups=4))
        eng.start()
        server = DiTServer(eng, model_name="tiny-dit")
        loop = asyncio.new_event_loop()
        client = TestClient(TestServer(server.build_app()), loop=loop)
        loop.run_until_complete(client.start_server())
        try:
            async def go():
                r = await client.get("/health")
                assert r.status == 200
                r = await client.post("/v1/images/generations", json={
                    "prompt": "a fox", "size": "16x16",
                    "num_inference_steps": 2})
                assert r.status == 200, await r.text()
                data = await r.json()
                png = base64.b64decode(data["data"][0]["b64_json"])
                assert png[:4] == b"\x89PNG"
                # bad size rejected
                r = await client.post("/v1/images/generations", json={
                    "prompt": "x", "size": "15x15"})
                assert r.status == 400

            loop.run_until_complete(go())
        finally:
            loop.run_until_complete(client.close())
            loop.close()
            eng.stop()


class TestCFGParallel:
    def test_cfg_parallel_parity_with_sequential(self):
        """(cfg=2, sp=2) CFG-parallel == sequential CFG, same inputs
        (reference DiT CFG-parallel axis, parallel_args.h:91-106): the
        guided combine v_u + s*(v_c - v_u) becomes one psum of
        coef_i * v_i over the 2-wide cfg axis."""
        from jax.sharding import Mesh

        cfg = PipelineConfig(model=tiny_cfg(), num_inference_steps=3,
                             true_cfg_scale=2.0)
        ref_pipe = DiTPipeline(cfg)
        params = ref_pipe.model.init_params(jax.random.PRNGKey(0))
        txt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32)) * 0.2
        neg = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 32)) * 0.1
        pooled = jnp.zeros((1, 16))
        ref, _ = ref_pipe.generate(params, txt, pooled,
                                   neg_txt_embeds=neg, neg_pooled=pooled,
                                   height=8, width=8)

        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                    ("cfg", "sp"))
        par_pipe = DiTPipeline(cfg, mesh=mesh, cfg_axis="cfg")
        assert par_pipe.cfg_axis == "cfg"
        out, _ = par_pipe.generate(params, txt, pooled,
                                   neg_txt_embeds=neg, neg_pooled=pooled,
                                   height=8, width=8)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=2e-4, atol=2e-4)

    def test_cfg_axis_requires_width_two(self):
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1),
                    ("cfg", "sp"))
        pipe = DiTPipeline(PipelineConfig(model=tiny_cfg()), mesh=mesh,
                           cfg_axis="cfg")
        assert pipe.cfg_axis is None  # 4-wide axis rejected


class TestVAEParallel:
    def test_vae_parallel_parity(self):
        """VAE decode with the latent H dim sharded over sp == plain
        decode (GSPMD conv halo exchange; reference VAE-parallel axis,
        parallel_args.h:91-106)."""
        from jax.sharding import Mesh

        vcfg = VAEConfig(latent_channels=4, base_channels=8,
                         channel_mults=(1, 2), norm_groups=4)
        vae = VAEDecoder(vcfg)
        params = vae.init_params(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        ref = vae.decode(params, z)

        mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
        pipe = DiTPipeline(PipelineConfig(model=tiny_cfg()), mesh=mesh,
                           vae=vae)
        out = pipe._vae_decode(params, z)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=2e-4, atol=2e-4)

    def test_vae_parallel_indivisible_falls_back(self):
        from jax.sharding import Mesh

        vcfg = VAEConfig(latent_channels=4, base_channels=8,
                         channel_mults=(1, 2), norm_groups=4)
        vae = VAEDecoder(vcfg)
        params = vae.init_params(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 6, 4))
        mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
        pipe = DiTPipeline(PipelineConfig(model=tiny_cfg()), mesh=mesh,
                           vae=vae)
        out = pipe._vae_decode(params, z)  # 6 % 4 != 0 -> plain path
        assert out.shape[1] == 12
