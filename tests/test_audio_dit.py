"""Audio DiT subsystem: conv helpers (torch parity), VAE, transformer,
APG guidance, pipeline E2E.

Counterpart of the reference's LongCat audio DiT stack
(reference xllm/models/dit/transformers/transformer_longcat_audiodit.h,
pipelines/pipeline_longcat_audiodit.h) on tiny random-weight configs.
"""

import numpy as np
import pytest

from xllm_tpu.dit.audio import (
    AudioDiT,
    AudioDiTConfig,
    AudioPipeline,
    AudioPipelineConfig,
    AudioVae,
    AudioVaeConfig,
    apg_step,
    approx_duration_from_text,
    conv1d,
    conv_transpose1d,
    pixel_shuffle_1d,
    pixel_unshuffle_1d,
)

import jax
import jax.numpy as jnp


def tiny_vae():
    return AudioVaeConfig(
        channels=8, c_mults=(1, 2), strides=(2, 4), latent_dim=4, scale=0.7
    )


def tiny_dit(**kw):
    base = dict(
        dim=32, depth=4, heads=4, ff_mult=2.0, latent_dim=4, text_dim=16,
        repa_layer=2,
    )
    base.update(kw)
    return AudioDiTConfig(**base)


# ---------------------------------------------------------------------------
def test_conv1d_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 40)).astype(np.float32)
    w = rng.standard_normal((5, 3, 7)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    for stride, pad, dil in [(1, 3, 1), (2, 3, 1), (1, 6, 2), (4, 2, 1)]:
        want = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=pad, dilation=dil,
        ).numpy()
        got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), stride, pad, dil))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_transpose1d_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 20)).astype(np.float32)
    for in_ch, out_ch, stride in [(6, 4, 2), (6, 3, 4), (6, 5, 8)]:
        k = 2 * stride
        pad = -(-stride // 2)  # ceil
        w = rng.standard_normal((in_ch, out_ch, k)).astype(np.float32)
        b = rng.standard_normal(out_ch).astype(np.float32)
        want = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=pad,
        ).numpy()
        got = np.asarray(conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride, pad
        ))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pixel_shuffle_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 4, 12)).astype(np.float32))
    y = pixel_unshuffle_1d(x, 4)
    assert y.shape == (2, 16, 3)
    z = pixel_shuffle_1d(y, 4)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


# ---------------------------------------------------------------------------
def test_vae_roundtrip_shapes():
    cfg = tiny_vae()
    vae = AudioVae(cfg)
    params = vae.init_params(jax.random.key(0))
    t = 64  # divisible by ratio 8
    audio = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 1, t)).astype(np.float32)
    )
    lat = vae.encode(params, audio)
    assert lat.shape == (2, cfg.latent_dim, t // cfg.downsampling_ratio)
    wav = vae.decode(params, lat)
    assert wav.shape == (2, 1, t)
    assert np.isfinite(np.asarray(wav)).all()
    # deterministic encode without rng; stochastic with
    lat2 = vae.encode(params, audio)
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(lat2))
    lat3 = vae.encode(params, audio, rng=jax.random.key(1))
    assert not np.array_equal(np.asarray(lat), np.asarray(lat3))


# ---------------------------------------------------------------------------
def test_dit_forward_shape_and_mask_invariance():
    cfg = tiny_dit()
    model = AudioDiT(cfg)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(4)
    b, s, st = 2, 10, 6
    x = jnp.asarray(rng.standard_normal((b, s, 4)).astype(np.float32))
    text = jnp.asarray(rng.standard_normal((b, st, 16)).astype(np.float32))
    text_len = jnp.asarray([6, 3])
    t = jnp.asarray([0.2, 0.7], jnp.float32)
    cond_mask = jnp.arange(st)[None, :] < text_len[:, None]
    lc = jnp.zeros((b, s, 4), jnp.float32)

    out = model.forward(params, x, text, text_len, t,
                        cond_mask=cond_mask, latent_cond=lc)
    assert out.shape == (b, s, 4)
    assert np.isfinite(np.asarray(out)).all()

    # masked text positions must not influence the output
    text2 = text.at[1, 3:].set(99.0)  # junk beyond row 1's text_len=3
    out2 = model.forward(params, x, text2, text_len, t,
                         cond_mask=cond_mask, latent_cond=lc)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-5
    )


def test_dit_long_skip_changes_output():
    """long_skip re-injects the embedded input after the repa block and at
    the end; disabling it must change the function."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 4)).astype(np.float32))
    text = jnp.asarray(rng.standard_normal((1, 4, 16)).astype(np.float32))
    tl = jnp.asarray([4])
    t = jnp.asarray([0.5], jnp.float32)
    m1 = AudioDiT(tiny_dit(long_skip=True))
    m2 = AudioDiT(tiny_dit(long_skip=False))
    p = m1.init_params(jax.random.key(1))
    o1 = m1.forward(p, x, text, tl, t, cond_mask=jnp.ones((1, 4), bool))
    o2 = m2.forward(p, x, text, tl, t, cond_mask=jnp.ones((1, 4), bool))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_all_masked_cross_attention_is_finite():
    """The unconditional pass masks ALL text tokens; softmax over an
    all--inf row must produce zeros, not NaN (reference nan_to_num,
    transformer_longcat_audiodit.h:1063)."""
    cfg = tiny_dit()
    model = AudioDiT(cfg)
    params = model.init_params(jax.random.key(2))
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 8, 4)).astype(np.float32))
    text = jnp.zeros((1, 4, 16), jnp.float32)
    out = model.forward(
        params, x, text, jnp.asarray([0]), jnp.asarray([0.3], jnp.float32),
        cond_mask=jnp.zeros((1, 4), bool),
    )
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
def test_apg_step_reduces_to_projection():
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.standard_normal((1, 6, 4)).astype(np.float32))
    u = jnp.asarray(rng.standard_normal((1, 6, 4)).astype(np.float32))
    avg0 = jnp.zeros_like(c)
    out, avg = apg_step(c, u, 2.0, avg0, step_idx=jnp.asarray(0))
    # first step: running average == diff
    np.testing.assert_allclose(
        np.asarray(avg), np.asarray(c - u), rtol=1e-6
    )
    # eta=1 and guidance=g reduces to plain CFG: out = c + g * diff
    out_cfg, _ = apg_step(c, u, 2.0, avg0, step_idx=jnp.asarray(0), eta=1.0)
    np.testing.assert_allclose(
        np.asarray(out_cfg), np.asarray(c + 2.0 * (c - u)),
        rtol=1e-4, atol=1e-5,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_duration_estimate():
    assert approx_duration_from_text(
        "hello world this is a long sentence"
    ) == pytest.approx(29 * 0.082, abs=1e-6)
    # CJK-heavy strings use the zh rate
    assert approx_duration_from_text("你好世界你好世界") == pytest.approx(
        8 * 0.21, abs=1e-6
    )
    # the 1 s floor (reference pipeline_longcat_audiodit.h dur_sec max)
    assert approx_duration_from_text("hi") == 1.0
    assert approx_duration_from_text("") == 1.0  # floor
    assert approx_duration_from_text("x" * 10000, 30.0) == 30.0  # cap


# ---------------------------------------------------------------------------
def test_pipeline_end_to_end():
    cfg = AudioPipelineConfig(
        dit=tiny_dit(), vae=tiny_vae(), sampling_rate=800,
        num_steps=4, guidance_scale=2.0, guidance_method="apg",
    )
    pipe = AudioPipeline(cfg)
    params = pipe.init_params(jax.random.key(0))
    rng = np.random.default_rng(8)
    text = rng.standard_normal((1, 5, 16)).astype(np.float32)

    wav = pipe.generate(params, jnp.asarray(text), [5],
                        duration_s=2.0, seed=3)
    frames = pipe.frames_for_duration(2.0)
    assert wav.shape == (1, frames * cfg.vae.downsampling_ratio)
    assert np.isfinite(wav).all()

    # determinism under a fixed seed; different seed changes the audio
    wav2 = pipe.generate(params, jnp.asarray(text), [5],
                         duration_s=2.0, seed=3)
    np.testing.assert_array_equal(wav, wav2)
    wav3 = pipe.generate(params, jnp.asarray(text), [5],
                         duration_s=2.0, seed=4)
    assert not np.array_equal(wav, wav3)


def test_pipeline_cfg_and_no_guidance():
    for method, scale in [("cfg", 1.5), ("", 0.0)]:
        cfg = AudioPipelineConfig(
            dit=tiny_dit(), vae=tiny_vae(), sampling_rate=800,
            num_steps=3, guidance_scale=scale, guidance_method=method,
        )
        pipe = AudioPipeline(cfg)
        params = pipe.init_params(jax.random.key(1))
        text = np.random.default_rng(9).standard_normal(
            (2, 4, 16)
        ).astype(np.float32)
        lat = pipe.generate(params, jnp.asarray(text), [4, 2],
                            duration_s=1.0, seed=0, decode=False)
        assert lat.shape[0] == 2 and np.isfinite(np.asarray(lat)).all()


def test_audio_generations_endpoint():
    import asyncio
    import base64
    import io
    import wave as wave_mod

    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.dit.audio_service import AudioServer

    cfg = AudioPipelineConfig(
        dit=tiny_dit(), vae=tiny_vae(), sampling_rate=800,
        num_steps=3, guidance_scale=2.0,
    )
    pipe = AudioPipeline(cfg)
    params = pipe.init_params(jax.random.key(0))
    server = AudioServer(pipe, params, model_name="tiny-audio")
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(server.build_app()), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def go():
            r = await client.get("/health")
            assert r.status == 200
            r = await client.post("/v1/audio/generations", json={
                "prompt": "a short chime", "duration_s": 1.0, "seed": 1,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            item = body["data"][0]
            assert item["sample_rate"] == 800
            raw = base64.b64decode(item["b64_wav"])
            with wave_mod.open(io.BytesIO(raw)) as w:
                assert w.getnchannels() == 1
                assert w.getframerate() == 800
                assert w.getnframes() > 0
            # missing prompt -> 400
            r = await client.post("/v1/audio/generations", json={})
            assert r.status == 400

        loop.run_until_complete(go())
    finally:
        loop.run_until_complete(client.close())
        loop.close()
