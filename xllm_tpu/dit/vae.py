"""Latent-space VAE decoder (flux/SD AutoencoderKL class) in JAX.

Counterpart of the reference's DiT VAE stack (xllm/models/dit/ — VAE
decode stage of the flux/qwen-image pipelines; ~`vae.h/cpp` in
models/dit/autoencoder_*). TPU-native notes: NHWC layout (XLA's native
conv layout on TPU), GroupNorm in f32, nearest-neighbour upsample +
conv, everything jittable with static shapes so the whole decode is one
fused XLA program.

Structure mirrors diffusers' AutoencoderKL decoder: conv_in → mid
(resnet, attention, resnet) → up blocks (resnets + upsample) → norm_out
→ conv_out. Scaling/shift factors are applied by the pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class VAEConfig:
    latent_channels: int = 16
    out_channels: int = 3
    base_channels: int = 32          # channels at the output resolution
    channel_mults: tuple = (1, 2)    # reversed while decoding
    layers_per_block: int = 1
    norm_groups: int = 8
    scaling_factor: float = 0.3611   # flux defaults
    shift_factor: float = 0.1159


def _conv(x, w, b, stride=1):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def _group_norm(x, gamma, beta, groups):
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mu = x32.mean((1, 2, 4), keepdims=True)
    var = x32.var((1, 2, 4), keepdims=True)
    x32 = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
    return (x32.reshape(b, h, w, c) * gamma + beta).astype(x.dtype)


class VAEDecoder:
    def __init__(self, cfg: VAEConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype

    # -- params ---------------------------------------------------------
    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        ks = iter(jax.random.split(rng, 256))

        def w(*shape, scale=0.05):
            return (jax.random.normal(next(ks), shape) * scale).astype(
                self.dtype)

        def conv_p(cin, cout, k=3):
            return {"w": w(k, k, cin, cout), "b": jnp.zeros((cout,),
                                                            self.dtype)}

        def resnet_p(cin, cout):
            p = {
                "n1g": jnp.ones((cin,), self.dtype),
                "n1b": jnp.zeros((cin,), self.dtype),
                "c1": conv_p(cin, cout),
                "n2g": jnp.ones((cout,), self.dtype),
                "n2b": jnp.zeros((cout,), self.dtype),
                "c2": conv_p(cout, cout),
            }
            if cin != cout:
                p["skip"] = conv_p(cin, cout, k=1)
            return p

        mults = list(reversed(c.channel_mults))
        ch0 = c.base_channels * mults[0]
        params = {
            "conv_in": conv_p(c.latent_channels, ch0),
            "mid_r1": resnet_p(ch0, ch0),
            "mid_attn": {
                "ng": jnp.ones((ch0,), self.dtype),
                "nb": jnp.zeros((ch0,), self.dtype),
                "q": conv_p(ch0, ch0, k=1), "k": conv_p(ch0, ch0, k=1),
                "v": conv_p(ch0, ch0, k=1), "o": conv_p(ch0, ch0, k=1),
            },
            "mid_r2": resnet_p(ch0, ch0),
            "ups": [],
        }
        cin = ch0
        for i, m in enumerate(mults):
            cout = c.base_channels * m
            blk = {"res": [resnet_p(cin if j == 0 else cout, cout)
                           for j in range(c.layers_per_block)]}
            if i < len(mults) - 1:
                blk["up"] = conv_p(cout, cout)
            params["ups"].append(blk)
            cin = cout
        params["norm_out_g"] = jnp.ones((cin,), self.dtype)
        params["norm_out_b"] = jnp.zeros((cin,), self.dtype)
        params["conv_out"] = conv_p(cin, c.out_channels)
        return params

    # -- blocks ---------------------------------------------------------
    def _resnet(self, p, x):
        g = self.cfg.norm_groups
        h = jax.nn.silu(_group_norm(x, p["n1g"], p["n1b"], g))
        h = _conv(h, p["c1"]["w"], p["c1"]["b"])
        h = jax.nn.silu(_group_norm(h, p["n2g"], p["n2b"], g))
        h = _conv(h, p["c2"]["w"], p["c2"]["b"])
        if "skip" in p:
            x = _conv(x, p["skip"]["w"], p["skip"]["b"])
        return x + h

    def _mid_attn(self, p, x):
        b, hh, ww, c = x.shape
        h = _group_norm(x, p["ng"], p["nb"], self.cfg.norm_groups)
        q = _conv(h, p["q"]["w"], p["q"]["b"]).reshape(b, hh * ww, c)
        k = _conv(h, p["k"]["w"], p["k"]["b"]).reshape(b, hh * ww, c)
        v = _conv(h, p["v"]["w"], p["v"]["b"]).reshape(b, hh * ww, c)
        logits = jnp.einsum("bsc,btc->bst", q, k) / jnp.sqrt(
            jnp.asarray(c, jnp.float32)).astype(x.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bst,btc->bsc", probs, v).reshape(b, hh, ww, c)
        return x + _conv(o, p["o"]["w"], p["o"]["b"])

    def decode(self, params, z):
        """z [B,h,w,latent_c] -> image [B,H,W,3] in [-1, 1]."""
        x = _conv(z.astype(self.dtype), params["conv_in"]["w"],
                  params["conv_in"]["b"])
        x = self._resnet(params["mid_r1"], x)
        x = self._mid_attn(params["mid_attn"], x)
        x = self._resnet(params["mid_r2"], x)
        n_up = len(params["ups"])
        for i, blk in enumerate(params["ups"]):
            for rp in blk["res"]:
                x = self._resnet(rp, x)
            if i < n_up - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
                x = _conv(x, blk["up"]["w"], blk["up"]["b"])
        x = jax.nn.silu(_group_norm(x, params["norm_out_g"],
                                    params["norm_out_b"],
                                    self.cfg.norm_groups))
        x = _conv(x, params["conv_out"]["w"], params["conv_out"]["b"])
        return jnp.tanh(x.astype(jnp.float32))


class VAEEncoder:
    """Mirror of VAEDecoder for image -> latent encoding (diffusers
    AutoencoderKL encoder: conv_in → down blocks (resnets + stride-2
    downsample) → mid (resnet, attention, resnet) → norm_out → conv_out
    to 2*latent channels (mean | logvar)).

    Needed by the image-editing pipelines (reference
    pipeline_flux_fill.h:203 encode_vae_image): the masked input image
    becomes the constant conditioning latents of the fill transformer.
    """

    def __init__(self, cfg: VAEConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype

    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg
        ks = iter(jax.random.split(rng, 256))

        def w(*shape, scale=0.05):
            return (jax.random.normal(next(ks), shape) * scale).astype(
                self.dtype)

        def conv_p(cin, cout, k=3):
            return {"w": w(k, k, cin, cout),
                    "b": jnp.zeros((cout,), self.dtype)}

        def resnet_p(cin, cout):
            p = {
                "n1g": jnp.ones((cin,), self.dtype),
                "n1b": jnp.zeros((cin,), self.dtype),
                "c1": conv_p(cin, cout),
                "n2g": jnp.ones((cout,), self.dtype),
                "n2b": jnp.zeros((cout,), self.dtype),
                "c2": conv_p(cout, cout),
            }
            if cin != cout:
                p["skip"] = conv_p(cin, cout, k=1)
            return p

        mults = list(c.channel_mults)
        ch0 = c.base_channels * mults[0]
        params = {"conv_in": conv_p(c.out_channels, ch0), "downs": []}
        cin = ch0
        for i, m in enumerate(mults):
            cout = c.base_channels * m
            blk = {"res": [resnet_p(cin if j == 0 else cout, cout)
                           for j in range(c.layers_per_block)]}
            if i < len(mults) - 1:
                blk["down"] = conv_p(cout, cout)
            params["downs"].append(blk)
            cin = cout
        params["mid_r1"] = resnet_p(cin, cin)
        params["mid_attn"] = {
            "ng": jnp.ones((cin,), self.dtype),
            "nb": jnp.zeros((cin,), self.dtype),
            "q": conv_p(cin, cin, k=1), "k": conv_p(cin, cin, k=1),
            "v": conv_p(cin, cin, k=1), "o": conv_p(cin, cin, k=1),
        }
        params["mid_r2"] = resnet_p(cin, cin)
        params["norm_out_g"] = jnp.ones((cin,), self.dtype)
        params["norm_out_b"] = jnp.zeros((cin,), self.dtype)
        params["conv_out"] = conv_p(cin, 2 * c.latent_channels)
        return params

    _resnet = VAEDecoder._resnet
    _mid_attn = VAEDecoder._mid_attn

    def encode(self, params, image, rng=None):
        """image [B,H,W,3] in [-1,1] -> latents [B,h,w,latent_c]
        (UNscaled — the pipeline applies shift/scale). Deterministic
        posterior mean unless ``rng`` samples it (reference encode seed).
        """
        x = _conv(image.astype(self.dtype), params["conv_in"]["w"],
                  params["conv_in"]["b"])
        n_down = len(params["downs"])
        for i, blk in enumerate(params["downs"]):
            for rp in blk["res"]:
                x = self._resnet(rp, x)
            if i < n_down - 1:
                x = _conv(x, blk["down"]["w"], blk["down"]["b"], stride=2)
        x = self._resnet(params["mid_r1"], x)
        x = self._mid_attn(params["mid_attn"], x)
        x = self._resnet(params["mid_r2"], x)
        x = jax.nn.silu(_group_norm(x, params["norm_out_g"],
                                    params["norm_out_b"],
                                    self.cfg.norm_groups))
        x = _conv(x, params["conv_out"]["w"], params["conv_out"]["b"])
        mean, logvar = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            return mean + std * jax.random.normal(rng, mean.shape)
        return mean
