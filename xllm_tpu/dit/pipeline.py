"""Flow-match diffusion pipeline (flux-class text→image) — TPU-native.

Counterpart of the reference DiT pipelines
(xllm/models/dit/ — flux pipeline + FlowMatchEulerDiscreteScheduler,
dit_engine/dit_scheduler drive loop; DiTModel interface in
core/framework/model/causal_lm.h).

TPU-native redesign: the reference steps the scheduler from host C++
between torch calls. Here the ENTIRE denoise loop — Euler integration,
classifier-free guidance, and the DiT cache's skip decisions — is one
`lax.scan` in latent *token* space (patchify hoisted out), compiled
once per (resolution, steps, policy). Under Ulysses SP (dit/sp.py) the
same scan runs inside a `shard_map` with image tokens sharded over the
`sp` mesh axis; all collectives ride ICI.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from xllm_tpu.dit.cache import DiTCacheConfig, make_dit_cache
from xllm_tpu.dit.model import DiTConfig, DiTModel


# ---------------------------------------------------------------------------
# FlowMatchEulerDiscreteScheduler (sigma schedule; reference bundles
# diffusers' FlowMatchEuler in xllm/models/dit/ scheduler stack)
# ---------------------------------------------------------------------------

def flow_match_sigmas(num_steps: int,
                      image_seq_len: int | None = None,
                      shift: float = 3.0,
                      use_dynamic_shifting: bool = True,
                      base_shift: float = 0.5,
                      max_shift: float = 1.15,
                      base_seq_len: int = 256,
                      max_seq_len: int = 4096) -> np.ndarray:
    """sigma schedule incl. terminal 0; sigmas[i] -> sigmas[i+1] per step.

    Dynamic shifting (flux): mu interpolated linearly in image_seq_len,
    sigma = exp(mu) / (exp(mu) + (1/t - 1)). Static: shift*t/(1+(shift-1)t).
    """
    ts = np.linspace(1.0, 1.0 / num_steps, num_steps)
    if use_dynamic_shifting and image_seq_len is not None:
        m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
        mu = m * image_seq_len + (base_shift - m * base_seq_len)
        sig = math.exp(mu) / (math.exp(mu) + (1.0 / ts - 1.0))
    else:
        sig = shift * ts / (1.0 + (shift - 1.0) * ts)
    return np.append(sig, 0.0).astype(np.float32)


@dataclass
class PipelineConfig:
    model: DiTConfig = field(default_factory=DiTConfig)
    cache: DiTCacheConfig = field(default_factory=DiTCacheConfig)
    num_inference_steps: int = 28
    guidance_scale: float = 3.5       # embedded guidance (flux-dev)
    true_cfg_scale: float = 1.0       # >1 enables real CFG (neg prompt)
    shift: float = 3.0
    use_dynamic_shifting: bool = True
    vae_scaling_factor: float = 0.3611
    vae_shift_factor: float = 0.1159


class DiTPipeline:
    """Text→image sampler over a DiTModel (+ optional VAE decoder).

    `mesh`/`sp_axis`: run the denoise scan under shard_map with image
    tokens sharded over `sp_axis` (Ulysses attention inside the blocks).
    """

    def __init__(self, cfg: PipelineConfig, dtype=jnp.float32,
                 mesh=None, sp_axis: str = "sp", vae=None,
                 cfg_axis: str = ""):
        self.cfg = cfg
        self.dtype = dtype
        self.mesh = mesh
        self.sp_axis = sp_axis if mesh is not None else None
        # CFG-parallel (reference DiT parallel axes, parallel_args.h:91-106):
        # a 2-wide mesh axis runs the conditional and unconditional
        # branches simultaneously; the guided velocity is ONE psum:
        # v = cfg*v_c + (1-cfg)*v_u = psum_i(coef_i * v_i)
        self.cfg_axis = (
            cfg_axis
            if mesh is not None
            and cfg_axis
            and mesh.shape.get(cfg_axis, 1) == 2
            else None
        )
        self.model = DiTModel(cfg.model, dtype=dtype, sp_axis=self.sp_axis)
        self.vae = vae
        self._denoise_cache: dict = {}
        self._vae_jit = None

    # -- latent init ----------------------------------------------------
    def prepare_latents(self, rng, batch, height, width):
        c = self.cfg.model
        return jax.random.normal(
            rng, (batch, height, width, c.in_channels), jnp.float32)

    # -- core scan ------------------------------------------------------
    def _build_denoise(self, num_steps: int, use_cfg: bool):
        """Returns denoise(params, lat_tokens, txt, pooled, neg_txt,
        neg_pooled, sigmas, guidance, cfg_scale, img_ang) -> (lat, skips)."""
        model = self.model
        cache_cfg = self.cfg.cache
        if self.sp_axis is not None:
            cache_cfg = DiTCacheConfig(
                **{**cache_cfg.__dict__, "sp_axis": self.sp_axis})
        cache = make_dit_cache(cache_cfg, num_steps)

        def denoise(params, lat, cond, txt, pooled, neg_txt, neg_pooled,
                    sigmas, guidance, cfg_scale, img_ang):
            # cond [B, N, cond_dim]: per-step channel conditioning
            # (flux-fill packed mask/masked-image latents; width 0 for
            # plain text->image — the concat below is then a no-op)
            txt_len = txt.shape[1]
            ang = jnp.concatenate(
                [jnp.zeros((txt_len, img_ang.shape[-1]), jnp.float32),
                 img_ang])
            rope = (jnp.cos(ang).astype(model.dtype),
                    jnp.sin(ang).astype(model.dtype))
            b = lat.shape[0]
            d = model.cfg.hidden_size
            img_shape = (b, lat.shape[1], d)
            txt_shape = (b, txt_len, d)

            states = [cache.init(img_shape, txt_shape, model.dtype)]
            if use_cfg and self.cfg_axis is None:
                # sequential CFG keeps a second branch state; under
                # CFG-parallel each device's single state IS its branch
                states.append(cache.init(img_shape, txt_shape, model.dtype))

            def body(carry, inp):
                lat_t, states = carry
                sigma, sigma_next, idx = inp
                t = jnp.full((b,), sigma, jnp.float32)

                def predict(lat_x, txt_e, pooled_e, cstate):
                    lat_in = jnp.concatenate(
                        [lat_x.astype(model.dtype),
                         cond.astype(model.dtype)], axis=-1)
                    img_in, txt_in, vec = model.embed_tokens(
                        params, lat_in, txt_e, t, pooled_e, guidance)
                    img0, txt0 = model.block0(
                        params, img_in, txt_in, vec, rope)
                    r0 = img0 - img_in  # FBCache probe residual (fbcache.cpp)

                    def rest_fn(i, tx):
                        return model.rest(params, i, tx, vec, rope)

                    (img_f, _), cstate = cache.step(
                        cstate, idx, img0, txt0, r0, rest_fn)
                    return model.final_tokens(params, img_f, vec), cstate

                if use_cfg and self.cfg_axis is not None:
                    # CFG-parallel: this device computes ONLY its branch
                    # (rank 0 = conditional, rank 1 = unconditional); the
                    # guided combine v_u + cfg*(v_c - v_u) is a psum of
                    # coef_i * v_i with coef = [cfg, 1-cfg]
                    r = jax.lax.axis_index(self.cfg_axis)
                    is_c = (r == 0)
                    txt_e = jnp.where(is_c, txt, neg_txt)
                    pooled_e = jnp.where(is_c, pooled, neg_pooled)
                    v_l, s0 = predict(lat_t, txt_e, pooled_e, states[0])
                    coef = jnp.where(is_c, cfg_scale, 1.0 - cfg_scale)
                    v = jax.lax.psum(
                        coef * v_l.astype(jnp.float32), self.cfg_axis
                    )
                    new_states = (s0,)
                elif use_cfg:
                    v_c, s0 = predict(lat_t, txt, pooled, states[0])
                    v_u, s1 = predict(lat_t, neg_txt, neg_pooled, states[1])
                    v = v_u + cfg_scale * (v_c - v_u)
                    new_states = (s0, s1)
                else:
                    v_c, s0 = predict(lat_t, txt, pooled, states[0])
                    v = v_c
                    new_states = (s0,)
                lat_t = lat_t + (sigma_next - sigma) * v.astype(jnp.float32)
                return (lat_t, new_states), None

            xs = (sigmas[:-1], sigmas[1:],
                  jnp.arange(num_steps, dtype=jnp.int32))
            (lat, states), _ = jax.lax.scan(
                body, (lat, tuple(states)), xs)
            skips = states[0]["skips"]
            if use_cfg and self.cfg_axis is not None:
                # report the CONDITIONAL branch's skip stats on every
                # device (out spec is replicated over the cfg axis)
                r = jax.lax.axis_index(self.cfg_axis)
                skips = jax.lax.psum(
                    jnp.where(r == 0, skips, jnp.zeros_like(skips)),
                    self.cfg_axis,
                )
            return lat, skips

        return denoise

    def _denoise_fn(self, num_steps, use_cfg, n_tokens):
        key = (num_steps, use_cfg, n_tokens)
        fn = self._denoise_cache.get(key)
        if fn is not None:
            return fn
        denoise = self._build_denoise(num_steps, use_cfg)
        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            sp = self.sp_axis
            spec_tok = P(None, sp, None)
            denoise = shard_map(
                denoise, mesh=self.mesh,
                in_specs=(P(), spec_tok, spec_tok, P(), P(), P(), P(), P(),
                          P(), P(), P(sp, None)),
                out_specs=(spec_tok, P()),
                check_vma=False)
        fn = jax.jit(denoise)
        self._denoise_cache[key] = fn
        return fn

    # -- public API -----------------------------------------------------
    def generate(self, params, txt_embeds, pooled, *,
                 height: int, width: int,
                 neg_txt_embeds=None, neg_pooled=None,
                 num_inference_steps: int | None = None,
                 seed: int = 0, vae_params=None):
        """Sample latents (and decode if a VAE is attached).

        txt_embeds [B,T,text_dim], pooled [B,pooled_dim] come from the
        text-encoder stage (DiT engine). height/width are LATENT dims.
        Returns (output, stats) where output is [B,H,W,3] images if a
        VAE is attached, else raw latents [B,h,w,C].
        """
        cfg = self.cfg
        steps = num_inference_steps or cfg.num_inference_steps
        use_cfg = (cfg.true_cfg_scale > 1.0
                   and neg_txt_embeds is not None)
        if not use_cfg:
            neg_txt_embeds = jnp.zeros_like(txt_embeds)
            neg_pooled = jnp.zeros_like(pooled)

        rng = jax.random.PRNGKey(seed)
        lat = self.prepare_latents(rng, txt_embeds.shape[0], height, width)
        lat_tokens = self.model.patchify(lat)
        p = cfg.model.patch_size
        gh, gw = height // p, width // p
        img_ang = self.model.rope_img(gh, gw)

        sigmas = jnp.asarray(flow_match_sigmas(
            steps, image_seq_len=gh * gw, shift=cfg.shift,
            use_dynamic_shifting=cfg.use_dynamic_shifting))
        guidance = jnp.full((txt_embeds.shape[0],), cfg.guidance_scale,
                            jnp.float32)
        cfg_scale = jnp.asarray(cfg.true_cfg_scale, jnp.float32)

        fn = self._denoise_fn(steps, use_cfg, lat_tokens.shape[1])
        cond = jnp.zeros(
            (lat_tokens.shape[0], lat_tokens.shape[1], 0), jnp.float32)
        lat_out, skips = fn(params, lat_tokens, cond, txt_embeds, pooled,
                            neg_txt_embeds, neg_pooled, sigmas, guidance,
                            cfg_scale, img_ang)
        lat = self.model.unpatchify(lat_out, (gh, gw))
        stats = {"cache_skips": int(jax.device_get(skips)),
                 "steps": steps}
        if self.vae is not None and vae_params is not None:
            z = lat / cfg.vae_scaling_factor + cfg.vae_shift_factor
            return self._vae_decode(vae_params, z), stats
        return lat, stats

    def _vae_decode(self, vae_params, z):
        """VAE-parallel decode (reference DiT VAE-parallel axis,
        parallel_args.h:91-106): the latent's H dim shards over the sp
        mesh axis; GSPMD inserts the conv halo exchanges and the
        mid-attention collectives. Falls back to a plain call off-mesh
        or when H doesn't divide."""
        if (
            self.mesh is None
            or self.sp_axis is None
            or z.shape[1] % self.mesh.shape[self.sp_axis] != 0
        ):
            return self.vae.decode(vae_params, z)
        if self._vae_jit is None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            rows = NamedSharding(self.mesh, P(None, self.sp_axis))
            rep = NamedSharding(self.mesh, P())

            self._vae_jit = jax.jit(
                self.vae.decode,
                in_shardings=(None, rows),
                out_shardings=rows,
            )
        return self._vae_jit(vae_params, z)


def pack_fill_mask(mask: jnp.ndarray, vae_scale: int, patch: int = 2):
    """Pixel mask [B, H, W] -> packed token features [B, N, vs*vs*p*p].

    Mirrors the reference flux-fill mask preparation
    (pipeline_flux_fill.h:190-198): each latent cell's vs x vs pixel
    sub-block becomes channels, then the p x p latent patchify packs
    them into token features — the transformer sees per-sub-pixel mask
    bits aligned with its latent tokens.
    """
    b, H, W = mask.shape
    h, w = H // vae_scale, W // vae_scale
    m = mask.reshape(b, h, vae_scale, w, vae_scale)
    # [B, h, w, vs*vs] with channel = vs_i * vs + vs_j (reference
    # permute({0,2,4,1,3}) in channels-first == this in channels-last)
    m = m.transpose(0, 1, 3, 2, 4).reshape(b, h, w, vae_scale * vae_scale)
    gh, gw = h // patch, w // patch
    m = m.reshape(b, gh, patch, gw, patch, vae_scale * vae_scale)
    return m.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, gh * gw, patch * patch * vae_scale * vae_scale
    )


class FluxFillPipeline(DiTPipeline):
    """Inpainting/outpainting sampler (reference pipeline_flux_fill.h:21,
    huggingface FluxFillPipeline semantics).

    The transformer consumes, at every step, the latent tokens
    concatenated with a CONSTANT conditioning block: the masked image's
    packed VAE latents plus the sub-pixel-packed binary mask
    (model cond_dim = patch_dim + vs*vs*p*p, e.g. 64 + 256 = 320 for a
    384-channel fill transformer). strength < 1 starts the flow from a
    noised copy of the input image (scale_noise / get_timesteps,
    pipeline_flux_fill.h:209-221).
    """

    # pixel span of one latent cell (SD/flux VAEs downsample 8x)
    vae_scale = 8

    def generate_fill(self, params, txt_embeds, pooled, *,
                      image_latents, mask,
                      neg_txt_embeds=None, neg_pooled=None,
                      num_inference_steps: int | None = None,
                      strength: float = 1.0,
                      seed: int = 0, vae_params=None):
        """image_latents [B, h, w, C] (VAE-encoded, unscaled);
        mask [B, H, W] pixels in {0, 1} (1 = repaint). Returns
        (output, stats) like generate."""
        cfg = self.cfg
        steps = num_inference_steps or cfg.num_inference_steps
        use_cfg = (cfg.true_cfg_scale > 1.0
                   and neg_txt_embeds is not None)
        if not use_cfg:
            neg_txt_embeds = jnp.zeros_like(txt_embeds)
            neg_pooled = jnp.zeros_like(pooled)

        b, height, width, _ = image_latents.shape
        p = cfg.model.patch_size
        gh, gw = height // p, width // p
        scaled = (
            (image_latents - cfg.vae_shift_factor) * cfg.vae_scaling_factor
        )
        # latent-space mask for the masked image (pixel mask averaged
        # per latent cell would differ from the reference, which masks
        # PIXELS before encoding; callers wanting exact parity pass
        # image_latents of the pre-masked image — here we mask latents
        # of cells fully inside the repaint region)
        vs = self.vae_scale
        cell_mask = mask.reshape(b, height, vs, width, vs).mean((2, 4))
        masked_lat = scaled * (1.0 - (cell_mask >= 1.0)[..., None])
        cond = jnp.concatenate(
            [
                self.model.patchify(masked_lat),
                pack_fill_mask(mask.astype(jnp.float32), vs, p),
            ],
            axis=-1,
        )
        expect = cfg.model.cond_dim
        assert cond.shape[-1] == expect, (cond.shape, expect)

        sigmas = jnp.asarray(flow_match_sigmas(
            steps, image_seq_len=gh * gw, shift=cfg.shift,
            use_dynamic_shifting=cfg.use_dynamic_shifting))
        # strength: start the flow part-way (get_timesteps slice); the
        # init latent is the flow-match noising of the input at sigma0
        t_start = max(steps - min(int(steps * strength), steps), 0)
        sigmas = sigmas[t_start:]
        rng = jax.random.PRNGKey(seed)
        noise = self.prepare_latents(rng, b, height, width)
        sigma0 = sigmas[0]
        lat = (1.0 - sigma0) * scaled + sigma0 * noise
        lat_tokens = self.model.patchify(lat)
        img_ang = self.model.rope_img(gh, gw)
        guidance = jnp.full((b,), cfg.guidance_scale, jnp.float32)
        cfg_scale = jnp.asarray(cfg.true_cfg_scale, jnp.float32)

        n_steps = sigmas.shape[0] - 1
        fn = self._denoise_fn(n_steps, use_cfg, lat_tokens.shape[1])
        lat_out, skips = fn(params, lat_tokens, cond, txt_embeds, pooled,
                            neg_txt_embeds, neg_pooled, sigmas, guidance,
                            cfg_scale, img_ang)
        lat = self.model.unpatchify(lat_out, (gh, gw))
        stats = {"cache_skips": int(jax.device_get(skips)),
                 "steps": n_steps}
        if self.vae is not None and vae_params is not None:
            z = lat / cfg.vae_scaling_factor + cfg.vae_shift_factor
            return self._vae_decode(vae_params, z), stats
        return lat, stats
