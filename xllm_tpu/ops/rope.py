"""Rotary position embeddings.

Counterpart of the reference rotary kernels
(reference xllm/core/layers/common/rotary_embedding.* and
xllm/core/kernels/ops_api.h rotary ops). Computed on the fly from positions;
XLA fuses the sin/cos + mul into the surrounding projections so no
precomputed cache or Pallas kernel is needed at these sizes.

Implements the HF "rotate-half" convention used by llama/qwen families.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_inv_freq(
    head_dim: int, theta: float, rope_scaling: dict | None = None
) -> jnp.ndarray:
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if rope_scaling:
        rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
        if rtype == "linear":
            inv_freq = inv_freq / rope_scaling["factor"]
        elif rtype == "llama3":
            # llama3.1-style NTK-by-parts (HF modeling_rope_utils)
            factor = rope_scaling["factor"]
            low_factor = rope_scaling["low_freq_factor"]
            high_factor = rope_scaling["high_freq_factor"]
            old_len = rope_scaling["original_max_position_embeddings"]
            wavelen = 2 * jnp.pi / inv_freq
            low_wavelen = old_len / low_factor
            high_wavelen = old_len / high_factor
            smooth = (old_len / wavelen - low_factor) / (high_factor - low_factor)
            smooth = jnp.clip(smooth, 0.0, 1.0)
            smoothed = (1 - smooth) * inv_freq / factor + smooth * inv_freq
            out = jnp.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
            is_medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
            inv_freq = jnp.where(is_medium, smoothed, out)
        elif rtype == "yarn":
            # YaRN NTK-by-parts (HF modeling_rope_utils yarn; reference
            # rotary_embedding yarn path). Frequencies blend interpolation
            # (long-wavelength) with extrapolation (short-wavelength) over a
            # linear ramp between the beta_fast/beta_slow correction dims.
            import math

            factor = rope_scaling["factor"]
            dim = head_dim
            beta_fast = rope_scaling.get("beta_fast", 32.0)
            beta_slow = rope_scaling.get("beta_slow", 1.0)
            old_len = rope_scaling["original_max_position_embeddings"]

            def corr_dim(num_rot):
                return (
                    dim
                    * math.log(old_len / (num_rot * 2 * math.pi))
                    / (2 * math.log(theta))
                )

            low = max(math.floor(corr_dim(beta_fast)), 0)
            high = min(math.ceil(corr_dim(beta_slow)), dim - 1)
            if low == high:
                high += 0.001
            ramp = jnp.clip(
                (jnp.arange(dim // 2, dtype=jnp.float32) - low)
                / (high - low),
                0.0,
                1.0,
            )
            extrap = 1.0 - ramp
            inv_freq = (inv_freq / factor) * (1 - extrap) + inv_freq * extrap
        # "default" falls through
    return inv_freq


def rope_mscale(rope_scaling: dict | None) -> float:
    """YaRN attention-magnitude correction.

    HF multiplies cos/sin by this factor (so attention scores pick up
    mscale**2); our models keep cos/sin unscaled and instead multiply the
    softmax scale by ``rope_mscale(...)**2`` — identical scores. Deepseek
    checkpoints carry explicit mscale/mscale_all_dim knobs."""
    import math

    if not rope_scaling:
        return 1.0
    rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
    if rtype != "yarn":
        return 1.0
    factor = rope_scaling["factor"]

    def get_mscale(scale, mscale=1.0):
        if scale <= 1.0:
            return 1.0
        return 0.1 * mscale * math.log(scale) + 1.0

    if "mscale" in rope_scaling:
        # deepseek convention. HF splits the correction between cos/sin
        # (ratio m1/m2) and the softmax scale (m2^2) — total scores factor
        # m1^2; we apply it all at the softmax scale so return m1.
        return get_mscale(factor, rope_scaling["mscale"])
    af = rope_scaling.get("attention_factor")
    if af is not None:
        return float(af)
    return get_mscale(factor)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,  # [T, Hq, D]
    k: jnp.ndarray,  # [T, Hkv, D]
    positions: jnp.ndarray,  # [T] int32
    inv_freq: jnp.ndarray,  # [D/2] f32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]  # [T, D/2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos2 = jnp.concatenate([cos, cos], axis=-1)[:, None, :]  # [T, 1, D]
    sin2 = jnp.concatenate([sin, sin], axis=-1)[:, None, :]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_out = qf * cos2 + _rotate_half(qf) * sin2
    k_out = kf * cos2 + _rotate_half(kf) * sin2
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def apply_rope_interleaved(
    q: jnp.ndarray,  # [T, Hq, D]
    k: jnp.ndarray,  # [T, Hkv, D]
    positions: jnp.ndarray,  # [T]
    inv_freq: jnp.ndarray,  # [D/2]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interleaved (complex-pair) convention: pairs (x[2i], x[2i+1]).

    Used by DeepSeek v2/v3 MLA rope (HF apply_rotary_emb via
    view_as_complex) — NOT the llama rotate-half convention.
    """
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]  # [T, 1, D/2]
    sin = jnp.sin(angles)[:, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
        xr, xi = x_pairs[..., 0], x_pairs[..., 1]
        or_ = xr * cos - xi * sin
        oi = xr * sin + xi * cos
        return jnp.stack([or_, oi], axis=-1).reshape(xf.shape).astype(x.dtype)

    return rot(q), rot(k)


def apply_rope_partial(
    q: jnp.ndarray,  # [T, Hq, D]
    k: jnp.ndarray,  # [T, Hkv, D]
    positions: jnp.ndarray,
    inv_freq: jnp.ndarray,  # [rotary_dim/2]
    rotary_dim: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Partial rope, llama rotate-half convention: only the first
    rotary_dim dims rotate as a standard half-split rope, the tail passes
    through. Matches HF glm4_moe's apply_rotary_pos_emb (reference
    glm4_moe registration, model_registry.h:150-247)."""
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos2 = jnp.concatenate([cos, cos], axis=-1)[:, None, :]  # [T, 1, rd]
    sin2 = jnp.concatenate([sin, sin], axis=-1)[:, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        xr, rest = xf[..., :rotary_dim], xf[..., rotary_dim:]
        out = xr * cos2 + _rotate_half(xr) * sin2
        return jnp.concatenate([out, rest], axis=-1).astype(x.dtype)

    return rot(q), rot(k)


def apply_rope_partial_interleaved_cos(
    q: jnp.ndarray,  # [T, Hq, D]
    k: jnp.ndarray,  # [T, Hkv, D]
    positions: jnp.ndarray,
    inv_freq: jnp.ndarray,  # [rotary_dim/2]
    rotary_dim: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GLM4 convention: only the first rotary_dim dims rotate, in
    INTERLEAVED (even/odd) pairs — HF glm4's rotate_half is the
    stack((-x[1::2], x[0::2])) variant, which with its repeat-interleaved
    cos/sin equals complex-pair rotation on the rotary slice."""
    angles = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]  # [T, 1, rd/2]
    sin = jnp.sin(angles)[:, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        xr, rest = xf[..., :rotary_dim], xf[..., rotary_dim:]
        pairs = xr.reshape(*xr.shape[:-1], -1, 2)
        xre, xim = pairs[..., 0], pairs[..., 1]
        or_ = xre * cos - xim * sin
        oi = xre * sin + xim * cos
        out = jnp.stack([or_, oi], axis=-1).reshape(xr.shape)
        return jnp.concatenate([out, rest], axis=-1).astype(x.dtype)

    return rot(q), rot(k)
