"""Normalization ops.

Counterpart of the reference RMSNorm kernels (reference
xllm/core/layers/common/rms_norm.*, fused layernorm ops in
xllm/core/kernels/ops_api.h). On TPU these are left as jnp expressions:
XLA fuses the reduce + scale into neighbors, so a hand-written Pallas
kernel buys nothing for a [T, D] norm (HBM-bound, already one pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in fp32 accumulation, cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """Affine LayerNorm in f32 (the DSA indexer's k_norm uses layernorm
    with bias, reference indexer.cpp k_norm_)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * weight + bias
