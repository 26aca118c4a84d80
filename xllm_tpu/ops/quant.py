"""Weight-only quantization: quantize + dequant-matmul dispatch.

Counterpart of the reference's quant_args plumbing + per-backend quant
matmuls (reference xllm/core/framework/hf_model_loader.h:44 quant_args,
kernels w8a8). Symmetric per-output-channel INT8:

    w_q[k, n] = round(w[k, n] / s[n]),   s[n] = absmax(w[:, n]) / 127
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_int8(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K, N] -> (int8 weights, f32 scales [..., N])."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    w_q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def quant_matmul(
    x: jnp.ndarray,  # [M, K]
    w_q: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] f32
) -> jnp.ndarray:
    """-> [M, N] f32. Pallas fused dequant-matmul on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        from xllm_tpu.ops.pallas.quant_matmul import quant_matmul_int8

        return quant_matmul_int8(x, w_q, scale)
    w = w_q.astype(x.dtype) * scale[None, :].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)
