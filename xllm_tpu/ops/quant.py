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


def quantize_fp8(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K, N] -> (float8_e4m3 weights, f32 scales [..., N]).

    Weight-only FP8 storage (reference fp8 quant kernels, kernels/cuda fp8
    path): per-output-channel scale maps absmax to the e4m3 range (448);
    v5e has no native fp8 MXU, so the matmul upcasts tiles on load.
    """
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(absmax / 448.0, 1e-8)
    w_q = (w.astype(jnp.float32) / scale[..., None, :]).astype(
        jnp.float8_e4m3fn
    )
    return w_q, scale.astype(jnp.float32)


def quant_matmul(
    x: jnp.ndarray,  # [M, K]
    w_q: jnp.ndarray,  # [K, N] int8 or float8_e4m3fn
    scale: jnp.ndarray,  # [N] f32
) -> jnp.ndarray:
    """-> [M, N] f32. Pallas fused dequant-matmul on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        import os

        v2 = os.environ.get("XLLM_QMM_KERNEL", "v2") == "v2"
        if w_q.dtype == jnp.int8:
            from xllm_tpu.ops.pallas.quant_matmul import (
                quant_matmul_int8,
                quant_matmul_int8_v2,
            )

            return (quant_matmul_int8_v2 if v2 else quant_matmul_int8)(
                x, w_q, scale
            )
        from xllm_tpu.ops.pallas.quant_matmul import (
            quant_matmul_fp8,
            quant_matmul_fp8_v2,
        )

        # fp8 defaults to v1: the v2 double-buffered variant crashes the
        # Mosaic compiler for f8 weight scratch on v5e (and a crashed
        # remote compile wedges the axon tunnel for ~18 min) — opt in
        # explicitly with XLLM_QMM_KERNEL=v2-fp8 once fixed
        fp8_v2 = os.environ.get("XLLM_QMM_KERNEL", "") == "v2-fp8"
        return (quant_matmul_fp8_v2 if fp8_v2 else quant_matmul_fp8)(
            x, w_q, scale
        )
    w = w_q.astype(x.dtype) * scale[None, :].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def quant_matmul_stacked(
    x: jnp.ndarray,  # [M, K]
    w_q: jnp.ndarray,  # [L, K, N] int8 or float8_e4m3fn
    scale: jnp.ndarray,  # [L, N] f32
    layer_idx: jnp.ndarray,  # [] int32 (relative index into the stack)
) -> jnp.ndarray:
    """-> [M, N] f32 for the live layer of a stacked weight tensor.

    Inside the per-layer lax.scan a pallas call cannot fuse XLA's
    dynamic-slice of the scanned stack — the sliced layer is materialized
    as a copy first (int8 then moves read+write+read = 3x its bytes,
    erasing the quantization bandwidth win; the r2 bench measured int8
    decode at exactly bf16 speed because of this). The stacked kernels
    keep the whole [L, K, N] stack in HBM and index the layer with a
    scalar-prefetched index instead.
    """
    if jax.default_backend() == "tpu":
        if w_q.dtype == jnp.int8:
            from xllm_tpu.ops.pallas.quant_matmul import (
                quant_matmul_int8_v2_stacked,
            )

            return quant_matmul_int8_v2_stacked(x, w_q, scale, layer_idx)
        from xllm_tpu.ops.pallas.quant_matmul import quant_matmul_fp8_stacked

        return quant_matmul_fp8_stacked(x, w_q, scale, layer_idx)
    w = w_q[layer_idx].astype(x.dtype) * scale[layer_idx][None, :].astype(
        x.dtype
    )
    return jnp.dot(x, w, preferred_element_type=jnp.float32)
