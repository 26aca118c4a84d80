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
    """-> [M, N] f32. XLA fused dequant-dot (the r3 on-chip in-scan A/B,
    scripts/probe_qmm_scan.py: XLA streams the int8 bytes and fuses the
    convert+scale into the dot at 81 us/layer vs the best Pallas kernel's
    92 and bf16's 143 — the dequant rides the weight stream for free).
    Pallas kernels stay env-gated (XLLM_QMM_KERNEL=pallas) for A/Bs."""
    import os

    if (
        jax.default_backend() == "tpu"
        and os.environ.get("XLLM_QMM_KERNEL", "") == "pallas"
    ):
        if w_q.dtype == jnp.int8:
            from xllm_tpu.ops.pallas.quant_matmul import quant_matmul_int8_v2

            return quant_matmul_int8_v2(x, w_q, scale)
        # fp8 uses v1: the v2 double-buffered variant crashes the Mosaic
        # compiler for f8 weight scratch on v5e
        from xllm_tpu.ops.pallas.quant_matmul import quant_matmul_fp8

        return quant_matmul_fp8(x, w_q, scale)
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
    decode at exactly bf16 speed because of this). The stack therefore
    stays OUT of the scanned xs (models/decoder.py pulls it) and the live
    layer is indexed HERE, where XLA fuses dynamic-slice + convert +
    scale into the dot's weight stream (r3 on-chip in-scan A/B,
    scripts/probe_qmm_scan.py: xla_int8dq 81 us/layer vs the best Pallas
    stacked kernel's 92 and bf16's 143 — the dequant rides the int8 byte
    stream for free). Pallas kernels stay env-gated
    (XLLM_QMM_KERNEL=pallas) for future A/Bs.
    """
    import os

    if (
        jax.default_backend() == "tpu"
        and os.environ.get("XLLM_QMM_KERNEL", "") == "pallas"
    ):
        if w_q.dtype == jnp.int8:
            from xllm_tpu.ops.pallas.quant_matmul import (
                quant_matmul_int8_v2_stacked,
            )

            return quant_matmul_int8_v2_stacked(x, w_q, scale, layer_idx)
        from xllm_tpu.ops.pallas.quant_matmul import quant_matmul_fp8_stacked

        return quant_matmul_fp8_stacked(x, w_q, scale, layer_idx)
    dq = jnp.bfloat16 if jax.default_backend() == "tpu" else x.dtype
    w = w_q[layer_idx].astype(dq) * scale[layer_idx][None, :].astype(dq)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)
