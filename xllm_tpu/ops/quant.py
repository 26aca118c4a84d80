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


def calibrate_kv_scales(
    engine, prompts: list[list[int]], margin: float = 1.25
):
    """Per-layer-per-head int8-KV scales from representative prompts.

    Offline calibration flow (reference quantized-KV calibration class,
    kv_cache_impl.h:29): run the prompts through a FULL-PRECISION-KV
    engine, reduce the live cache to per-(layer, head) amax — the cache
    IS the complete post-rope K / V activation record, so no model
    instrumentation is needed — and derive scale = amax * margin / 127.
    Returns (s_k, s_v) as [L, Hkv] float32 numpy arrays for
    ``model.set_kv_scales`` on the int8-KV serving engine.
    """
    import numpy as np

    from xllm_tpu.framework.sampling_params import SamplingParams

    runner = engine.runner
    if runner.k_cache.dtype == jnp.int8:
        raise ValueError(
            "calibrate on a full-precision-KV engine (kv_cache_dtype "
            "auto/bfloat16/float32), then install the scales on the "
            "int8 engine"
        )
    interleaved = runner.k_cache.ndim == 6
    if not interleaved and (
        runner.v_cache.ndim != 5
        or runner.k_cache.shape != runner.v_cache.shape
    ):
        raise NotImplementedError(
            "KV-scale calibration covers the paged GQA cache layouts"
        )
    sp = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
    for i, ids in enumerate(prompts):
        engine.add_request(prompt_token_ids=list(ids),
                           sampling_params=sp,
                           request_id=f"kvcal-{i}")
    engine.generate_all(timeout_s=600)

    @jax.jit
    def amax(cache):  # [L, NB, Hkv, bs, D] -> [L, Hkv]
        return jnp.max(jnp.abs(cache.astype(jnp.float32)), axis=(1, 3, 4))

    if interleaved:  # [L, NB, 2, Hkv, bs, D]
        ak = np.asarray(amax(runner.k_cache[:, :, 0]))
        av = np.asarray(amax(runner.k_cache[:, :, 1]))
    else:
        ak = np.asarray(amax(runner.k_cache))
        av = np.asarray(amax(runner.v_cache))
    s_k = np.maximum(ak * margin / 127.0, 1e-6).astype(np.float32)
    s_v = np.maximum(av * margin / 127.0, 1e-6).astype(np.float32)
    return s_k, s_v


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
