"""Fused w8a8 quantized matmul Pallas kernel.

Counterpart of the reference's w8a8 kernels
(reference xllm/core/kernels/ops_api.h quant matmul + cutlass w8a8,
docs/en/features ppmatmul/groupgemm). TPU design:

- weights are stored INT8 with per-output-channel scales (half the HBM
  bytes of bf16 — decode is weight-bandwidth-bound);
- activations are dynamically quantized per token (absmax row scale) just
  before the kernel, so the MXU runs a native int8 x int8 -> int32 matmul
  — no per-element weight dequant on the VPU (which was measured to erase
  the bandwidth win);
- the int32 accumulator is rescaled by (row_scale x col_scale) in fp32.

Grid (M/TM, N/TN); K stays resident per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(xq_ref, sx_ref, wq_ref, sw_ref, o_ref, *, out_dtype):
    acc = jax.lax.dot(
        xq_ref[...], wq_ref[...], preferred_element_type=jnp.int32
    )  # [TM, TN] int32 on the MXU
    o_ref[...] = (acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...]).astype(
        out_dtype
    )


def _pick_tile(dim: int, pref: int) -> int:
    for c in (pref, 1024, 512, 256, 128, 64, 32, 16, 8):
        if c <= pref and dim % c == 0:
            return c
    return dim


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_int8(
    x: jnp.ndarray,  # [M, K] bf16/f32
    w_q: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] f32 per-output-channel
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    m, k = x.shape
    _, n = w_q.shape
    # dynamic per-token activation quantization (fused by XLA into the
    # preceding elementwise ops; tiny vs the weight stream)
    sx = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-10)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(
        jnp.int8
    )

    tm = _pick_tile(m, 256)
    tn = _pick_tile(n, 2048)
    grid = (m // tm, n // tn)
    kernel = functools.partial(_qmm_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, sx, w_q, scale.reshape(1, n))


def _fp8_mm_kernel(x_ref, wq_ref, sw_ref, o_ref, *, out_dtype):
    # upcast the fp8 weight tile on load; the MXU runs bf16 x bf16
    w = wq_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w,
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc * sw_ref[...]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_fp8(
    x: jnp.ndarray,  # [M, K] bf16/f32
    w_q: jnp.ndarray,  # [K, N] float8_e4m3fn
    scale: jnp.ndarray,  # [N] f32 per-output-channel
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weight-only FP8 matmul: fp8 weight stream (half of bf16), in-tile
    upcast, bf16 MXU, fp32 per-channel rescale (reference fp8 quant path,
    kernels/cuda fp8; v5e has no fp8 MXU so upcast-on-load is the design).
    """
    m, k = x.shape
    _, n = w_q.shape
    tm = _pick_tile(m, 256)
    # K stays resident per tile: bound tn so (x + w + out) x double-buffer
    # fits the 16 MB scoped VMEM (the upcast adds a bf16 copy of the tile)
    budget = 6 * 1024 * 1024
    tn_cap = 2048
    while tn_cap > 128 and tm * k * 2 + k * tn_cap * 3 + tm * tn_cap * 4 > budget:
        tn_cap //= 2
    tn = _pick_tile(n, tn_cap)
    grid = (m // tm, n // tn)
    kernel = functools.partial(_fp8_mm_kernel, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k * 2 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, n))
