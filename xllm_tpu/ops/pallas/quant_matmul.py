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


# ----------------------------------------------------------------------
# v2: manual split-DMA weight streaming. A single pallas-managed block
# fetch streams at ~250 GB/s on v5e (scripts/probe_streams.py); 4 parallel
# sub-copies reach ~700 GB/s — and the weight stream IS the whole cost of
# a decode-shape quantized matmul.
# ----------------------------------------------------------------------
_QMM_SPLIT = 4


def _qmm_v2_kernel(
    xq_ref,  # [TM, K] int8/bf16 (pallas-managed)
    sx_ref,  # [TM, 1] f32 or dummy
    w_hbm,  # [K, N] int8/f8 ANY
    sw_ref,  # [1, TN] f32 (pallas-managed per-N-tile)
    o_ref,  # [TM, TN]
    w_buf,  # [2, K, TN] scratch
    sem,  # [2, SPLIT]
    *,
    out_dtype,
    tn: int,
    n_tiles: int,
    act_quant: bool,
    w_is_f8: bool = False,
):
    i, j = pl.program_id(0), pl.program_id(1)
    k = w_buf.shape[1]
    split = sem.shape[1]
    rows = k // split

    def issue(tile_j, slot):
        for si in range(split):
            pltpu.make_async_copy(
                w_hbm.at[pl.ds(si * rows, rows), pl.ds(tile_j * tn, tn)],
                w_buf.at[slot, pl.ds(si * rows, rows)],
                sem.at[slot, si],
            ).start()

    def wait(slot):
        for si in range(split):
            pltpu.make_async_copy(
                w_buf.at[slot, pl.ds(si * rows, rows)],
                w_buf.at[slot, pl.ds(si * rows, rows)],
                sem.at[slot, si],
            ).wait()

    step = i * n_tiles + j

    @pl.when(step == 0)
    def _():
        issue(0, 0)

    slot = jax.lax.rem(step, 2)
    # prefetch the next weight tile (wraps to column 0 for the next M tile)
    nxt = jax.lax.rem(step + 1, n_tiles * pl.num_programs(0))

    @pl.when(step + 1 < n_tiles * pl.num_programs(0))
    def _():
        issue(jax.lax.rem(nxt, n_tiles), jax.lax.rem(step + 1, 2))

    wait(slot)
    w = w_buf[slot]
    if w_is_f8:
        # weights travel as int8 bits (f8-dtype DMA/scratch crashes the
        # v5e Mosaic compiler); reinterpret before the MXU upcast
        w = jax.lax.bitcast_convert_type(w, jnp.float8_e4m3fn)
    if w.dtype == jnp.int8 and act_quant:
        acc = jax.lax.dot(
            xq_ref[...], w, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        o_ref[...] = (acc * sx_ref[...] * sw_ref[...]).astype(out_dtype)
    else:
        acc = jax.lax.dot(
            xq_ref[...].astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = (acc * sw_ref[...]).astype(out_dtype)


def _qmm_v2(x, w_q, scale, out_dtype, interpret, act_quant):
    m, k = x.shape
    _, n = w_q.shape
    tm = _pick_tile(m, 256)
    # bound VMEM: 2 weight buffers + (fp8 path) the bf16 upcast copy of one
    # weight tile + x + out under ~10 MB of the 16 MB scoped budget
    tn_cap = 2048
    wb = 1 if w_q.dtype != jnp.bfloat16 else 2
    upcast = 2 * k if w_q.dtype == jnp.float8_e4m3fn else 0
    # the upcast chain (bitcast + f8->bf16) makes Mosaic's stack accounting
    # much fatter than the raw tile bytes; give the fp8 path a smaller cap
    budget = (5 if upcast else 10) * 1024 * 1024
    while tn_cap > 128 and (
        2 * k * tn_cap * wb + upcast * tn_cap + tm * k + tm * tn_cap * 4
        > budget
    ):
        tn_cap //= 2
    tn = _pick_tile(n, tn_cap)
    n_tiles = n // tn
    split = _QMM_SPLIT if k % (32 * _QMM_SPLIT) == 0 else 1

    if act_quant:
        sx = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-10)
        xin = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(
            jnp.int8
        )
    else:
        sx = jnp.zeros((m, 1), jnp.float32)
        xin = x

    w_is_f8 = w_q.dtype == jnp.float8_e4m3fn
    if w_is_f8 and not interpret:
        w_q = jax.lax.bitcast_convert_type(w_q, jnp.int8)
    kernel = functools.partial(
        _qmm_v2_kernel, out_dtype=out_dtype, tn=tn, n_tiles=n_tiles,
        act_quant=act_quant, w_is_f8=w_is_f8 and not interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(m // tm, n_tiles),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, k, tn), w_q.dtype),  # int8 bits when f8
            pltpu.SemaphoreType.DMA((2, split)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xin, sx, w_q, scale.reshape(1, n))


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_int8_v2(
    x, w_q, scale, out_dtype=jnp.float32, interpret: bool = False
):
    return _qmm_v2(x, w_q, scale, out_dtype, interpret, act_quant=True)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_fp8_v2(
    x, w_q, scale, out_dtype=jnp.float32, interpret: bool = False
):
    return _qmm_v2(x, w_q, scale, out_dtype, interpret, act_quant=False)


# ----------------------------------------------------------------------
# stacked variants: the weight stack [L, K, N] stays in HBM and the
# kernel indexes the live layer with a scalar-prefetched index. Inside
# the per-layer lax.scan a pallas call CANNOT fuse XLA's dynamic-slice
# of the scanned weight stack — the sliced layer would be materialized
# as a copy first (read + write + read = 3x the bytes, which is exactly
# why the r2 bench measured int8 decode at bf16 speed). Indexing inside
# the kernel restores the true int8/fp8 byte stream.
# ----------------------------------------------------------------------


def _qmm_v2_stacked_kernel(
    layer_ref,  # [1] int32 scalar prefetch
    xq_ref,  # [TM, K]
    sx_ref,  # [TM, 1]
    w_hbm,  # [L, K, N] ANY
    sw_ref,  # [1, 1, TN] (pallas-managed, layer-indexed via prefetch)
    o_ref,  # [TM, TN]
    w_buf,  # [2, K, TN]
    sem,  # [2, SPLIT]
    *,
    out_dtype,
    tn: int,
    n_tiles: int,
    act_quant: bool,
    w_is_f8: bool = False,
):
    i, j = pl.program_id(0), pl.program_id(1)
    k = w_buf.shape[1]
    split = sem.shape[1]
    rows = k // split
    layer = layer_ref[0]

    def issue(tile_j, slot):
        for si in range(split):
            pltpu.make_async_copy(
                w_hbm.at[layer, pl.ds(si * rows, rows), pl.ds(tile_j * tn, tn)],
                w_buf.at[slot, pl.ds(si * rows, rows)],
                sem.at[slot, si],
            ).start()

    def wait(slot):
        for si in range(split):
            pltpu.make_async_copy(
                w_buf.at[slot, pl.ds(si * rows, rows)],
                w_buf.at[slot, pl.ds(si * rows, rows)],
                sem.at[slot, si],
            ).wait()

    step = i * n_tiles + j

    @pl.when(step == 0)
    def _():
        issue(0, 0)

    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, n_tiles * pl.num_programs(0))

    @pl.when(step + 1 < n_tiles * pl.num_programs(0))
    def _():
        issue(jax.lax.rem(nxt, n_tiles), jax.lax.rem(step + 1, 2))

    wait(slot)
    w = w_buf[slot]
    if w_is_f8:
        w = jax.lax.bitcast_convert_type(w, jnp.float8_e4m3fn)
    if w.dtype == jnp.int8 and act_quant:
        acc = jax.lax.dot(
            xq_ref[...], w, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        o_ref[...] = (acc * sx_ref[...] * sw_ref[0]).astype(out_dtype)
    else:
        acc = jax.lax.dot(
            xq_ref[...].astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = (acc * sw_ref[0]).astype(out_dtype)


def _qmm_v2_stacked(x, w_q, scale, layer_idx, out_dtype, interpret, act_quant):
    nl, k, n = w_q.shape
    m = x.shape[0]
    tm = _pick_tile(m, 256)
    tn_cap = 2048
    wb = 1 if w_q.dtype != jnp.bfloat16 else 2
    upcast = 2 * k if w_q.dtype == jnp.float8_e4m3fn else 0
    budget = (5 if upcast else 10) * 1024 * 1024
    while tn_cap > 128 and (
        2 * k * tn_cap * wb + upcast * tn_cap + tm * k + tm * tn_cap * 4
        > budget
    ):
        tn_cap //= 2
    tn = _pick_tile(n, tn_cap)
    n_tiles = n // tn
    split = _QMM_SPLIT if k % (32 * _QMM_SPLIT) == 0 else 1

    if act_quant:
        sx = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-10)
        xin = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(
            jnp.int8
        )
    else:
        sx = jnp.zeros((m, 1), jnp.float32)
        xin = x

    w_is_f8 = w_q.dtype == jnp.float8_e4m3fn
    if w_is_f8 and not interpret:
        w_q = jax.lax.bitcast_convert_type(w_q, jnp.int8)
    kernel = functools.partial(
        _qmm_v2_stacked_kernel, out_dtype=out_dtype, tn=tn, n_tiles=n_tiles,
        act_quant=act_quant, w_is_f8=w_is_f8 and not interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // tm, n_tiles),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j, ls: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, ls: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, tn), lambda i, j, ls: (ls[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, ls: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, k, tn), w_q.dtype),
            pltpu.SemaphoreType.DMA((2, split)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.reshape(layer_idx, (1,)).astype(jnp.int32),
        xin,
        sx,
        w_q,
        scale[:, None, :],
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_int8_v2_stacked(
    x,  # [M, K]
    w_q,  # [L, K, N] int8
    scale,  # [L, N] f32
    layer_idx,  # [] int32
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    return _qmm_v2_stacked(
        x, w_q, scale, layer_idx, out_dtype, interpret, act_quant=True
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_fp8_v2_stacked(
    x, w_q, scale, layer_idx, out_dtype=jnp.float32, interpret: bool = False
):
    return _qmm_v2_stacked(
        x, w_q, scale, layer_idx, out_dtype, interpret, act_quant=False
    )


def _fp8_mm_stacked_kernel(layer_ref, x_ref, wq_ref, sw_ref, o_ref, *,
                           out_dtype):
    del layer_ref  # consumed by the index_maps
    w = wq_ref[0].astype(jnp.bfloat16)
    acc = jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w,
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc * sw_ref[0]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_fp8_stacked(
    x,  # [M, K]
    w_q,  # [L, K, N] float8_e4m3fn
    scale,  # [L, N] f32
    layer_idx,  # [] int32
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Stacked fp8 matmul with PALLAS-managed weight blocks (the fp8
    manual-DMA v2 path crashes v5e Mosaic; the managed pipeline handles
    f8 block fetches fine — layer indexing rides the block index_map)."""
    m, k = x.shape
    nl, _, n = w_q.shape
    tm = _pick_tile(m, 256)
    # large-K prefill shapes: shrink the M tile too — the r3 8B bench
    # phase OOMed the Mosaic VMEM stack at [2048, 12288] x [36, 12288,
    # 4096] (27 M > 16 M scoped) because only tn could shrink. Mosaic's
    # measured stack accounting for the f8 path runs ~11 bytes per
    # weight-tile element (f8 double-buffer + bf16 upcast + f32 staging;
    # 17.85 M at k=12288, tn=128), not the naive 3 — budget with that.
    while tm > 64 and tm * k * 2 > 2 * 1024 * 1024:
        tm //= 2
    budget = 10 * 1024 * 1024
    tn_cap = 2048
    while tn_cap > 128 and tm * k * 2 + k * tn_cap * 11 + tm * tn_cap * 4 > budget:
        tn_cap //= 2
    if tm * k * 2 + k * tn_cap * 11 + tm * tn_cap * 4 > 15 * 1024 * 1024:
        # K too large for a single-pass weight tile (lane dim can't go
        # below 128): fall back to the XLA dequant-dot — which the r3
        # in-scan A/B measured faster anyway (probe_qmm_scan.py)
        w = w_q[layer_idx].astype(jnp.bfloat16) * scale[layer_idx][
            None, :
        ].astype(jnp.bfloat16)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
            out_dtype
        )
    tn = _pick_tile(n, tn_cap)
    kernel = functools.partial(_fp8_mm_stacked_kernel, out_dtype=out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // tm, n // tn),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j, ls: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tn), lambda i, j, ls: (ls[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda i, j, ls: (ls[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, ls: (i, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k * 2 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.reshape(layer_idx, (1,)).astype(jnp.int32), x, w_q, scale[:, None, :])


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def matmul_bf16_stacked(
    x,  # [M, K] bf16
    w,  # [L, K, N] bf16
    layer_idx,  # [] int32
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Stacked bf16 matmul on the v2 split-DMA streamer: the layer index
    goes into the kernel, so a lax.scan over layers streams weights
    straight from the [L, K, N] HBM stack (same rationale as the stacked
    quant kernels — and a direct in-scan A/B against XLA's dot)."""
    nl, _, n = w.shape
    ones = jnp.ones((nl, n), jnp.float32)
    return _qmm_v2_stacked(
        x, w, ones, layer_idx, out_dtype, interpret, act_quant=False
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def matmul_bf16_v2(
    x, w, out_dtype=jnp.float32, interpret: bool = False
):
    """Unquantized bf16 matmul on the v2 split-DMA weight streamer.

    XLA's decode-shape dots stream weights at ~660 GB/s on this rig; the
    4-way split pipeline reaches ~700 (scripts/probe_streams.py) — at
    decode batch the weight stream is the whole cost, so the same v2
    skeleton serves bf16 (reference ppmatmul small-M weight-streaming
    GEMM, docs/en/features/ppmatmul.md)."""
    n = w.shape[1]
    ones = jnp.ones((n,), jnp.float32)
    return _qmm_v2(x, w, ones, out_dtype, interpret, act_quant=False)
