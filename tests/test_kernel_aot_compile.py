"""Chipless AOT Mosaic compilation of every production Pallas kernel.

A kernel that traces and passes in interpret mode can still CRASH the real
Mosaic compiler (VMEM stack overflows, tiling violations) — and on this
rig a crashed remote compile wedges the TPU tunnel for ~18 minutes. This
suite compiles the kernels at production (bench-class) shapes against a
chipless v5e topology via jax.experimental.topologies, entirely on CPU —
the same TpuAotCompiler the axon remote-compile helper uses.

Counterpart of the reference's device-gated kernel tests (SURVEY §4:
tests/core/kernels/* compare vendor kernels on real hardware) — here the
compile-validity half runs hardware-free in CI.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# bench-model shapes (qwen3-1.7B class)
B = 128  # decode batch
HQ, HKV, D = 16, 8, 128
BS = 64  # page size
NB = 8  # per-seq block-table length
NBLK = 64  # total blocks (shape-only; capacity irrelevant to compile)
L = 2
P, S = 4, 512  # batched prefill rows x tokens


@pytest.fixture(scope="module")
def tpu_aot():
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x2x1"
        )
    except Exception as e:  # no local libtpu
        pytest.skip(f"chipless TPU AOT unavailable: {e}")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(topo.devices[:1]).reshape(1), ("x",))
    sh = NamedSharding(mesh, PartitionSpec())

    def compile_(fn, *shapes, **kw):
        args = [
            jax.ShapeDtypeStruct(s, dt, sharding=sh) for s, dt in shapes
        ]
        jax.jit(functools.partial(fn, **kw)).lower(*args).compile()

    return compile_


def _kv_shapes():
    cache = ((L, NBLK, HKV, BS, D), jnp.bfloat16)
    return cache




def test_prefill_batched_compiles(tpu_aot):
    from xllm_tpu.ops.pallas.prefill_attention import (
        paged_attention_prefill_batched_tpu,
    )

    cache = _kv_shapes()
    tpu_aot(
        paged_attention_prefill_batched_tpu,
        ((P, S, HQ, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        scale=D**-0.5,
    )


def test_prefill_batched_8b_compiles(tpu_aot):
    """Regression: the 8B bench config (Hq=32, 36 layers) OOMed the Mosaic
    VMEM stack at TQ=128 — _pick_q_tile must shrink the tile with the
    head count (r3 bench failure: 17.63M > 16M scoped vmem)."""
    from xllm_tpu.ops.pallas.prefill_attention import (
        paged_attention_prefill_batched_tpu,
        paged_attention_prefill_tpu,
    )

    L8, NBLK8, HQ8 = 36, 250, 32
    cache = ((L8, NBLK8, HKV, BS, D), jnp.bfloat16)
    tpu_aot(
        paged_attention_prefill_batched_tpu,
        ((P, S, HQ8, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((P, 35), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        scale=D**-0.5,
    )
    tpu_aot(
        paged_attention_prefill_tpu,
        ((2048, HQ8, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((35,), jnp.int32),
        ((), jnp.int32),
        ((), jnp.int32),
        scale=D**-0.5,
    )


def test_decode_v5_premap_compile(tpu_aot):
    """The host-precomputed page-map path (DecodeInput.page_cum/page_seq)
    must produce the same Mosaic kernel — only the XLA-side prep changes.
    (Legacy generations' compile tests were retired with the kernels —
    ops/pallas/legacy; interpret-mode coverage remains.)"""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v5_tpu,
    )

    cache = _kv_shapes()
    common = (
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
    )
    def v5_premap(*a, scale):
        *base, cum = a
        return paged_decode_attention_write_v5_tpu(*base, scale, cum=cum)

    tpu_aot(v5_premap, *common, ((B + 1,), jnp.int32), scale=D**-0.5)


def test_kv_writers_compile(tpu_aot):
    from xllm_tpu.ops.pallas.kv_write import (
        kv_write_prefill_batched_tpu,
        kv_write_rmw_batched_tpu,
    )

    cache = _kv_shapes()
    tpu_aot(
        kv_write_prefill_batched_tpu,
        ((P, HKV, S, D), jnp.bfloat16),
        ((P, HKV, S, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
    )
    tpu_aot(
        kv_write_rmw_batched_tpu,
        ((P, BS, HKV, D), jnp.bfloat16),
        ((P, BS, HKV, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
    )


def test_quant_matmuls_compile(tpu_aot):
    from xllm_tpu.ops.pallas.quant_matmul import (
        quant_matmul_fp8,
        quant_matmul_fp8_v2,
        quant_matmul_int8,
        quant_matmul_int8_v2,
    )

    for K, N in ((2048, 6144), (2048, 12288), (6144, 2048)):
        x = ((B, K), jnp.bfloat16)
        s = ((N,), jnp.float32)
        tpu_aot(quant_matmul_int8, x, ((K, N), jnp.int8), s)
        tpu_aot(quant_matmul_int8_v2, x, ((K, N), jnp.int8), s)
        tpu_aot(quant_matmul_fp8, x, ((K, N), jnp.float8_e4m3fn), s)
        tpu_aot(quant_matmul_fp8_v2, x, ((K, N), jnp.float8_e4m3fn), s)


def test_quant_matmuls_stacked_compile(tpu_aot):
    from xllm_tpu.ops.pallas.quant_matmul import (
        quant_matmul_fp8_stacked,
        quant_matmul_int8_v2_stacked,
    )

    from xllm_tpu.ops.pallas.quant_matmul import matmul_bf16_stacked

    NL = 28
    for K, N in ((2048, 6144), (2048, 12288), (6144, 2048)):
        x = ((B, K), jnp.bfloat16)
        s = ((NL, N), jnp.float32)
        li = ((), jnp.int32)
        tpu_aot(
            quant_matmul_int8_v2_stacked, x, ((NL, K, N), jnp.int8), s, li
        )
        tpu_aot(
            quant_matmul_fp8_stacked, x, ((NL, K, N), jnp.float8_e4m3fn),
            s, li,
        )
        tpu_aot(
            matmul_bf16_stacked, x, ((NL, K, N), jnp.bfloat16), li
        )


def test_mla_kernels_compile(tpu_aot):
    from xllm_tpu.ops.pallas.mla_attention import (
        mla_decode_attention_write_tpu,
        mla_prefill_attention_batched_tpu,
    )

    DK = 640  # 512 latent + 64 rope, lane-padded to 128-multiple
    DV = 512
    H = 16
    cache = ((L, NBLK, 1, BS, DK), jnp.bfloat16)
    tpu_aot(
        mla_decode_attention_write_tpu,
        ((B, H, DK), jnp.bfloat16),
        ((B, DK), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
        scale=DK**-0.5,
        dv=DV,
    )
    tpu_aot(
        mla_prefill_attention_batched_tpu,
        ((P, S, H, DK), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        scale=DK**-0.5,
        dv=DV,
    )


def test_own_gmm_compiles(tpu_aot):
    from xllm_tpu.ops.pallas.gmm import gmm

    # qwen3-moe-class: E=128 experts, D=2048, I=768; 1024 routed pairs
    E, D, I, M = 128, 2048, 768, 1024
    offs = ((E + 1,), jnp.int32)
    tpu_aot(gmm, ((M, D), jnp.bfloat16), ((E, D, 2 * I), jnp.bfloat16), offs)
    tpu_aot(gmm, ((M, I), jnp.bfloat16), ((E, I, D), jnp.bfloat16), offs)


def test_decode_v5_compiles(tpu_aot):
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v5_tpu,
    )

    cache = _kv_shapes()
    tpu_aot(
        paged_decode_attention_write_v5_tpu,
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
        scale=D**-0.5,
    )
    tpu_aot(
        paged_decode_attention_write_v5_tpu,
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
        scale=D**-0.5,
        window=1024,
    )


def test_decode_v5_fp8_kv_compiles(tpu_aot):
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v5_tpu,
    )

    cache = ((L, NBLK, HKV, BS, D), jnp.float8_e4m3fn)
    tpu_aot(
        paged_decode_attention_write_v5_tpu,
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.float8_e4m3fn),
        ((B, HKV, D), jnp.float8_e4m3fn),
        cache, cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
        scale=D**-0.5,
    )






def test_matmul_bf16_v2_compiles(tpu_aot):
    from xllm_tpu.ops.pallas.quant_matmul import matmul_bf16_v2

    for k, n in ((2048, 4096), (2048, 2048), (6144, 2048), (2048, 12288)):
        tpu_aot(
            matmul_bf16_v2,
            ((128, k), jnp.bfloat16),
            ((k, n), jnp.bfloat16),
        )


def test_own_gmm_fp8_compiles(tpu_aot):
    from xllm_tpu.ops.pallas.gmm import gmm

    E, D, I, M = 128, 2048, 768, 1024
    offs = ((E + 1,), jnp.int32)
    tpu_aot(
        gmm, ((M, D), jnp.bfloat16), ((E, D, 2 * I), jnp.float8_e4m3fn),
        offs,
    )
    tpu_aot(
        gmm, ((M, I), jnp.bfloat16), ((E, I, D), jnp.float8_e4m3fn), offs,
    )


def test_decode_kernels_bs128_compile(tpu_aot):
    """bench-shape compile at page size 128 (the per-page fixed cost
    amortizes over twice the bytes; candidate bench config). Covers the
    FULL page-128 path the bench would drive: decode v5/v9 (incl. v9
    premap, the production trace), batched prefill attention, and both
    writers."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v5_tpu,
        paged_decode_attention_write_v9_tpu,
    )
    from xllm_tpu.ops.pallas.kv_write import (
        kv_write_prefill_batched_tpu,
        kv_write_rmw_batched_tpu,
    )
    from xllm_tpu.ops.pallas.prefill_attention import (
        paged_attention_prefill_batched_tpu,
    )

    cache = ((L, NBLK, HKV, 128, D), jnp.bfloat16)
    for fn in (paged_decode_attention_write_v5_tpu,
               paged_decode_attention_write_v9_tpu):
        tpu_aot(
            fn,
            ((B, HQ, D), jnp.bfloat16),
            ((B, HKV, D), jnp.bfloat16),
            ((B, HKV, D), jnp.bfloat16),
            cache, cache,
            ((), jnp.int32),
            ((B,), jnp.int32),
            ((B, 4), jnp.int32),
            ((B,), jnp.int32),
            scale=D**-0.5,
        )

    def v9_premap(*a, scale):
        *base, cum = a
        return paged_decode_attention_write_v9_tpu(
            *base, scale, cum=cum, tile=4
        )

    tpu_aot(
        v9_premap,
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, 4), jnp.int32),
        ((B,), jnp.int32),
        ((B + 1,), jnp.int32),
        scale=D**-0.5,
    )
    tpu_aot(
        paged_attention_prefill_batched_tpu,
        ((P, S, HQ, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((P, 4), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        scale=D**-0.5,
    )
    tpu_aot(
        kv_write_prefill_batched_tpu,
        ((P, HKV, S, D), jnp.bfloat16),
        ((P, HKV, S, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((P, 4), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
    )
    tpu_aot(
        kv_write_rmw_batched_tpu,
        ((P, 128, HKV, D), jnp.bfloat16),
        ((P, 128, HKV, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((P, 4), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
    )


def test_mla_kernels_fp8_latent_compile(tpu_aot):
    """Regression: the MLA kernels fed fp8 latent tiles straight into the
    MXU dots (and quantized softmax probs to fp8) — Mosaic won't lower
    the mixed dot; the _mxu upcast must keep these compiling. lat_new
    stays bf16 (what ops/mla.py passes on the decode path)."""
    from xllm_tpu.ops.pallas.mla_attention import (
        mla_decode_attention_write_tpu,
        mla_prefill_attention_batched_tpu,
        mla_prefill_attention_tpu,
    )

    DK = 640
    DV = 512
    H = 16
    cache = ((L, NBLK, 1, BS, DK), jnp.float8_e4m3fn)
    tpu_aot(
        mla_decode_attention_write_tpu,
        ((B, H, DK), jnp.bfloat16),
        ((B, DK), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
        scale=DK**-0.5,
        dv=DV,
    )
    tpu_aot(
        mla_prefill_attention_batched_tpu,
        ((P, S, H, DK), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        scale=DK**-0.5,
        dv=DV,
    )
    tpu_aot(
        mla_prefill_attention_tpu,
        ((S, H, DK), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((NB,), jnp.int32),
        ((), jnp.int32),
        ((), jnp.int32),
        scale=DK**-0.5,
        dv=DV,
    )



def test_fp8_stacked_prefill_shape_compiles(tpu_aot):
    """Regression: the r3 8B bench phase OOMed Mosaic's VMEM stack in
    quant_matmul_fp8_stacked at prefill M=2048, K=12288 (27M > 16M) —
    the tile picker must shrink TM with K, not only TN."""
    from xllm_tpu.ops.pallas.quant_matmul import (
        quant_matmul_fp8_stacked,
        quant_matmul_int8_v2_stacked,
    )

    NL = 36
    for K, N in ((12288, 4096), (4096, 12288)):
        x = ((2048, K), jnp.bfloat16)
        s = ((NL, N), jnp.float32)
        li = ((), jnp.int32)
        tpu_aot(
            quant_matmul_fp8_stacked, x, ((NL, K, N), jnp.float8_e4m3fn),
            s, li,
        )
        tpu_aot(
            quant_matmul_int8_v2_stacked, x, ((NL, K, N), jnp.int8), s, li
        )


def test_decode_v9_compiles(tpu_aot):
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v9_tpu,
    )

    cache = _kv_shapes()
    common = (
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
    )
    for kw in ({}, {"window": 1024}, {"tile": 2}, {"tile": 3},
               {"tile": 4, "nslots_override": 4},
               {"tile": 6}, {"tile": 8}, {"tile": 4, "softmax16": True},
               {"tile": 4, "premask": True}):
        tpu_aot(
            paged_decode_attention_write_v9_tpu, *common,
            scale=D**-0.5, **kw,
        )
    # 8B bench config (Hq=32) and fp8 KV
    cache8 = ((36, 250, HKV, BS, D), jnp.bfloat16)
    tpu_aot(
        paged_decode_attention_write_v9_tpu,
        ((64, 32, D), jnp.bfloat16),
        ((64, HKV, D), jnp.bfloat16),
        ((64, HKV, D), jnp.bfloat16),
        cache8, cache8,
        ((), jnp.int32),
        ((64,), jnp.int32),
        ((64, 35), jnp.int32),
        ((64,), jnp.int32),
        scale=D**-0.5,
    )
    cachef8 = ((L, NBLK, HKV, BS, D), jnp.float8_e4m3fn)
    tpu_aot(
        paged_decode_attention_write_v9_tpu,
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.float8_e4m3fn),
        ((B, HKV, D), jnp.float8_e4m3fn),
        cachef8, cachef8,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
        scale=D**-0.5,
    )

def test_decode_int8_kv_compiles(tpu_aot):
    """int8 KV (scaleless in-kernel; scales fold into q / the output
    outside — see _mxu): fp8 KV measured 4x slower than bf16 on v5e
    (probe_r8_fp8kv r3 log), so quantized KV ships as int8. Compiles
    the probe/production trace: int8 cache + int8 new-token rows, v5
    premap and v9 tiles, plus the bf16-rows-in-int8-cache combination
    the model's decode() emits."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v5_tpu,
        paged_decode_attention_write_v9_tpu,
    )

    cache = ((L, NBLK, HKV, BS, D), jnp.int8)
    for rows_dt in (jnp.int8, jnp.bfloat16):
        common = (
            ((B, HQ, D), jnp.bfloat16),
            ((B, HKV, D), rows_dt),
            ((B, HKV, D), rows_dt),
            cache, cache,
            ((), jnp.int32),
            ((B,), jnp.int32),
            ((B, NB), jnp.int32),
            ((B,), jnp.int32),
        )
        tpu_aot(
            paged_decode_attention_write_v5_tpu, *common, scale=D**-0.5
        )
        for kw in ({"tile": 4}, {"tile": 2}, {"tile": 6}, {"tile": 8},
                   {"tile": 4, "premask": True}):
            tpu_aot(
                paged_decode_attention_write_v9_tpu, *common,
                scale=D**-0.5, **kw,
            )

    def v5_premap(*a, scale):
        *base, cum = a
        return paged_decode_attention_write_v5_tpu(*base, scale, cum=cum)

    tpu_aot(
        v5_premap,
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.int8),
        ((B, HKV, D), jnp.int8),
        cache, cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
        ((B + 1,), jnp.int32),
        scale=D**-0.5,
    )


def test_prefill_and_writers_int8_kv_compile(tpu_aot):
    """The int8-KV bench phases drive the full path: batched prefill
    attention + both KV writers must lower with int8 caches and int8
    new-token rows (the model quantizes BEFORE the kernels)."""
    from xllm_tpu.ops.pallas.kv_write import (
        kv_write_prefill_batched_tpu,
        kv_write_rmw_batched_tpu,
    )
    from xllm_tpu.ops.pallas.prefill_attention import (
        paged_attention_prefill_batched_tpu,
        paged_attention_prefill_tpu,
    )

    cache = ((L, NBLK, HKV, BS, D), jnp.int8)
    tpu_aot(
        paged_attention_prefill_batched_tpu,
        ((P, S, HQ, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        scale=D**-0.5,
    )
    tpu_aot(
        paged_attention_prefill_tpu,
        ((512, HQ, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((NB,), jnp.int32),
        ((), jnp.int32),
        ((), jnp.int32),
        scale=D**-0.5,
    )
    tpu_aot(
        kv_write_prefill_batched_tpu,
        ((P, HKV, S, D), jnp.int8),
        ((P, HKV, S, D), jnp.int8),
        cache, cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
    )
    tpu_aot(
        kv_write_rmw_batched_tpu,
        ((P, BS, HKV, D), jnp.int8),
        ((P, BS, HKV, D), jnp.int8),
        cache, cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
    )
    # 8B bench shapes (Hq=32, 36 layers) with int8 cache
    cache8 = ((36, 250, HKV, BS, D), jnp.int8)
    tpu_aot(
        paged_attention_prefill_batched_tpu,
        ((P, S, 32, D), jnp.bfloat16),
        cache8, cache8,
        ((), jnp.int32),
        ((P, 35), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        scale=D**-0.5,
    )


def test_decode_fp8_cache_bf16_rows_compiles(tpu_aot):
    """The PRODUCTION fp8-KV decode trace: the model hands the kernels
    bf16 post-rope K/V rows and an fp8_e4m3 cache (models/decoder.py
    decode() does not pre-cast; the kernel's tail patch casts in place).
    The fp8-k_new variants above compile a different combination."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v5_tpu,
        paged_decode_attention_write_v9_tpu,
    )

    cache = ((L, NBLK, HKV, BS, D), jnp.float8_e4m3fn)
    common = (
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        cache, cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
    )
    tpu_aot(paged_decode_attention_write_v5_tpu, *common, scale=D**-0.5)
    for kw in ({"tile": 4}, {"tile": 2}):
        tpu_aot(
            paged_decode_attention_write_v9_tpu, *common,
            scale=D**-0.5, **kw,
        )


def test_interleaved_kernels_compile(tpu_aot):
    """The interleaved-layout path (kv_layout=interleaved): v11 decode at
    bench shapes (bf16 + int8 cache, window, tiles), the interleaved
    batched prefill attention, and both interleaved writers."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v11_tpu,
    )
    from xllm_tpu.ops.pallas.kv_write import (
        kv_write_prefill_batched_ilv_tpu,
        kv_write_rmw_batched_ilv_tpu,
    )
    from xllm_tpu.ops.pallas.prefill_attention import (
        paged_attention_prefill_batched_ilv_tpu,
    )

    for cache_dt, rows_dt in (
        (jnp.bfloat16, jnp.bfloat16),
        (jnp.int8, jnp.int8),
        (jnp.int8, jnp.bfloat16),
    ):
        cache = ((L, NBLK, 2, HKV, BS, D), cache_dt)
        common = (
            ((B, HQ, D), jnp.bfloat16),
            ((B, HKV, D), rows_dt),
            ((B, HKV, D), rows_dt),
            cache,
            ((), jnp.int32),
            ((B,), jnp.int32),
            ((B, NB), jnp.int32),
            ((B,), jnp.int32),
        )
        for kw in ({}, {"tile": 2}, {"window": 1024}):
            tpu_aot(
                paged_decode_attention_write_v11_tpu, *common,
                scale=D**-0.5, **kw,
            )

    # premap trace (the production decode path passes DecodeInput.page_cum)
    def v11_premap(*a, scale):
        *base, cum = a
        return paged_decode_attention_write_v11_tpu(
            *base, scale, cum=cum, tile=4
        )

    cache = ((L, NBLK, 2, HKV, BS, D), jnp.bfloat16)
    tpu_aot(
        v11_premap,
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
        ((B + 1,), jnp.int32),
        scale=D**-0.5,
    )
    # 8B bench config (Hq=32, 36 layers)
    cache8 = ((36, 250, 2, HKV, BS, D), jnp.bfloat16)
    tpu_aot(
        paged_decode_attention_write_v11_tpu,
        ((64, 32, D), jnp.bfloat16),
        ((64, HKV, D), jnp.bfloat16),
        ((64, HKV, D), jnp.bfloat16),
        cache8,
        ((), jnp.int32),
        ((64,), jnp.int32),
        ((64, 35), jnp.int32),
        ((64,), jnp.int32),
        scale=D**-0.5,
    )
    for cache_dt in (jnp.bfloat16, jnp.int8):
        cache = ((L, NBLK, 2, HKV, BS, D), cache_dt)
        tpu_aot(
            paged_attention_prefill_batched_ilv_tpu,
            ((P, S, HQ, D), jnp.bfloat16),
            cache,
            ((), jnp.int32),
            ((P, NB), jnp.int32),
            ((P,), jnp.int32),
            ((P,), jnp.int32),
            scale=D**-0.5,
        )
        tpu_aot(
            kv_write_prefill_batched_ilv_tpu,
            ((P, 2, HKV, S, D), cache_dt),
            cache,
            ((), jnp.int32),
            ((P, NB), jnp.int32),
            ((P,), jnp.int32),
            ((P,), jnp.int32),
        )
        tpu_aot(
            kv_write_rmw_batched_ilv_tpu,
            ((P, BS, HKV, D), cache_dt),
            ((P, BS, HKV, D), cache_dt),
            cache,
            ((), jnp.int32),
            ((P, NB), jnp.int32),
            ((P,), jnp.int32),
            ((P,), jnp.int32),
        )

def test_rowmajor_kernels_compile(tpu_aot):
    """kv_layout=interleaved_rm: v12 decode (row-major tail pages), the
    rowmajor prefill writers, and the tail-aware prefill attention."""
    from xllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_write_v12_tpu,
    )
    from xllm_tpu.ops.pallas.kv_write import (
        kv_write_prefill_batched_rm_tpu,
        kv_write_rmw_batched_rm_tpu,
    )
    from xllm_tpu.ops.pallas.prefill_attention import (
        paged_attention_prefill_batched_ilv_tpu,
    )

    cache = ((L, NBLK, 2, HKV, BS, D), jnp.bfloat16)
    common = (
        ((B, HQ, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        ((B, HKV, D), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((B,), jnp.int32),
        ((B, NB), jnp.int32),
        ((B,), jnp.int32),
    )
    for kw in ({}, {"tile": 2}, {"window": 1024}):
        tpu_aot(
            paged_decode_attention_write_v12_tpu, *common,
            scale=D**-0.5, **kw,
        )
    # 8B bench config (Hq=32, 36 layers)
    cache8 = ((36, 250, 2, HKV, BS, D), jnp.bfloat16)
    tpu_aot(
        paged_decode_attention_write_v12_tpu,
        ((64, 32, D), jnp.bfloat16),
        ((64, HKV, D), jnp.bfloat16),
        ((64, HKV, D), jnp.bfloat16),
        cache8,
        ((), jnp.int32),
        ((64,), jnp.int32),
        ((64, 35), jnp.int32),
        ((64,), jnp.int32),
        scale=D**-0.5,
    )
    tpu_aot(
        paged_attention_prefill_batched_ilv_tpu,
        ((P, S, HQ, D), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        scale=D**-0.5,
        rowmajor_tail=True,
    )
    tpu_aot(
        kv_write_prefill_batched_rm_tpu,
        ((P, 2, HKV, S, D), jnp.bfloat16),
        ((P, S, 2 * HKV, D), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
    )
    tpu_aot(
        kv_write_rmw_batched_rm_tpu,
        ((P, BS, HKV, D), jnp.bfloat16),
        ((P, BS, HKV, D), jnp.bfloat16),
        cache,
        ((), jnp.int32),
        ((P, NB), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
        ((P,), jnp.int32),
    )
