"""Isolate the decode-attention bottleneck: DMA rate vs per-page compute.

Kernels (all grid-per-page over NPAGES pages of [Hkv, bs, D] bf16):
  dma_only     : hand-rolled 4-deep async-copy pipeline, no compute
  compute_only : per-page batched dot + softmax update on resident VMEM
  fused        : both (the real kernel's structure)
  pallas_pipe  : pallas-managed input pipelining, trivial body
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HKV, BS, D, G = 8, 64, 128, 2
NPAGES = 768  # == bench traffic per layer (128 seqs x 3 pages and 2 arrays)
ITERS = 20
NSLOTS = 4


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def report(name, ms, nbytes):
    print(f"## {name}: {ms:.3f} ms ({nbytes / (ms / 1e3) / 1e9:.0f} GB/s)",
          flush=True)


def _dma_kernel(src, o_ref, buf, sem, *, compute: bool, dma: bool):
    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, NSLOTS)
        if dma:
            nxt = i + NSLOTS - 1

            @pl.when(nxt < NPAGES)
            def _():
                pltpu.make_async_copy(
                    src.at[nxt], buf.at[jax.lax.rem(nxt, NSLOTS)],
                    sem.at[jax.lax.rem(nxt, NSLOTS)],
                ).start()

            pltpu.make_async_copy(src.at[i], buf.at[slot], sem.at[slot]).wait()
        if compute:
            q = acc.astype(jnp.bfloat16)  # [Hkv, G, D]
            s = jax.lax.dot_general(
                q, buf[slot],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, (HKV, G, BS), 2)
            s = jnp.where(kv_idx < 10_000, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), buf[slot],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            m, l = m_new, l_new
        else:
            m = m + buf[slot, :, 0:G, 0:1].astype(jnp.float32)
        return m, l, acc

    if dma:
        for s0 in range(NSLOTS - 1):
            pltpu.make_async_copy(src.at[s0], buf.at[s0], sem.at[s0]).start()
    m0 = jnp.full((HKV, G, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((HKV, G, 1), jnp.float32)
    acc0 = jnp.zeros((HKV, G, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, NPAGES, body, (m0, l0, acc0))
    o_ref[...] = acc + m + l


def run_variant(name, compute, dma, src):
    kernel = functools.partial(_dma_kernel, compute=compute, dma=dma)
    fn = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HKV, G, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, HKV, BS, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
    )
    ms = timed(jax.jit(fn), src)
    report(name, ms, NPAGES * HKV * BS * D * 2 if dma else 0)


def run_pallas_pipe(src):
    def kernel(page_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += page_ref[0, :, 0, :].astype(jnp.float32)

    fn = pl.pallas_call(
        kernel,
        grid=(NPAGES,),
        in_specs=[
            pl.BlockSpec((1, HKV, BS, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((HKV, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HKV, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    ms = timed(jax.jit(fn), src)
    report("pallas_pipe", ms, NPAGES * HKV * BS * D * 2)


def main():
    for attempt in range(6):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"probe fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)

    src = jnp.zeros((NPAGES, HKV, BS, D), jnp.bfloat16)  # 100 MB
    run_variant("dma_only", compute=False, dma=True, src=src)
    run_variant("compute_only", compute=True, dma=False, src=src)
    run_variant("fused", compute=True, dma=True, src=src)
    run_pallas_pipe(src)


if __name__ == "__main__":
    main()
