"""DMA parallelism sweep: outstanding-depth x page-size x #arrays.

Hypothesis from probe_dma: each async copy costs ~1.8 us regardless of
overlap -> either per-DMA fixed cost or single-queue serialization.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HKV, D = 8, 128
ITERS = 20
TOTAL_BYTES = 768 * HKV * 64 * D * 2  # ~100 MB, match probe_dma


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def stream_kernel(src, o_ref, buf, sem, *, npages, nslots):
    def body(i, acc):
        slot = jax.lax.rem(i, nslots)
        nxt = i + nslots - 1

        @pl.when(nxt < npages)
        def _():
            pltpu.make_async_copy(
                src.at[nxt], buf.at[jax.lax.rem(nxt, nslots)],
                sem.at[jax.lax.rem(nxt, nslots)],
            ).start()

        pltpu.make_async_copy(src.at[i], buf.at[slot], sem.at[slot]).wait()
        return acc + buf[slot, :, 0:1, 0:1].astype(jnp.float32)

    for s0 in range(nslots - 1):
        pltpu.make_async_copy(src.at[s0], buf.at[s0], sem.at[s0]).start()
    acc = jax.lax.fori_loop(
        0, npages, body, jnp.zeros((HKV, 1, 1), jnp.float32)
    )
    o_ref[...] = acc


def run_stream(name, bs, nslots):
    npages = TOTAL_BYTES // (HKV * bs * D * 2)
    src = jnp.zeros((npages, HKV, bs, D), jnp.bfloat16)
    kernel = functools.partial(stream_kernel, npages=npages, nslots=nslots)
    fn = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HKV, 1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslots, HKV, bs, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )
    try:
        ms = timed(jax.jit(fn), src)
        print(f"## {name}: {ms:.3f} ms ({TOTAL_BYTES / (ms / 1e3) / 1e9:.0f} GB/s)",
              flush=True)
    except Exception as e:
        print(f"## {name}: FAILED {type(e).__name__}", flush=True)
    src.delete()


def one_big_kernel(src, o_ref, buf, sem):
    pltpu.make_async_copy(src, buf, sem).start()
    pltpu.make_async_copy(src, buf, sem).wait()
    o_ref[...] = buf[0, :, 0:1, 0:1].astype(jnp.float32)


def run_one_big():
    # single 8 MB DMA HBM -> VMEM
    npages = 8 * 1024 * 1024 // (HKV * 64 * D * 2)
    src = jnp.zeros((npages, HKV, 64, D), jnp.bfloat16)
    fn = pl.pallas_call(
        one_big_kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HKV, 1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((npages, HKV, 64, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    nbytes = npages * HKV * 64 * D * 2
    ms = timed(jax.jit(fn), src)
    print(f"## one_8MB_dma: {ms:.3f} ms ({nbytes / (ms / 1e3) / 1e9:.0f} GB/s)",
          flush=True)
    src.delete()


def main():
    for attempt in range(6):
        try:
            np.asarray(jax.jit(lambda: jnp.ones(8) * 2)())
            break
        except Exception as e:
            print(f"probe fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)

    run_one_big()
    run_stream("bs64_depth4", 64, 4)
    run_stream("bs64_depth8", 64, 8)
    run_stream("bs64_depth16", 64, 16)
    run_stream("bs256_depth4", 256, 4)
    run_stream("bs256_depth8", 256, 8)
    run_stream("bs1024_depth4", 1024, 4)


if __name__ == "__main__":
    main()
