"""Pallas in-place paged KV-cache writer for prefill chunks.

TPU-native counterpart of the reference's reshape_paged_cache op
(reference xllm/core/kernels/ops_api.h paged-cache ops). The chunk's K/V
rows land in their page slots via HBM->HBM DMA with the cache aliased
in/out (`input_output_aliases`) — no XLA scatter (which cannot be proven
in-place inside the layer scan and degenerates to a whole-cache copy per
layer).

CONTRACT: the chunk start (`q_offset`) is page-aligned — the scheduler
rounds prefill chunk budgets down to block_size multiples, so every chunk
except a prompt's final one is a whole number of pages. Writes are then
all full-page DMAs [Hkv, bs, D] (HBM tiling forbids sub-page slices); the
tail page is written whole, clobbering only slots beyond the sequence's
tokens (never-read garbage, overwritten when those positions compute).

New K/V arrive head-major [Hkv, S_pad, D] (the layout the prefill
attention kernel wants for q), padded internally by one page so tail-page
source reads stay in bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kv_write_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_table_ref,  # [NBmax] int32
    q_offset_ref,  # [1] int32 (page-aligned)
    ntok_ref,  # [1] int32 (actual chunk tokens, <= S_pad)
    # inputs
    kt,  # [Hkv, S_pad + bs, D] ANY (head-major new K)
    vt,
    k_in,  # [L, NB, Hkv, bs, D] ANY (aliased)
    v_in,
    # outputs (aliased)
    k_out,
    v_out,
    # scratch
    page_sem,  # [2, MAXP]
    *,
    block_size: int,
    max_pages: int,
):
    del k_in, v_in
    layer = layer_ref[0]
    q_offset = q_offset_ref[0]
    ntok = ntok_ref[0]
    first_page = q_offset // block_size

    def page_dmas(p):
        r0 = p * block_size
        blk = block_table_ref[first_page + p]
        kw = pltpu.make_async_copy(
            kt.at[:, pl.ds(r0, block_size), :],
            k_out.at[layer, blk],
            page_sem.at[0, p],
        )
        vw = pltpu.make_async_copy(
            vt.at[:, pl.ds(r0, block_size), :],
            v_out.at[layer, blk],
            page_sem.at[1, p],
        )
        return kw, vw

    for p in range(max_pages):

        @pl.when(p * block_size < ntok)
        def _(p=p):
            kw, vw = page_dmas(p)
            kw.start()
            vw.start()

    for p in range(max_pages):

        @pl.when(p * block_size < ntok)
        def _(p=p):
            kw, vw = page_dmas(p)
            kw.wait()
            vw.wait()


def _kv_write_rmw_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    block_table_ref,  # [NBmax]
    q_offset_ref,  # [1] (any alignment)
    ntok_ref,  # [1] valid rows (<= S)
    # inputs
    kt,  # [S, Hkv, D] VMEM (small chunk, token-major, S <= block_size)
    vt,
    k_in,  # aliased
    v_in,
    # outputs (aliased)
    k_out,
    v_out,
    # scratch
    k_pg,  # [Hkv, bs, D] VMEM
    v_pg,
    sem,  # [2]
    *,
    block_size: int,
    s: int,
):
    """Read-modify-write small-chunk writer (speculative verify chunks).

    The chunk spans at most two pages; each touched page is DMA'd to VMEM,
    the chunk rows are merged with per-row vector selects (S is small and
    static), and the page is written back whole — HBM tiling never sees a
    sub-page DMA. The chunk is token-major so indexing row j slices the
    UNtiled leading dim.
    """
    del k_in, v_in
    layer = layer_ref[0]
    q_offset = q_offset_ref[0]
    ntok = ntok_ref[0]
    _, hkv, d = kt.shape
    first_page = q_offset // block_size
    last_page = (q_offset + jnp.maximum(ntok, 1) - 1) // block_size

    def do_page(page_idx):
        blk = block_table_ref[page_idx]
        kr = pltpu.make_async_copy(k_out.at[layer, blk], k_pg, sem.at[0])
        vr = pltpu.make_async_copy(v_out.at[layer, blk], v_pg, sem.at[1])
        kr.start()
        vr.start()
        kr.wait()
        vr.wait()
        row = jax.lax.broadcasted_iota(jnp.int32, (hkv, block_size, d), 1)
        for j in range(s):
            pos = q_offset + j
            hit = (
                (j < ntok)
                & (pos // block_size == page_idx)
                & (row == jax.lax.rem(pos, block_size))
            )
            k_pg[...] = jnp.where(
                hit, kt[j][:, None, :].astype(k_pg.dtype), k_pg[...]
            )
            v_pg[...] = jnp.where(
                hit, vt[j][:, None, :].astype(v_pg.dtype), v_pg[...]
            )
        kw = pltpu.make_async_copy(k_pg, k_out.at[layer, blk], sem.at[0])
        vw = pltpu.make_async_copy(v_pg, v_out.at[layer, blk], sem.at[1])
        kw.start()
        vw.start()
        kw.wait()
        vw.wait()

    do_page(first_page)

    @pl.when(last_page != first_page)
    def _():
        do_page(last_page)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_rmw_tpu(
    kt: jnp.ndarray,  # [S, Hkv, D] token-major chunk, S <= block_size
    vt: jnp.ndarray,
    k_all: jnp.ndarray,
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,
    block_table: jnp.ndarray,
    q_offset: jnp.ndarray,  # [] any alignment
    ntok: jnp.ndarray,  # [] valid rows
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    s, hkv, d = kt.shape
    bs = k_all.shape[3]
    assert s <= bs, "RMW writer covers chunks within two pages"
    kernel = functools.partial(_kv_write_rmw_kernel, block_size=bs, s=s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, bs, d), k_all.dtype),
            pltpu.VMEM((hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_table,
        q_offset.reshape(1),
        ntok.reshape(1),
        kt,
        vt,
        k_all,
        v_all,
    )
    return k_all, v_all


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill_tpu(
    kt: jnp.ndarray,  # [Hkv, S_pad, D] head-major new K of the chunk
    vt: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    block_table: jnp.ndarray,  # [NBmax] int32
    q_offset: jnp.ndarray,  # [] int32 (page-aligned; see module docstring)
    ntok: jnp.ndarray,  # [] int32 (valid rows in kt)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (k_all, v_all) updated in place."""
    hkv, s_pad, d = kt.shape
    bs = k_all.shape[3]
    max_pages = (s_pad + bs - 1) // bs
    # one page of slack so tail-page source reads stay in bounds
    kt = jnp.pad(kt, ((0, 0), (0, bs), (0, 0)))
    vt = jnp.pad(vt, ((0, 0), (0, bs), (0, 0)))

    kernel = functools.partial(
        _kv_write_kernel, block_size=bs, max_pages=max_pages
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2, max_pages)),
        ],
    )
    # inputs: 4 scalars, kt=4, vt=5, k_all=6, v_all=7 -> outputs 0, 1
    k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_table,
        q_offset.reshape(1),
        ntok.reshape(1),
        kt,
        vt,
        k_all,
        v_all,
    )
    return k_all, v_all


# ----------------------------------------------------------------------
# batched (multi-chunk) writers: grid (P,), one program per chunk row
# (counterpart of the reference whole-batch BatchInputBuilder semantics,
# xllm/core/framework/batch/batch_input_builder.h:53)
# ----------------------------------------------------------------------
def _kv_write_batched_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    block_tables_ref,  # [P, NBmax]
    q_offsets_ref,  # [P] (page-aligned per row)
    ntoks_ref,  # [P]
    # inputs
    kt,  # [P, Hkv, S_pad + bs, D] ANY
    vt,
    k_in,
    v_in,
    # outputs (aliased)
    k_out,
    v_out,
    # scratch
    page_sem,  # [2, MAXP]
    *,
    block_size: int,
    max_pages: int,
):
    del k_in, v_in
    p = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    ntok = ntoks_ref[p]
    first_page = q_offset // block_size

    split = page_sem.shape[2]
    hkv_total = k_out.shape[2]
    rows = hkv_total // split

    def page_dmas(pg):
        r0 = pg * block_size
        blk = block_tables_ref[p, first_page + pg]
        copies = []
        for si in range(split):
            copies.append(pltpu.make_async_copy(
                kt.at[p, pl.ds(si * rows, rows), pl.ds(r0, block_size), :],
                k_out.at[layer, blk, pl.ds(si * rows, rows)],
                page_sem.at[0, pg, si],
            ))
            copies.append(pltpu.make_async_copy(
                vt.at[p, pl.ds(si * rows, rows), pl.ds(r0, block_size), :],
                v_out.at[layer, blk, pl.ds(si * rows, rows)],
                page_sem.at[1, pg, si],
            ))
        return copies

    for pg in range(max_pages):

        @pl.when(pg * block_size < ntok)
        def _(pg=pg):
            for c in page_dmas(pg):
                c.start()

    for pg in range(max_pages):

        @pl.when(pg * block_size < ntok)
        def _(pg=pg):
            for c in page_dmas(pg):
                c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill_batched_tpu(
    kt: jnp.ndarray,  # [P, Hkv, S_pad, D] head-major new K per chunk
    vt: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    block_tables: jnp.ndarray,  # [P, NBmax] int32
    q_offsets: jnp.ndarray,  # [P] int32 (page-aligned)
    ntoks: jnp.ndarray,  # [P] int32 (0 = padded row)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    p, hkv, s_pad, d = kt.shape
    bs = k_all.shape[3]
    max_pages = (s_pad + bs - 1) // bs
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, bs), (0, 0)))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, bs), (0, 0)))

    kernel = functools.partial(
        _kv_write_batched_kernel, block_size=bs, max_pages=max_pages
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA(
            (2, max_pages, 4 if hkv % 4 == 0 else (2 if hkv % 2 == 0 else 1))
        )],
    )
    k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        ntoks,
        kt,
        vt,
        k_all,
        v_all,
    )
    return k_all, v_all


def _kv_write_rmw_batched_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    block_tables_ref,  # [P, NBmax]
    q_offsets_ref,  # [P]
    ntoks_ref,  # [P]
    # inputs
    kt_ref,  # [1, S, Hkv, D] VMEM (this row's chunk, token-major)
    vt_ref,
    k_in,
    v_in,
    # outputs (aliased)
    k_out,
    v_out,
    # scratch
    k_pg,  # [Hkv, bs, D]
    v_pg,
    sem,  # [2]
    *,
    block_size: int,
    s: int,
):
    """Batched RMW writer: one program per verify chunk (distinct seqs,
    so touched pages are disjoint across programs)."""
    del k_in, v_in
    p = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    ntok = ntoks_ref[p]
    _, _, hkv, d = kt_ref.shape
    first_page = q_offset // block_size
    last_page = (q_offset + jnp.maximum(ntok, 1) - 1) // block_size

    def do_page(page_idx):
        blk = block_tables_ref[p, page_idx]
        kr = pltpu.make_async_copy(k_out.at[layer, blk], k_pg, sem.at[0])
        vr = pltpu.make_async_copy(v_out.at[layer, blk], v_pg, sem.at[1])
        kr.start()
        vr.start()
        kr.wait()
        vr.wait()
        row = jax.lax.broadcasted_iota(jnp.int32, (hkv, block_size, d), 1)
        for j in range(s):
            pos = q_offset + j
            hit = (
                (j < ntok)
                & (pos // block_size == page_idx)
                & (row == jax.lax.rem(pos, block_size))
            )
            k_pg[...] = jnp.where(
                hit, kt_ref[0, j][:, None, :].astype(k_pg.dtype), k_pg[...]
            )
            v_pg[...] = jnp.where(
                hit, vt_ref[0, j][:, None, :].astype(v_pg.dtype), v_pg[...]
            )
        kw = pltpu.make_async_copy(k_pg, k_out.at[layer, blk], sem.at[0])
        vw = pltpu.make_async_copy(v_pg, v_out.at[layer, blk], sem.at[1])
        kw.start()
        vw.start()
        kw.wait()
        vw.wait()

    @pl.when(ntok > 0)
    def _():
        do_page(first_page)

        @pl.when(last_page != first_page)
        def _():
            do_page(last_page)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_rmw_batched_tpu(
    kt: jnp.ndarray,  # [P, S, Hkv, D], S <= block_size
    vt: jnp.ndarray,
    k_all: jnp.ndarray,
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [P, NBmax]
    q_offsets: jnp.ndarray,  # [P] any alignment
    ntoks: jnp.ndarray,  # [P] (0 = padded row)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    p, s, hkv, d = kt.shape
    bs = k_all.shape[3]
    assert s <= bs, "RMW writer covers chunks within two pages"
    kernel = functools.partial(
        _kv_write_rmw_batched_kernel, block_size=bs, s=s
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(
                (1, s, hkv, d), lambda pi, *_: (pi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, hkv, d), lambda pi, *_: (pi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, bs, d), k_all.dtype),
            pltpu.VMEM((hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        ntoks,
        kt,
        vt,
        k_all,
        v_all,
    )
    return k_all, v_all


# ----------------------------------------------------------------------
# single-cache (MLA latent) writers: same schemes, one aliased array
# ----------------------------------------------------------------------
def _latent_pages_kernel(
    layer_ref, block_table_ref, q_offset_ref, ntok_ref,
    lt, c_in, c_out, page_sem, *, block_size: int, max_pages: int,
):
    """Full-page writer for the latent cache (page-aligned chunk starts)."""
    del c_in
    layer = layer_ref[0]
    q_offset = q_offset_ref[0]
    ntok = ntok_ref[0]
    first_page = q_offset // block_size

    def page_dma(p):
        r0 = p * block_size
        blk = block_table_ref[first_page + p]
        return pltpu.make_async_copy(
            lt.at[pl.ds(r0, block_size), :],
            c_out.at[layer, blk, 0],
            page_sem.at[p],
        )

    for p in range(max_pages):

        @pl.when(p * block_size < ntok)
        def _(p=p):
            page_dma(p).start()

    for p in range(max_pages):

        @pl.when(p * block_size < ntok)
        def _(p=p):
            page_dma(p).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def latent_write_prefill_tpu(
    lt: jnp.ndarray,  # [S_pad, Dk] latent rows (token-major)
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    block_table: jnp.ndarray,
    q_offset: jnp.ndarray,  # page-aligned
    ntok: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    s_pad, dk = lt.shape
    bs = cache.shape[3]
    max_pages = (s_pad + bs - 1) // bs
    lt = jnp.pad(lt, ((0, bs), (0, 0)))
    kernel = functools.partial(
        _latent_pages_kernel, block_size=bs, max_pages=max_pages
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((max_pages,))],
    )
    # inputs: 4 scalars, lt=4, cache=5 -> output 0
    (cache,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(cache.shape, cache.dtype)],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer_idx.reshape(1), block_table, q_offset.reshape(1),
        ntok.reshape(1), lt, cache,
    )
    return cache


def _latent_rmw_kernel(
    layer_ref, block_table_ref, q_offset_ref, ntok_ref,
    lt, c_in, c_out, pg, sem, *, block_size: int, s: int,
):
    """RMW small-chunk latent writer (speculative verify chunks)."""
    del c_in
    layer = layer_ref[0]
    q_offset = q_offset_ref[0]
    ntok = ntok_ref[0]
    _, dk = lt.shape
    first_page = q_offset // block_size
    last_page = (q_offset + jnp.maximum(ntok, 1) - 1) // block_size

    def do_page(page_idx):
        blk = block_table_ref[page_idx]
        rd = pltpu.make_async_copy(c_out.at[layer, blk, 0], pg, sem.at[0])
        rd.start()
        rd.wait()
        row = jax.lax.broadcasted_iota(jnp.int32, (block_size, dk), 0)
        for j in range(s):
            pos = q_offset + j
            hit = (
                (j < ntok)
                & (pos // block_size == page_idx)
                & (row == jax.lax.rem(pos, block_size))
            )
            pg[...] = jnp.where(hit, lt[j][None, :].astype(pg.dtype), pg[...])
        wr = pltpu.make_async_copy(pg, c_out.at[layer, blk, 0], sem.at[0])
        wr.start()
        wr.wait()

    do_page(first_page)

    @pl.when(last_page != first_page)
    def _():
        do_page(last_page)


@functools.partial(jax.jit, static_argnames=("interpret",))
def latent_write_rmw_tpu(
    lt: jnp.ndarray,  # [S, Dk], S <= block_size
    cache: jnp.ndarray,
    layer_idx: jnp.ndarray,
    block_table: jnp.ndarray,
    q_offset: jnp.ndarray,  # any alignment
    ntok: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    s, dk = lt.shape
    bs = cache.shape[3]
    assert s <= bs
    kernel = functools.partial(_latent_rmw_kernel, block_size=bs, s=s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((bs, dk), cache.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    (cache,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(cache.shape, cache.dtype)],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer_idx.reshape(1), block_table, q_offset.reshape(1),
        ntok.reshape(1), lt, cache,
    )
    return cache


# ----------------------------------------------------------------------
# batched latent (MLA) writers: grid (P,), one program per chunk row
# ----------------------------------------------------------------------
def _latent_pages_batched_kernel(
    layer_ref, block_tables_ref, q_offsets_ref, ntoks_ref,
    lt, c_in, c_out, page_sem, *, block_size: int, max_pages: int,
):
    del c_in
    p = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    ntok = ntoks_ref[p]
    first_page = q_offset // block_size
    split = page_sem.shape[1]
    rows = block_size // split

    def page_dmas(pg):
        r0 = pg * block_size
        blk = block_tables_ref[p, first_page + pg]
        return [
            pltpu.make_async_copy(
                lt.at[p, pl.ds(r0 + si * rows, rows), :],
                c_out.at[layer, blk, 0, pl.ds(si * rows, rows)],
                page_sem.at[pg, si],
            )
            for si in range(split)
        ]

    for pg in range(max_pages):

        @pl.when(pg * block_size < ntok)
        def _(pg=pg):
            for c in page_dmas(pg):
                c.start()

    for pg in range(max_pages):

        @pl.when(pg * block_size < ntok)
        def _(pg=pg):
            for c in page_dmas(pg):
                c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def latent_write_prefill_batched_tpu(
    lt: jnp.ndarray,  # [P, S_pad, Dk] latent rows (token-major)
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [P, NBmax]
    q_offsets: jnp.ndarray,  # [P] page-aligned
    ntoks: jnp.ndarray,  # [P] (0 = padded row)
    interpret: bool = False,
) -> jnp.ndarray:
    p, s_pad, dk = lt.shape
    bs = cache.shape[3]
    max_pages = (s_pad + bs - 1) // bs
    lt = jnp.pad(lt, ((0, 0), (0, bs), (0, 0)))
    split = 4 if bs % 4 == 0 and bs // 4 >= 8 else 1
    kernel = functools.partial(
        _latent_pages_batched_kernel, block_size=bs, max_pages=max_pages
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((max_pages, split))],
    )
    (cache,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(cache.shape, cache.dtype)],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1), block_tables, q_offsets, ntoks, lt, cache,
    )
    return cache


def _latent_rmw_batched_kernel(
    layer_ref, block_tables_ref, q_offsets_ref, ntoks_ref,
    lt_ref,  # [1, S, Dk] VMEM (this row's chunk)
    c_in, c_out, pg, sem, *, block_size: int, s: int,
):
    del c_in
    p = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    ntok = ntoks_ref[p]
    dk = lt_ref.shape[2]
    first_page = q_offset // block_size
    last_page = (q_offset + jnp.maximum(ntok, 1) - 1) // block_size

    def do_page(page_idx):
        blk = block_tables_ref[p, page_idx]
        rd = pltpu.make_async_copy(c_out.at[layer, blk, 0], pg, sem.at[0])
        rd.start()
        rd.wait()
        row = jax.lax.broadcasted_iota(jnp.int32, (block_size, dk), 0)
        for j in range(s):
            pos = q_offset + j
            hit = (
                (j < ntok)
                & (pos // block_size == page_idx)
                & (row == jax.lax.rem(pos, block_size))
            )
            pg[...] = jnp.where(
                hit, lt_ref[0, j][None, :].astype(pg.dtype), pg[...]
            )
        wr = pltpu.make_async_copy(pg, c_out.at[layer, blk, 0], sem.at[0])
        wr.start()
        wr.wait()

    @pl.when(ntok > 0)
    def _():
        do_page(first_page)

        @pl.when(last_page != first_page)
        def _():
            do_page(last_page)


@functools.partial(jax.jit, static_argnames=("interpret",))
def latent_write_rmw_batched_tpu(
    lt: jnp.ndarray,  # [P, S, Dk], S <= block_size
    cache: jnp.ndarray,
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [P, NBmax]
    q_offsets: jnp.ndarray,  # [P] any alignment
    ntoks: jnp.ndarray,  # [P] (0 = padded row)
    interpret: bool = False,
) -> jnp.ndarray:
    p, s, dk = lt.shape
    bs = cache.shape[3]
    assert s <= bs
    kernel = functools.partial(
        _latent_rmw_batched_kernel, block_size=bs, s=s
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(
                (1, s, dk), lambda pi, *_: (pi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((bs, dk), cache.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    (cache,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(cache.shape, cache.dtype)],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1), block_tables, q_offsets, ntoks, lt, cache,
    )
    return cache


# ----------------------------------------------------------------------
# interleaved-layout writers: K and V of a page live contiguously in ONE
# cache array [L, NB, 2, Hkv, bs, D], so each page is a single DMA (the
# layout the v11 decode kernel streams — see decode_attention.py)
# ----------------------------------------------------------------------
def _kv_write_batched_ilv_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    block_tables_ref,  # [P, NBmax]
    q_offsets_ref,  # [P] (page-aligned per row)
    ntoks_ref,  # [P]
    # inputs
    kvt,  # [P, 2, Hkv, S_pad + bs, D] ANY
    kv_in,
    # outputs (aliased)
    kv_out,  # [L, NB, 2, Hkv, bs, D]
    # scratch
    page_sem,  # [MAXP]
    *,
    block_size: int,
    max_pages: int,
):
    del kv_in
    p = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    ntok = ntoks_ref[p]
    first_page = q_offset // block_size

    def page_dma(pg):
        r0 = pg * block_size
        blk = block_tables_ref[p, first_page + pg]
        return pltpu.make_async_copy(
            kvt.at[p, :, :, pl.ds(r0, block_size), :],
            kv_out.at[layer, blk],
            page_sem.at[pg],
        )

    for pg in range(max_pages):

        @pl.when(pg * block_size < ntok)
        def _(pg=pg):
            page_dma(pg).start()

    for pg in range(max_pages):

        @pl.when(pg * block_size < ntok)
        def _(pg=pg):
            page_dma(pg).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill_batched_ilv_tpu(
    kvt: jnp.ndarray,  # [P, 2, Hkv, S_pad, D] (K at [:,0], V at [:,1])
    kv_all: jnp.ndarray,  # [L, NB, 2, Hkv, bs, D]
    layer_idx: jnp.ndarray,  # [] int32
    block_tables: jnp.ndarray,  # [P, NBmax] int32
    q_offsets: jnp.ndarray,  # [P] int32 (page-aligned)
    ntoks: jnp.ndarray,  # [P] int32 (0 = padded row)
    interpret: bool = False,
) -> jnp.ndarray:
    """Full-page writer over the interleaved layout: ONE DMA per page
    covers that page's K and V."""
    p, two, hkv, s_pad, d = kvt.shape
    assert two == 2
    bs = kv_all.shape[4]
    max_pages = (s_pad + bs - 1) // bs
    kvt = jnp.pad(kvt, ((0, 0), (0, 0), (0, 0), (0, bs), (0, 0)))

    kernel = functools.partial(
        _kv_write_batched_ilv_kernel, block_size=bs, max_pages=max_pages
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((max_pages,))],
    )
    (kv_all,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(kv_all.shape, kv_all.dtype)],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        ntoks,
        kvt,
        kv_all,
    )
    return kv_all


def _kv_write_rmw_batched_ilv_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    block_tables_ref,  # [P, NBmax]
    q_offsets_ref,  # [P]
    ntoks_ref,  # [P]
    # inputs
    kt_ref,  # [1, S, Hkv, D] VMEM (token-major)
    vt_ref,
    kv_in,
    # outputs (aliased)
    kv_out,  # [L, NB, 2, Hkv, bs, D]
    # scratch
    kv_pg,  # [2, Hkv, bs, D]
    sem,  # [1]
    *,
    block_size: int,
    s: int,
):
    """Interleaved RMW writer: each touched page is ONE read DMA, per-row
    vector merges, ONE write DMA (the split layout spends four)."""
    del kv_in
    p = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    ntok = ntoks_ref[p]
    _, _, hkv, d = kt_ref.shape
    first_page = q_offset // block_size
    last_page = (q_offset + jnp.maximum(ntok, 1) - 1) // block_size

    def do_page(page_idx):
        blk = block_tables_ref[p, page_idx]
        rd = pltpu.make_async_copy(kv_out.at[layer, blk], kv_pg, sem.at[0])
        rd.start()
        rd.wait()
        row = jax.lax.broadcasted_iota(jnp.int32, (hkv, block_size, d), 1)
        for j in range(s):
            pos = q_offset + j
            hit = (
                (j < ntok)
                & (pos // block_size == page_idx)
                & (row == jax.lax.rem(pos, block_size))
            )
            kv_pg[0] = jnp.where(
                hit, kt_ref[0, j][:, None, :].astype(kv_pg.dtype), kv_pg[0]
            )
            kv_pg[1] = jnp.where(
                hit, vt_ref[0, j][:, None, :].astype(kv_pg.dtype), kv_pg[1]
            )
        wr = pltpu.make_async_copy(kv_pg, kv_out.at[layer, blk], sem.at[0])
        wr.start()
        wr.wait()

    @pl.when(ntok > 0)
    def _():
        do_page(first_page)

        @pl.when(last_page != first_page)
        def _():
            do_page(last_page)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_rmw_batched_ilv_tpu(
    kt: jnp.ndarray,  # [P, S, Hkv, D], S <= block_size
    vt: jnp.ndarray,
    kv_all: jnp.ndarray,  # [L, NB, 2, Hkv, bs, D]
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [P, NBmax]
    q_offsets: jnp.ndarray,  # [P] any alignment
    ntoks: jnp.ndarray,  # [P] (0 = padded row)
    interpret: bool = False,
) -> jnp.ndarray:
    p, s, hkv, d = kt.shape
    bs = kv_all.shape[4]
    assert s <= bs, "RMW writer covers chunks within two pages"
    kernel = functools.partial(
        _kv_write_rmw_batched_ilv_kernel, block_size=bs, s=s
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(
                (1, s, hkv, d), lambda pi, *_: (pi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, hkv, d), lambda pi, *_: (pi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, hkv, bs, d), kv_all.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    (kv_all,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(kv_all.shape, kv_all.dtype)],
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        ntoks,
        kt,
        vt,
        kv_all,
    )
    return kv_all


# ----------------------------------------------------------------------
# row-major-tail writers (kv_layout=interleaved_rm): COMPLETE pages keep
# the canonical [2, Hkv, bs, D] layout; a sequence's final INCOMPLETE
# page stores token-major content (row w = token's [2*Hkv, D] block) so
# the v12 decode kernel persists each new token as one 4 KB tile
# (decode_attention._decode_kernel_v12 docstring — the r5 patch-probe fix)
# ----------------------------------------------------------------------
def _kv_write_batched_rm_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    block_tables_ref,  # [P, NBmax]
    q_offsets_ref,  # [P] (page-aligned per row)
    ntoks_ref,  # [P]
    kv_lens_ref,  # [P] sequence kv length (incl. this chunk)
    # inputs
    kvt,  # [P, 2, Hkv, S_pad + bs, D] ANY (head-major source)
    kvt_tok,  # [P, (S_pad + bs) // 4, 64-ish, D] ANY (token-major rows,
    # grouped so a 4-token row-group matches one page (bs, D) plane)
    kv_in,
    # outputs (aliased)
    kv_out,  # [L, NB, 2, Hkv, bs, D]
    # scratch
    page_sem,  # [MAXP, 2]
    *,
    block_size: int,
    max_pages: int,
    hkv: int,
):
    del kv_in
    p = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    ntok = ntoks_ref[p]
    kv_len = kv_lens_ref[p]
    first_page = q_offset // block_size
    two_h = 2 * hkv
    grp = block_size // two_h  # tokens per (bs, D) plane

    def canon_dma(pg):
        r0 = pg * block_size
        blk = block_tables_ref[p, first_page + pg]
        return pltpu.make_async_copy(
            kvt.at[p, :, :, pl.ds(r0, block_size), :],
            kv_out.at[layer, blk],
            page_sem.at[pg, 0],
        )

    def rm_dmas(pg):
        # token-major content: the a-half's planes are contiguous row
        # groups of the token-major source (module comment)
        r0 = pg * block_size
        blk = block_tables_ref[p, first_page + pg]
        g0 = r0 // grp
        return [
            pltpu.make_async_copy(
                kvt_tok.at[p, pl.ds(g0 + a * hkv, hkv)],
                kv_out.at[layer, blk, a],
                page_sem.at[pg, a],
            )
            for a in range(2)
        ]

    for pg in range(max_pages):
        live = pg * block_size < ntok
        # the page is the SEQUENCE's final incomplete page iff the chunk
        # ends inside it and the sequence ends with this chunk's tokens
        partial = live & (q_offset + (pg + 1) * block_size > kv_len)

        @pl.when(live & jnp.logical_not(partial))
        def _(pg=pg):
            canon_dma(pg).start()

        @pl.when(partial)
        def _(pg=pg):
            for c in rm_dmas(pg):
                c.start()

    for pg in range(max_pages):
        live = pg * block_size < ntok
        partial = live & (q_offset + (pg + 1) * block_size > kv_len)

        @pl.when(live & jnp.logical_not(partial))
        def _(pg=pg):
            canon_dma(pg).wait()

        @pl.when(partial)
        def _(pg=pg):
            for c in rm_dmas(pg):
                c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill_batched_rm_tpu(
    kvt: jnp.ndarray,  # [P, 2, Hkv, S_pad, D] head-major
    kvt_tok: jnp.ndarray,  # [P, S_pad, 2*Hkv, D] token-major rows
    kv_all: jnp.ndarray,  # [L, NB, 2, Hkv, bs, D]
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [P, NBmax]
    q_offsets: jnp.ndarray,  # [P] (page-aligned)
    ntoks: jnp.ndarray,  # [P] (0 = padded row)
    kv_lens: jnp.ndarray,  # [P] total kv length of the sequence
    interpret: bool = False,
) -> jnp.ndarray:
    p, two, hkv, s_pad, d = kvt.shape
    assert two == 2
    bs = kv_all.shape[4]
    two_h = 2 * hkv
    assert two_h % 16 == 0 and bs % two_h == 0, (hkv, bs)
    max_pages = (s_pad + bs - 1) // bs
    kvt = jnp.pad(kvt, ((0, 0), (0, 0), (0, 0), (0, bs), (0, 0)))
    kvt_tok = jnp.pad(kvt_tok, ((0, 0), (0, bs), (0, 0), (0, 0)))
    # group tokens so hkv consecutive groups = one (a)-half of a page
    grp = bs // two_h
    kvt_tok = kvt_tok.reshape(p, (s_pad + bs) // grp, grp * two_h, d)

    kernel = functools.partial(
        _kv_write_batched_rm_kernel, block_size=bs, max_pages=max_pages,
        hkv=hkv,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((max_pages, 2))],
    )
    (kv_all,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(kv_all.shape, kv_all.dtype)],
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        ntoks,
        kv_lens,
        kvt,
        kvt_tok,
        kv_all,
    )
    return kv_all


def _kv_write_rmw_batched_rm_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    block_tables_ref,  # [P, NBmax]
    q_offsets_ref,  # [P]
    ntoks_ref,  # [P]
    kv_lens_ref,  # [P]
    # inputs
    kt_ref,  # [1, S, Hkv, D] VMEM (token-major)
    vt_ref,
    kv_in,
    # outputs (aliased)
    kv_out,  # [L, NB, 2, Hkv, bs, D]
    # scratch
    kv_pg,  # [2, Hkv, bs, D]
    sem,  # [1]
    *,
    block_size: int,
    s: int,
    hkv: int,
):
    """Row-major RMW: touched pages hold token-major content; rows merge
    by token index, and a page that COMPLETES (sequence covers its last
    slot) is canonicalized on write-back — the same convention the v12
    decode kernel maintains."""
    del kv_in
    p = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    ntok = ntoks_ref[p]
    kv_len = kv_lens_ref[p]
    first_page = q_offset // block_size
    last_page = (q_offset + jnp.maximum(ntok, 1) - 1) // block_size
    bs = block_size
    two_h = 2 * hkv
    d = kt_ref.shape[3]

    def do_page(page_idx):
        blk = block_tables_ref[p, page_idx]
        rd = pltpu.make_async_copy(kv_out.at[layer, blk], kv_pg, sem.at[0])
        rd.start()
        rd.wait()
        # token-major content view of the page
        cont = kv_pg[...].reshape(bs, two_h, d)
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (bs, two_h, d), 0)
        for j in range(s):
            pos = q_offset + j
            hit = (
                (j < ntok)
                & (pos // bs == page_idx)
                & (row_tok == jax.lax.rem(pos, bs))
            )
            row_val = jnp.concatenate(
                [kt_ref[0, j], vt_ref[0, j]], axis=0
            ).astype(cont.dtype)  # [2*Hkv, D]
            cont = jnp.where(hit, row_val[None], cont)
        complete = (page_idx + 1) * bs <= kv_len

        @pl.when(complete)
        def _():
            canon = jnp.swapaxes(cont, 0, 1)  # [2*Hkv, bs, D]
            kv_pg[...] = canon.reshape(2, hkv, bs, d)

        @pl.when(jnp.logical_not(complete))
        def _():
            kv_pg[...] = cont.reshape(2, hkv, bs, d)

        wr = pltpu.make_async_copy(kv_pg, kv_out.at[layer, blk], sem.at[0])
        wr.start()
        wr.wait()

    @pl.when(ntok > 0)
    def _():
        do_page(first_page)

        @pl.when(last_page != first_page)
        def _():
            do_page(last_page)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_rmw_batched_rm_tpu(
    kt: jnp.ndarray,  # [P, S, Hkv, D], S <= block_size
    vt: jnp.ndarray,
    kv_all: jnp.ndarray,  # [L, NB, 2, Hkv, bs, D]
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [P, NBmax]
    q_offsets: jnp.ndarray,  # [P] any alignment
    ntoks: jnp.ndarray,  # [P] (0 = padded row)
    kv_lens: jnp.ndarray,  # [P]
    interpret: bool = False,
) -> jnp.ndarray:
    p, s, hkv, d = kt.shape
    bs = kv_all.shape[4]
    assert s <= bs, "RMW writer covers chunks within two pages"
    assert (2 * hkv) % 16 == 0 and bs % (2 * hkv) == 0, (hkv, bs)
    kernel = functools.partial(
        _kv_write_rmw_batched_rm_kernel, block_size=bs, s=s, hkv=hkv
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(p,),
        in_specs=[
            pl.BlockSpec(
                (1, s, hkv, d), lambda pi, *_: (pi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, hkv, d), lambda pi, *_: (pi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, hkv, bs, d), kv_all.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    (kv_all,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(kv_all.shape, kv_all.dtype)],
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        ntoks,
        kv_lens,
        kt,
        vt,
        kv_all,
    )
    return kv_all
