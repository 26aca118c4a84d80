"""Pallas fused write+attend paged-attention decode kernels (production).

TPU-native counterpart of the reference's reshape_paged_cache +
single_query_cached_kv_attn pair (reference xllm/core/kernels/ops_api.h
paged-cache + batch-decode ops, xllm/core/kernels/mlu/attention.cpp:26-157).
The TPU twist: the per-token KV-cache write happens INSIDE the attention
kernel with the cache aliased in/out (`input_output_aliases`), so the cache
is updated in place in HBM — no XLA scatter, no cache copy inside the layer
scan (the scatter forced a whole-cache copy per layer).

This module carries only the kernels the dispatch actually selects
(ops/attention.py): **v9** (tile-of-T-pages slots; the split-layout
default — interleaved medians 206 us/layer bf16 / 169-175 int8 at the
bench config), **v5** (slot-ring page pipeline; the fallback, 202 bf16
but 210-220 int8), and **v11** (the interleaved-KV-layout kernel: K and
V of a page live contiguously in ONE cache array, so a page is ONE DMA
and a block-contiguous tile is one [T, 2, Hkv, bs, D] burst). Retired
generations v1/v3/v4/v6/v7/v8/v10 — each of which LOST an on-chip A/B
(PERF.md kernel history) — live env-gated in
ops/pallas/legacy/decode_attention.py.

Shared design (both kernels):
- grid = (batch,) over a GLOBAL page ring: host-precomputed cumulative
  page counts (DecodeInput.page_cum) let every program stream any
  sequence's pages, so DMA issue order is global and the copy engines
  never idle at sequence boundaries.
- The new token's K/V row is written to its page slot inside the kernel
  (write-before-read; sequences' slots are disjoint — shared prefix
  blocks are always full and never written).
- GQA heads are packed into ONE MXU dot per page tile with a
  block-diagonal mask (v5 docstring below).
- Quantized caches (int8 / fp8) upcast per tile via _mxu; int8 scales
  fold OUTSIDE the kernel (q / output) so only the convert rides the
  DMA-critical path.
- Padded batch rows carry seq_len = 0: no write, no pages, zero output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_NSLOTS = 4  # DMA pipeline depth


def _mxu(x):
    """Quantized cache tiles upcast to bf16 for the MXU/VPU (reference
    kv_cache_impl.h:29 quantized variants). int8 KV is scaleless inside
    the kernel: per-head scales fold into q (K side) and into the
    attention output (V side) outside the kernel, so only the convert
    rides the DMA-critical path (fp8 converts measured 4x slower than
    the bytes they save on v5e — scripts/probe_r8_fp8kv.py)."""
    if x.dtype in (jnp.float8_e4m3fn, jnp.int8):
        return x.astype(jnp.bfloat16)
    return x


def _decode_kernel_v5(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight columns)
    seq_lens_ref,  # [B] int32 (incl. current token)
    slot_ref,  # [B] int32 (current token's slot)
    cum_ref,  # [B+1] int32 cumulative page counts (global slot ring)
    # inputs
    q_ref,  # [1, Hkv*G, D] VMEM
    k_new_ref,  # [1, Hkv, D] VMEM
    v_new_ref,
    k_in,  # [L, NB, Hkv, bs, D] ANY (aliased)
    v_in,
    # outputs
    o_ref,  # [1, Hkv*G, D] VMEM
    k_out,
    v_out,
    # scratch
    k_buf,  # [NSLOTS, Hkv, bs, D]
    v_buf,
    sem,  # DMA [2, NSLOTS, SPLIT]
    k_patch,
    v_patch,
    w_sem,  # DMA [2]
    pend_ref,  # SMEM [1]
    cursor_ref,  # SMEM [2]
    *,
    scale: float,
    block_size: int,
    window: int = 0,
):
    """v5: v4's global-cursor split-DMA streaming + PACKED-HEAD compute.

    The v4 per-page math ran on [Hkv, G, bs] tiles — with GQA G=2 that is
    2 sublanes of 8 and 2-row MXU dots, and the kernel measured
    compute-bound at ~375 GB/s while its DMA stream alone hits ~729 GB/s
    (scripts/probe_decode_kernel.py). v5 packs every head into ONE
    well-shaped dot per page:

        s = q_flat [Hkv*G, D] @ k_flat^T [D, Hkv*bs]   (one MXU op)

    with off-diagonal (query-head x kv-head) blocks masked to -inf. After
    exp they are exactly zero, so `p @ v_flat` combines each query head
    with ITS kv head's values with no further masking — the 8x redundant
    MAC lanes ride an MXU that was idle anyway, and the VPU softmax ops
    run on [Hkv*G, Hkv*bs] tiles (full sublanes/lanes) instead of [_, 2, _].

    The new token's column seeds the online-softmax state (m0 = its
    score, l0 = 1, acc0 = v_new), replacing v4's post-loop extra-column
    pass.
    """
    del k_in, v_in
    b = pl.program_id(0)
    nprog = pl.num_programs(0)

    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    last = nblks - 1
    rows_q, d = q_ref.shape[1], q_ref.shape[2]
    hkv = k_new_ref.shape[1]
    g = rows_q // hkv
    n_cached = seq_len - 1
    base = cum_ref[b]
    total_pages = cum_ref[nprog]
    split = sem.shape[2]
    rows_dma = hkv // split
    nslots = k_buf.shape[0]
    bs = block_size
    cols = hkv * bs

    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0
        cursor_ref[1] = 0

    def issue_global(gp, iseq):
        j = gp - cum_ref[iseq]
        blk = block_tables_ref[iseq, j]
        slot = jax.lax.rem(gp, nslots)
        for si in range(split):
            pltpu.make_async_copy(
                k_out.at[layer, blk, pl.ds(si * rows_dma, rows_dma)],
                k_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                sem.at[0, slot, si],
            ).start()
            pltpu.make_async_copy(
                v_out.at[layer, blk, pl.ds(si * rows_dma, rows_dma)],
                v_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                sem.at[1, slot, si],
            ).start()

    def drain_to(target):
        tgt = jnp.minimum(target, total_pages)

        def cond(c):
            return c[0] < tgt

        def step(c):
            gp, iseq = c

            def adv_cond(s):
                return gp >= cum_ref[s + 1]

            iseq = jax.lax.while_loop(adv_cond, lambda s: s + 1, iseq)
            issue_global(gp, iseq)
            return (gp + 1, iseq)

        gp, iseq = jax.lax.while_loop(
            cond, step, (cursor_ref[0], cursor_ref[1])
        )
        cursor_ref[0] = gp
        cursor_ref[1] = iseq

    def wait_page(slot):
        for si in range(split):
            for which in (0, 1):
                pltpu.make_async_copy(
                    k_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                    k_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                    sem.at[which, slot, si],
                ).wait()

    # head-of-column == head-of-row block-diagonal mask (static)
    hc = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1) // bs
    hr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 0) // g
    diag = hc == hr  # [rows_q, cols]
    col_pos = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1) % bs

    @pl.when(seq_len > 0)
    def _():
        q = q_ref[0]  # [Hkv*G, D]
        # seed the online softmax with the new token's own column
        k_new_p = jnp.repeat(k_new_ref[0], g, axis=0)  # [Hkv*G, D]
        v_new_p = jnp.repeat(v_new_ref[0], g, axis=0)
        m0 = (
            jnp.sum(q.astype(jnp.float32) * k_new_p.astype(jnp.float32),
                    axis=-1, keepdims=True) * scale
        )  # [Hkv*G, 1]
        l0 = jnp.ones((rows_q, 1), jnp.float32)
        acc0 = v_new_p.astype(jnp.float32)

        def body(i, carry):
            m, l, acc = carry
            drain_to(base + i + nslots)
            slot = jax.lax.rem(base + i, nslots)
            wait_page(slot)

            k_flat = _mxu(k_buf[slot]).reshape(cols, d)
            v_flat = _mxu(v_buf[slot]).reshape(cols, d)
            s = jax.lax.dot_general(
                q, k_flat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [Hkv*G, Hkv*bs]
            kv_idx = i * bs + col_pos
            keep = diag & (kv_idx < n_cached)
            if window > 0:
                keep = keep & (kv_idx >= jnp.maximum(seq_len - window, 0))
            s = jnp.where(keep, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)  # off-diagonal blocks -> exactly 0
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_flat.dtype), v_flat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hkv*G, D]
            acc = acc * alpha + pv

            # tail page: patch the new row and write back (deferred wait)
            @pl.when(i == last)
            def _():
                @pl.when(pend_ref[0] == 1)
                def _():
                    pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
                    pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()

                off = jax.lax.rem(slot_ref[b], bs)
                row = jax.lax.broadcasted_iota(jnp.int32, (hkv, bs, d), 1)
                k_patch[...] = jnp.where(
                    row == off,
                    k_new_ref[0][:, None, :].astype(k_patch.dtype),
                    k_buf[slot],
                )
                v_patch[...] = jnp.where(
                    row == off,
                    v_new_ref[0][:, None, :].astype(v_patch.dtype),
                    v_buf[slot],
                )
                blk = block_tables_ref[b, last]
                pltpu.make_async_copy(
                    k_patch, k_out.at[layer, blk], w_sem.at[0]
                ).start()
                pltpu.make_async_copy(
                    v_patch, v_out.at[layer, blk], w_sem.at[1]
                ).start()
                pend_ref[0] = 1

            return m_new, l_new, acc

        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    @pl.when(seq_len == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when((b == nprog - 1) & (pend_ref[0] == 1))
    def _():
        pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
        pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()
        pend_ref[0] = 0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret", "window", "split_override",
                     "nslots_override"),
)
def paged_decode_attention_write_v5_tpu(
    q: jnp.ndarray,  # [B, Hq, D]
    k_new: jnp.ndarray,  # [B, Hkv, D]
    v_new: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [B] int32
    block_tables: jnp.ndarray,  # [B, NB_used] int32
    seq_lens: jnp.ndarray,  # [B] int32 (incl. current token)
    scale: float,
    interpret: bool = False,
    window: int = 0,
    split_override: int = 0,
    nslots_override: int = 0,
    cum: jnp.ndarray | None = None,  # [B+1] precomputed page cumsum
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g
    nslots = nslots_override or 8
    # dma-only rate is best at 2 sub-copies per page: slot-ring concurrency
    # already keeps multiple pages in flight (probe_decode_kernel.py)
    split = 2 if hkv % 2 == 0 else 1
    if split_override:
        assert hkv % split_override == 0
        split = split_override

    if cum is None:
        pages = jax.lax.div(seq_lens + bs - 1, bs)
        cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(pages).astype(jnp.int32)]
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, hkv, bs, d), k_all.dtype),
            pltpu.VMEM((nslots, hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, nslots, split)),
            pltpu.VMEM((hkv, bs, d), k_all.dtype),
            pltpu.VMEM((hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_v5, scale=scale, block_size=bs, window=window
    )
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={8: 1, 9: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        seq_lens,
        slot_mapping,
        cum,
        q,
        k_new,
        v_new,
        k_all,
        v_all,
    )
    return out, k_all, v_all


def _decode_kernel_v9(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight columns)
    seq_lens_ref,  # [B] int32 (incl. current token)
    slot_ref,  # [B] int32 (current token's slot)
    pages_ref,  # [B] int32 page count per sequence
    cum_tiles_ref,  # [B+1] int32 cumulative TILE counts (global ring)
    seq_of_tile_ref,  # [B*ceil(NB/T)] int32 owning seq of each tile
    # inputs
    q_ref,  # [1, Hkv*G, D] VMEM
    k_new_ref,  # [1, Hkv, D] VMEM
    v_new_ref,
    # premask=True inserts diag_ref [rows_q, cols] f32 and coloff_ref
    # [rows_q, cols] i32 here (resident VMEM blocks, index map (0, 0))
    *rest,
    scale: float,
    block_size: int,
    tile: int,
    window: int = 0,
    softmax16: bool = False,
    premask: bool = False,
    patch_mode: int = 2,  # 2 = full tail write-back; 1 = K page only;
    # 0 = none. Modes < 2 are TIMING PROBES (the cache never persists
    # the new token) isolating the write-traffic share of the step.
):
    """v9: v7's page-pair design generalized to T-page tiles.

    The r5/r6 probes established that the decode kernels are limited by
    the SCALAR issue count per page (DMA floor 140 us/layer with the full
    issue/wait logic live; v5's softmax bookkeeping adds ~65; v8's
    scores-scratch detour gained nothing back). v9 divides every
    per-iteration fixed cost by T while keeping the tile CONTIGUOUS in
    one ring slot (no v8 multi-slot gather):

    - ring slot = T consecutive pages of one sequence ([T*Hkv, bs, D]);
    - one flash iteration (2 dots + one softmax rescale) per T pages;
    - T conditional sub-issues / waits per tile (first unconditional);
    - odd tails skip absent pages' DMAs; their columns mask out through
      the causal compare and the ring is zeroed once at program 0 so
      unwritten halves stay finite (0 * p == 0, never NaN);
    - the tile->owner map comes from a VECTORIZED scatter+cumsum in the
      wrapper — no jnp.searchsorted (a sequential loop on TPU, the r3
      "v6 regression").

    T=2 reproduces v7; T=4 quarters the fixed costs at 2 MB more VMEM.

    premask (r4 structural hypothesis — measured NEUTRAL): with
    "arbitrary" grid semantics Mosaic re-executes the whole body per
    program, so the [rows_q, cols] iota/compare mask build below runs
    B(=128) times per layer — a per-program VPU cost the
    softmax16/narrow-score A/Bs never touched. premask=True receives
    diag_bias and col_off as VMEM inputs whose index map is constant,
    so the pipeline fetches them once and every program reads the
    resident block. The 6-round interleaved A/B measured 207.4 vs
    208.7 us/layer bf16 and 167.4 vs 167.1 int8 (/tmp/ab_premask.log,
    2026-08-21) — the iota build is NOT the residual above the DMA
    floor; kept env-gated (XLLM_DECODE_KERNEL=v9t4p) as the documented
    negative result.
    """
    if premask:
        (diag_ref, coloff_ref, k_in, v_in, o_ref, k_out, v_out, k_buf,
         v_buf, sem, k_patch, v_patch, w_sem, pend_ref, cursor_ref) = rest
    else:
        diag_ref = coloff_ref = None
        (k_in, v_in, o_ref, k_out, v_out, k_buf, v_buf, sem, k_patch,
         v_patch, w_sem, pend_ref, cursor_ref) = rest
    del k_in, v_in
    b = pl.program_id(0)
    nprog = pl.num_programs(0)

    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    last = nblks - 1
    T = tile
    ntiles = pl.cdiv(seq_len, T * block_size)
    rows_q, d = q_ref.shape[1], q_ref.shape[2]
    hkv = k_new_ref.shape[1]
    g = rows_q // hkv
    n_cached = seq_len - 1
    base = cum_tiles_ref[b]
    total_tiles = cum_tiles_ref[nprog]
    nslots = k_buf.shape[0]
    bs = block_size
    cols = T * hkv * bs  # tile width

    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0
        # unwritten tile tails must hold FINITE values (see docstring)
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)

    def issue_tile(gt):
        iseq = seq_of_tile_ref[gt]
        j0 = (gt - cum_tiles_ref[iseq]) * T
        slot = jax.lax.rem(gt, nslots)
        blk0 = block_tables_ref[iseq, j0]
        pltpu.make_async_copy(
            k_out.at[layer, blk0], k_buf.at[slot, pl.ds(0, hkv)],
            sem.at[0, slot, 0],
        ).start()
        pltpu.make_async_copy(
            v_out.at[layer, blk0], v_buf.at[slot, pl.ds(0, hkv)],
            sem.at[1, slot, 0],
        ).start()
        for h in range(1, T):

            @pl.when(j0 + h < pages_ref[iseq])
            def _(h=h):
                blkh = block_tables_ref[iseq, j0 + h]
                pltpu.make_async_copy(
                    k_out.at[layer, blkh],
                    k_buf.at[slot, pl.ds(h * hkv, hkv)],
                    sem.at[0, slot, h],
                ).start()
                pltpu.make_async_copy(
                    v_out.at[layer, blkh],
                    v_buf.at[slot, pl.ds(h * hkv, hkv)],
                    sem.at[1, slot, h],
                ).start()

    # prologue: fill the tile ring (steady state: one failed check)
    def prologue_cond(gt):
        return gt < jnp.minimum(base + nslots, total_tiles)

    gt0 = jax.lax.while_loop(
        prologue_cond,
        lambda gt: (issue_tile(gt), gt + 1)[1],
        cursor_ref[0],
    )
    cursor_ref[0] = gt0

    # static tile maps: query-head x kv-head block diagonal (repeats per
    # page) and each column's token offset within the tile
    if premask:
        diag_bias = diag_ref[...]
        col_off = coloff_ref[...]
    else:
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1)
        hc = (ci % (hkv * bs)) // bs
        hr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 0) // g
        diag_bias = jnp.where(hc == hr, 0.0, _NEG_INF).astype(jnp.float32)
        col_off = (ci // (hkv * bs)) * bs + ci % bs  # token offset in tile

    @pl.when(seq_len > 0)
    def _():
        q = q_ref[0]  # [Hkv*G, D]
        k_new_p = jnp.repeat(k_new_ref[0], g, axis=0)
        v_new_p = jnp.repeat(v_new_ref[0], g, axis=0)
        m0 = (
            jnp.sum(q.astype(jnp.float32) * k_new_p.astype(jnp.float32),
                    axis=-1, keepdims=True) * scale
        )
        l0 = jnp.ones((rows_q, 1), jnp.float32)
        acc0 = v_new_p.astype(jnp.float32)
        win_lo = jnp.maximum(seq_len - window, 0) if window > 0 else 0

        def body(i, carry):
            m, l, acc = carry
            gt = cursor_ref[0]

            @pl.when(gt < jnp.minimum(base + i + nslots, total_tiles))
            def _():
                issue_tile(gt)
                cursor_ref[0] = gt + 1

            slot = jax.lax.rem(base + i, nslots)
            p0 = i * T
            for which in (0, 1):
                pltpu.make_async_copy(
                    k_buf.at[slot, pl.ds(0, hkv)],
                    k_buf.at[slot, pl.ds(0, hkv)],
                    sem.at[which, slot, 0],
                ).wait()
            for h in range(1, T):

                @pl.when(p0 + h < nblks)
                def _(h=h):
                    for which in (0, 1):
                        pltpu.make_async_copy(
                            k_buf.at[slot, pl.ds(h * hkv, hkv)],
                            k_buf.at[slot, pl.ds(h * hkv, hkv)],
                            sem.at[which, slot, h],
                        ).wait()

            k_flat = _mxu(k_buf[slot]).reshape(cols, d)
            v_flat = _mxu(v_buf[slot]).reshape(cols, d)
            s = jax.lax.dot_general(
                q, k_flat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + diag_bias
            limit = n_cached - p0 * bs
            s = jnp.where(col_off < limit, s, _NEG_INF)
            if window > 0:
                lo_lim = win_lo - p0 * bs
                s = jnp.where(col_off >= lo_lim, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            if softmax16:
                # bf16 softmax stream: the exp runs at the doubled VPU
                # bf16 rate and the PV dot consumes p16 directly (no
                # separate f32->bf16 cast pass); the row sum reduces the
                # bf16 probs with f32 accumulation. Probs tolerate 8
                # mantissa bits (flash-attention practice); the m/l/acc
                # online-softmax state stays f32.
                p16 = jnp.exp((s - m_new).astype(jnp.bfloat16))
                l_new = l * alpha + jnp.sum(
                    p16, axis=-1, keepdims=True, dtype=jnp.float32
                )
                pv = jax.lax.dot_general(
                    p16.astype(v_flat.dtype), v_flat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return m_new, l_new, acc * alpha + pv
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_flat.dtype), v_flat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        m, l, acc = jax.lax.fori_loop(0, ntiles, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        # tail-page patch + write-back, out of the hot loop (see v6)
        @pl.when(pend_ref[0] == 1)
        def _():
            if patch_mode >= 1:
                pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
            if patch_mode >= 2:
                pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()

        slot_last = jax.lax.rem(base + last // T, nslots)
        half0 = jax.lax.rem(last, T) * hkv
        off = jax.lax.rem(slot_ref[b], bs)
        row = jax.lax.broadcasted_iota(jnp.int32, (hkv, bs, d), 1)
        if patch_mode >= 1:
            k_patch[...] = jnp.where(
                row == off,
                k_new_ref[0][:, None, :].astype(k_patch.dtype),
                k_buf[slot_last, pl.ds(half0, hkv)],
            )
        if patch_mode >= 2:
            v_patch[...] = jnp.where(
                row == off,
                v_new_ref[0][:, None, :].astype(v_patch.dtype),
                v_buf[slot_last, pl.ds(half0, hkv)],
            )
        blk = block_tables_ref[b, last]
        if patch_mode >= 1:
            pltpu.make_async_copy(
                k_patch, k_out.at[layer, blk], w_sem.at[0]
            ).start()
        if patch_mode >= 2:
            pltpu.make_async_copy(
                v_patch, v_out.at[layer, blk], w_sem.at[1]
            ).start()
        if patch_mode >= 1:
            pend_ref[0] = 1

    @pl.when(seq_len == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when((b == nprog - 1) & (pend_ref[0] == 1))
    def _():
        if patch_mode >= 1:
            pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
        if patch_mode >= 2:
            pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()
        pend_ref[0] = 0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret", "window", "split_override",
                     "nslots_override", "tile", "softmax16", "premask",
                     "patch_mode"),
)
def paged_decode_attention_write_v9_tpu(
    q: jnp.ndarray,  # [B, Hq, D]
    k_new: jnp.ndarray,  # [B, Hkv, D]
    v_new: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [B] int32
    block_tables: jnp.ndarray,  # [B, NB_used] int32
    seq_lens: jnp.ndarray,  # [B] int32 (incl. current token)
    scale: float,
    interpret: bool = False,
    window: int = 0,
    split_override: int = 0,  # unused (kept for the probe harness)
    nslots_override: int = 0,
    tile: int = 4,
    cum: jnp.ndarray | None = None,  # [B+1] precomputed page cumsum
    softmax16: bool = False,  # bf16 softmax stream — measured NEUTRAL
    # (223.5 vs 216.9 us/layer median, /tmp/ab_sm16.log r4): kept as the
    # documented negative result; the residual above the DMA floor is
    # not the softmax arithmetic
    premask: bool = False,  # hoist the static mask build out of the
    # per-program body into resident VMEM inputs (see kernel docstring)
    patch_mode: int = 2,  # < 2 are timing probes (see kernel)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
    del split_override
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g
    T = tile
    nslots = nslots_override or max(2, 12 // T)  # ~12 pages in flight
    nb = block_tables.shape[1]
    ntile_cols = -(-nb // T)

    if cum is None:
        pages = jax.lax.div(seq_lens + bs - 1, bs)
    else:
        pages = cum[1:] - cum[:-1]
    tiles = jax.lax.div(pages + (T - 1), T)
    cum_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles).astype(jnp.int32)]
    )
    # owner of each global tile: scatter a 1 at every sequence's first
    # tile index, then cumsum — fully parallel (searchsorted lowers to a
    # sequential binary-search loop on TPU, the r3 "v6 regression")
    starts = jnp.zeros(b * ntile_cols, jnp.int32).at[
        cum_tiles[1:-1]
    ].add(1, mode="drop")
    seq_of_tile = jnp.cumsum(starts).astype(jnp.int32)

    mask_inputs = []
    mask_specs = []
    if premask:
        # one-time (XLA hoists it out of the layer scan) build of the
        # static tile maps the kernel would otherwise rebuild per program
        cols = T * hkv * bs
        rows_q = hq
        ci = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1)
        hc = (ci % (hkv * bs)) // bs
        hr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 0) // g
        diag_bias = jnp.where(hc == hr, 0.0, _NEG_INF).astype(jnp.float32)
        col_off = (ci // (hkv * bs)) * bs + ci % bs
        mask_inputs = [diag_bias, col_off]
        mask_specs = [
            pl.BlockSpec(
                (rows_q, cols), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rows_q, cols), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            *mask_specs,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, T * hkv, bs, d), k_all.dtype),
            pltpu.VMEM((nslots, T * hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, nslots, T)),
            pltpu.VMEM((hkv, bs, d), k_all.dtype),
            pltpu.VMEM((hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_v9, scale=scale, block_size=bs, window=window,
        tile=T, softmax16=softmax16, premask=premask,
        patch_mode=patch_mode,
    )
    n_mask = len(mask_inputs)
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={10 + n_mask: 1, 11 + n_mask: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        seq_lens,
        slot_mapping,
        pages.astype(jnp.int32),
        cum_tiles,
        seq_of_tile,
        q,
        k_new,
        v_new,
        *mask_inputs,
        k_all,
        v_all,
    )
    return out, k_all, v_all


def _decode_kernel_v11(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight columns)
    seq_lens_ref,  # [B] int32 (incl. current token)
    slot_ref,  # [B] int32 (current token's slot)
    pages_ref,  # [B] int32 page count per sequence
    cum_tiles_ref,  # [B+1] int32 cumulative TILE counts (global ring)
    seq_of_tile_ref,  # [B*ceil(NB/T)] int32 owning seq of each tile
    # inputs
    q_ref,  # [1, Hkv*G, D] VMEM
    k_new_ref,  # [1, Hkv, D] VMEM
    v_new_ref,
    kv_in,  # [L, NB, 2, Hkv, bs, D] ANY (aliased)
    # outputs
    o_ref,  # [1, Hkv*G, D] VMEM
    kv_out,
    # scratch
    kv_buf,  # [NSLOTS, T, 2, Hkv, bs, D]
    sem,  # DMA [NSLOTS, T]
    kv_patch,  # [2, Hkv, bs, D]
    w_sem,  # DMA [1]
    pend_ref,  # SMEM [1]
    cursor_ref,  # SMEM [1]
    *,
    scale: float,
    block_size: int,
    tile: int,
    window: int = 0,
):
    """v11: v9's T-page tiles over the INTERLEAVED cache layout.

    Five kernel-structure theories for the ~65 us/layer decode residual
    above the 140 us DMA floor all measured neutral (PERF.md r4); the
    remaining levers are LAYOUT-level. v11 stores K and V of a page
    contiguously in one array [L, NB, 2, Hkv, bs, D], so:

    - one page = ONE [2, Hkv, bs, D] DMA (v9 issues two per page);
    - when a tile's T pages hold consecutive block ids (the block
      manager's ordered free list makes this the common case), the whole
      tile is ONE [T, 2, Hkv, bs, D] burst — 1 issue where v9 spends 8;
    - the tail-page patch writes back K and V in one DMA.

    Compute: K pages land contiguous at kv_buf[slot, t, 0], so the score
    pass runs T per-page packed dots [Hkv*G, D] x [D, Hkv*bs] whose
    concatenated columns reproduce v9's tile ordering exactly — masks,
    online softmax, and the PV accumulation are v9's, unchanged. The
    contiguity check is recomputed at wait time from the same scalars,
    so issue and wait always agree on the DMA descriptor shape.
    """
    del kv_in
    b = pl.program_id(0)
    nprog = pl.num_programs(0)

    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    last = nblks - 1
    T = tile
    ntiles = pl.cdiv(seq_len, T * block_size)
    rows_q, d = q_ref.shape[1], q_ref.shape[2]
    hkv = k_new_ref.shape[1]
    g = rows_q // hkv
    n_cached = seq_len - 1
    base = cum_tiles_ref[b]
    total_tiles = cum_tiles_ref[nprog]
    nslots = kv_buf.shape[0]
    bs = block_size
    w = hkv * bs  # per-page score width
    cols = T * w  # tile width

    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0
        # unwritten tile tails must hold FINITE values (see v9 docstring)
        kv_buf[...] = jnp.zeros_like(kv_buf)

    def tile_contig(iseq, j0):
        """-> (blk0, full-tile-and-block-contiguous?). Reads clamp to
        the table width: partial last tiles would otherwise index past
        the row (their values only feed `ok`, which the full-tile term
        already falsifies, but the OOB scalar read itself is UB)."""
        nb_cols = block_tables_ref.shape[1]
        blk0 = block_tables_ref[iseq, j0]
        ok = j0 + T <= pages_ref[iseq]
        for h in range(1, T):
            jh = jnp.minimum(j0 + h, nb_cols - 1)
            ok = ok & (block_tables_ref[iseq, jh] == blk0 + h)
        return blk0, ok

    def issue_tile(gt):
        iseq = seq_of_tile_ref[gt]
        j0 = (gt - cum_tiles_ref[iseq]) * T
        slot = jax.lax.rem(gt, nslots)
        blk0, contig = tile_contig(iseq, j0)

        @pl.when(contig)
        def _():
            pltpu.make_async_copy(
                kv_out.at[layer, pl.ds(blk0, T)], kv_buf.at[slot],
                sem.at[slot, 0],
            ).start()

        @pl.when(jnp.logical_not(contig))
        def _():
            pltpu.make_async_copy(
                kv_out.at[layer, blk0], kv_buf.at[slot, 0], sem.at[slot, 0]
            ).start()
            for h in range(1, T):

                @pl.when(j0 + h < pages_ref[iseq])
                def _(h=h):
                    blkh = block_tables_ref[iseq, j0 + h]
                    pltpu.make_async_copy(
                        kv_out.at[layer, blkh], kv_buf.at[slot, h],
                        sem.at[slot, h],
                    ).start()

    # prologue: fill the tile ring (steady state: one failed check)
    def prologue_cond(gt):
        return gt < jnp.minimum(base + nslots, total_tiles)

    gt0 = jax.lax.while_loop(
        prologue_cond,
        lambda gt: (issue_tile(gt), gt + 1)[1],
        cursor_ref[0],
    )
    cursor_ref[0] = gt0

    # static tile maps (v9's): query-head x kv-head block diagonal and
    # each column's token offset within the tile
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1)
    hc = (ci % w) // bs
    hr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 0) // g
    diag_bias = jnp.where(hc == hr, 0.0, _NEG_INF).astype(jnp.float32)
    col_off = (ci // w) * bs + ci % bs  # token offset in tile

    @pl.when(seq_len > 0)
    def _():
        q = q_ref[0]  # [Hkv*G, D]
        k_new_p = jnp.repeat(k_new_ref[0], g, axis=0)
        v_new_p = jnp.repeat(v_new_ref[0], g, axis=0)
        m0 = (
            jnp.sum(q.astype(jnp.float32) * k_new_p.astype(jnp.float32),
                    axis=-1, keepdims=True) * scale
        )
        l0 = jnp.ones((rows_q, 1), jnp.float32)
        acc0 = v_new_p.astype(jnp.float32)
        win_lo = jnp.maximum(seq_len - window, 0) if window > 0 else 0

        def body(i, carry):
            m, l, acc = carry
            gt = cursor_ref[0]

            @pl.when(gt < jnp.minimum(base + i + nslots, total_tiles))
            def _():
                issue_tile(gt)
                cursor_ref[0] = gt + 1

            slot = jax.lax.rem(base + i, nslots)
            p0 = i * T
            blk0, contig = tile_contig(b, p0)

            @pl.when(contig)
            def _():
                pltpu.make_async_copy(
                    kv_buf.at[slot], kv_buf.at[slot], sem.at[slot, 0]
                ).wait()

            @pl.when(jnp.logical_not(contig))
            def _():
                pltpu.make_async_copy(
                    kv_buf.at[slot, 0], kv_buf.at[slot, 0], sem.at[slot, 0]
                ).wait()
                for h in range(1, T):

                    @pl.when(p0 + h < nblks)
                    def _(h=h):
                        pltpu.make_async_copy(
                            kv_buf.at[slot, h], kv_buf.at[slot, h],
                            sem.at[slot, h],
                        ).wait()

            s_parts = []
            for t in range(T):
                k_t = _mxu(kv_buf[slot, t, 0]).reshape(w, d)
                s_parts.append(
                    jax.lax.dot_general(
                        q, k_t,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            s = jnp.concatenate(s_parts, axis=1) * scale + diag_bias
            limit = n_cached - p0 * bs
            s = jnp.where(col_off < limit, s, _NEG_INF)
            if window > 0:
                lo_lim = win_lo - p0 * bs
                s = jnp.where(col_off >= lo_lim, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.zeros((rows_q, d), jnp.float32)
            for t in range(T):
                v_t = _mxu(kv_buf[slot, t, 1]).reshape(w, d)
                pv = pv + jax.lax.dot_general(
                    p[:, t * w:(t + 1) * w].astype(v_t.dtype), v_t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return m_new, l_new, acc * alpha + pv

        m, l, acc = jax.lax.fori_loop(0, ntiles, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        # tail-page patch + write-back, out of the hot loop (see v6)
        @pl.when(pend_ref[0] == 1)
        def _():
            pltpu.make_async_copy(kv_patch, kv_patch, w_sem.at[0]).wait()

        slot_last = jax.lax.rem(base + last // T, nslots)
        t_last = jax.lax.rem(last, T)
        off = jax.lax.rem(slot_ref[b], bs)
        row = jax.lax.broadcasted_iota(jnp.int32, (hkv, bs, d), 1)
        kv_patch[0] = jnp.where(
            row == off,
            k_new_ref[0][:, None, :].astype(kv_patch.dtype),
            kv_buf[slot_last, t_last, 0],
        )
        kv_patch[1] = jnp.where(
            row == off,
            v_new_ref[0][:, None, :].astype(kv_patch.dtype),
            kv_buf[slot_last, t_last, 1],
        )
        blk = block_tables_ref[b, last]
        pltpu.make_async_copy(kv_patch, kv_out.at[layer, blk], w_sem.at[0]).start()
        pend_ref[0] = 1

    @pl.when(seq_len == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when((b == nprog - 1) & (pend_ref[0] == 1))
    def _():
        pltpu.make_async_copy(kv_patch, kv_patch, w_sem.at[0]).wait()
        pend_ref[0] = 0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret", "window", "nslots_override",
                     "tile"),
)
def paged_decode_attention_write_v11_tpu(
    q: jnp.ndarray,  # [B, Hq, D]
    k_new: jnp.ndarray,  # [B, Hkv, D]
    v_new: jnp.ndarray,
    kv_all: jnp.ndarray,  # [L, NB, 2, Hkv, bs, D] (interleaved layout)
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [B] int32
    block_tables: jnp.ndarray,  # [B, NB_used] int32
    seq_lens: jnp.ndarray,  # [B] int32 (incl. current token)
    scale: float,
    interpret: bool = False,
    window: int = 0,
    nslots_override: int = 0,
    tile: int = 4,
    cum: jnp.ndarray | None = None,  # [B+1] precomputed page cumsum
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], kv_all) — cache updated in place.

    Interleaved-layout decode: K and V of a page are one contiguous
    [2, Hkv, bs, D] region, fetched in ONE DMA (a block-contiguous tile
    in one [T, 2, Hkv, bs, D] burst). See _decode_kernel_v11.
    """
    b, hq, d = q.shape
    _, _, two, hkv, bs, _ = kv_all.shape
    assert two == 2, "interleaved cache must be [L, NB, 2, Hkv, bs, D]"
    g = hq // hkv
    assert hq == hkv * g
    T = tile
    nslots = nslots_override or max(2, 12 // T)  # ~12 pages in flight
    nb = block_tables.shape[1]
    ntile_cols = -(-nb // T)

    if cum is None:
        pages = jax.lax.div(seq_lens + bs - 1, bs)
    else:
        pages = cum[1:] - cum[:-1]
    tiles = jax.lax.div(pages + (T - 1), T)
    cum_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles).astype(jnp.int32)]
    )
    # vectorized tile->owner map (see v9: no searchsorted on TPU)
    starts = jnp.zeros(b * ntile_cols, jnp.int32).at[
        cum_tiles[1:-1]
    ].add(1, mode="drop")
    seq_of_tile = jnp.cumsum(starts).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, T, 2, hkv, bs, d), kv_all.dtype),
            pltpu.SemaphoreType.DMA((nslots, T)),
            pltpu.VMEM((2, hkv, bs, d), kv_all.dtype),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_v11, scale=scale, block_size=bs, window=window,
        tile=T,
    )
    out, kv_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(kv_all.shape, kv_all.dtype),
        ],
        input_output_aliases={10: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        seq_lens,
        slot_mapping,
        pages.astype(jnp.int32),
        cum_tiles,
        seq_of_tile,
        q,
        k_new,
        v_new,
        kv_all,
    )
    return out, kv_all


def _decode_kernel_v12(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight columns)
    seq_lens_ref,  # [B] int32 (incl. current token)
    slot_ref,  # [B] int32 (current token's slot)
    pages_ref,  # [B] int32 FULL (canonical) page count per sequence
    cum_tiles_ref,  # [B+1] int32 cumulative tile counts over full pages
    seq_of_tile_ref,  # [B*ceil(NB/T)] int32 owning seq of each tile
    # inputs
    q_ref,  # [1, Hkv*G, D] VMEM
    k_new_ref,  # [1, Hkv, D] VMEM
    v_new_ref,
    kv_in,  # [L, NB, 2, Hkv, bs, D] ANY (aliased)
    # outputs
    o_ref,  # [1, Hkv*G, D] VMEM
    kv_out,
    # scratch
    kv_buf,  # [NSLOTS, T, 2, Hkv, bs, D] canonical tile ring
    sem,  # DMA [NSLOTS, T]
    win_buf,  # [WD, 2, Hkv, bs, D] tail-page ring (token-major CONTENT)
    w_sem,  # DMA [WD]
    row_buf,  # [2*Hkv, D] the new token's row
    canon_buf,  # [2, Hkv, bs, D] canonicalized page (completion flush)
    r_sem,  # DMA [1]
    pend_ref,  # SMEM [1]
    cursor_ref,  # SMEM [1]
    *,
    scale: float,
    block_size: int,
    tile: int,
    window: int = 0,
):
    """v12: ROW-MAJOR TAIL PAGES — the tail write-back shrinks 64x.

    The r5 patch_mode probe pinned the decode residual above the 140
    us/layer DMA floor on the tail-page write-back: persisting ONE 2 KB
    token row cost a full 2x128 KB page rewrite per program per layer
    (210 -> 148 us/layer with the write disabled). v12 removes it:

    - a sequence's INCOMPLETE tail page stores token-major content —
      row w = token (page*bs + w) as [2*Hkv, D] (K heads then V heads),
      exactly one bf16 (16, 128) tile, so the new token persists with a
      single 4 KB DMA into the page (tile-aligned at plane w//4, rows
      (w%4)*16 of the page's (bs, D) tiling);
    - complete pages keep the canonical [2, Hkv, bs, D] layout and
      stream through v11's tile ring unchanged;
    - the tail page is read as ONE DMA and attended with a 2x-wide
      masked dot over its [2*Hkv*bs, D] flat content; the PV operand is
      jnp.roll(p, Hkv, axis=1): V-masked probabilities shift from each
      token's K rows onto its V rows (zeros everywhere else);
    - when the current token COMPLETES the page (w == bs-1), the kernel
      transposes window+row to canonical form and writes the page once
      — 256 KB per 64 steps amortizes to the same 4 KB/step.

    Prefill writers emit token-major partial tail pages (kv_write.py
    rowmajor variants), so no import step exists at the prefill->decode
    transition; spec-decode engines keep the patch path (their verify
    chunks rewrite tails mid-page).
    """
    del kv_in
    b = pl.program_id(0)
    nprog = pl.num_programs(0)

    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    T = tile
    rows_q, d = q_ref.shape[1], q_ref.shape[2]
    hkv = k_new_ref.shape[1]
    g = rows_q // hkv
    n_cached = seq_len - 1
    nfull = pages_ref[b]  # complete (canonical) pages
    ntiles = pl.cdiv(nfull, T)
    n_win = n_cached - nfull * block_size  # tail-page cached tokens
    base = cum_tiles_ref[b]
    total_tiles = cum_tiles_ref[nprog]
    nslots = kv_buf.shape[0]
    bs = block_size
    w_pos = jax.lax.rem(jnp.maximum(n_cached, 0), bs)  # current row
    two_h = 2 * hkv
    wcols = two_h * bs  # flat tail width
    cols = T * hkv * bs  # canonical tile width

    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0
        kv_buf[...] = jnp.zeros_like(kv_buf)
        win_buf[...] = jnp.zeros_like(win_buf)

    def tile_contig(iseq, j0):
        """-> (blk0, full-tile-and-block-contiguous?). Reads clamp to
        the table width: partial last tiles would otherwise index past
        the row (their values only feed `ok`, which the full-tile term
        already falsifies, but the OOB scalar read itself is UB)."""
        nb_cols = block_tables_ref.shape[1]
        blk0 = block_tables_ref[iseq, j0]
        ok = j0 + T <= pages_ref[iseq]
        for h in range(1, T):
            jh = jnp.minimum(j0 + h, nb_cols - 1)
            ok = ok & (block_tables_ref[iseq, jh] == blk0 + h)
        return blk0, ok

    def issue_tile(gt):
        iseq = seq_of_tile_ref[gt]
        j0 = (gt - cum_tiles_ref[iseq]) * T
        slot = jax.lax.rem(gt, nslots)
        blk0, contig = tile_contig(iseq, j0)

        @pl.when(contig)
        def _():
            pltpu.make_async_copy(
                kv_out.at[layer, pl.ds(blk0, T)], kv_buf.at[slot],
                sem.at[slot, 0],
            ).start()

        @pl.when(jnp.logical_not(contig))
        def _():
            pltpu.make_async_copy(
                kv_out.at[layer, blk0], kv_buf.at[slot, 0], sem.at[slot, 0]
            ).start()
            for h in range(1, T):

                @pl.when(j0 + h < pages_ref[iseq])
                def _(h=h):
                    blkh = block_tables_ref[iseq, j0 + h]
                    pltpu.make_async_copy(
                        kv_out.at[layer, blkh], kv_buf.at[slot, h],
                        sem.at[slot, h],
                    ).start()

    # tail-page reads ride their own prefetch ring: each program's
    # window is issued WD-1 programs ahead, so its DMA has the same
    # runway as the canonical tiles (issuing at own-program start left
    # the full read latency exposed — measured ~v9-neutral in the first
    # v12 A/B)
    wd = win_buf.shape[0]
    has_win = n_win > 0

    def issue_win(t):
        sl_t = seq_lens_ref[t]
        nf_t = pages_ref[t]
        nw_t = sl_t - 1 - nf_t * bs

        @pl.when(nw_t > 0)
        def _():
            pltpu.make_async_copy(
                kv_out.at[layer, block_tables_ref[t, nf_t]],
                win_buf.at[jax.lax.rem(t, wd)],
                w_sem.at[jax.lax.rem(t, wd)],
            ).start()

    @pl.when(b == 0)
    def _():
        for t0 in range(wd - 1):
            if t0 == 0:
                issue_win(jnp.int32(0))
            else:
                @pl.when(t0 < nprog)
                def _(t0=t0):
                    issue_win(jnp.int32(t0))

    @pl.when(b + wd - 1 < nprog)
    def _():
        issue_win(b + wd - 1)

    def prologue_cond(gt):
        return gt < jnp.minimum(base + nslots, total_tiles)

    gt0 = jax.lax.while_loop(
        prologue_cond,
        lambda gt: (issue_tile(gt), gt + 1)[1],
        cursor_ref[0],
    )
    cursor_ref[0] = gt0

    # static maps: canonical tiles (v9 ordering) and the flat tail block
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1)
    hc = (ci % (hkv * bs)) // bs
    hr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 0) // g
    diag_bias = jnp.where(hc == hr, 0.0, _NEG_INF).astype(jnp.float32)
    col_off = (ci // (hkv * bs)) * bs + ci % bs
    # tail content: col = w*2Hkv + c; c<Hkv -> K head c, else V head
    wi = jax.lax.broadcasted_iota(jnp.int32, (rows_q, wcols), 1)
    wc = wi % two_h
    wr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, wcols), 0) // g
    wdiag = jnp.where(wc == wr, 0.0, _NEG_INF).astype(jnp.float32)
    wtok = wi // two_h  # token offset within the tail page

    @pl.when(seq_len > 0)
    def _():
        q = q_ref[0]  # [Hkv*G, D]
        k_new_p = jnp.repeat(k_new_ref[0], g, axis=0)
        v_new_p = jnp.repeat(v_new_ref[0], g, axis=0)
        m0 = (
            jnp.sum(q.astype(jnp.float32) * k_new_p.astype(jnp.float32),
                    axis=-1, keepdims=True) * scale
        )
        l0 = jnp.ones((rows_q, 1), jnp.float32)
        acc0 = v_new_p.astype(jnp.float32)
        win_lo = jnp.maximum(seq_len - window, 0) if window > 0 else 0

        def body(i, carry):
            m, l, acc = carry
            gt = cursor_ref[0]

            @pl.when(gt < jnp.minimum(base + i + nslots, total_tiles))
            def _():
                issue_tile(gt)
                cursor_ref[0] = gt + 1

            slot = jax.lax.rem(base + i, nslots)
            p0 = i * T
            blk0, contig = tile_contig(b, p0)

            @pl.when(contig)
            def _():
                pltpu.make_async_copy(
                    kv_buf.at[slot], kv_buf.at[slot], sem.at[slot, 0]
                ).wait()

            @pl.when(jnp.logical_not(contig))
            def _():
                pltpu.make_async_copy(
                    kv_buf.at[slot, 0], kv_buf.at[slot, 0], sem.at[slot, 0]
                ).wait()
                for h in range(1, T):

                    @pl.when(p0 + h < nfull)
                    def _(h=h):
                        pltpu.make_async_copy(
                            kv_buf.at[slot, h], kv_buf.at[slot, h],
                            sem.at[slot, h],
                        ).wait()

            s_parts = []
            for t in range(T):
                k_t = _mxu(kv_buf[slot, t, 0]).reshape(hkv * bs, d)
                s_parts.append(
                    jax.lax.dot_general(
                        q, k_t,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            s = jnp.concatenate(s_parts, axis=1) * scale + diag_bias
            limit = nfull * bs - p0 * bs  # full pages hold < nfull*bs
            s = jnp.where(col_off < limit, s, _NEG_INF)
            if window > 0:
                lo_lim = win_lo - p0 * bs
                s = jnp.where(col_off >= lo_lim, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.zeros((rows_q, d), jnp.float32)
            for t in range(T):
                v_t = _mxu(kv_buf[slot, t, 1]).reshape(hkv * bs, d)
                pv = pv + jax.lax.dot_general(
                    p[:, t * hkv * bs:(t + 1) * hkv * bs].astype(v_t.dtype),
                    v_t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return m_new, l_new, acc * alpha + pv

        m, l, acc = jax.lax.fori_loop(0, ntiles, body, (m0, l0, acc0))

        # ---- tail-page block (token-major content) ----
        def with_window(carry):
            m, l, acc = carry
            wslot = jax.lax.rem(b, wd)
            pltpu.make_async_copy(
                win_buf.at[wslot], win_buf.at[wslot], w_sem.at[wslot]
            ).wait()
            flat = _mxu(win_buf[wslot]).reshape(wcols, d)
            s = jax.lax.dot_general(
                q, flat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + wdiag  # V columns masked by wdiag (wc >= Hkv)
            s = jnp.where(wtok < n_win, s, _NEG_INF)
            if window > 0:
                s = jnp.where(
                    wtok >= win_lo - nfull * bs, s, _NEG_INF
                )
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            # shift each token's K-probabilities onto its V rows: V cols
            # held zeros, so the roll is exact (kernel docstring; concat
            # form — jnp.roll lowers to an unsupported gather)
            p_roll = jnp.concatenate(
                [p[:, -hkv:], p[:, :-hkv]], axis=1
            )
            pv = jax.lax.dot_general(
                p_roll.astype(flat.dtype), flat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        m, l, acc = jax.lax.cond(
            has_win, with_window, lambda c: c, (m, l, acc)
        )
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        # ---- persist the new token ----
        # pend kind: 1 = row write in flight, 2 = canonical page write
        @pl.when(pend_ref[0] == 1)
        def _():
            pltpu.make_async_copy(row_buf, row_buf, r_sem.at[0]).wait()

        @pl.when(pend_ref[0] == 2)
        def _():
            pltpu.make_async_copy(canon_buf, canon_buf, r_sem.at[0]).wait()

        row = jnp.concatenate(
            [k_new_ref[0], v_new_ref[0]], axis=0
        ).astype(row_buf.dtype)  # [2*Hkv, D]
        write_blk = block_tables_ref[b, jax.lax.div(n_cached, bs)]
        completes = w_pos == bs - 1

        @pl.when(jnp.logical_not(completes))
        def _():
            row_buf[...] = row
            # content row w lives at plane w//4, token rows (w%4)*16 of
            # the page's declared [2, Hkv, bs, D] dims
            plane = jax.lax.div(w_pos, bs // (2 * hkv))
            t0 = jax.lax.rem(w_pos, bs // (2 * hkv)) * two_h
            pltpu.make_async_copy(
                row_buf,
                kv_out.at[layer, write_blk, jax.lax.div(plane, hkv),
                          jax.lax.rem(plane, hkv), pl.ds(t0, two_h)],
                r_sem.at[0],
            ).start()
            pend_ref[0] = 1

        @pl.when(completes)
        def _():
            # completion: canonicalize window + new row, write the page
            flat = win_buf[jax.lax.rem(b, wd)].reshape(bs, two_h, d)
            flat = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (bs, two_h, d), 0)
                == w_pos,
                row[None],
                flat,
            )
            canon = jnp.swapaxes(flat, 0, 1)  # [2*Hkv, bs, D]
            canon_buf[...] = canon.reshape(2, hkv, bs, d)
            pltpu.make_async_copy(
                canon_buf, kv_out.at[layer, write_blk], r_sem.at[0]
            ).start()
            pend_ref[0] = 2

    @pl.when(seq_len == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(b == nprog - 1)
    def _():
        @pl.when(pend_ref[0] == 1)
        def _():
            pltpu.make_async_copy(row_buf, row_buf, r_sem.at[0]).wait()

        @pl.when(pend_ref[0] == 2)
        def _():
            pltpu.make_async_copy(canon_buf, canon_buf, r_sem.at[0]).wait()

        pend_ref[0] = 0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret", "window", "nslots_override",
                     "tile"),
)
def paged_decode_attention_write_v12_tpu(
    q: jnp.ndarray,  # [B, Hq, D]
    k_new: jnp.ndarray,  # [B, Hkv, D]
    v_new: jnp.ndarray,
    kv_all: jnp.ndarray,  # [L, NB, 2, Hkv, bs, D] (interleaved layout)
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [B] int32
    block_tables: jnp.ndarray,  # [B, NB_used] int32
    seq_lens: jnp.ndarray,  # [B] int32 (incl. current token)
    scale: float,
    interpret: bool = False,
    window: int = 0,
    nslots_override: int = 0,
    tile: int = 4,
    cum: jnp.ndarray | None = None,  # unused (tiles derive from FULL
    # pages, not the ceil-page cumsum the other kernels share)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], kv_all) — row-major tail pages (see kernel)."""
    del cum
    b, hq, d = q.shape
    _, _, two, hkv, bs, _ = kv_all.shape
    assert two == 2
    g = hq // hkv
    assert hq == hkv * g
    two_h = 2 * hkv
    # the single-tile row write needs [2*Hkv, D] to be whole (16, 128)
    # bf16 tiles that evenly split the page's (bs, D) planes
    assert two_h % 16 == 0 and bs % two_h == 0, (hkv, bs)
    T = tile
    nslots = nslots_override or max(2, 12 // T)
    nb = block_tables.shape[1]
    ntile_cols = -(-nb // T)

    pages_full = jax.lax.div(jnp.maximum(seq_lens - 1, 0), bs)
    tiles = jax.lax.div(pages_full + (T - 1), T)
    cum_tiles = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles).astype(jnp.int32)]
    )
    starts = jnp.zeros(b * ntile_cols, jnp.int32).at[
        cum_tiles[1:-1]
    ].add(1, mode="drop")
    seq_of_tile = jnp.cumsum(starts).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, T, 2, hkv, bs, d), kv_all.dtype),
            pltpu.SemaphoreType.DMA((nslots, T)),
            pltpu.VMEM((4, 2, hkv, bs, d), kv_all.dtype),  # window ring
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((two_h, d), kv_all.dtype),
            pltpu.VMEM((2, hkv, bs, d), kv_all.dtype),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_v12, scale=scale, block_size=bs, window=window,
        tile=T,
    )
    out, kv_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(kv_all.shape, kv_all.dtype),
        ],
        input_output_aliases={10: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        seq_lens,
        slot_mapping,
        pages_full.astype(jnp.int32),
        cum_tiles,
        seq_of_tile,
        q,
        k_new,
        v_new,
        kv_all,
    )
    return out, kv_all
