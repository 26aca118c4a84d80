"""Retired decode-attention kernel generations (v1, v3, v4, v6, v7, v8).

Engineering history kept out of the production module
(ops/pallas/decode_attention.py carries only the default v9 and the v5
fallback — VERDICT r3 weak #7): every variant here LOST a same-session
full-config A/B on the real chip (PERF.md kernel history). Still
env-selectable via XLLM_DECODE_KERNEL (ops/attention.py dispatches
lazily into this module) and interpret-mode tested
(tests/test_pallas_attention.py), but excluded from the chipless AOT
compile suite to keep its runtime bounded.
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


def _decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NBmax] int32
    seq_lens_ref,  # [B] int32 (including the current token)
    slot_ref,  # [B] int32 (current token's slot = block*bs + off)
    # inputs
    q_ref,  # [1, Hkv, G, D] VMEM (this sequence's queries, group-major)
    k_new_ref,  # [1, Hkv, D] VMEM (this sequence's new K row)
    v_new_ref,
    k_in,  # [L, NB, Hkv, bs, D] ANY/HBM (aliased with k_out)
    v_in,
    # outputs
    o_ref,  # [1, Hkv, G, D] VMEM
    k_out,  # aliased HBM cache
    v_out,
    # scratch
    k_buf,  # [NSLOTS, Hkv, bs, D] VMEM
    v_buf,
    sem,  # DMA sems [2, NSLOTS]
    w_sem,  # write sems [2]
    *,
    scale: float,
    block_size: int,
):
    del k_in, v_in  # same buffers as k_out/v_out (aliased); use outputs only
    b = pl.program_id(0)
    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    hkv, g, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_out.at[layer, block_tables_ref[b, i]], k_buf.at[slot], sem.at[0, slot]
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_out.at[layer, block_tables_ref[b, i]], v_buf.at[slot], sem.at[1, slot]
        )

    @pl.when(seq_len > 0)
    def _():
        # HBM tiling forbids single-row page DMAs, so the new K/V row is
        # merged read-modify-write style: the last page is already being
        # DMA'd for attention — patch the row in VMEM (vector select) and
        # write the whole page back after the loop.
        off = jax.lax.rem(slot_ref[b], block_size)
        last = nblks - 1

        for s in range(_NSLOTS - 1):

            @pl.when(s < nblks)
            def _(s=s):
                k_dma(s, s).start()
                v_dma(s, s).start()

        q = q_ref[0]  # [Hkv, G, D]

        def body(i, carry):
            m, l, acc = carry  # [Hkv, G, 1], [Hkv, G, 1], [Hkv, G, D]
            slot = jax.lax.rem(i, _NSLOTS)
            nxt = i + _NSLOTS - 1

            @pl.when(nxt < nblks)
            def _():
                k_dma(jax.lax.rem(nxt, _NSLOTS), nxt).start()
                v_dma(jax.lax.rem(nxt, _NSLOTS), nxt).start()

            k_dma(slot, i).wait()

            @pl.when(i == last)
            def _():
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (hkv, block_size, d), 1
                )
                k_buf[slot] = jnp.where(
                    row == off,
                    k_new_ref[0][:, None, :].astype(k_buf.dtype),
                    k_buf[slot],
                )

            s_parts = []
            for h in range(hkv):
                s_parts.append(
                    jax.lax.dot_general(
                        q[h],
                        _mxu(k_buf[slot, h]),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            s = jnp.stack(s_parts, axis=0) * scale  # [Hkv, G, bs]
            kv_idx = i * block_size + jax.lax.broadcasted_iota(
                jnp.int32, (hkv, g, block_size), 2
            )
            s = jnp.where(kv_idx < seq_len, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

            v_dma(slot, i).wait()

            @pl.when(i == last)
            def _():
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (hkv, block_size, d), 1
                )
                v_buf[slot] = jnp.where(
                    row == off,
                    v_new_ref[0][:, None, :].astype(v_buf.dtype),
                    v_buf[slot],
                )

            p_cast = p.astype(_mxu(v_buf[slot]).dtype)
            pv_parts = []
            for h in range(hkv):
                pv_parts.append(
                    jax.lax.dot_general(
                        p_cast[h],
                        _mxu(v_buf[slot, h]),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            pv = jnp.stack(pv_parts, axis=0)  # [Hkv, G, D]
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((hkv, g, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((hkv, g, 1), jnp.float32)
        acc0 = jnp.zeros((hkv, g, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        # write the patched last page back to HBM (full-page, tile-aligned)
        last_slot = jax.lax.rem(last, _NSLOTS)
        last_blk = block_tables_ref[b, last]
        kw = pltpu.make_async_copy(
            k_buf.at[last_slot], k_out.at[layer, last_blk], w_sem.at[0]
        )
        vw = pltpu.make_async_copy(
            v_buf.at[last_slot], v_out.at[layer, last_blk], w_sem.at[1]
        )
        kw.start()
        vw.start()
        kw.wait()
        vw.wait()

    @pl.when(seq_len == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])


def _decode_kernel_v3(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight-bucketed columns)
    seq_lens_ref,  # [B] int32 (including the current token)
    slot_ref,  # [B] int32 (current token's slot = block*bs + off)
    # inputs
    q_ref,  # [1, Hkv, G, D] VMEM
    k_new_ref,  # [1, Hkv, D] VMEM
    v_new_ref,
    k_page,  # [1, 1, Hkv, bs, D] VMEM — pallas-pipelined cache page
    v_page,
    # outputs
    o_ref,  # [1, Hkv, G, D] VMEM
    k_out,  # aliased HBM cache [L, NB_total, Hkv, bs, D]
    v_out,
    # scratch
    m_ref,  # [Hkv, G, 1] f32
    l_ref,
    acc_ref,  # [Hkv, G, D] f32
    k_patch,  # [Hkv, bs, D]
    v_patch,
    w_sem,  # DMA [2]
    pend_ref,  # SMEM [1] int32: a write-back DMA is in flight
    *,
    scale: float,
    block_size: int,
    nb_grid: int,
    window: int = 0,
):
    """Streaming decode kernel: grid (B, NB), pages pipelined BY PALLAS.

    v3 design (vs the per-sequence v1 grid=(B,) kernel, which measured at
    ~260 GB/s — 1/3 of the chip's streaming bandwidth — because each program
    restarted its DMA pipeline and serialized its write-back wait):

    - the KV page fetch is a pallas-managed input (index_map walks the
      block table), so the double-buffered page stream crosses sequence
      boundaries with no pipeline restart;
    - the new token's K/V is NOT patched into the page before attention;
      it joins the online softmax as one extra column read straight from
      VMEM (the cache holds only seq_len-1 valid rows);
    - the cache write-back of the new row builds the patched last page in
      VMEM and DMAs it out, waiting for the PREVIOUS sequence's write at
      patch time — the write latency hides under the next sequence's
      compute (sequences never share a partial page, so writes cannot
      race reads).
    """
    b, i = pl.program_id(0), pl.program_id(1)

    # SMEM scratch is NOT zero-initialized: clear the pending-write flag
    # on the very first grid step or the first wait blocks forever
    @pl.when((b == 0) & (i == 0))
    def _():
        pend_ref[0] = 0

    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    last = nblks - 1
    hkv, g, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    n_cached = seq_len - 1
    win_lo = jnp.maximum(seq_len - window, 0) if window > 0 else 0
    first_blk = win_lo // block_size if window > 0 else 0  # rows valid in the cache

    @pl.when((i == 0) & (seq_len == 0))
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when((i < nblks) & (i >= first_blk) & (seq_len > 0))
    def _():
        q = q_ref[0]  # [Hkv, G, D]
        m, l, acc = m_ref[...], l_ref[...], acc_ref[...]

        s = jax.lax.dot_general(
            q,
            _mxu(k_page[0, 0]),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [Hkv, G, bs]
        kv_idx = i * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (hkv, g, block_size), 2
        )
        keep = kv_idx < n_cached
        if window > 0:
            keep = keep & (kv_idx >= win_lo)
        s = jnp.where(keep, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(_mxu(v_page[0, 0]).dtype),
            _mxu(v_page[0, 0]),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        m, l = m_new, l_new

        @pl.when(i == last)
        def _():
            # ---- extra column: the new token attends to itself ----
            mm, ll, aa = m, l, acc
            s_new = (
                jnp.sum(
                    q.astype(jnp.float32)
                    * k_new_ref[0].astype(jnp.float32)[:, None, :],
                    axis=-1,
                    keepdims=True,
                )
                * scale
            )  # [Hkv, G, 1]
            m2 = jnp.maximum(mm, s_new)
            alpha2 = jnp.exp(mm - m2)
            p2 = jnp.exp(s_new - m2)
            l2 = ll * alpha2 + p2
            a2 = aa * alpha2 + p2 * v_new_ref[0].astype(jnp.float32)[:, None, :]
            o_ref[0] = (a2 / jnp.maximum(l2, 1e-30)).astype(o_ref.dtype)

            # ---- write-back: patched last page -> HBM ----
            @pl.when(pend_ref[0] == 1)
            def _():
                pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
                pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()

            off = jax.lax.rem(slot_ref[b], block_size)
            row = jax.lax.broadcasted_iota(
                jnp.int32, (hkv, block_size, d), 1
            )
            k_patch[...] = jnp.where(
                row == off,
                k_new_ref[0][:, None, :].astype(k_patch.dtype),
                k_page[0, 0],
            )
            v_patch[...] = jnp.where(
                row == off,
                v_new_ref[0][:, None, :].astype(v_patch.dtype),
                v_page[0, 0],
            )
            blk = block_tables_ref[b, last]
            pltpu.make_async_copy(
                k_patch, k_out.at[layer, blk], w_sem.at[0]
            ).start()
            pltpu.make_async_copy(
                v_patch, v_out.at[layer, blk], w_sem.at[1]
            ).start()
            pend_ref[0] = 1

        @pl.when(i < last)
        def _():
            m_ref[...] = m
            l_ref[...] = l
            acc_ref[...] = acc

    # drain the final in-flight write on the very last grid step
    @pl.when(
        (b == pl.num_programs(0) - 1)
        & (i == nb_grid - 1)
        & (pend_ref[0] == 1)
    )
    def _():
        pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
        pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()
        pend_ref[0] = 0


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "window"))
def paged_decode_attention_write_v3_tpu(
    q: jnp.ndarray,  # [B, Hq, D]
    k_new: jnp.ndarray,  # [B, Hkv, D]
    v_new: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [B] int32
    block_tables: jnp.ndarray,  # [B, NB_used] int32 (tight columns)
    seq_lens: jnp.ndarray,  # [B] int32 (including the current token)
    scale: float,
    interpret: bool = False,
    window: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g
    nb = block_tables.shape[1]

    def page_index(bi, i, layer_s, bt_s, sl_s, slot_s):
        # clamp out-of-range steps (beyond the end, or below the sliding
        # window) to a valid page so the pallas pipeline does not issue
        # extra copies (same index -> no copy)
        nblks = jax.lax.div(sl_s[bi] + bs - 1, bs)
        ii = jnp.minimum(i, jnp.maximum(nblks - 1, 0))
        if window > 0:
            lo_blk = jnp.maximum(sl_s[bi] - window, 0) // bs
            ii = jnp.maximum(ii, jnp.minimum(lo_blk, jnp.maximum(nblks - 1, 0)))
        return (layer_s[0], bt_s[bi, ii], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(
                (1, hkv, g, d), lambda bi, i, *_: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda bi, i, *_: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hkv, d), lambda bi, i, *_: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, hkv, bs, d), page_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, bs, d), page_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hkv, g, d), lambda bi, i, *_: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, g, 1), jnp.float32),
            pltpu.VMEM((hkv, g, 1), jnp.float32),
            pltpu.VMEM((hkv, g, d), jnp.float32),
            pltpu.VMEM((hkv, bs, d), k_all.dtype),
            pltpu.VMEM((hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_v3, scale=scale, block_size=bs, nb_grid=nb,
        window=window,
    )
    # inputs incl. 4 scalar-prefetch args: q=4, k_new=5, v_new=6, k_all=7,
    # v_all=8; outputs: o=0, k_out=1, v_out=2
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        seq_lens,
        slot_mapping,
        q.reshape(b, hkv, g, d),
        k_new,
        v_new,
        k_all,
        v_all,
    )
    return out.reshape(b, hq, d), k_all, v_all


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention_write_tpu(
    q: jnp.ndarray,  # [B, Hq, D]
    k_new: jnp.ndarray,  # [B, Hkv, D]
    v_new: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [B] int32
    block_tables: jnp.ndarray,  # [B, NBmax] int32
    seq_lens: jnp.ndarray,  # [B] int32 (including the current token)
    scale: float,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hkv, g, d), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
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
                (1, hkv, g, d), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, hkv, bs, d), k_all.dtype),
            pltpu.VMEM((_NSLOTS, hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, _NSLOTS)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_decode_kernel, scale=scale, block_size=bs)
    # input indices include the 4 scalar-prefetch args: q=4, k_new=5,
    # v_new=6, k_all=7, v_all=8; outputs: o=0, k_out=1, v_out=2
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        seq_lens,
        slot_mapping,
        q.reshape(b, hkv, g, d),
        k_new,
        v_new,
        k_all,
        v_all,
    )
    return out.reshape(b, hq, d), k_all, v_all


_V4_SPLIT = 4  # sub-page DMA split: single-stream DMA saturates ~250 GB/s
# on v5e; 4 parallel sub-copies per page measured 694 GB/s (probe_streams)


def _decode_kernel_v4(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight columns)
    seq_lens_ref,  # [B] int32 (incl. current token)
    slot_ref,  # [B] int32 (current token's slot)
    cum_ref,  # [B+1] int32 cumulative page counts (global slot ring)
    # inputs
    q_ref,  # [1, Hkv, G, D] VMEM
    k_new_ref,  # [1, Hkv, D] VMEM
    v_new_ref,
    k_in,  # [L, NB, Hkv, bs, D] ANY (aliased)
    v_in,
    # outputs
    o_ref,  # [1, Hkv, G, D] VMEM
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
    cursor_ref,  # SMEM [2]: shared global issue cursor
    *,
    scale: float,
    block_size: int,
    window: int = 0,
    nocompute: bool = False,  # probe: DMA stream only (perf ablation)
):
    """v4: manual split-DMA streaming decode kernel, grid (B,).

    Fixes the measured bandwidth ceilings (scripts/probe_streams.py):
    - every page copy is SPLIT sub-copies on separate semaphores so the
      DMA engines run in parallel (1 stream ~250 GB/s, 4 ~694 GB/s);
    - the VMEM slot ring is indexed by GLOBAL page number (cum_ref), so a
      program's trailing issue slots flow seamlessly into the next
      program's first pages — the pipeline never drains at sequence
      boundaries;
    - the new token joins the softmax as an extra column (no patch before
      attend) and the patched tail page is written back with the wait
      deferred into the next program's compute.
    """
    del k_in, v_in
    b = pl.program_id(0)
    nprog = pl.num_programs(0)

    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    last = nblks - 1
    hkv, g, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    n_cached = seq_len - 1
    base = cum_ref[b]  # global page index of this program's page 0
    total_pages = cum_ref[nprog]
    split = sem.shape[2]
    rows = hkv // split
    nslots = k_buf.shape[0]

    # shared issue cursor: cursor_ref = [next global page to issue,
    # sequence owning it]; persists across programs so the DMA pipeline
    # never drains at sequence boundaries
    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0
        cursor_ref[1] = 0

    def issue_global(gp, iseq):
        """Start global page gp owned by sequence iseq."""
        j = gp - cum_ref[iseq]
        blk = block_tables_ref[iseq, j]
        slot = jax.lax.rem(gp, nslots)
        for si in range(split):
            pltpu.make_async_copy(
                k_out.at[layer, blk, pl.ds(si * rows, rows)],
                k_buf.at[slot, pl.ds(si * rows, rows)],
                sem.at[0, slot, si],
            ).start()
            pltpu.make_async_copy(
                v_out.at[layer, blk, pl.ds(si * rows, rows)],
                v_buf.at[slot, pl.ds(si * rows, rows)],
                sem.at[1, slot, si],
            ).start()

    def drain_to(target):
        """Issue global pages until the cursor reaches min(target, total).

        The cursor is carried through the loop explicitly (ref reads
        inside a while cond are staged once by tracing) and written back
        after.
        """
        tgt = jnp.minimum(target, total_pages)

        def cond(c):
            return c[0] < tgt

        def step(c):
            gp, iseq = c

            def adv_cond(s):  # skip empty/finished sequences
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
                    k_buf.at[slot, pl.ds(si * rows, rows)],
                    k_buf.at[slot, pl.ds(si * rows, rows)],
                    sem.at[which, slot, si],
                ).wait()

    @pl.when(seq_len > 0)
    def _():
        q = q_ref[0]  # [Hkv, G, D]

        def body(i, carry):
            m, l, acc = carry
            # keep nslots pages in flight ahead of the consume point
            drain_to(base + i + nslots)
            slot = jax.lax.rem(base + i, nslots)
            wait_page(slot)

            if nocompute:
                # perf ablation: touch one row per buffer so the DMAs are
                # live, skip all attention math
                touch = (
                    k_buf[slot, :, :1, :].astype(jnp.float32)
                    + v_buf[slot, :, :1, :].astype(jnp.float32)
                )
                return m, l, acc + touch

            s = jax.lax.dot_general(
                q,
                _mxu(k_buf[slot]),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [Hkv, G, bs]
            kv_idx = i * block_size + jax.lax.broadcasted_iota(
                jnp.int32, (hkv, g, block_size), 2
            )
            keep = kv_idx < n_cached
            if window > 0:
                keep = keep & (kv_idx >= jnp.maximum(seq_len - window, 0))
            s = jnp.where(keep, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(_mxu(v_buf[slot]).dtype),
                _mxu(v_buf[slot]),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv

            # tail page: patch the new row and write back (deferred wait)
            @pl.when(i == last)
            def _():
                @pl.when(pend_ref[0] == 1)
                def _():
                    pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
                    pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()

                off = jax.lax.rem(slot_ref[b], block_size)
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (hkv, block_size, d), 1
                )
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

        m0 = jnp.full((hkv, g, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((hkv, g, 1), jnp.float32)
        acc0 = jnp.zeros((hkv, g, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))

        # extra column: the new token attends to itself
        s_new = (
            jnp.sum(
                q_ref[0].astype(jnp.float32)
                * k_new_ref[0].astype(jnp.float32)[:, None, :],
                axis=-1,
                keepdims=True,
            )
            * scale
        )
        m2 = jnp.maximum(m, s_new)
        alpha2 = jnp.exp(m - m2)
        p2 = jnp.exp(s_new - m2)
        l2 = l * alpha2 + p2
        a2 = acc * alpha2 + p2 * v_new_ref[0].astype(jnp.float32)[:, None, :]
        o_ref[0] = (a2 / jnp.maximum(l2, 1e-30)).astype(o_ref.dtype)

    @pl.when(seq_len == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    # drain the final in-flight write on the last program
    @pl.when((b == nprog - 1) & (pend_ref[0] == 1))
    def _():
        pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
        pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()
        pend_ref[0] = 0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret", "window", "split_override",
                     "nslots_override", "nocompute"),
)
def paged_decode_attention_write_v4_tpu(
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
    split_override: int = 0,  # perf probes only
    nslots_override: int = 0,
    nocompute: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g
    nslots = nslots_override or 8
    split = _V4_SPLIT if hkv % _V4_SPLIT == 0 else (2 if hkv % 2 == 0 else 1)
    if split_override:
        assert hkv % split_override == 0
        split = split_override

    pages = jax.lax.div(seq_lens + bs - 1, bs)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pages).astype(jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hkv, g, d), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
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
                (1, hkv, g, d), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
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
        _decode_kernel_v4, scale=scale, block_size=bs, window=window,
        nocompute=nocompute,
    )
    # inputs incl. 5 scalar-prefetch args: q=5, k_new=6, v_new=7, k_all=8,
    # v_all=9; outputs: o=0, k_out=1, v_out=2
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
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
        q.reshape(b, hkv, g, d),
        k_new,
        v_new,
        k_all,
        v_all,
    )
    return out.reshape(b, hq, d), k_all, v_all


def _decode_kernel_v6(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight columns)
    seq_lens_ref,  # [B] int32 (incl. current token)
    slot_ref,  # [B] int32 (current token's slot)
    cum_ref,  # [B+1] int32 cumulative page counts (global stream)
    seq_of_page_ref,  # [B*NB] int32: owning sequence of each global page
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
    cursor_ref,  # SMEM [1]: next global page to issue
    *,
    scale: float,
    block_size: int,
    split: int,
    window: int = 0,
):
    """v6: v5's packed-head compute with the scalar path stripped bare.

    Per-page scalar work in v5 (measured program-bound at 550 ns/page vs
    the 360 ns/page DMA floor): a catch-up while_loop + nested
    sequence-advance while per issue, 2x`split` semaphore waits, and an
    `i == last` branch evaluated every iteration. v6:

    - `seq_of_page` (scalar prefetch, computed in XLA) maps global page
      -> owning sequence: issue is a table lookup, no while_loops;
    - the slot ring is topped up with exactly ONE conditional issue per
      loop iteration (a prologue drain fills it at program start);
    - the tail-page patch/write-back runs AFTER the flash loop (the ring
      never overwrites a slot until `nslots` pages later, and the next
      program starts only after this one returns);
    - scale and the block-diagonal head mask fold into one FMA with a
      precomputed additive bias; the causal/window edge needs only a
      per-iteration compare against a scalar limit.
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
    rows_dma = hkv // split
    nslots = k_buf.shape[0]
    bs = block_size
    cols = hkv * bs

    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0

    def issue_global(gp):
        iseq = seq_of_page_ref[gp]
        blk = block_tables_ref[iseq, gp - cum_ref[iseq]]
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

    # prologue: fill the ring up to base + nslots (amortized: in steady
    # state the cursor is already there and this is one failed check)
    def prologue_cond(gp):
        return gp < jnp.minimum(base + nslots, total_pages)

    gp0 = jax.lax.while_loop(
        prologue_cond,
        lambda gp: (issue_global(gp), gp + 1)[1],
        cursor_ref[0],
    )
    cursor_ref[0] = gp0

    # block-diagonal additive bias: 0 on a query head's own kv block,
    # -inf elsewhere (post-exp those lanes are exactly 0, so p @ v_flat
    # needs no further masking)
    hc = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1) // bs
    hr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 0) // g
    diag_bias = jnp.where(hc == hr, 0.0, _NEG_INF).astype(jnp.float32)
    col_pos = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1) % bs

    @pl.when(seq_len > 0)
    def _():
        q = q_ref[0]  # [Hkv*G, D]
        k_new_p = jnp.repeat(k_new_ref[0], g, axis=0)  # [Hkv*G, D]
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
            # top up the ring: exactly one issue in steady state
            gp = cursor_ref[0]

            @pl.when(gp < jnp.minimum(base + i + nslots, total_pages))
            def _():
                issue_global(gp)
                cursor_ref[0] = gp + 1

            slot = jax.lax.rem(base + i, nslots)
            for si in range(split):
                pltpu.make_async_copy(
                    k_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                    k_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                    sem.at[0, slot, si],
                ).wait()
                pltpu.make_async_copy(
                    v_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                    v_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                    sem.at[1, slot, si],
                ).wait()

            k_flat = _mxu(k_buf[slot]).reshape(cols, d)
            v_flat = _mxu(v_buf[slot]).reshape(cols, d)
            s = jax.lax.dot_general(
                q, k_flat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + diag_bias  # FMA: scale + head mask in one pass
            # causal edge: positions >= n_cached - i*bs are invalid on
            # the tail page only; full pages pass the compare trivially
            limit = n_cached - i * bs
            s = jnp.where(col_pos < limit, s, _NEG_INF)
            if window > 0:
                lo_lim = win_lo - i * bs
                s = jnp.where(col_pos >= lo_lim, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_flat.dtype), v_flat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        # tail-page patch + write-back, OUT of the hot loop: the ring
        # cannot overwrite slot(last) before the next program's drains,
        # which start after this program returns
        @pl.when(pend_ref[0] == 1)
        def _():
            pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
            pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()

        slot_last = jax.lax.rem(base + last, nslots)
        off = jax.lax.rem(slot_ref[b], bs)
        row = jax.lax.broadcasted_iota(jnp.int32, (hkv, bs, d), 1)
        k_patch[...] = jnp.where(
            row == off,
            k_new_ref[0][:, None, :].astype(k_patch.dtype),
            k_buf[slot_last],
        )
        v_patch[...] = jnp.where(
            row == off,
            v_new_ref[0][:, None, :].astype(v_patch.dtype),
            v_buf[slot_last],
        )
        blk = block_tables_ref[b, last]
        pltpu.make_async_copy(k_patch, k_out.at[layer, blk], w_sem.at[0]).start()
        pltpu.make_async_copy(v_patch, v_out.at[layer, blk], w_sem.at[1]).start()
        pend_ref[0] = 1

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
def paged_decode_attention_write_v6_tpu(
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
    seq_of_page: jnp.ndarray | None = None,  # [B*NB] precomputed owner map
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g
    nslots = nslots_override or 8
    # On-chip A/B (scripts/probe_decode_kernel.py, r2): split=1 reaches the
    # measured DMA floor (145 us/layer, 693 GB/s at bench shapes) while
    # split=2 serializes the copy engines (355 GB/s) — page-level slot
    # parallelism already saturates the fabric, intra-page splits only add
    # issue overhead.
    split = 1
    if split_override:
        assert hkv % split_override == 0
        split = split_override
    nb = block_tables.shape[1]

    if cum is None:
        pages = jax.lax.div(seq_lens + bs - 1, bs)
        cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(pages).astype(jnp.int32)]
        )
    if seq_of_page is None:
        # owning sequence of each global page (monotone; empty seqs
        # skipped). NOTE: on TPU jnp.searchsorted lowers to a sequential
        # binary-search loop — callers inside a layer scan must pass the
        # precomputed host map (DecodeInput.page_seq) or this prep
        # dominates the kernel itself.
        seq_of_page = jnp.searchsorted(
            cum[1:], jnp.arange(b * nb, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
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
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_v6, scale=scale, block_size=bs, split=split,
        window=window,
    )
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={9: 1, 10: 2},
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
        seq_of_page,
        q,
        k_new,
        v_new,
        k_all,
        v_all,
    )
    return out, k_all, v_all


def _decode_kernel_v7(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight columns)
    seq_lens_ref,  # [B] int32 (incl. current token)
    slot_ref,  # [B] int32 (current token's slot)
    pages_ref,  # [B] int32 page count per sequence
    cum_pairs_ref,  # [B+1] int32 cumulative PAIR counts (global ring)
    seq_of_pair_ref,  # [B*ceil(NB/2)] int32 owning seq of each pair
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
    k_buf,  # [NSLOTS, 2*Hkv, bs, D]  (pair ring: two pages per slot)
    v_buf,
    sem,  # DMA [2, NSLOTS, 2]  (k/v, slot, page-half)
    k_patch,
    v_patch,
    w_sem,  # DMA [2]
    pend_ref,  # SMEM [1]
    cursor_ref,  # SMEM [1]: next global PAIR to issue
    *,
    scale: float,
    block_size: int,
    window: int = 0,
):
    """v7: v6's stripped scalar path on PAGE-PAIR tiles.

    v6 measured issue-rate bound: per-page fixed costs (issue + sem waits
    + the [Hq, Hkv*bs] softmax ops) exceed the ~360 ns page DMA, capping
    effective bandwidth. v7 halves every per-page fixed cost by making
    the ring slot TWO consecutive pages of one sequence:

    - one flash iteration per pair: s = q [Hq, D] @ k_pair^T [D, 2*Hkv*bs]
      — VPU ops amortize over 1024 columns instead of 512;
    - one conditional issue + 4 semaphore waits per PAIR (v6: per page);
    - odd tails skip the second half's DMA; its columns mask out through
      the causal compare (kv_idx >= n_cached), and the ring is zeroed at
      program 0 so unwritten halves hold finite values (0 * p == 0 in the
      p @ v accumulation, never NaN).

    Same contract as v4/v5/v6: fused write+attend, caches aliased in
    place (reference fused attention ops, xllm/core/kernels/ops_api.h:27).
    """
    del k_in, v_in
    b = pl.program_id(0)
    nprog = pl.num_programs(0)

    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    last = nblks - 1
    npairs = pl.cdiv(seq_len, 2 * block_size)
    rows_q, d = q_ref.shape[1], q_ref.shape[2]
    hkv = k_new_ref.shape[1]
    g = rows_q // hkv
    n_cached = seq_len - 1
    base = cum_pairs_ref[b]
    total_pairs = cum_pairs_ref[nprog]
    nslots = k_buf.shape[0]
    bs = block_size
    cols = 2 * hkv * bs  # pair tile width

    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0
        # unwritten pair halves must hold FINITE values (see docstring)
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)

    def issue_pair(gp):
        iseq = seq_of_pair_ref[gp]
        j = gp - cum_pairs_ref[iseq]
        p0 = 2 * j
        slot = jax.lax.rem(gp, nslots)
        blk0 = block_tables_ref[iseq, p0]
        pltpu.make_async_copy(
            k_out.at[layer, blk0], k_buf.at[slot, pl.ds(0, hkv)],
            sem.at[0, slot, 0],
        ).start()
        pltpu.make_async_copy(
            v_out.at[layer, blk0], v_buf.at[slot, pl.ds(0, hkv)],
            sem.at[1, slot, 0],
        ).start()

        @pl.when(p0 + 1 < pages_ref[iseq])
        def _():
            blk1 = block_tables_ref[iseq, p0 + 1]
            pltpu.make_async_copy(
                k_out.at[layer, blk1], k_buf.at[slot, pl.ds(hkv, hkv)],
                sem.at[0, slot, 1],
            ).start()
            pltpu.make_async_copy(
                v_out.at[layer, blk1], v_buf.at[slot, pl.ds(hkv, hkv)],
                sem.at[1, slot, 1],
            ).start()

    # prologue: fill the pair ring (steady state: one failed check)
    def prologue_cond(gp):
        return gp < jnp.minimum(base + nslots, total_pairs)

    gp0 = jax.lax.while_loop(
        prologue_cond,
        lambda gp: (issue_pair(gp), gp + 1)[1],
        cursor_ref[0],
    )
    cursor_ref[0] = gp0

    # static tile maps: query-head x kv-head block diagonal (repeats per
    # half) and each column's token offset within the pair
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 1)
    hc = (ci % (hkv * bs)) // bs
    hr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, cols), 0) // g
    diag_bias = jnp.where(hc == hr, 0.0, _NEG_INF).astype(jnp.float32)
    col_off = (ci // (hkv * bs)) * bs + ci % bs  # token offset in pair

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
            gp = cursor_ref[0]

            @pl.when(gp < jnp.minimum(base + i + nslots, total_pairs))
            def _():
                issue_pair(gp)
                cursor_ref[0] = gp + 1

            slot = jax.lax.rem(base + i, nslots)
            p0 = 2 * i
            for which in (0, 1):
                pltpu.make_async_copy(
                    k_buf.at[slot, pl.ds(0, hkv)],
                    k_buf.at[slot, pl.ds(0, hkv)],
                    sem.at[which, slot, 0],
                ).wait()

            @pl.when(p0 + 1 < nblks)
            def _():
                for which in (0, 1):
                    pltpu.make_async_copy(
                        k_buf.at[slot, pl.ds(hkv, hkv)],
                        k_buf.at[slot, pl.ds(hkv, hkv)],
                        sem.at[which, slot, 1],
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
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_flat.dtype), v_flat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        m, l, acc = jax.lax.fori_loop(0, npairs, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        # tail-page patch + write-back, out of the hot loop (see v6)
        @pl.when(pend_ref[0] == 1)
        def _():
            pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
            pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()

        slot_last = jax.lax.rem(base + last // 2, nslots)
        half0 = jax.lax.rem(last, 2) * hkv
        off = jax.lax.rem(slot_ref[b], bs)
        row = jax.lax.broadcasted_iota(jnp.int32, (hkv, bs, d), 1)
        k_patch[...] = jnp.where(
            row == off,
            k_new_ref[0][:, None, :].astype(k_patch.dtype),
            k_buf[slot_last, pl.ds(half0, hkv)],
        )
        v_patch[...] = jnp.where(
            row == off,
            v_new_ref[0][:, None, :].astype(v_patch.dtype),
            v_buf[slot_last, pl.ds(half0, hkv)],
        )
        blk = block_tables_ref[b, last]
        pltpu.make_async_copy(k_patch, k_out.at[layer, blk], w_sem.at[0]).start()
        pltpu.make_async_copy(v_patch, v_out.at[layer, blk], w_sem.at[1]).start()
        pend_ref[0] = 1

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
def paged_decode_attention_write_v7_tpu(
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
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
    del split_override
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g
    nslots = nslots_override or 6  # pairs in flight (12 pages)
    nb = block_tables.shape[1]
    npair_cols = -(-nb // 2)

    pages = jax.lax.div(seq_lens + bs - 1, bs)
    pairs = jax.lax.div(pages + 1, 2)
    cum_pairs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pairs).astype(jnp.int32)]
    )
    seq_of_pair = jnp.searchsorted(
        cum_pairs[1:], jnp.arange(b * npair_cols, dtype=jnp.int32),
        side="right",
    ).astype(jnp.int32)

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
            pltpu.VMEM((nslots, 2 * hkv, bs, d), k_all.dtype),
            pltpu.VMEM((nslots, 2 * hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, nslots, 2)),
            pltpu.VMEM((hkv, bs, d), k_all.dtype),
            pltpu.VMEM((hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_v7, scale=scale, block_size=bs, window=window
    )
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={10: 1, 11: 2},
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
        cum_pairs,
        seq_of_pair,
        q,
        k_new,
        v_new,
        k_all,
        v_all,
    )
    return out, k_all, v_all

def _decode_kernel_v8(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, NB] int32 (tight columns)
    seq_lens_ref,  # [B] int32 (incl. current token)
    slot_ref,  # [B] int32 (current token's slot)
    cum_ref,  # [B+1] int32 cumulative page counts
    ccum_ref,  # [B+1] int32 cumulative CHUNK counts (pages grouped by C)
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
    k_buf,  # [NSLOTS, Hkv, bs, D] (NSLOTS multiple of C)
    v_buf,
    scores_ref,  # [Hkv*G, C*Hkv*bs] f32
    sem,  # DMA [2, NSLOTS, SPLIT]
    k_patch,
    v_patch,
    w_sem,  # DMA [2]
    pend_ref,  # SMEM [1]
    cursor_ref,  # SMEM [3]: (next global page, owning seq, its padded idx)
    *,
    scale: float,
    block_size: int,
    chunk: int,
    window: int = 0,
):
    """v8: v5's packed-head streaming + C-page flash chunks.

    The r5 floor probe (scripts/probe_r5_floor.py) measured the pure DMA
    stream of the full bench config at 140 us/layer while v5/v6 run ~205:
    ~65 us/layer of per-page softmax bookkeeping (max/exp rescale of the
    online-softmax state) sits on the critical path. v8 amortizes it: each
    flash iteration consumes a CHUNK of C pages —

      - per page, only the packed QK dot runs, writing raw scores into a
        [Hq, C*Hkv*bs] VMEM scratch;
      - the mask / max / exp / rescale / PV dot run ONCE per chunk over
        the whole scratch, with the chunk's V pages read as one
        [C*Hkv*bs, D] tile out of consecutive ring slots.

    Ring slots are addressed by PADDED page index (each sequence's pages
    rounded up to whole chunks, cumulative counts in ccum_ref) so a
    chunk's pages always occupy C consecutive slots with no mid-chunk
    wraparound. The DMA cursor walks real pages but targets padded
    indices; tail chunks simply leave their missing slots unissued and
    the combine masks those columns (kv_idx >= n_cached).
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
    total_pages = cum_ref[nprog]
    split = sem.shape[2]
    rows_dma = hkv // split
    nslots = k_buf.shape[0]
    bs = block_size
    cols = hkv * bs
    C = chunk

    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0
        cursor_ref[1] = 0
        cursor_ref[2] = 0

    def issue_at(gp, iseq, pd):
        j = gp - cum_ref[iseq]
        blk = block_tables_ref[iseq, j]
        slot = jax.lax.rem(pd, nslots)
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

    def drain_to_padded(tgt):
        """Issue pages while their PADDED index < tgt (and pages remain)."""

        def cond(c):
            gp, iseq, pd = c
            return (gp < total_pages) & (pd < tgt)

        def step(c):
            gp, iseq, pd = c
            issue_at(gp, iseq, pd)
            gp1 = gp + 1

            def adv_cond(s):
                return (s + 1 < nprog + 1) & (gp1 >= cum_ref[s + 1])

            iseq1 = jax.lax.while_loop(adv_cond, lambda s: s + 1, iseq)
            j1 = gp1 - cum_ref[iseq1]
            pd1 = (ccum_ref[iseq1] + j1 // C) * C + jax.lax.rem(j1, C)
            return (gp1, iseq1, pd1)

        gp, iseq, pd = jax.lax.while_loop(
            cond, step, (cursor_ref[0], cursor_ref[1], cursor_ref[2])
        )
        cursor_ref[0] = gp
        cursor_ref[1] = iseq
        cursor_ref[2] = pd

    def wait_page(slot):
        for si in range(split):
            for which in (0, 1):
                pltpu.make_async_copy(
                    k_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                    k_buf.at[slot, pl.ds(si * rows_dma, rows_dma)],
                    sem.at[which, slot, si],
                ).wait()

    # packed-head block-diagonal mask, tiled over the C pages (static)
    ccols = C * cols
    hc = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (rows_q, ccols), 1), cols
    ) // bs
    hr = jax.lax.broadcasted_iota(jnp.int32, (rows_q, ccols), 0) // g
    diag = hc == hr  # [rows_q, C*cols]
    # token index of each column within its chunk: page_in_chunk*bs + row
    off_in_chunk = (
        jax.lax.broadcasted_iota(jnp.int32, (rows_q, ccols), 1) // cols * bs
        + jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows_q, ccols), 1), bs
        )
    )

    @pl.when(seq_len > 0)
    def _():
        q = q_ref[0]  # [Hkv*G, D]
        k_new_p = jnp.repeat(k_new_ref[0], g, axis=0)  # [Hkv*G, D]
        v_new_p = jnp.repeat(v_new_ref[0], g, axis=0)
        m0 = (
            jnp.sum(q.astype(jnp.float32) * k_new_p.astype(jnp.float32),
                    axis=-1, keepdims=True) * scale
        )
        l0 = jnp.ones((rows_q, 1), jnp.float32)
        acc0 = v_new_p.astype(jnp.float32)

        base_c = ccum_ref[b]
        nchunks = pl.cdiv(nblks, C)

        def chunk_body(ci, carry):
            m, l, acc = carry
            pc = (base_c + ci) * C  # padded index of the chunk's page 0
            # one drain per chunk: everything in [pc, pc+nslots) in flight;
            # slots of the chunk's V pages can't be overwritten before the
            # combine reads them (an issue at pd would recycle pd-nslots)
            drain_to_padded(pc + nslots)
            for j in range(C):
                i = ci * C + j

                @pl.when(i < nblks)
                def _(i=i, j=j):
                    slot = jax.lax.rem(pc + j, nslots)
                    wait_page(slot)
                    k_flat = _mxu(k_buf[slot]).reshape(cols, d)
                    scores_ref[:, j * cols:(j + 1) * cols] = (
                        jax.lax.dot_general(
                            q, k_flat,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) * scale
                    )

                    # tail page: patch the new row, write back (deferred)
                    @pl.when(i == last)
                    def _():
                        @pl.when(pend_ref[0] == 1)
                        def _():
                            pltpu.make_async_copy(
                                k_patch, k_patch, w_sem.at[0]
                            ).wait()
                            pltpu.make_async_copy(
                                v_patch, v_patch, w_sem.at[1]
                            ).wait()

                        off = jax.lax.rem(slot_ref[b], bs)
                        row = jax.lax.broadcasted_iota(
                            jnp.int32, (hkv, bs, d), 1
                        )
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

            # combine the whole chunk (mask also kills unissued tail slots)
            kv_idx = ci * (C * bs) + off_in_chunk
            keep = diag & (kv_idx < n_cached)
            if window > 0:
                keep = keep & (kv_idx >= jnp.maximum(seq_len - window, 0))
            s = jnp.where(keep, scores_ref[...], _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            sg = jax.lax.rem(pc, nslots)

            def full_pv():
                # full chunk: C pages sit in consecutive slots -> ONE dot
                v_flat = _mxu(v_buf[pl.ds(sg, C)]).reshape(ccols, d)
                return jax.lax.dot_general(
                    p.astype(v_flat.dtype), v_flat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def tail_pv():
                # tail chunk: per-page dots, guarded — unissued slots hold
                # stale/NaN data whose p columns are 0, and 0 * NaN = NaN
                out = jnp.zeros((rows_q, d), jnp.float32)
                for j in range(C):
                    i = ci * C + j

                    def page_dot(j=j):
                        vj = _mxu(v_buf[jax.lax.rem(pc + j, nslots)])
                        return jax.lax.dot_general(
                            p[:, j * cols:(j + 1) * cols].astype(vj.dtype),
                            vj.reshape(cols, d),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )

                    out = out + jax.lax.cond(
                        i < nblks, page_dot,
                        lambda: jnp.zeros((rows_q, d), jnp.float32),
                    )
                return out

            pv = jax.lax.cond((ci + 1) * C <= nblks, full_pv, tail_pv)
            acc = acc * alpha + pv
            return m_new, l_new, acc

        m, l, acc = jax.lax.fori_loop(0, nchunks, chunk_body, (m0, l0, acc0))
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
                     "nslots_override", "chunk"),
)
def paged_decode_attention_write_v8_tpu(
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
    chunk: int = 4,
    cum: jnp.ndarray | None = None,  # [B+1] precomputed page cumsum
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g
    C = chunk
    nslots = nslots_override or 3 * C
    assert nslots % C == 0
    split = 2 if hkv % 2 == 0 else 1
    if split_override:
        assert hkv % split_override == 0
        split = split_override

    if cum is None:
        pages = jax.lax.div(seq_lens + bs - 1, bs)
        cum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(pages).astype(jnp.int32)]
        )
    # cumulative chunk counts (vectorized — no sequential device prep)
    pages_per = cum[1:] - cum[:-1]
    cchunks = jax.lax.div(pages_per + C - 1, C)
    ccum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cchunks).astype(jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
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
            pltpu.VMEM((hq, C * hkv * bs), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nslots, split)),
            pltpu.VMEM((hkv, bs, d), k_all.dtype),
            pltpu.VMEM((hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_v8, scale=scale, block_size=bs, window=window,
        chunk=C,
    )
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={9: 1, 10: 2},
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
        ccum,
        q,
        k_new,
        v_new,
        k_all,
        v_all,
    )
    return out, k_all, v_all

# ---------------------------------------------------------------------------
# v10 (r4 challenger, LOST its interleaved on-chip A/B): narrow
# per-(page, head) scores via dots batched over the tile's (page, head)
# axis — 8x fewer softmax elements than v9's packed-head layout, but the
# batched M=G(=2) dots lower to serial small MXU ops that cost more than
# the VPU work they save (medians 259 vs v9t4's 206 us/layer bf16,
# /tmp/ab_v10.log 2026-08-20). Kept env-gated (XLLM_DECODE_KERNEL=v10t4)
# as the documented negative result; oracle-tested in interpret mode.
# ---------------------------------------------------------------------------

def _decode_kernel_v10(
    # scalar prefetch
    layer_ref,
    block_tables_ref,
    seq_lens_ref,
    slot_ref,
    pages_ref,
    cum_tiles_ref,
    seq_of_tile_ref,
    # inputs
    q_ref,
    k_new_ref,
    v_new_ref,
    k_in,
    v_in,
    # outputs
    o_ref,
    k_out,
    v_out,
    # scratch
    k_buf,
    v_buf,
    sem,
    k_patch,
    v_patch,
    w_sem,
    pend_ref,
    cursor_ref,
    *,
    scale: float,
    block_size: int,
    tile: int,
    window: int = 0,
):
    """v10: v9's tile ring with NARROW per-(page, head) scores.

    v9's packed-head dot computes [Hq, T*Hkv*bs] scores of which only
    the block diagonal — [Hq, T*bs], one kv head's columns per query
    row — is useful; the masks/exp/rescale still run over ALL 8x
    elements, and the r4 reconciliation shows that VPU work (not DMA)
    is what holds the kernel at ~209 us/layer vs the 140 us DMA floor.
    v10 computes ONLY the useful scores with dots batched over the
    (page, kv-head) axis of the tile buffer:

        s[(p,h), g, tok] = q[h, g, :] . k_buf[(p,h), tok, :]

    so the softmax stream is [T*Hkv, G, bs] (= Hq x T*bs useful
    elements, 4096/tile at the bench shape) instead of [Hq, T*Hkv*bs]
    (32768). No diagonal bias is needed at all — the head pairing is
    structural. The online-softmax state stays per query row ([Hq, 1]);
    tile maxima/sums reduce over the page axis first. DMA issue logic,
    ring, and tail patch are identical to v9.
    """
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

    @pl.when(b == 0)
    def _():
        pend_ref[0] = 0
        cursor_ref[0] = 0
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

    def prologue_cond(gt):
        return gt < jnp.minimum(base + nslots, total_tiles)

    gt0 = jax.lax.while_loop(
        prologue_cond,
        lambda gt: (issue_tile(gt), gt + 1)[1],
        cursor_ref[0],
    )
    cursor_ref[0] = gt0

    # token offset of each narrow-score element within the tile:
    # batch axis is (page, head) -> page = idx0 // hkv
    pg_of = jax.lax.broadcasted_iota(
        jnp.int32, (T * hkv, g, bs), 0
    ) // hkv
    tok_of = jax.lax.broadcasted_iota(jnp.int32, (T * hkv, g, bs), 2)
    col_off = pg_of * bs + tok_of

    @pl.when(seq_len > 0)
    def _():
        q = q_ref[0]  # [Hkv*G, D]
        # batched-q: batch element (p, h) uses head h's G query rows
        q_b = jnp.tile(q.reshape(hkv, g, d), (T, 1, 1))  # [T*Hkv, G, D]
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

            k_tile = _mxu(k_buf[slot])  # [T*Hkv, bs, D]
            v_tile = _mxu(v_buf[slot])
            # narrow scores: ONLY the useful (page, head) pairs
            s = jax.lax.dot_general(
                _mxu(q_b), k_tile,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [T*Hkv, G, bs]
            limit = n_cached - p0 * bs
            s = jnp.where(col_off < limit, s, _NEG_INF)
            if window > 0:
                lo_lim = win_lo - p0 * bs
                s = jnp.where(col_off >= lo_lim, s, _NEG_INF)

            # reduce the page axis first: [T, Hq, bs] view is a free
            # reshape of the (p, h, g, tok) layout
            s_rows = s.reshape(T, rows_q, bs)
            m_tile = jnp.max(jnp.max(s_rows, axis=0), axis=-1,
                             keepdims=True)  # [Hq, 1]
            m_new = jnp.maximum(m, m_tile)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s_rows - m_new[None])  # [T, Hq, bs]
            l_new = l * alpha + jnp.sum(
                jnp.sum(p, axis=0), axis=-1, keepdims=True
            )
            pv_b = jax.lax.dot_general(
                p.reshape(T * hkv, g, bs).astype(v_tile.dtype), v_tile,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [T*Hkv, G, D]
            pv = jnp.sum(pv_b.reshape(T, rows_q, d), axis=0)
            return m_new, l_new, acc * alpha + pv

        m, l, acc = jax.lax.fori_loop(0, ntiles, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        @pl.when(pend_ref[0] == 1)
        def _():
            pltpu.make_async_copy(k_patch, k_patch, w_sem.at[0]).wait()
            pltpu.make_async_copy(v_patch, v_patch, w_sem.at[1]).wait()

        slot_last = jax.lax.rem(base + last // T, nslots)
        half0 = jax.lax.rem(last, T) * hkv
        off = jax.lax.rem(slot_ref[b], bs)
        row = jax.lax.broadcasted_iota(jnp.int32, (hkv, bs, d), 1)
        k_patch[...] = jnp.where(
            row == off,
            k_new_ref[0][:, None, :].astype(k_patch.dtype),
            k_buf[slot_last, pl.ds(half0, hkv)],
        )
        v_patch[...] = jnp.where(
            row == off,
            v_new_ref[0][:, None, :].astype(v_patch.dtype),
            v_buf[slot_last, pl.ds(half0, hkv)],
        )
        blk = block_tables_ref[b, last]
        pltpu.make_async_copy(k_patch, k_out.at[layer, blk], w_sem.at[0]).start()
        pltpu.make_async_copy(v_patch, v_out.at[layer, blk], w_sem.at[1]).start()
        pend_ref[0] = 1

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
                     "nslots_override", "tile"),
)
def paged_decode_attention_write_v10_tpu(
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
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """v10 challenger: narrow per-(page, head) scores (see _decode_kernel_v10).

    -> (out [B, Hq, D], k_all, v_all) — caches updated in place."""
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
        _decode_kernel_v10, scale=scale, block_size=bs, window=window,
        tile=T,
    )
    out, k_all, v_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={10: 1, 11: 2},
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
        k_all,
        v_all,
    )
    return out, k_all, v_all
