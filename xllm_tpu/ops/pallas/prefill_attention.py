"""Pallas paged-attention prefill kernel (flash attention over paged KV).

TPU-native counterpart of the reference's batch_prefill / flash-attention
kernels (reference xllm/core/kernels/cuda/batch_prefill.cpp:24-40, mlu
flash_attention wrappers). One sequence's prompt chunk attends causally to
its full paged KV (earlier chunks included — chunked prefill).

Design:
- grid = (S / TQ,): each program owns a [Hq, TQ, D] query tile (ALL heads)
  and streams the sequence's KV pages from HBM with an N-deep DMA pipeline.
  A page fetch is ONE contiguous [Hkv, bs, D] DMA shared by every query
  head — GQA costs no extra bandwidth.
- The causal frontier bounds the walk: query tile t needs KV positions
  <= q_offset + (t+1)*TQ - 1 only, so trailing pages are never fetched.
- Per page and kv head, the G grouped query rows fold into one
  [G*TQ, D] x [D, bs] MXU matmul; online softmax state is fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_NSLOTS = 4


def _mxu(x):
    """Quantized cache tiles upcast to bf16 for the MXU (fp8 or int8 KV;
    int8 scales fold outside the kernel — see decode_attention._mxu)."""
    if x.dtype in (jnp.float8_e4m3fn, jnp.int8):
        return x.astype(jnp.bfloat16)
    return x


def _prefill_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_table_ref,  # [NBmax] int32
    q_offset_ref,  # [1] int32
    kv_len_ref,  # [1] int32
    # inputs
    q_ref,  # [Hq, TQ, D] VMEM
    k_hbm,  # [L, NB, Hkv, bs, D] ANY
    v_hbm,
    # outputs
    o_ref,  # [Hq, TQ, D] VMEM
    # scratch
    k_buf,  # [NSLOTS, Hkv, bs, D]
    v_buf,
    sem,  # [2, NSLOTS]
    *,
    scale: float,
    block_size: int,
    group: int,
    window: int = 0,
):
    t = pl.program_id(0)
    layer = layer_ref[0]
    q_offset = q_offset_ref[0]
    kv_len = kv_len_ref[0]
    hq, tq, d = q_ref.shape
    hkv = hq // group

    # this tile's rows cover absolute positions [q_offset + t*TQ, ... + TQ)
    tile_last_pos = q_offset + (t + 1) * tq - 1
    kv_limit = jnp.minimum(kv_len, tile_last_pos + 1)
    nblks = pl.cdiv(kv_limit, block_size)

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[layer, block_table_ref[i]], k_buf.at[slot], sem.at[0, slot]
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[layer, block_table_ref[i]], v_buf.at[slot], sem.at[1, slot]
        )

    @pl.when(nblks > 0)
    def _():
        for s in range(_NSLOTS - 1):

            @pl.when(s < nblks)
            def _(s=s):
                k_dma(s, s).start()
                v_dma(s, s).start()

        # [Hkv, G*TQ, D]: kv head h's group rows, G-major then TQ
        q = q_ref[...].reshape(hkv, group * tq, d)
        # absolute position of each (g, tq) row: q_offset + t*TQ + (row % TQ)
        row_pos = (
            q_offset
            + t * tq
            + jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (group * tq, block_size), 0),
                tq,
            )
        )  # [G*TQ, bs]
        # loop-invariant column iota hoisted out of the page walk: Mosaic
        # does not LICM vector materializations out of fori_loop bodies,
        # so building it per page re-spent VPU cycles nblks times
        col_iota = jax.lax.broadcasted_iota(
            jnp.int32, (group * tq, block_size), 1
        )

        def body(i, carry):
            m, l, acc = carry  # [Hkv, G*TQ, 1] x2, [Hkv, G*TQ, D]
            slot = jax.lax.rem(i, _NSLOTS)
            nxt = i + _NSLOTS - 1

            @pl.when(nxt < nblks)
            def _():
                k_dma(jax.lax.rem(nxt, _NSLOTS), nxt).start()
                v_dma(jax.lax.rem(nxt, _NSLOTS), nxt).start()

            k_dma(slot, i).wait()
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
            s = jnp.stack(s_parts, axis=0) * scale  # [Hkv, G*TQ, bs]
            kv_idx = i * block_size + col_iota
            mask = (kv_idx <= row_pos) & (kv_idx < kv_len)
            if window > 0:
                mask = mask & (kv_idx > row_pos - window)
            s = jnp.where(mask[None], s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

            v_dma(slot, i).wait()
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
            pv = jnp.stack(pv_parts, axis=0)
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((hkv, group * tq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((hkv, group * tq, 1), jnp.float32)
        acc0 = jnp.zeros((hkv, group * tq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        out = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        o_ref[...] = out.reshape(hq, tq, d)

    @pl.when(nblks == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)


def _batched_prefill_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [P, NBmax] int32
    q_offsets_ref,  # [P] int32
    kv_lens_ref,  # [P] int32
    # inputs
    q_ref,  # [1, Hq, TQ, D] VMEM (this row's query tile)
    k_hbm,  # [L, NB, Hkv, bs, D] ANY
    v_hbm,
    # outputs
    o_ref,  # [1, Hq, TQ, D] VMEM
    # scratch
    k_buf,  # [NSLOTS, Hkv, bs, D]
    v_buf,
    sem,  # [2, NSLOTS]
    *,
    scale: float,
    block_size: int,
    group: int,
    window: int = 0,
):
    """Multi-chunk variant of _prefill_kernel: grid (P, S // TQ).

    Counterpart of the reference's whole-batch BatchInputBuilder semantics
    (reference xllm/core/framework/batch/batch_input_builder.h:53): P prompt
    chunks from P different sequences run in ONE dispatch. Each grid step
    owns one query tile of one chunk; rows with kv_len == 0 are padding.
    """
    p, t = pl.program_id(0), pl.program_id(1)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    kv_len = kv_lens_ref[p]
    hq, tq, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    hkv = hq // group

    tile_last_pos = q_offset + (t + 1) * tq - 1
    kv_limit = jnp.minimum(kv_len, tile_last_pos + 1)
    nblks = pl.cdiv(kv_limit, block_size)

    split = sem.shape[2]
    rows = hkv // split

    def _dmas(arr, buf, which, slot, i, bt_blk):
        return [
            pltpu.make_async_copy(
                arr.at[layer, bt_blk, pl.ds(si * rows, rows)],
                buf.at[slot, pl.ds(si * rows, rows)],
                sem.at[which, slot, si],
            )
            for si in range(split)
        ]

    def k_dma(slot, i):
        return _dmas(k_hbm, k_buf, 0, slot, i, block_tables_ref[p, i])

    def v_dma(slot, i):
        return _dmas(v_hbm, v_buf, 1, slot, i, block_tables_ref[p, i])

    @pl.when(nblks > 0)
    def _():
        for s in range(_NSLOTS - 1):

            @pl.when(s < nblks)
            def _(s=s):
                for c in k_dma(s, s) + v_dma(s, s):
                    c.start()

        q = q_ref[0].reshape(hkv, group * tq, d)
        row_pos = (
            q_offset
            + t * tq
            + jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (group * tq, block_size), 0),
                tq,
            )
        )
        # hoisted out of the page walk (see _prefill_kernel)
        col_iota = jax.lax.broadcasted_iota(
            jnp.int32, (group * tq, block_size), 1
        )

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, _NSLOTS)
            nxt = i + _NSLOTS - 1

            @pl.when(nxt < nblks)
            def _():
                for c in k_dma(jax.lax.rem(nxt, _NSLOTS), nxt) + v_dma(
                    jax.lax.rem(nxt, _NSLOTS), nxt
                ):
                    c.start()

            for c in k_dma(slot, i):
                c.wait()
            s = jax.lax.dot_general(
                q,
                _mxu(k_buf[slot]),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [Hkv, G*TQ, bs]
            kv_idx = i * block_size + col_iota
            mask = (kv_idx <= row_pos) & (kv_idx < kv_len)
            if window > 0:
                mask = mask & (kv_idx > row_pos - window)
            s = jnp.where(mask[None], s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p_ = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)

            for c in v_dma(slot, i):
                c.wait()
            pv = jax.lax.dot_general(
                p_.astype(_mxu(v_buf[slot]).dtype),
                _mxu(v_buf[slot]),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((hkv, group * tq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((hkv, group * tq, 1), jnp.float32)
        acc0 = jnp.zeros((hkv, group * tq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        out = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        o_ref[0] = out.reshape(hq, tq, d)

    @pl.when(nblks == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "window"))
def paged_attention_prefill_batched_tpu(
    q: jnp.ndarray,  # [P, S, Hq, D]
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    block_tables: jnp.ndarray,  # [P, NBmax] int32
    q_offsets: jnp.ndarray,  # [P] int32
    kv_lens: jnp.ndarray,  # [P] int32 (0 = padded row)
    scale: float,
    interpret: bool = False,
    window: int = 0,
) -> jnp.ndarray:
    """P prompt chunks (each from its own sequence) in one dispatch."""
    p, s, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    tq = _pick_q_tile(s, hq)

    qt = q.transpose(0, 2, 1, 3)  # [P, Hq, S, D]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p, s // tq),
        in_specs=[
            pl.BlockSpec(
                (1, hq, tq, d),
                lambda pi, t, *_: (pi, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hq, tq, d),
            lambda pi, t, *_: (pi, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, hkv, bs, d), k_all.dtype),
            pltpu.VMEM((_NSLOTS, hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA(
                (2, _NSLOTS, 4 if hkv % 4 == 0 else (2 if hkv % 2 == 0 else 1))
            ),
        ],
    )
    kernel = functools.partial(
        _batched_prefill_kernel, scale=scale, block_size=bs, group=g,
        window=window,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, hq, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        kv_lens,
        qt,
        k_all,
        v_all,
    )
    return out.transpose(0, 2, 1, 3)


def _pick_q_tile(s: int, hq: int) -> int:
    # The VMEM footprint scales with Hq*TQ (q/out windows, fp32
    # accumulators, score temporaries): Hq*TQ = 2048 measured ~11 MB of
    # the 16 MB scoped budget; Hq=32 with TQ=128 OOMs the Mosaic stack
    # (17.6 MB — the r3 8B bench failure), so the tile shrinks as the
    # head count grows.
    tq = 128
    while tq > 8 and (hq * tq > 2048 or s % tq != 0):
        tq //= 2
    return tq if s % tq == 0 else s


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "window"))
def paged_attention_prefill_tpu(
    q: jnp.ndarray,  # [S, Hq, D]
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    block_table: jnp.ndarray,  # [NBmax] int32
    q_offset: jnp.ndarray,  # [] int32
    kv_len: jnp.ndarray,  # [] int32
    scale: float,
    interpret: bool = False,
    window: int = 0,
) -> jnp.ndarray:
    s, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    tq = _pick_q_tile(s, hq)

    # head-major [Hq, S, D]; rows of head h*g+j are kv head h, group slot j,
    # so q_t.reshape(hkv, g*tq, d) groups each kv head's G query rows.
    qt = q.transpose(1, 0, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(s // tq,),
        in_specs=[
            pl.BlockSpec(
                (hq, tq, d), lambda t, *_: (0, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (hq, tq, d), lambda t, *_: (0, t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, hkv, bs, d), k_all.dtype),
            pltpu.VMEM((_NSLOTS, hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, _NSLOTS)),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel, scale=scale, block_size=bs, group=g, window=window
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hq, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_table,
        q_offset.reshape(1),
        kv_len.reshape(1),
        qt,
        k_all,
        v_all,
    )
    return out.transpose(1, 0, 2)


def _batched_prefill_ilv_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [P, NBmax] int32
    q_offsets_ref,  # [P] int32
    kv_lens_ref,  # [P] int32
    # inputs
    q_ref,  # [1, Hq, TQ, D] VMEM (this row's query tile)
    kv_hbm,  # [L, NB, 2, Hkv, bs, D] ANY (interleaved layout)
    # outputs
    o_ref,  # [1, Hq, TQ, D] VMEM
    # scratch
    kv_buf,  # [NSLOTS, 2, Hkv, bs, D]
    sem,  # [NSLOTS]
    win_buf,  # [2, Hkv, bs, D] rm tail page (token-major content)
    w_sem,  # [1]
    *,
    scale: float,
    block_size: int,
    group: int,
    window: int = 0,
    rowmajor_tail: bool = False,
):
    """Interleaved-layout variant of _batched_prefill_kernel: a page's K
    and V arrive in ONE [2, Hkv, bs, D] DMA (half the issue count of the
    split layout), landing K-contiguous at kv_buf[slot, 0] and
    V-contiguous at kv_buf[slot, 1]; the flash math is unchanged.

    rowmajor_tail (kv_layout=interleaved_rm): the sequence's final
    INCOMPLETE page stores token-major content (row w = token's
    [2*Hkv, D] block — see decode _decode_kernel_v12); that one page is
    attended with a 2x-wide masked dot over its flat content, the PV
    operand being jnp.roll(p, Hkv) (K-probabilities shift onto V rows)."""
    p, t = pl.program_id(0), pl.program_id(1)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    kv_len = kv_lens_ref[p]
    hq, tq, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    hkv = hq // group

    tile_last_pos = q_offset + (t + 1) * tq - 1
    kv_limit = jnp.minimum(kv_len, tile_last_pos + 1)
    nblks = pl.cdiv(kv_limit, block_size)
    if rowmajor_tail:
        # the sequence's final page is token-major content when partial;
        # it leaves the canonical ring and is attended ONCE after the
        # page walk (a per-iteration branch measured -25% prefill)
        last_pg = kv_len // block_size
        has_tail = (
            (jax.lax.rem(kv_len, block_size) != 0)
            & (last_pg * block_size < kv_limit)
        )
        nblks_can = nblks - jnp.where(has_tail, 1, 0)
    else:
        has_tail = False
        nblks_can = nblks

    def kv_dma(slot, i):
        return pltpu.make_async_copy(
            kv_hbm.at[layer, block_tables_ref[p, i]],
            kv_buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nblks > 0)
    def _():
        if rowmajor_tail:
            # the tail read prefetches alongside the canonical walk
            @pl.when(has_tail)
            def _():
                pltpu.make_async_copy(
                    kv_hbm.at[layer, block_tables_ref[p, last_pg]],
                    win_buf,
                    w_sem.at[0],
                ).start()

        for s in range(_NSLOTS - 1):

            @pl.when(s < nblks_can)
            def _(s=s):
                kv_dma(s, s).start()

        q = q_ref[0].reshape(hkv, group * tq, d)
        row_pos = (
            q_offset
            + t * tq
            + jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (group * tq, block_size), 0),
                tq,
            )
        )
        # hoisted out of the page walk (see _prefill_kernel)
        col_iota = jax.lax.broadcasted_iota(
            jnp.int32, (group * tq, block_size), 1
        )

        hkv_ = hkv
        two_h = 2 * hkv_
        bs_ = block_size

        def canonical_block(i, m, l, acc, slot, k_op=None, v_op=None):
            k_op = _mxu(kv_buf[slot, 0]) if k_op is None else k_op
            v_op = _mxu(kv_buf[slot, 1]) if v_op is None else v_op
            s = jax.lax.dot_general(
                q,
                k_op,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [Hkv, G*TQ, bs]
            kv_idx = i * block_size + col_iota
            mask = (kv_idx <= row_pos) & (kv_idx < kv_len)
            if window > 0:
                mask = mask & (kv_idx > row_pos - window)
            s = jnp.where(mask[None], s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p_ = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p_, axis=-1, keepdims=True)

            pv = jax.lax.dot_general(
                p_.astype(v_op.dtype),
                v_op,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, _NSLOTS)
            nxt = i + _NSLOTS - 1

            @pl.when(nxt < nblks_can)
            def _():
                kv_dma(jax.lax.rem(nxt, _NSLOTS), nxt).start()

            pltpu.make_async_copy(
                kv_buf.at[slot], kv_buf.at[slot], sem.at[slot]
            ).wait()
            return canonical_block(i, m, l, acc, slot)

        m0 = jnp.full((hkv, group * tq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((hkv, group * tq, 1), jnp.float32)
        acc0 = jnp.zeros((hkv, group * tq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks_can, body, (m0, l0, acc0))

        if rowmajor_tail:

            def tail_block(carry):
                m, l, acc = carry
                pltpu.make_async_copy(win_buf, win_buf, w_sem.at[0]).wait()
                # token-major content -> canonical operands in VMEM (one
                # [bs, 2Hkv, D] transpose of the single tail page; the
                # canonical flash math then applies unchanged)
                cont = _mxu(win_buf[...]).reshape(bs_, two_h, d)
                k_op = jnp.swapaxes(cont[:, :hkv_, :], 0, 1)
                v_op = jnp.swapaxes(cont[:, hkv_:, :], 0, 1)
                return canonical_block(
                    last_pg, m, l, acc, 0, k_op=k_op, v_op=v_op
                )

            m, l, acc = jax.lax.cond(
                has_tail, tail_block, lambda c: c, (m, l, acc)
            )

        out = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        o_ref[0] = out.reshape(hq, tq, d)

    @pl.when(nblks == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "window",
                                              "rowmajor_tail"))
def paged_attention_prefill_batched_ilv_tpu(
    q: jnp.ndarray,  # [P, S, Hq, D]
    kv_all: jnp.ndarray,  # [L, NB, 2, Hkv, bs, D] (interleaved layout)
    layer_idx: jnp.ndarray,  # [] int32
    block_tables: jnp.ndarray,  # [P, NBmax] int32
    q_offsets: jnp.ndarray,  # [P] int32
    kv_lens: jnp.ndarray,  # [P] int32 (0 = padded row)
    scale: float,
    interpret: bool = False,
    window: int = 0,
    rowmajor_tail: bool = False,
) -> jnp.ndarray:
    """P prompt chunks over the interleaved cache in one dispatch."""
    p, s, hq, d = q.shape
    _, _, two, hkv, bs, _ = kv_all.shape
    assert two == 2
    g = hq // hkv
    tq = _pick_q_tile(s, hq)

    qt = q.transpose(0, 2, 1, 3)  # [P, Hq, S, D]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p, s // tq),
        in_specs=[
            pl.BlockSpec(
                (1, hq, tq, d),
                lambda pi, t, *_: (pi, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hq, tq, d),
            lambda pi, t, *_: (pi, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, 2, hkv, bs, d), kv_all.dtype),
            pltpu.SemaphoreType.DMA((_NSLOTS,)),
            pltpu.VMEM((2, hkv, bs, d), kv_all.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    kernel = functools.partial(
        _batched_prefill_ilv_kernel, scale=scale, block_size=bs, group=g,
        window=window, rowmajor_tail=rowmajor_tail,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, hq, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        kv_lens,
        qt,
        kv_all,
    )
    return out.transpose(0, 2, 1, 3)
