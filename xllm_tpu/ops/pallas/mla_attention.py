"""Pallas MLA (latent) paged-attention kernels — decode and prefill.

TPU-native counterpart of the reference's MLA fused ops
(reference xllm/core/kernels/ops_api.h MLA section, deepseek v2/v3 decoder
layers). The absorbed form makes MLA an MQA over one shared latent head
(Dk = kv_lora_rank + rope dims), so K and V SHARE pages: one page DMA
feeds both the score matmul (full Dk) and the value combine (first dv
lanes) — half the HBM traffic of a split-cache layout.

Decode additionally merges the new token's latent row into its page
read-modify-write style and writes the page back (aliased cache, same
scheme as decode_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mxu(x):
    """fp8 latent tiles upcast to bf16 for the MXU (quantized KV,
    reference kv_cache_impl.h:29 quantized variants); matmuls in fp8
    would quantize softmax probabilities and Mosaic won't lower the
    mixed-dtype dot."""
    return x.astype(jnp.bfloat16) if x.dtype == jnp.float8_e4m3fn else x

_NEG_INF = -1e30
_NSLOTS = 4


def _mla_decode_kernel(
    # scalar prefetch
    layer_ref,
    block_tables_ref,  # [B, NBmax]
    seq_lens_ref,  # [B] incl. current token
    slot_ref,  # [B]
    # inputs
    q_ref,  # [1, H, Dk] VMEM
    lat_new_ref,  # [1, 1, Dk] VMEM (new latent row)
    c_in,  # [L, NB, 1, bs, Dk] ANY (aliased)
    # outputs
    o_ref,  # [1, H, dv] VMEM
    c_out,  # aliased
    # scratch
    buf,  # [NSLOTS, bs, Dk] VMEM
    sem,  # [NSLOTS]
    w_sem,  # [1]
    *,
    scale: float,
    block_size: int,
    dv: int,
):
    del c_in
    b = pl.program_id(0)
    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    h, dk = q_ref.shape[1], q_ref.shape[2]

    def page_dma(slot, i):
        return pltpu.make_async_copy(
            c_out.at[layer, block_tables_ref[b, i], 0], buf.at[slot], sem.at[slot]
        )

    @pl.when(seq_len > 0)
    def _():
        off = jax.lax.rem(slot_ref[b], block_size)
        last = nblks - 1
        for s in range(_NSLOTS - 1):

            @pl.when(s < nblks)
            def _(s=s):
                page_dma(s, s).start()

        q = q_ref[0]  # [H, Dk]

        # hoisted out of the page walk (see prefill_attention)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (h, block_size), 1)
        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, _NSLOTS)
            nxt = i + _NSLOTS - 1

            @pl.when(nxt < nblks)
            def _():
                page_dma(jax.lax.rem(nxt, _NSLOTS), nxt).start()

            page_dma(slot, i).wait()

            @pl.when(i == last)
            def _():
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (block_size, dk), 0
                )
                buf[slot] = jnp.where(
                    row == off, lat_new_ref[0].astype(buf.dtype), buf[slot]
                )

            b = _mxu(buf[slot])
            s_ = jax.lax.dot_general(
                q,
                b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [H, bs]
            kv_idx = i * block_size + col_iota
            s_ = jnp.where(kv_idx < seq_len, s_, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s_, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s_ - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(b.dtype),
                b[:, :dv],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, dv]
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((h, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((h, 1), jnp.float32)
        acc0 = jnp.zeros((h, dv), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        last_slot = jax.lax.rem(last, _NSLOTS)
        wb = pltpu.make_async_copy(
            buf.at[last_slot],
            c_out.at[layer, block_tables_ref[b, last], 0],
            w_sem.at[0],
        )
        wb.start()
        wb.wait()

    @pl.when(seq_len == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])


@functools.partial(jax.jit, static_argnames=("scale", "dv", "interpret"))
def mla_decode_attention_write_tpu(
    q_eff: jnp.ndarray,  # [B, H, Dk]
    lat_new: jnp.ndarray,  # [B, Dk]
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # [B]
    block_tables: jnp.ndarray,  # [B, NBmax]
    seq_lens: jnp.ndarray,  # [B] incl. current token
    scale: float,
    dv: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b, h, dk = q_eff.shape
    bs = cache.shape[3]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h, dk), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, dk), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, h, dv), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, bs, dk), cache.dtype),
            pltpu.SemaphoreType.DMA((_NSLOTS,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    kernel = functools.partial(
        _mla_decode_kernel, scale=scale, block_size=bs, dv=dv
    )
    # inputs: 4 scalars, q=4, lat_new=5, cache=6 -> outputs o=0, cache=1
    out, cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, dv), q_eff.dtype),
            jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        ],
        input_output_aliases={6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        seq_lens,
        slot_mapping,
        q_eff,
        lat_new.reshape(b, 1, dk),
        cache,
    )
    return out, cache


def _mla_prefill_kernel(
    # scalar prefetch
    layer_ref,
    block_table_ref,
    q_offset_ref,
    kv_len_ref,
    # inputs
    q_ref,  # [HG, TQ, Dk] VMEM
    c_hbm,  # ANY
    # outputs
    o_ref,  # [HG, TQ, dv]
    # scratch
    buf,  # [NSLOTS, bs, Dk]
    sem,
    *,
    scale: float,
    block_size: int,
    dv: int,
):
    t = pl.program_id(1)
    layer = layer_ref[0]
    q_offset = q_offset_ref[0]
    kv_len = kv_len_ref[0]
    hg, tq, dk = q_ref.shape

    tile_last_pos = q_offset + (t + 1) * tq - 1
    kv_limit = jnp.minimum(kv_len, tile_last_pos + 1)
    nblks = pl.cdiv(kv_limit, block_size)

    def page_dma(slot, i):
        return pltpu.make_async_copy(
            c_hbm.at[layer, block_table_ref[i], 0], buf.at[slot], sem.at[slot]
        )

    @pl.when(nblks > 0)
    def _():
        for s in range(_NSLOTS - 1):

            @pl.when(s < nblks)
            def _(s=s):
                page_dma(s, s).start()

        q = q_ref[...].reshape(hg * tq, dk)
        row_pos = (
            q_offset
            + t * tq
            + jax.lax.rem(
                jax.lax.broadcasted_iota(
                    jnp.int32, (hg * tq, block_size), 0
                ),
                tq,
            )
        )

        # hoisted out of the page walk (see prefill_attention)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (hg * tq, block_size), 1)
        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, _NSLOTS)
            nxt = i + _NSLOTS - 1

            @pl.when(nxt < nblks)
            def _():
                page_dma(jax.lax.rem(nxt, _NSLOTS), nxt).start()

            page_dma(slot, i).wait()
            b = _mxu(buf[slot])
            s_ = jax.lax.dot_general(
                q,
                b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [HG*TQ, bs]
            kv_idx = i * block_size + col_iota
            mask = (kv_idx <= row_pos) & (kv_idx < kv_len)
            s_ = jnp.where(mask, s_, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s_, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s_ - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(b.dtype),
                b[:, :dv],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((hg * tq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((hg * tq, 1), jnp.float32)
        acc0 = jnp.zeros((hg * tq, dv), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype).reshape(
            hg, tq, dv
        )

    @pl.when(nblks == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)


def _mla_tiles(h: int, s: int, dk: int) -> tuple[int, int]:
    """(head-chunk, q-tile) under a ~2MB q-tile VMEM budget."""
    for tq in (128, 64, 32, 16, 8):
        if s % tq:
            continue
        hg = h
        while hg > 1 and hg * tq * dk * 2 > 2 * 1024 * 1024:
            hg //= 2
        if h % hg == 0:
            return hg, tq
    return 1, s


@functools.partial(jax.jit, static_argnames=("scale", "dv", "interpret"))
def mla_prefill_attention_tpu(
    q_eff: jnp.ndarray,  # [S, H, Dk]
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    block_table: jnp.ndarray,
    q_offset: jnp.ndarray,
    kv_len: jnp.ndarray,
    scale: float,
    dv: int,
    interpret: bool = False,
) -> jnp.ndarray:
    s, h, dk = q_eff.shape
    bs = cache.shape[3]
    hg, tq = _mla_tiles(h, s, dk)
    qt = q_eff.transpose(1, 0, 2)  # [H, S, Dk]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(h // hg, s // tq),
        in_specs=[
            pl.BlockSpec(
                (hg, tq, dk),
                lambda g, t, *_: (g, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (hg, tq, dv), lambda g, t, *_: (g, t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, bs, dk), cache.dtype),
            pltpu.SemaphoreType.DMA((_NSLOTS,)),
        ],
    )
    kernel = functools.partial(
        _mla_prefill_kernel, scale=scale, block_size=bs, dv=dv
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, s, dv), q_eff.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_table,
        q_offset.reshape(1),
        kv_len.reshape(1),
        qt,
        cache,
    )
    return out.transpose(1, 0, 2)


def _mla_prefill_batched_kernel(
    # scalar prefetch
    layer_ref,
    block_tables_ref,  # [P, NBmax]
    q_offsets_ref,  # [P]
    kv_lens_ref,  # [P]
    # inputs
    q_ref,  # [1, HG, TQ, Dk] VMEM
    c_hbm,  # ANY
    # outputs
    o_ref,  # [1, HG, TQ, dv]
    # scratch
    buf,  # [NSLOTS, bs, Dk]
    sem,  # [NSLOTS, SPLIT]
    *,
    scale: float,
    block_size: int,
    dv: int,
):
    """Multi-chunk MLA prefill: grid (P, H//HG, S//TQ) — the latent-cache
    twin of the dense batched kernel (one dispatch for the whole prefill
    group; reference batch_input_builder.h:53). Page fetches are 4-way
    split sub-copies (single-stream DMA caps ~250 GB/s on v5e,
    scripts/probe_streams.py)."""
    p, t = pl.program_id(0), pl.program_id(2)
    layer = layer_ref[0]
    q_offset = q_offsets_ref[p]
    kv_len = kv_lens_ref[p]
    hg, tq, dk = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    split = sem.shape[1]
    rows = block_size // split

    tile_last_pos = q_offset + (t + 1) * tq - 1
    kv_limit = jnp.minimum(kv_len, tile_last_pos + 1)
    nblks = pl.cdiv(kv_limit, block_size)

    def page_dmas(slot, i):
        blk = block_tables_ref[p, i]
        return [
            pltpu.make_async_copy(
                c_hbm.at[layer, blk, 0, pl.ds(si * rows, rows)],
                buf.at[slot, pl.ds(si * rows, rows)],
                sem.at[slot, si],
            )
            for si in range(split)
        ]

    @pl.when(nblks > 0)
    def _():
        for s in range(_NSLOTS - 1):

            @pl.when(s < nblks)
            def _(s=s):
                for c in page_dmas(s, s):
                    c.start()

        q = q_ref[0].reshape(hg * tq, dk)
        row_pos = (
            q_offset
            + t * tq
            + jax.lax.rem(
                jax.lax.broadcasted_iota(
                    jnp.int32, (hg * tq, block_size), 0
                ),
                tq,
            )
        )

        # hoisted out of the page walk (see prefill_attention)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (hg * tq, block_size), 1)
        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, _NSLOTS)
            nxt = i + _NSLOTS - 1

            @pl.when(nxt < nblks)
            def _():
                for c in page_dmas(jax.lax.rem(nxt, _NSLOTS), nxt):
                    c.start()

            for c in page_dmas(slot, i):
                c.wait()
            b = _mxu(buf[slot])
            s_ = jax.lax.dot_general(
                q,
                b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            kv_idx = i * block_size + col_iota
            mask = (kv_idx <= row_pos) & (kv_idx < kv_len)
            s_ = jnp.where(mask, s_, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s_, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            pr = jnp.exp(s_ - m_new)
            l_new = l * alpha + jnp.sum(pr, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                pr.astype(b.dtype),
                b[:, :dv],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((hg * tq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((hg * tq, 1), jnp.float32)
        acc0 = jnp.zeros((hg * tq, dv), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype).reshape(
            hg, tq, dv
        )

    @pl.when(nblks == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])


@functools.partial(jax.jit, static_argnames=("scale", "dv", "interpret"))
def mla_prefill_attention_batched_tpu(
    q_eff: jnp.ndarray,  # [P, S, H, Dk]
    cache: jnp.ndarray,  # [L, NB, 1, bs, Dk]
    layer_idx: jnp.ndarray,
    block_tables: jnp.ndarray,  # [P, NBmax]
    q_offsets: jnp.ndarray,  # [P]
    kv_lens: jnp.ndarray,  # [P] (0 = padded row)
    scale: float,
    dv: int,
    interpret: bool = False,
) -> jnp.ndarray:
    p, s, h, dk = q_eff.shape
    bs = cache.shape[3]
    hg, tq = _mla_tiles(h, s, dk)
    split = 4 if bs % 4 == 0 and bs // 4 >= 8 else 1
    qt = q_eff.transpose(0, 2, 1, 3)  # [P, H, S, Dk]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p, h // hg, s // tq),
        in_specs=[
            pl.BlockSpec(
                (1, hg, tq, dk),
                lambda pi, g, t, *_: (pi, g, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hg, tq, dv),
            lambda pi, g, t, *_: (pi, g, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, bs, dk), cache.dtype),
            pltpu.SemaphoreType.DMA((_NSLOTS, split)),
        ],
    )
    kernel = functools.partial(
        _mla_prefill_batched_kernel, scale=scale, block_size=bs, dv=dv
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, h, s, dv), q_eff.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        q_offsets,
        kv_lens,
        qt,
        cache,
    )
    return out.transpose(0, 2, 1, 3)
