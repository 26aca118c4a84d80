"""Pallas fused write+attend paged-attention decode kernel.

TPU-native counterpart of the reference's reshape_paged_cache +
single_query_cached_kv_attn pair (reference xllm/core/kernels/ops_api.h
paged-cache + batch-decode ops, xllm/core/kernels/mlu/attention.cpp:26-157).
The TPU twist: the per-token KV-cache write happens INSIDE the attention
kernel with the cache aliased in/out (`input_output_aliases`), so the cache
is updated in place in HBM — no XLA scatter, no cache copy inside the layer
scan (the scatter forced a whole-cache copy per layer).

Design:
- grid = (batch,); each program owns one sequence: it first DMAs the
  sequence's new K/V row into its page slot (write-before-read within the
  program; sequences' slots are disjoint — shared prefix blocks are always
  full and never written), then walks the block table with an N-deep
  pipeline of contiguous [Hkv, bs, D] page DMAs, accumulating
  flash-attention online-softmax state in fp32.
- GQA: per kv head h, the G grouped query rows run [G, D] x [D, bs] on the
  MXU; decode attention is HBM-bandwidth-bound so the small M is fine.
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
                    row == off, k_new_ref[0][:, None, :], k_buf[slot]
                )

            s_parts = []
            for h in range(hkv):
                s_parts.append(
                    jax.lax.dot_general(
                        q[h],
                        k_buf[slot, h],
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
                    row == off, v_new_ref[0][:, None, :], v_buf[slot]
                )

            p_cast = p.astype(v_buf.dtype)
            pv_parts = []
            for h in range(hkv):
                pv_parts.append(
                    jax.lax.dot_general(
                        p_cast[h],
                        v_buf[slot, h],
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
