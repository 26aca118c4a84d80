"""Pallas paged-attention decode kernel (single query token per sequence).

TPU-native counterpart of the reference's single_query_cached_kv_attn /
FlashInfer decode kernels (reference xllm/core/kernels/ops_api.h batch
decode ops, xllm/core/kernels/mlu/attention.cpp:26-157). Design:

- grid = (batch,); each program owns one sequence and all of its heads, so
  a page fetch is ONE contiguous [Hkv, bs, D] DMA (the KV layout
  [L, num_blocks, Hkv, bs, D] makes the whole per-block KV contiguous).
- The kernel walks the sequence's block table (scalar-prefetched in SMEM)
  with an N-deep DMA pipeline, hiding HBM latency behind the per-page
  flash-attention update (online softmax, fp32 state).
- GQA: per kv head h, the G grouped query rows do [G, D] x [D, bs] on the
  MXU; decode attention is HBM-bandwidth-bound so the small M dim is fine.
- Padded batch rows carry seq_len = 0 and are skipped entirely.
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
    seq_lens_ref,  # [B] int32
    # inputs
    q_ref,  # [1, Hkv, G, D] VMEM (this sequence's queries, group-major)
    k_hbm,  # [L, NB, Hkv, bs, D] ANY/HBM
    v_hbm,
    # outputs
    o_ref,  # [1, Hkv, G, D] VMEM
    # scratch
    k_buf,  # [NSLOTS, Hkv, bs, D] VMEM
    v_buf,
    sem,  # DMA sems [2, NSLOTS]
    *,
    scale: float,
    block_size: int,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    nblks = pl.cdiv(seq_len, block_size)
    hkv, g, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[layer, block_tables_ref[b, i]], k_buf.at[slot], sem.at[0, slot]
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[layer, block_tables_ref[b, i]], v_buf.at[slot], sem.at[1, slot]
        )

    @pl.when(nblks > 0)
    def _():
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
            # per-kv-head [G, D] x [D, bs] scores, statically unrolled
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
            pv_parts = []
            p_cast = p.astype(v_buf.dtype)
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

    @pl.when(nblks == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_attention_decode_tpu(
    q: jnp.ndarray,  # [B, Hq, D]
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    block_tables: jnp.ndarray,  # [B, NBmax] int32
    seq_lens: jnp.ndarray,  # [B] int32
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hq, d = q.shape
    _, _, hkv, bs, _ = k_all.shape
    g = hq // hkv
    assert hq == hkv * g

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hkv, g, d),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, g, d),
            lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_NSLOTS, hkv, bs, d), k_all.dtype),
            pltpu.VMEM((_NSLOTS, hkv, bs, d), v_all.dtype),
            pltpu.SemaphoreType.DMA((2, _NSLOTS)),
        ],
    )
    kernel = functools.partial(_decode_kernel, scale=scale, block_size=bs)
    # GQA is head-major: q.reshape(b, hkv, g, d)[_, h] is kv head h's group.
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1),
        block_tables,
        seq_lens,
        q.reshape(b, hkv, g, d),
        k_all,
        v_all,
    )
    return out.reshape(b, hq, d)
