"""Fused write+attend paged-attention dispatch.

Pallas kernels on TPU, jnp reference elsewhere (CPU tests, interpret mode).
Mirrors the reference's kernel dispatch layer
(reference xllm/core/kernels/ops_api.h:27-287 dispatching per backend).

The KV-cache write is part of the attention op: on TPU the kernels update
the paged cache in place via aliased HBM buffers (see
xllm_tpu/ops/pallas/decode_attention.py, kv_write.py); the portable path
composes an XLA scatter (ops/kv_cache_ops.write_kv) with the jnp oracle.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from xllm_tpu.ops import attention_ref
from xllm_tpu.ops.kv_cache_ops import write_kv, write_kv_interleaved

_FORCE_REF = os.environ.get("XLLM_ATTENTION_BACKEND", "auto") == "ref"
# test hook: run the Pallas kernels in interpret mode on CPU — the only
# way to exercise the row-major-tail content convention end-to-end
# without a chip (the portable jnp path stores canonical pages only)
_INTERPRET = os.environ.get("XLLM_ATTENTION_BACKEND", "auto") == "interpret"


def is_interleaved(k_all) -> bool:
    """True when the cache uses the interleaved layout
    [L, NB, 2, Hkv, bs, D] (K and V of a page contiguous; v_all is a
    rank-1 placeholder, like MLA's latent pair)."""
    return k_all.ndim == 6


def _parse_tiled_kernel(kver: str, prefix: str):
    """Parse 'v9t4', 'v9t4p', 'v9t4n6', 'v11t2', ... -> (tile, nslots,
    premask). Raises with the supported grammar on anything else (the
    probe harness's richer grammar silently diverged from this parser
    once — ADVICE r4)."""
    spec = kver[len(prefix):]
    premask = spec.endswith("p")
    if premask:
        spec = spec[:-1]
        if prefix != "v9":
            raise ValueError(
                f"premask suffix 'p' is a v9-family option: {kver!r}"
            )
    tile, nslots = 4, 0
    if spec.startswith("t"):
        spec = spec[1:]
        if "n" in spec:
            tpart, npart = spec.split("n", 1)
            tile, nslots = int(tpart), int(npart)
        else:
            tile = int(spec)
    elif spec:
        raise ValueError(
            f"bad XLLM_DECODE_KERNEL {kver!r}: expected "
            f"{prefix}[tT[nN]][p], e.g. {prefix}t4, {prefix}t4n6"
        )
    return tile, nslots, premask


def _use_pallas(head_dim: int = 128, allow_interpret: bool = False) -> bool:
    """Pallas kernels need lane-aligned head_dim (Mosaic HBM DMA slices
    must be 128-aligned in the lane dim); production families all use 128.
    Others fall back to the portable XLA path."""
    if _FORCE_REF or head_dim % 128 != 0:
        return False
    if _INTERPRET and allow_interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def decode_attention_write(
    q: jnp.ndarray,  # [B, Hq, D]
    k_new: jnp.ndarray,  # [B, Hkv, D]
    v_new: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [B] int32
    block_tables: jnp.ndarray,  # [B, NBmax] int32
    seq_lens: jnp.ndarray,  # [B] int32 (including current token)
    scale: float,
    window: int = 0,
    page_maps: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    # (page_cum [B+1], page_seq [B*NB]) host-precomputed global-page-ring
    # maps (DecodeInput.page_cum/page_seq) — computing them on device puts
    # a sequential searchsorted inside every layer of the decode scan
    rowmajor_tail: bool = False,  # interleaved_rm layout: incomplete tail
    # pages hold token-major content (v12; new rows persist as one 4 KB
    # tile instead of a full-page rewrite — the r5 patch-probe fix)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Write each sequence's new K/V row, then attend. -> (out, k, v).

    Interleaved layout (k_all 6-dim, v_all a rank-1 placeholder): the
    v11 kernel fetches each page's K and V in one DMA; the placeholder
    v_all threads through unchanged."""
    cum = page_maps[0] if page_maps is not None else None
    seq_of_page = page_maps[1] if page_maps is not None else None
    if is_interleaved(k_all):
        kv_all = k_all
        if _use_pallas(q.shape[-1], allow_interpret=True):
            if rowmajor_tail:
                from xllm_tpu.ops.pallas.decode_attention import (
                    paged_decode_attention_write_v12_tpu,
                )

                # tile 4: the spread-lens PROBE preferred t2 (184.6 vs
                # 204.6 us/layer) but the full BENCH prefers t4 (11,014
                # vs 10,818 tok/s — real contexts reach 3-4 full pages
                # where t4 walks once); bench-level evidence decides
                kver = os.environ.get("XLLM_DECODE_KERNEL", "v12t4")
                tile, nslots, _ = _parse_tiled_kernel(kver, "v12") \
                    if kver.startswith("v12") else (4, 0, False)
                out, kv_all = paged_decode_attention_write_v12_tpu(
                    q, k_new, v_new, kv_all, layer_idx, slot_mapping,
                    block_tables, seq_lens, scale, window=window,
                    tile=tile, nslots_override=nslots,
                    interpret=_INTERPRET,
                )
                return out, kv_all, v_all
            from xllm_tpu.ops.pallas.decode_attention import (
                paged_decode_attention_write_v11_tpu,
            )

            kver = os.environ.get("XLLM_DECODE_KERNEL", "v11t4")
            tile, nslots, _ = _parse_tiled_kernel(kver, "v11") \
                if kver.startswith("v11") else (4, 0, False)
            out, kv_all = paged_decode_attention_write_v11_tpu(
                q, k_new, v_new, kv_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale, window=window, cum=cum,
                tile=tile, nslots_override=nslots, interpret=_INTERPRET,
            )
            return out, kv_all, v_all
        kv_all = write_kv_interleaved(
            kv_all, layer_idx, k_new, v_new, slot_mapping
        )
        out = attention_ref.paged_attention_decode_ref(
            q, kv_all[:, :, 0], kv_all[:, :, 1], layer_idx, block_tables,
            seq_lens, scale, window=window,
        )
        return out, kv_all, v_all
    if _use_pallas(q.shape[-1]):
        # Default v9t4: the r4 INTERLEAVED A/Bs (shared pools,
        # alternating rounds — scripts/probe_ab_interleaved.py) rank
        # v9t4 bf16 at 206 us/layer median vs v5's 202 (tie within
        # noise; v9t4 kept for its int8 advantage) and v9t4 int8 at
        # 169-175 vs v5 int8's 210-220. Tile widths 6/8 and the v10
        # narrow-score challenger LOST their A/Bs (PERF.md r4). v5 and
        # every retired generation stay one env flip away
        # (XLLM_DECODE_KERNEL=v5 | v10t4 | ...).
        kver = os.environ.get("XLLM_DECODE_KERNEL", "v9t4")
        if kver.startswith("v8"):
            # v8: C-page flash chunks amortize the per-page softmax
            # bookkeeping the r5 floor probe exposed (~65 us/layer between
            # v5 and the pure-DMA floor). "v8" -> chunk=4; "v8c2" -> 2.
            from xllm_tpu.ops.pallas.legacy.decode_attention import (
                paged_decode_attention_write_v8_tpu,
            )

            chunk = int(kver[3:]) if kver.startswith("v8c") else 4
            return paged_decode_attention_write_v8_tpu(
                q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale, window=window, cum=cum,
                chunk=chunk,
            )
        if kver.startswith("v10"):
            # v10: narrow per-(page, head) scores — LOST its r4
            # interleaved A/B (259 vs v9t4's 206 median: the batched
            # M=G dots cost more than the 8x VPU savings); kept as the
            # documented negative result ("v10" -> T=4; "v10t2" -> 2)
            from xllm_tpu.ops.pallas.legacy.decode_attention import (
                paged_decode_attention_write_v10_tpu,
            )

            t = int(kver[4:]) if kver.startswith("v10t") else 4
            return paged_decode_attention_write_v10_tpu(
                q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale, window=window, cum=cum,
                tile=t,
            )
        if kver.startswith("v9"):
            # v9: v7's page-pair tiles generalized to T pages per slot
            # ("v9" -> T=4; "v9t2" -> 2), vectorized owner-map prep.
            # Trailing "p" (v9t4p) = premask: the static mask tables ride
            # as resident VMEM inputs instead of being rebuilt by every
            # grid program (decode_attention kernel docstring).
            from xllm_tpu.ops.pallas.decode_attention import (
                paged_decode_attention_write_v9_tpu,
            )

            t, nslots, premask = _parse_tiled_kernel(kver, "v9")
            return paged_decode_attention_write_v9_tpu(
                q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale, window=window, cum=cum,
                tile=t, premask=premask, nslots_override=nslots,
            )
        if kver == "v7":
            from xllm_tpu.ops.pallas.legacy.decode_attention import (
                paged_decode_attention_write_v7_tpu,
            )

            return paged_decode_attention_write_v7_tpu(
                q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale, window=window,
            )
        if kver == "v6":
            from xllm_tpu.ops.pallas.legacy.decode_attention import (
                paged_decode_attention_write_v6_tpu,
            )

            return paged_decode_attention_write_v6_tpu(
                q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale, window=window,
                cum=cum, seq_of_page=seq_of_page,
            )
        if kver == "v5":
            from xllm_tpu.ops.pallas.decode_attention import (
                paged_decode_attention_write_v5_tpu,
            )

            return paged_decode_attention_write_v5_tpu(
                q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale, window=window, cum=cum,
            )
        if kver == "v4":
            from xllm_tpu.ops.pallas.legacy.decode_attention import (
                paged_decode_attention_write_v4_tpu,
            )

            return paged_decode_attention_write_v4_tpu(
                q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale, window=window,
            )
        if kver == "v1" and window <= 0:
            # v1 has no window support: sliding-window models (whose
            # out-of-window pages get recycled) always take v3+
            from xllm_tpu.ops.pallas.legacy.decode_attention import (
                paged_decode_attention_write_tpu,
            )

            return paged_decode_attention_write_tpu(
                q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
                block_tables, seq_lens, scale,
            )
        from xllm_tpu.ops.pallas.legacy.decode_attention import (
            paged_decode_attention_write_v3_tpu,
        )

        return paged_decode_attention_write_v3_tpu(
            q, k_new, v_new, k_all, v_all, layer_idx, slot_mapping,
            block_tables, seq_lens, scale, window=window,
        )
    k_all, v_all = write_kv(k_all, v_all, layer_idx, k_new, v_new, slot_mapping)
    out = attention_ref.paged_attention_decode_ref(
        q, k_all, v_all, layer_idx, block_tables, seq_lens, scale,
        window=window,
    )
    return out, k_all, v_all


def prefill_attention_write_batched(
    q: jnp.ndarray,  # [P, S, Hq, D]
    k_new: jnp.ndarray,  # [P, S, Hkv, D]
    v_new: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, NB, Hkv, bs, D]
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [P, S] int32 (portable path)
    block_tables: jnp.ndarray,  # [P, NBmax] int32
    q_offsets: jnp.ndarray,  # [P] int32
    kv_lens: jnp.ndarray,  # [P] int32 (0 = padded row)
    scale: float,
    window: int = 0,
    force_ref: bool = False,
    positions: jnp.ndarray | None = None,  # [P, S] (CP zigzag layouts)
    rowmajor_tail: bool = False,  # interleaved_rm layout (see decode)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """P prompt chunks (one per sequence) written + attended in ONE dispatch.

    Counterpart of the reference's whole-batch prefill ForwardInput
    (reference xllm/core/framework/batch/batch_input_builder.h:53): the
    per-sequence loop lives in the kernel grid, not in Python. Page-aligned
    chunk starts use the full-page writer; small chunks (S <= block_size,
    e.g. speculative verify rows) use the RMW writer.
    """
    p, s, hq, d = q.shape
    if is_interleaved(k_all):
        kv_all = k_all
        if _use_pallas(d, allow_interpret=True) and not force_ref:
            from xllm_tpu.ops.pallas.kv_write import (
                kv_write_prefill_batched_ilv_tpu,
                kv_write_prefill_batched_rm_tpu,
                kv_write_rmw_batched_ilv_tpu,
                kv_write_rmw_batched_rm_tpu,
            )
            from xllm_tpu.ops.pallas.prefill_attention import (
                paged_attention_prefill_batched_ilv_tpu,
            )

            ntoks = kv_lens - q_offsets
            block_size = kv_all.shape[4]
            k_w = k_new.astype(kv_all.dtype)
            v_w = v_new.astype(kv_all.dtype)
            if s <= block_size:
                if rowmajor_tail:
                    kv_all = kv_write_rmw_batched_rm_tpu(
                        k_w, v_w, kv_all, layer_idx, block_tables,
                        q_offsets, ntoks, kv_lens, interpret=_INTERPRET,
                    )
                else:
                    kv_all = kv_write_rmw_batched_ilv_tpu(
                        k_w, v_w, kv_all, layer_idx, block_tables,
                        q_offsets, ntoks, interpret=_INTERPRET,
                    )
            else:
                kvt = jnp.stack(
                    [k_w.transpose(0, 2, 1, 3), v_w.transpose(0, 2, 1, 3)],
                    axis=1,
                )  # [P, 2, Hkv, S, D]
                if rowmajor_tail:
                    kvt_tok = jnp.concatenate([k_w, v_w], axis=2)
                    # [P, S, 2*Hkv, D] token-major rows
                    kv_all = kv_write_prefill_batched_rm_tpu(
                        kvt, kvt_tok, kv_all, layer_idx, block_tables,
                        q_offsets, ntoks, kv_lens, interpret=_INTERPRET,
                    )
                else:
                    kv_all = kv_write_prefill_batched_ilv_tpu(
                        kvt, kv_all, layer_idx, block_tables, q_offsets,
                        ntoks, interpret=_INTERPRET,
                    )
            out = paged_attention_prefill_batched_ilv_tpu(
                q, kv_all, layer_idx, block_tables, q_offsets, kv_lens,
                scale, window=window, rowmajor_tail=rowmajor_tail,
                interpret=_INTERPRET,
            )
            return out, kv_all, v_all
        kv_all = write_kv_interleaved(
            kv_all, layer_idx,
            k_new.reshape(p * s, *k_new.shape[2:]),
            v_new.reshape(p * s, *v_new.shape[2:]),
            slot_mapping.reshape(p * s),
        )
        out = jax.vmap(
            attention_ref.paged_attention_prefill_ref,
            in_axes=(0, None, None, None, 0, 0, 0, None, None, 0),
        )(q, kv_all[:, :, 0], kv_all[:, :, 1], layer_idx, block_tables,
          q_offsets, kv_lens, scale, window, positions)
        return out, kv_all, v_all
    if _use_pallas(d) and not force_ref:
        from xllm_tpu.ops.pallas.kv_write import (
            kv_write_prefill_batched_tpu,
            kv_write_rmw_batched_tpu,
        )
        from xllm_tpu.ops.pallas.prefill_attention import (
            paged_attention_prefill_batched_tpu,
        )

        ntoks = kv_lens - q_offsets
        block_size = k_all.shape[3]
        # quantized KV: DMA cannot convert dtypes — cast the new rows to
        # the cache dtype before the writers
        k_w = k_new.astype(k_all.dtype)
        v_w = v_new.astype(v_all.dtype)
        if s <= block_size:
            # small chunks (speculative verify): may start mid-page -> RMW
            k_all, v_all = kv_write_rmw_batched_tpu(
                k_w, v_w, k_all, v_all, layer_idx, block_tables,
                q_offsets, ntoks,
            )
        else:
            k_all, v_all = kv_write_prefill_batched_tpu(
                k_w.transpose(0, 2, 1, 3),
                v_w.transpose(0, 2, 1, 3),
                k_all, v_all, layer_idx, block_tables, q_offsets, ntoks,
            )
        out = paged_attention_prefill_batched_tpu(
            q, k_all, v_all, layer_idx, block_tables, q_offsets, kv_lens,
            scale, window=window,
        )
        return out, k_all, v_all
    k_all, v_all = write_kv(
        k_all, v_all, layer_idx,
        k_new.reshape(p * s, *k_new.shape[2:]),
        v_new.reshape(p * s, *v_new.shape[2:]),
        slot_mapping.reshape(p * s),
    )
    out = jax.vmap(
        attention_ref.paged_attention_prefill_ref,
        in_axes=(0, None, None, None, 0, 0, 0, None, None, 0),
    )(q, k_all, v_all, layer_idx, block_tables, q_offsets, kv_lens, scale,
      window, positions)
    return out, k_all, v_all


def prefill_attention_write(
    q: jnp.ndarray,  # [S, Hq, D]
    k_new: jnp.ndarray,  # [S, Hkv, D]
    v_new: jnp.ndarray,
    k_all: jnp.ndarray,
    v_all: jnp.ndarray,
    layer_idx: jnp.ndarray,  # [] int32
    slot_mapping: jnp.ndarray,  # [S] int32 (used by the portable path)
    block_table: jnp.ndarray,  # [NBmax] int32
    q_offset: jnp.ndarray,  # [] int32
    kv_len: jnp.ndarray,  # [] int32
    scale: float,
    window: int = 0,
    rowmajor_tail: bool = False,  # interleaved_rm layout (see decode)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Write the chunk's K/V into its pages, then flash-attend causally."""
    if is_interleaved(k_all):
        # interleaved layout rides the batched kernels with P=1
        pos = (q_offset + jnp.arange(q.shape[0], dtype=jnp.int32))[None]
        out, k_all, v_all = prefill_attention_write_batched(
            q[None], k_new[None], v_new[None], k_all, v_all, layer_idx,
            slot_mapping[None], block_table[None], q_offset.reshape(1),
            kv_len.reshape(1), scale, window=window, positions=pos,
            rowmajor_tail=rowmajor_tail,
        )
        return out[0], k_all, v_all
    if _use_pallas(q.shape[-1]):
        from xllm_tpu.ops.pallas.kv_write import (
            kv_write_prefill_tpu,
            kv_write_rmw_tpu,
        )
        from xllm_tpu.ops.pallas.prefill_attention import (
            paged_attention_prefill_tpu,
        )

        ntok = kv_len - q_offset
        block_size = k_all.shape[3]
        k_w = k_new.astype(k_all.dtype)
        v_w = v_new.astype(v_all.dtype)
        if k_new.shape[0] <= block_size:
            # small chunk (speculative verify): may start mid-page -> RMW
            # (token-major input, no transpose)
            k_all, v_all = kv_write_rmw_tpu(
                k_w, v_w, k_all, v_all, layer_idx, block_table,
                q_offset, ntok,
            )
        else:
            # large chunk: page-aligned start (scheduler contract) -> full-page
            k_all, v_all = kv_write_prefill_tpu(
                k_w.transpose(1, 0, 2),
                v_w.transpose(1, 0, 2),
                k_all, v_all, layer_idx, block_table, q_offset, ntok,
            )
        out = paged_attention_prefill_tpu(
            q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale,
            window=window,
        )
        return out, k_all, v_all
    k_all, v_all = write_kv(k_all, v_all, layer_idx, k_new, v_new, slot_mapping)
    out = attention_ref.paged_attention_prefill_ref(
        q, k_all, v_all, layer_idx, block_table, q_offset, kv_len, scale,
        window=window,
    )
    return out, k_all, v_all
