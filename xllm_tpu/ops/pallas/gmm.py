"""Own grouped-GEMM (MoE expert matmul) Pallas kernel.

Counterpart of the reference's group-GEMM kernels
(reference xllm/core/kernels/ops_api.h:89-93 MoE group gemm rows,
docs/en/features/groupgemm.md; the vendor kernels it dispatches to).
Previously this repo leaned on megablox `gmm`; this is the from-scratch
equivalent so the whole hot path is ours (and quantized variants can be
fused in later).

Design (megablox-style straddle decomposition, built independently):

- lhs rows are pre-sorted by group (expert); `group_offsets` [E+1] gives
  each expert's row range.
- The kernel runs a flat grid of `steps x n_tiles`. Each step handles
  ONE (m-tile, expert) pair; an m-tile whose rows straddle an expert
  boundary is visited once per overlapping expert. Step -> (expert,
  m-tile) maps are computed in-graph and passed via scalar prefetch
  (pltpu.PrefetchScalarGridSpec), so BlockSpec index_maps can route the
  right lhs row-tile and expert weight block to each step.
- Consecutive steps that share an m-tile share the same output block;
  Pallas keeps the block resident in VMEM between revisits, so each
  step writes only its expert's row span (first visitor zero-fills).
- The MXU does one [tm, K] x [K, tn] dot per step in fp32 accumulate.
  K stays whole per block: with tm = tn = 128 and K <= 8192 the three
  resident blocks are ~2 MB each — well inside VMEM, and the automatic
  BlockSpec pipeline double-buffers the streams.

Empty experts contribute zero steps (their tiles are simply not
visited), so compute is proportional to routed tokens — the point of a
grouped GEMM vs a capacity-padded batched matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gmm_kernel(eos_ref, mts_ref, cum_ref, nsteps_ref,
                lhs_ref, rhs_ref, o_ref, *, tm: int):
    s = pl.program_id(1)  # steps are innermost: straddle revisits of an
    # output block must be consecutive grid iterations
    e = eos_ref[s]
    mt = mts_ref[s]
    valid = s < nsteps_ref[0]

    # rows of this m-tile owned by expert e
    row0 = mt * tm
    lo = jnp.clip(cum_ref[e] - row0, 0, tm)
    hi = jnp.clip(cum_ref[e + 1] - row0, 0, tm)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    mask = (rows >= lo) & (rows < hi) & valid

    rhs = rhs_ref[0]
    if rhs.dtype != lhs_ref.dtype:
        # fp8 weight-only experts: tiles travel at half bandwidth and
        # upcast on load (reference w8a8/fp8 group GEMM, ops_api.h:89-93)
        rhs = rhs.astype(lhs_ref.dtype)
    acc = jax.lax.dot(lhs_ref[...], rhs,
                      preferred_element_type=jnp.float32)
    masked = jnp.where(mask, acc, 0.0).astype(o_ref.dtype)

    first_visit = jnp.logical_or(s == 0, mts_ref[jnp.maximum(s - 1, 0)] != mt)

    @pl.when(first_visit)
    def _():
        o_ref[...] = masked

    @pl.when(jnp.logical_not(first_visit))
    def _():
        o_ref[...] = jnp.where(mask, masked, o_ref[...])


def _step_maps(group_offsets: jnp.ndarray, num_groups: int, m_tiles: int,
               tm: int):
    """-> (expert_of_step, mtile_of_step, num_steps), arrays of static
    length L = m_tiles + num_groups (the straddle worst case)."""
    c = group_offsets
    first_tile = c[:-1] // tm
    last_excl = pl.cdiv(c[1:], tm)
    ntiles = jnp.maximum(last_excl - first_tile, 0)          # [E]
    ntiles = jnp.where(c[1:] > c[:-1], ntiles, 0)            # empty experts
    step_end = jnp.cumsum(ntiles)                            # [E]
    num_steps = step_end[-1]
    L = m_tiles + num_groups
    sidx = jnp.arange(L, dtype=jnp.int32)
    eos = jnp.searchsorted(step_end, sidx, side="right").astype(jnp.int32)
    eos_safe = jnp.minimum(eos, num_groups - 1)
    step_start = step_end - ntiles
    mts = first_tile[eos_safe] + (sidx - step_start[eos_safe])
    # park invalid steps on the last tile (writes are masked off anyway,
    # and a monotone map keeps the revisit chain intact)
    mts = jnp.where(sidx < num_steps, mts, m_tiles - 1).astype(jnp.int32)
    return eos_safe, mts, num_steps.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("tm", "tn", "interpret"))
def gmm(lhs: jnp.ndarray,          # [M, K] rows sorted by group
        rhs: jnp.ndarray,          # [E, K, N] expert-stacked weights
        group_offsets: jnp.ndarray,  # [E+1] int32 cumulative row offsets
        tm: int = 128, tn: int = 128,
        interpret: bool = False) -> jnp.ndarray:
    """-> [M, N] f32: out[r] = lhs[r] @ rhs[expert_of_row(r)]."""
    m, k = lhs.shape
    e, k2, n = rhs.shape
    assert k == k2
    tm = min(tm, m)
    tn = min(tn, n)
    assert m % tm == 0 and n % tn == 0, (m, n, tm, tn)
    m_tiles = m // tm
    eos, mts, num_steps = _step_maps(group_offsets, e, m_tiles, tm)
    L = int(m_tiles + e)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # eos, mts, cum, num_steps
        grid=(n // tn, L),
        in_specs=[
            pl.BlockSpec((tm, k), lambda j, s, eos, mts, cum, ns:
                         (mts[s], 0)),
            pl.BlockSpec((1, k, tn), lambda j, s, eos, mts, cum, ns:
                         (eos[s], 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda j, s, eos, mts, cum, ns:
                               (mts[s], j)),
    )
    out = pl.pallas_call(
        functools.partial(_gmm_kernel, tm=tm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(eos, mts, group_offsets.astype(jnp.int32),
      num_steps[None], lhs, rhs)
    return out
