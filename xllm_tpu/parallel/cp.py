"""Context-parallel prefill: zigzag token partition over the ``cp`` axis.

Counterpart of the reference's CP machinery
(reference xllm/core/runtime/cp_input_partition.h:70 worker-side input
slicing, npu_cp_prepare.cpp:26-120 zigzag head/tail split,
parallel_args.h:155-177 kv replica mode). TPU-native collapse:

- the chunk's token dim is SHARDED over the mesh ``cp`` axis; GSPMD
  inserts the KV all-gather for attention — exactly the reference's
  "allgather-KV then attend" pattern (ring attention does not exist in
  the reference either, SURVEY.md §2.6);
- the zigzag LOAD BALANCE becomes a host-side permutation of the chunk's
  token order: block-sharding the permuted layout gives every rank one
  head segment and one tail segment, so causal-attention work is equal
  across ranks. Positions/slot mappings ride along explicitly, so the
  attention math is order-invariant;
- decode keeps the global view (reference cp_input_partition.h:44-48) —
  CP only reshapes prefill.
"""

from __future__ import annotations

import numpy as np


def zigzag_order(n: int, cp: int) -> np.ndarray:
    """Permutation laying out ``n`` tokens in zigzag segment order.

    Tokens are cut into 2*cp equal segments (n must divide); rank r's
    block-shard of the PERMUTED layout holds segments r and 2*cp-1-r —
    the reference's head+tail pairing (npu_cp_prepare.cpp:26-120).
    Returns perm with ``permuted[i] = original[perm[i]]``.
    """
    if cp <= 1:
        return np.arange(n, dtype=np.int64)
    assert n % (2 * cp) == 0, f"zigzag needs {2 * cp} | {n}"
    seg = n // (2 * cp)
    order = []
    for r in range(cp):
        order.append(np.arange(r * seg, (r + 1) * seg))
        hi = 2 * cp - 1 - r
        order.append(np.arange(hi * seg, (hi + 1) * seg))
    return np.concatenate(order)


def inverse_order(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    return inv


def rank_segments(n: int, cp: int, rank: int) -> list[tuple[int, int]]:
    """Original-index [start, end) segments owned by ``rank`` (tests)."""
    seg = n // (2 * cp)
    lo = rank
    hi = 2 * cp - 1 - rank
    return [(lo * seg, (lo + 1) * seg), (hi * seg, (hi + 1) * seg)]


def causal_work(n: int, cp: int, rank: int) -> int:
    """Causal-attention kv-visits for a rank's tokens (balance metric)."""
    total = 0
    for s, e in rank_segments(n, cp, rank):
        for pos in range(s, e):
            total += pos + 1
    return total
