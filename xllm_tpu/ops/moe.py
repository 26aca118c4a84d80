"""Mixture-of-Experts block: router + grouped expert MLP.

Counterpart of the reference's FusedMoE + MoE topk + group-GEMM kernels
(reference xllm/core/layers/common/fused_moe.cpp, kernels/ops_api.h MoE
dispatch/combine + group gemm ops, docs/en/features/groupgemm.md). TPU
design:

- routing (softmax top-k, optional renorm) is plain XLA — it's tiny;
- the expert MLP sorts the (token, expert) pairs by expert id and runs two
  grouped matmuls (megablox `gmm` Pallas kernel) over the expert-stacked
  weights — the group GEMM the reference gets from its vendor kernels;
- a dense masked-einsum reference path is the oracle (CPU tests) and the
  GSPMD-friendly fallback for sharded meshes until the shard_map EP path
  lands.

Weight layout: gate_up [E, D, 2I] (gate columns then up columns per
expert), down [E, I, D].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def route(
    x: jnp.ndarray,  # [T, D]
    router_w: jnp.ndarray,  # [D, E]
    num_experts_per_tok: int,
    norm_topk_prob: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (weights [T, k] f32, expert_ids [T, k] int32).

    Softmax-then-topk, matching qwen3-moe (reference
    xllm/core/layers/common/ MoE topk softmax path).
    """
    logits = jnp.dot(
        x, router_w.astype(x.dtype), preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, num_experts_per_tok)
    if norm_topk_prob:
        topv = topv / jnp.maximum(topv.sum(axis=-1, keepdims=True), 1e-20)
    return topv, topi.astype(jnp.int32)


def moe_mlp_ref(
    x: jnp.ndarray,  # [T, D]
    router_w: jnp.ndarray,  # [D, E]
    gate_up: jnp.ndarray,  # [E, D, 2I]
    down: jnp.ndarray,  # [E, I, D]
    num_experts_per_tok: int,
    norm_topk_prob: bool,
) -> jnp.ndarray:
    """Dense oracle: every expert computed, masked combine. O(T*E) compute."""
    t, d = x.shape
    e, _, i2 = gate_up.shape
    i = i2 // 2
    topv, topi = route(x, router_w, num_experts_per_tok, norm_topk_prob)
    # combine weight per (token, expert): [T, E]
    comb = jnp.zeros((t, e), jnp.float32)
    comb = jax.vmap(lambda c, idx, v: c.at[idx].add(v))(comb, topi, topv)
    gu = jnp.einsum(
        "td,edi->tei", x, gate_up, preferred_element_type=jnp.float32
    )
    act = jax.nn.silu(gu[..., :i]) * gu[..., i:]
    out = jnp.einsum(
        "tei,eid->ted",
        act.astype(x.dtype),
        down,
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum("ted,te->td", out, comb).astype(x.dtype)


def moe_mlp_gmm(
    x: jnp.ndarray,
    router_w: jnp.ndarray,
    gate_up: jnp.ndarray,  # [E, D, 2I]
    down: jnp.ndarray,  # [E, I, D]
    num_experts_per_tok: int,
    norm_topk_prob: bool,
    tiling: tuple[int, int, int] | None = None,
) -> jnp.ndarray:
    """Sorted group-GEMM path (TPU): compute only the routed pairs."""
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    t, d = x.shape
    e = gate_up.shape[0]
    i = gate_up.shape[2] // 2
    k = num_experts_per_tok
    topv, topi = route(x, router_w, k, norm_topk_prob)

    flat_e = topi.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_e)  # pairs sorted by expert
    token_of_pair = order // k  # [T*k]
    xs = x[token_of_pair]  # [T*k, D] gathered, expert-sorted
    group_sizes = jnp.bincount(flat_e, length=e).astype(jnp.int32)

    def _tile(dim: int, pref: int = 128) -> int:
        best = 8
        for c in (512, 256, 128, 64, 32, 16, 8):
            if c <= pref and dim % c == 0:
                return c
        return best

    m = xs.shape[0]
    t1 = (_tile(m), _tile(d), _tile(2 * i))
    t2 = (_tile(m), _tile(i), _tile(d))
    gu = gmm(
        xs, gate_up, group_sizes, preferred_element_type=jnp.float32, tiling=t1
    )
    act = (jax.nn.silu(gu[:, :i]) * gu[:, i:]).astype(x.dtype)
    od = gmm(
        act, down, group_sizes, preferred_element_type=jnp.float32, tiling=t2
    )

    scale = topv.reshape(-1)[order][:, None]  # [T*k, 1] f32
    out = jnp.zeros((t, d), jnp.float32)
    out = out.at[token_of_pair].add(od * scale)
    return out.astype(x.dtype)


def expert_counts(
    x: jnp.ndarray,
    router_w: jnp.ndarray,
    num_experts_per_tok: int,
    norm_topk_prob: bool,
) -> jnp.ndarray:
    """Per-physical-slot routed token counts [E] int32 — the live load
    signal the reference's EplbManager collects every step
    (eplb_manager.h:28, worker hook llm_worker_impl.cpp:249-251)."""
    e = router_w.shape[-1]
    _, topi = route(x, router_w, num_experts_per_tok, norm_topk_prob)
    return (
        jnp.zeros((e,), jnp.int32).at[topi.reshape(-1)].add(1)
    )


def moe_mlp(
    x: jnp.ndarray,
    router_w: jnp.ndarray,
    gate_up: jnp.ndarray,
    down: jnp.ndarray,
    num_experts_per_tok: int,
    norm_topk_prob: bool,
    placement: jnp.ndarray | None = None,
    return_counts: bool = False,
):
    """placement [E] is the EPLB slot map: placement[slot] = the LOGICAL
    expert whose weights live in physical slot `slot` (reference
    EplbExecutor routing remap). Permuting the router columns to slot
    order makes top-k ids physical, so gather/combine stay unchanged."""
    if placement is not None:
        router_w = router_w[:, placement]
    if jax.default_backend() == "tpu":
        out = moe_mlp_gmm(
            x, router_w, gate_up, down, num_experts_per_tok, norm_topk_prob
        )
    else:
        out = moe_mlp_ref(
            x, router_w, gate_up, down, num_experts_per_tok, norm_topk_prob
        )
    if return_counts:
        return out, expert_counts(
            x, router_w, num_experts_per_tok, norm_topk_prob
        )
    return out
