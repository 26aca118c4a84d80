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
    scoring: str = "softmax",
    bias: jnp.ndarray | None = None,  # [E] e_score_correction_bias
    n_group: int = 1,
    topk_group: int = 1,
    routed_scaling: float = 1.0,
    _id_map: jnp.ndarray | None = None,  # logical->physical remap [E]
    _replica_map: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    # (l2p [E, max_rep], counts [E]): logical expert -> its physical
    # replica slots; tokens split across replicas round-robin (reference
    # redundant-experts routing, eplb_policy.h:30-56)
    _routed: tuple[jnp.ndarray, jnp.ndarray] | None = None,  # precomputed
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (weights [T, k] f32, expert_ids [T, k] int32).

    scoring="softmax": softmax-then-topk, matching qwen3-moe /
    deepseek-v2 (reference xllm/core/layers/common/ MoE topk softmax path).
    scoring="sigmoid": deepseek-v3 / kimi-k2 "noaux_tc" — sigmoid scores,
    selection by score + correction bias with group-limited top-k
    (reference kimi_k2.h topk_method noaux_tc), combine weights from the
    UNbiased scores.
    """
    if _routed is not None:
        return _routed
    logits = jnp.dot(
        x, router_w.astype(x.dtype), preferred_element_type=jnp.float32
    )
    k = num_experts_per_tok
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
        sel = scores if bias is None else scores + bias[None, :]
        if n_group > 1:
            t = sel.shape[0]
            e = sel.shape[1]
            gsel = sel.reshape(t, n_group, e // n_group)
            # group strength = sum of its top-2 biased scores
            g2, _ = jax.lax.top_k(gsel, 2)
            gscore = g2.sum(axis=-1)  # [T, G]
            _, gidx = jax.lax.top_k(gscore, topk_group)
            gmask = (
                jnp.zeros((t, n_group), jnp.bool_)
                .at[jnp.arange(t)[:, None], gidx]
                .set(True)
            )
            sel = jnp.where(
                jnp.repeat(gmask, e // n_group, axis=1), sel, -jnp.inf
            )
        _, topi = jax.lax.top_k(sel, k)
        topv = jnp.take_along_axis(scores, topi, axis=-1)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        topv, topi = jax.lax.top_k(probs, k)
    if norm_topk_prob:
        topv = topv / jnp.maximum(topv.sum(axis=-1, keepdims=True), 1e-20)
    if routed_scaling != 1.0:
        topv = topv * routed_scaling
    if _id_map is not None:
        topi = _id_map[topi]
    if _replica_map is not None:
        l2p, rcounts = _replica_map
        t = topi.shape[0]
        kk = topi.shape[1]
        # deterministic round-robin over each expert's replicas: token
        # ordinal spreads a hot expert's tokens evenly across its slots
        ordinal = (
            jnp.arange(t, dtype=jnp.int32)[:, None]
            + jnp.arange(kk, dtype=jnp.int32)[None, :]
        )
        rep = ordinal % rcounts[topi]
        topi = l2p[topi, rep]
    return topv, topi.astype(jnp.int32)


def moe_mlp_ref(
    x: jnp.ndarray,  # [T, D]
    router_w: jnp.ndarray,  # [D, E]
    gate_up: jnp.ndarray,  # [E, D, 2I]
    down: jnp.ndarray,  # [E, I, D]
    num_experts_per_tok: int,
    norm_topk_prob: bool,
    **route_kw,
) -> jnp.ndarray:
    """Dense oracle: every expert computed, masked combine. O(T*E) compute."""
    t, d = x.shape
    e, _, i2 = gate_up.shape
    i = i2 // 2
    topv, topi = route(
        x, router_w, num_experts_per_tok, norm_topk_prob, **route_kw
    )
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
    gate_up: jnp.ndarray,  # [E, D, 2I] (bf16 or fp8_e4m3 weight-only)
    down: jnp.ndarray,  # [E, I, D]
    num_experts_per_tok: int,
    norm_topk_prob: bool,
    tiling: tuple[int, int, int] | None = None,
    impl: str | None = None,  # None -> $XLLM_GMM_IMPL or "own"
    interpret: bool = False,
    gate_up_scale: jnp.ndarray | None = None,  # [E, 2I] f32 (fp8 experts)
    down_scale: jnp.ndarray | None = None,  # [E, D] f32
    **route_kw,
) -> jnp.ndarray:
    """Sorted group-GEMM path (TPU): compute only the routed pairs.

    impl="own" uses our Pallas kernel (ops/pallas/gmm.py);
    impl="megablox" keeps the upstream megablox kernel as a fallback.
    """
    import os

    impl = impl or os.environ.get("XLLM_GMM_IMPL", "own")

    t, d = x.shape
    e = gate_up.shape[0]
    i = gate_up.shape[2] // 2
    k = num_experts_per_tok
    topv, topi = route(x, router_w, k, norm_topk_prob, **route_kw)

    flat_e = topi.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_e)  # pairs sorted by expert
    token_of_pair = order // k  # [T*k]
    xs = x[token_of_pair]  # [T*k, D] gathered, expert-sorted
    group_sizes = jnp.bincount(flat_e, length=e).astype(jnp.int32)
    m = xs.shape[0]
    expert_of_pair = flat_e[order]  # [T*k] sorted expert ids

    def deq(o, scales):
        # per-(expert, out-channel) weight-only scales applied on the
        # f32 GEMM output rows
        if scales is None:
            return o
        return o * scales[expert_of_pair[: o.shape[0]]]

    def _tile(dim: int, pref: int = 128) -> int:
        best = 8
        for c in (512, 256, 128, 64, 32, 16, 8):
            if c <= pref and dim % c == 0:
                return c
        return best

    if impl == "own":
        from xllm_tpu.ops.pallas.gmm import gmm as own_gmm

        tm = _tile(m)
        # pad rows to a tile multiple; pads hang off the last expert and
        # compute garbage rows that are sliced away below
        mpad = ((m + tm - 1) // tm) * tm
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes)])
        offs = offs.at[-1].set(mpad)
        xs_p = jnp.pad(xs, ((0, mpad - m), (0, 0)))
        gu = own_gmm(xs_p, gate_up, offs, tm=tm, tn=_tile(2 * i),
                     interpret=interpret)[:m]
        gu = deq(gu, gate_up_scale)
        act = (jax.nn.silu(gu[:, :i]) * gu[:, i:]).astype(x.dtype)
        act = jnp.pad(act, ((0, mpad - m), (0, 0)))
        od = own_gmm(act, down, offs, tm=tm, tn=_tile(d),
                     interpret=interpret)[:m]
        od = deq(od, down_scale)
    else:
        from jax.experimental.pallas.ops.tpu.megablox import gmm

        t1 = (_tile(m), _tile(d), _tile(2 * i))
        t2 = (_tile(m), _tile(i), _tile(d))
        gu = deq(
            gmm(
                xs, gate_up, group_sizes,
                preferred_element_type=jnp.float32, tiling=t1
            ),
            gate_up_scale,
        )
        act = (jax.nn.silu(gu[:, :i]) * gu[:, i:]).astype(x.dtype)
        od = deq(
            gmm(
                act, down, group_sizes,
                preferred_element_type=jnp.float32, tiling=t2
            ),
            down_scale,
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
    **route_kw,
) -> jnp.ndarray:
    """Per-physical-slot routed token counts [E] int32 — the live load
    signal the reference's EplbManager collects every step
    (eplb_manager.h:28, worker hook llm_worker_impl.cpp:249-251)."""
    e = router_w.shape[-1]
    _, topi = route(
        x, router_w, num_experts_per_tok, norm_topk_prob, **route_kw
    )
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
    mesh=None,
    ep_axis: str = "tp",
    gate_up_scale: jnp.ndarray | None = None,  # fp8 weight-only experts
    down_scale: jnp.ndarray | None = None,
    **route_kw,
):
    """placement [E] is the EPLB slot map: placement[slot] = the LOGICAL
    expert whose weights live in physical slot `slot` (reference
    EplbExecutor routing remap). Permuting the router columns to slot
    order makes top-k ids physical, so gather/combine stay unchanged.

    With a mesh whose `ep_axis` is non-trivial and divides both the expert
    count and the token count, dispatch goes through the ragged
    all-to-all EP path (`moe_mlp_ep_a2a`, DeepEP analog) instead of
    relying on GSPMD to gather expert weights."""
    e_log = router_w.shape[-1]
    e = gate_up.shape[0]  # PHYSICAL slot count (> e_log with replicas)
    if placement is not None:
        if e > e_log:
            # redundant-expert slots (reference eplb_policy.h:30-56):
            # selection stays LOGICAL; each chosen expert's tokens then
            # split round-robin across its physical replica slots. The
            # l2p/count maps derive from the placement in-graph (tiny
            # [E]-sized ops, hoisted by XLA out of the layer scan).
            max_rep = e - e_log + 1
            counts = jnp.zeros((e_log,), jnp.int32).at[placement].add(1)
            cumstart = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(counts).astype(jnp.int32)[:-1]]
            )
            order = jnp.argsort(placement, stable=True).astype(jnp.int32)
            sorted_e = placement[order]
            pos = jnp.arange(e, dtype=jnp.int32) - cumstart[sorted_e]
            l2p = jnp.zeros((e_log, max_rep), jnp.int32).at[
                sorted_e, pos
            ].set(order)
            route_kw = dict(route_kw, _replica_map=(l2p, counts))
        elif route_kw.get("n_group", 1) > 1:
            # group-limited selection is defined on the LOGICAL expert
            # order, so don't permute the router columns; instead remap the
            # chosen logical ids to physical slots afterwards (identical
            # selection, EPLB-placed weights)
            inv = jnp.argsort(placement)
            route_kw = dict(route_kw, _id_map=inv)
        else:
            router_w = router_w[:, placement]
            if route_kw.get("bias") is not None:
                route_kw = dict(route_kw, bias=route_kw["bias"][placement])
    nep = mesh.shape.get(ep_axis, 1) if mesh is not None else 1
    quantized = gate_up_scale is not None
    counts = None
    if return_counts:
        # route once; the gmm/ref paths below reuse it via _routed (the
        # EP shard_map paths re-route internally — closing traced arrays
        # over shard_map is not worth the saved router GEMM there)
        routed = route(
            x, router_w, num_experts_per_tok, norm_topk_prob, **route_kw
        )
        counts = (
            jnp.zeros((e,), jnp.int32).at[routed[1].reshape(-1)].add(1)
        )
        route_kw = dict(route_kw, _routed=routed)
    if (
        nep > 1
        and e % nep == 0
        and x.shape[0] % nep == 0
    ):
        if quantized:  # EP path: dequantize locally before the shard_map
            gate_up = (
                gate_up.astype(jnp.float32) * gate_up_scale[:, None, :]
            ).astype(x.dtype)
            down = (
                down.astype(jnp.float32) * down_scale[:, None, :]
            ).astype(x.dtype)
        ep_kw = {k: v for k, v in route_kw.items() if k != "_routed"}
        out = moe_mlp_ep_a2a(
            x, router_w, gate_up, down, num_experts_per_tok,
            norm_topk_prob, mesh, axis=ep_axis, **ep_kw,
        )
    elif jax.default_backend() == "tpu":
        out = moe_mlp_gmm(
            x, router_w, gate_up, down, num_experts_per_tok, norm_topk_prob,
            gate_up_scale=gate_up_scale, down_scale=down_scale,
            **route_kw,
        )
    else:
        if quantized:
            gate_up = (
                gate_up.astype(jnp.float32) * gate_up_scale[:, None, :]
            ).astype(x.dtype)
            down = (
                down.astype(jnp.float32) * down_scale[:, None, :]
            ).astype(x.dtype)
        out = moe_mlp_ref(
            x, router_w, gate_up, down, num_experts_per_tok, norm_topk_prob,
            **route_kw,
        )
    if return_counts:
        return out, counts
    return out


def moe_mlp_ep(
    x: jnp.ndarray,  # [T, D] replicated
    router_w: jnp.ndarray,  # [D, E] replicated
    gate_up: jnp.ndarray,  # [E, D, 2I] sharded on E over `axis`
    down: jnp.ndarray,  # [E, I, D] sharded on E over `axis`
    num_experts_per_tok: int,
    norm_topk_prob: bool,
    mesh,
    axis: str = "tp",
    **route_kw,
) -> jnp.ndarray:
    """Explicit expert-parallel MoE via shard_map.

    Counterpart of the reference's EP dispatch/combine collectives
    (reference fused_moe.cpp MoE dispatch/combine + DeepEP wrapper,
    ops_api.h all2all rows): each device holds E/n experts, routes on the
    replicated router, computes ONLY its local experts' contributions and
    psum-combines over the axis. Tokens stay replicated (attention output
    is already replicated after the TP all-reduce), so no ragged all2all
    is needed on an ICI mesh — the collective is one psum of [T, D].

    Compute is O(T * E_local) per device on the dense path, or megablox
    gmm over the local expert stack on TPU.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    ntp = mesh.shape[axis]
    e = gate_up.shape[0]  # physical slots (> router width with replicas)
    el = e // ntp
    assert el * ntp == e, "num_experts must divide the EP axis size"
    k = num_experts_per_tok

    def local_fn(xl, rw, gu, dn):
        t = xl.shape[0]
        topv, topi = route(xl, rw, k, norm_topk_prob, **route_kw)
        ax = jax.lax.axis_index(axis)
        lo = ax * el
        # combine weights for LOCAL experts only: [T, El]
        local_id = topi - lo
        in_range = (local_id >= 0) & (local_id < el)
        safe_id = jnp.where(in_range, local_id, 0)
        w_masked = jnp.where(in_range, topv, 0.0)
        comb = jnp.zeros((t, el), jnp.float32)
        comb = jax.vmap(lambda c, idx, v: c.at[idx].add(v))(
            comb, safe_id, w_masked
        )
        i = gu.shape[2] // 2
        guo = jnp.einsum(
            "td,edi->tei", xl, gu, preferred_element_type=jnp.float32
        )
        act = jax.nn.silu(guo[..., :i]) * guo[..., i:]
        out = jnp.einsum(
            "tei,eid->ted", act.astype(xl.dtype), dn,
            preferred_element_type=jnp.float32,
        )
        local_out = jnp.einsum("ted,te->td", out, comb)
        return jax.lax.psum(local_out, axis).astype(xl.dtype)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False,
    )(x, router_w, gate_up, down)


def _ragged_a2a(operand, output, input_offsets, send_sizes,
                output_offsets, recv_sizes, axis: str):
    """`jax.lax.ragged_all_to_all`, with a faithful all_gather-based
    emulation off-TPU (XLA:CPU has no ragged-all-to-all thunk). The
    emulation honors the SAME offset arguments — sender i's chunk to
    device j is read at input_offsets_i[j] and lands at output_offsets
    _i[j] in j's buffer — so the offset math is exercised by CPU tests
    exactly as the real collective would use it."""
    if jax.default_backend() == "tpu":
        return jax.lax.ragged_all_to_all(
            operand, output, input_offsets, send_sizes,
            output_offsets, recv_sizes, axis_name=axis,
        )
    me = jax.lax.axis_index(axis)
    X = jax.lax.all_gather(operand, axis)  # [n, m, ...]
    IO = jax.lax.all_gather(input_offsets, axis)  # [n, n]
    SS = jax.lax.all_gather(send_sizes, axis)  # [n, n]
    OO = jax.lax.all_gather(output_offsets, axis)  # [n, n]
    n = X.shape[0]
    cap = output.shape[0]
    r = jnp.arange(cap)
    lo = OO[:, me][:, None]  # [n, 1] where sender i's chunk starts here
    hi = lo + SS[:, me][:, None]
    hit = (r[None, :] >= lo) & (r[None, :] < hi)  # [n, cap]
    any_hit = hit.any(axis=0)
    i_of_r = jnp.argmax(hit, axis=0)  # sender of each output row
    src_row = IO[i_of_r, me] + r - OO[i_of_r, me]
    gathered = X[i_of_r, jnp.clip(src_row, 0, X.shape[1] - 1)]
    mask = any_hit.reshape((cap,) + (1,) * (output.ndim - 1))
    return jnp.where(mask, gathered, output)


def moe_mlp_ep_a2a(
    x: jnp.ndarray,  # [T, D] sharded on the token dim over `axis`
    router_w: jnp.ndarray,  # [D, E] replicated
    gate_up: jnp.ndarray,  # [E, D, 2I] sharded on E over `axis`
    down: jnp.ndarray,  # [E, I, D] sharded on E over `axis`
    num_experts_per_tok: int,
    norm_topk_prob: bool,
    mesh,
    axis: str = "ep",
    interpret: bool = False,
    **route_kw,
) -> jnp.ndarray:
    """Ragged all-to-all expert parallelism (DeepEP dispatch/combine analog).

    Counterpart of the reference's DeepEP wrapper + MoE dispatch/combine
    collectives (reference xllm/core/layers/common/deep_ep.cpp, kernels
    ops_api.h all2all rows). TPU design: tokens are sharded over the EP
    axis; each device routes its own tokens, sorts the (token, expert)
    pairs by global expert id (which also groups them by owner device and
    by local expert within each owner), exchanges the ragged row groups
    with ONE `jax.lax.ragged_all_to_all` each way, and runs the grouped
    expert MLP over exactly the routed rows it owns. Compute is
    proportional to routed pairs (vs O(T * E_local) for the psum variant
    `moe_mlp_ep`), and the wire bytes are exactly the routed rows — the
    point of DeepEP.

    Receive capacity is the global pair count (n * t_local * k): nothing
    is ever dropped (no capacity factor), at the cost of a worst-case
    buffer. Rows land packed (senders write at exclusive-cumsum offsets),
    so validity is a prefix mask.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    e = gate_up.shape[0]  # physical slots (> router width with replicas)
    el = e // n
    assert el * n == e, "num_experts must divide the EP axis size"
    k = num_experts_per_tok
    i = gate_up.shape[2] // 2
    d = x.shape[-1]

    def local_fn(xl, rw, gu, dn):
        t = xl.shape[0]
        m = t * k  # local routed pairs (static)
        cap = n * m  # worst-case rows this device can receive (static)
        me = jax.lax.axis_index(axis)

        topv, topi = route(xl, rw, k, norm_topk_prob, **route_kw)
        flat_e = topi.reshape(-1)  # [m] global expert ids
        order = jnp.argsort(flat_e)  # by expert => by owner, local-sorted
        token_of_pair = order // k
        xs_send = xl[token_of_pair]  # [m, D]
        ids_send = flat_e[order].astype(jnp.int32)  # [m]

        owner_counts = jnp.bincount(flat_e // el, length=n).astype(jnp.int32)
        send_sizes = owner_counts  # [n]
        input_offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(send_sizes)[:-1]]
        )
        # S[i, j] = rows device i sends to device j
        S = jax.lax.all_gather(send_sizes, axis)  # [n, n]
        recv_sizes = S[:, me]  # [n] from each sender
        # my chunk lands after all lower-ranked senders' chunks to each dst
        below = jnp.where(jnp.arange(n)[:, None] < me, S, 0)
        output_offsets = below.sum(axis=0).astype(jnp.int32)  # [n]

        recv_x = _ragged_a2a(
            xs_send, jnp.zeros((cap, d), xl.dtype),
            input_offsets, send_sizes, output_offsets, recv_sizes, axis,
        )
        recv_ids = _ragged_a2a(
            ids_send[:, None], jnp.zeros((cap, 1), jnp.int32),
            input_offsets, send_sizes, output_offsets, recv_sizes, axis,
        )[:, 0]

        total_recv = recv_sizes.sum()
        valid = jnp.arange(cap) < total_recv
        local_id = jnp.where(valid, recv_ids - me * el, el)  # invalid -> el
        order2 = jnp.argsort(local_id)  # sort by local expert, pads last
        xs_loc = recv_x[order2]
        id_loc = local_id[order2]
        group_sizes = jnp.bincount(id_loc, length=el).astype(jnp.int32)

        if jax.default_backend() == "tpu" or interpret:
            from xllm_tpu.ops.pallas.gmm import gmm as own_gmm

            def _tile(dim: int, pref: int = 128) -> int:
                for c in (128, 64, 32, 16, 8):
                    if c <= pref and dim % c == 0:
                        return c
                return 8

            # park the pad rows on the LAST expert's range so every row is
            # covered by some group; their outputs are garbage but masked
            # out of the combine by `valid`
            offs = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes)]
            ).astype(jnp.int32)
            offs = offs.at[-1].set(cap)
            guo = own_gmm(xs_loc, gu, offs, tm=_tile(cap),
                          tn=_tile(2 * i), interpret=interpret)
            act = (jax.nn.silu(guo[:, :i]) * guo[:, i:]).astype(xl.dtype)
            od = own_gmm(act, dn, offs, tm=_tile(cap), tn=_tile(d),
                         interpret=interpret)
        else:
            # dense per-row oracle (CPU tests): gather each row's expert
            id_safe = jnp.minimum(id_loc, el - 1)
            guo = jnp.einsum(
                "cd,cdi->ci", xs_loc, gu[id_safe],
                preferred_element_type=jnp.float32,
            )
            act = (jax.nn.silu(guo[:, :i]) * guo[:, i:]).astype(xl.dtype)
            od = jnp.einsum(
                "ci,cid->cd", act, dn[id_safe],
                preferred_element_type=jnp.float32,
            )
        od = jnp.where(valid[order2][:, None], od, 0.0).astype(xl.dtype)

        # unsort back to recv-buffer (sender-packed) order
        inv2 = jnp.argsort(order2)
        od_recv_order = od[inv2]

        # reverse exchange: chunk j (rows from device j) goes back to j,
        # landing where j originally read it from (j's input_offsets for
        # destination me)
        rev_in_off = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(recv_sizes)[:-1]]
        )
        j_row = S[jnp.arange(n)]  # [n, n]; row j = device j's send_sizes
        before_me = jnp.where(jnp.arange(n)[None, :] < me, j_row, 0)
        rev_out_off = before_me.sum(axis=1).astype(jnp.int32)  # [n]
        back = _ragged_a2a(
            od_recv_order, jnp.zeros((m, d), xl.dtype),
            rev_in_off, recv_sizes, rev_out_off, send_sizes, axis,
        )  # [m, D] in xs_send order

        w = topv.reshape(-1)[order][:, None]  # [m, 1] f32
        out = jnp.zeros((t, d), jnp.float32)
        out = out.at[token_of_pair].add(back.astype(jnp.float32) * w)
        return out.astype(xl.dtype)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(x, router_w, gate_up, down)
