"""Gated DeltaNet (qwen3-next linear attention) recurrence + causal conv.

Counterpart of the reference's GDN kernel family + causal conv1d
(reference xllm/core/kernels/ops_api.h gated delta rule ops,
xllm/models/llm/qwen3_next_hybrid_base.h linear-attention layers). TPU
design notes:

- ONE ``lax.scan`` over the token axis carries BOTH the short-conv tail
  (last K-1 pre-activation channel vectors) and the recurrent state
  S [Hv, Dk, Dv]; each step is a couple of small einsums that XLA fuses —
  there is no better layout for a strictly sequential recurrence at
  decode, and prefill throughput comes from vmapping the scan over the
  row axis of the batched-prefill input.
- the per-token "valid" mask freezes both carries on padded tail tokens,
  so bucket padding never corrupts sequence state (the linear-attention
  equivalent of writing padded KV to the null block).
- state is carried in f32 (the recurrence is numerically delicate:
  exp-decay + rank-1 updates), activations stay in the model dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """FLA-convention l2 normalization (rsqrt(sum(x^2) + eps))."""
    x = x.astype(jnp.float32)
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def gdn_scan(
    x_qkv: jnp.ndarray,  # [T, conv_dim] pre-conv concat(q|k|v) channels
    g: jnp.ndarray,  # [T, Hv] f32 log-decay
    beta: jnp.ndarray,  # [T, Hv] f32 write strength
    valid: jnp.ndarray,  # [T] bool
    conv_w: jnp.ndarray,  # [conv_dim, K] depthwise kernel
    conv_tail0: jnp.ndarray,  # [conv_dim, K-1] carry-in (prev chunk)
    state0: jnp.ndarray,  # [Hv, Dk, Dv] f32 carry-in
    *,
    num_k_heads: int,
    num_v_heads: int,
    head_k_dim: int,
    head_v_dim: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (out [T, Hv, Dv] f32, conv_tail [conv_dim, K-1], state [Hv,Dk,Dv]).

    Fused causal depthwise conv (kernel K, silu) + delta-rule recurrence
    (HF torch_recurrent_gated_delta_rule semantics, incl. qk l2-norm and
    the 1/sqrt(Dk) query scale).
    """
    hk, hv = num_k_heads, num_v_heads
    dk, dv = head_k_dim, head_v_dim
    key_dim = hk * dk
    r = hv // hk
    conv_w = conv_w.astype(jnp.float32)
    x_qkv = x_qkv.astype(jnp.float32)

    def step(carry, inp):
        tail, S = carry  # [conv_dim, K-1], [Hv, Dk, Dv]
        x_t, g_t, b_t, ok = inp
        window = jnp.concatenate([tail, x_t[:, None]], axis=1)  # [cd, K]
        conv = jnp.sum(window * conv_w, axis=1)  # [conv_dim]
        conv = conv * jax.nn.sigmoid(conv)  # silu
        q = conv[:key_dim].reshape(hk, dk)
        k = conv[key_dim : 2 * key_dim].reshape(hk, dk)
        v = conv[2 * key_dim :].reshape(hv, dv)
        q = l2norm(q) * (dk**-0.5)
        k = l2norm(k)
        if r > 1:
            q = jnp.repeat(q, r, axis=0)  # [Hv, Dk]
            k = jnp.repeat(k, r, axis=0)
        S2 = S * jnp.exp(g_t)[:, None, None]
        kv_mem = jnp.einsum("hk,hkv->hv", k, S2)
        delta = (v - kv_mem) * b_t[:, None]
        S2 = S2 + k[:, :, None] * delta[:, None, :]
        o = jnp.einsum("hk,hkv->hv", q, S2)
        tail2 = window[:, 1:]
        S_next = jnp.where(ok, S2, S)
        tail_next = jnp.where(ok, tail2, tail)
        return (tail_next, S_next), o

    (tail, state), out = jax.lax.scan(
        step,
        (conv_tail0.astype(jnp.float32), state0.astype(jnp.float32)),
        (x_qkv, g.astype(jnp.float32), beta.astype(jnp.float32), valid),
    )
    return out, tail, state


def gdn_gate_params(
    a: jnp.ndarray,  # [T, Hv] raw a
    b: jnp.ndarray,  # [T, Hv] raw b
    A_log: jnp.ndarray,  # [Hv]
    dt_bias: jnp.ndarray,  # [Hv]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (g log-decay [T, Hv] f32, beta [T, Hv] f32)."""
    g = -jnp.exp(A_log.astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + dt_bias.astype(jnp.float32)
    )
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    return g, beta


def gated_rms_norm(
    x: jnp.ndarray,  # [..., Dv] f32
    z: jnp.ndarray,  # [..., Dv] gate
    w: jnp.ndarray,  # [Dv]
    eps: float,
) -> jnp.ndarray:
    """Qwen3NextRMSNormGated: plain-weight RMS norm then * silu(z)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    n = xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    return n * (zf * jax.nn.sigmoid(zf))
