"""Fused on-device sampler: greedy / temperature / top-k / top-p + logprobs.

Counterpart of the reference Sampler
(reference xllm/core/framework/sampling/sampler.cpp:29) and its fused
topK-topP kernel (docs/en/features/topk_topp.md). TPU design: one jit-fused
pass over the [N, V] logits —

1. a static-K ``lax.top_k`` (K = 64) prunes the vocab once;
2. per-row top-k / top-p masks are applied inside the pruned set;
3. Gumbel-max sampling picks inside the pruned set (no CDF inversion —
   categorical via argmax keeps everything dense and branch-free);
4. greedy rows (temperature == 0) select argmax of the raw logits.

Truncation note: rows with top_k > 64 or with top_p mass spilling past the
64 largest logits are truncated to the 64 best candidates. This is the same
class of bounded-candidate approximation the reference's fused NPU kernel
makes (top 64 covers > 0.999 of the mass for trained LLMs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xllm_tpu.runtime.forward_params import SamplingInput

_PRUNE_K = 64
_NEG_INF = -1e30


def sample(
    logits: jnp.ndarray,  # [N, V] fp32
    si: SamplingInput,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (token_ids [N] int32, logprobs [N] f32 of the chosen token)."""
    n, v = logits.shape
    k = min(_PRUNE_K, v)

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    top_vals, top_idx = jax.lax.top_k(logits, k)  # [N, k] descending
    temp = jnp.maximum(si.temperature, 1e-6)[:, None]
    scaled = top_vals / temp

    # top-k mask inside the pruned set
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    eff_top_k = jnp.where(si.top_k > 0, jnp.minimum(si.top_k, k), k)[:, None]
    mask = pos < eff_top_k

    # top-p (nucleus) mask: keep the smallest prefix with cum prob >= top_p
    probs = jax.nn.softmax(jnp.where(mask, scaled, _NEG_INF), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    mask = mask & ((cum - probs) < si.top_p[:, None])

    masked = jnp.where(mask, scaled, _NEG_INF)
    gumbel = jax.random.gumbel(si.key, (n, k), dtype=jnp.float32)
    sampled_local = jnp.argmax(masked + gumbel, axis=-1)
    sampled = jnp.take_along_axis(top_idx, sampled_local[:, None], axis=-1)[:, 0]

    tokens = jnp.where(si.temperature == 0.0, greedy, sampled).astype(jnp.int32)

    # logprob of the chosen token under the raw (temperature-free) model dist
    logz = jax.nn.logsumexp(logits, axis=-1)
    chosen = jnp.take_along_axis(logits, tokens[:, None], axis=-1)[:, 0]
    logprobs = chosen - logz
    return tokens, logprobs
