"""Fused on-device sampler: greedy / temperature / top-k / top-p,
repetition / frequency / presence penalties, per-request seeds, logprobs.

Counterpart of the reference Sampler
(reference xllm/core/framework/sampling/sampler.cpp:29, penalty logits
utils in framework/sampling/) and its fused topK-topP kernel
(docs/en/features/topk_topp.md). TPU design: one jit-fused pass over the
[N, V] logits —

1. a static-K ``lax.approx_max_k`` (K = 64) prunes the vocab once (the
   TPU-optimized PartialReduce path — a full lax.top_k sort measured ~5 ms
   at N=128, V=152k; approx_max_k ~0.2 ms);
2. penalties are applied INSIDE the pruned candidate set: per-candidate
   occurrence counts come from the device-resident token-history ring, so
   no [N, V] histogram is ever built (the reference gathers/scatters seen
   token ids the same way). Tokens outside the 64 best logits are already
   unsampleable, so candidate-set penalties are exact up to the same
   bounded-candidate approximation the pruning itself makes;
3. per-row top-k / top-p masks are applied inside the pruned set;
4. Gumbel-max sampling picks inside the pruned set; rows with a
   per-request ``seed`` draw their gumbel noise from a
   fold_in(seed, step) stream so identical seeded requests reproduce
   exactly regardless of batch composition;
5. greedy rows (temperature == 0) select argmax of the raw logits, or of
   the penalized candidates when penalties are active.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xllm_tpu.runtime.forward_params import SamplingInput

_PRUNE_K = 64
_NEG_INF = -1e30


def as_key(key) -> jax.Array:
    """Accept a typed PRNG key or raw uint32 key data.

    The host passes raw ``np.uint32[2]`` counter words (ModelRunner
    ``_next_key``): building/splitting a typed key on the host is a
    device op per step (~0.8 ms through the dispatch path), while
    wrapping raw data inside the jit is free. Threefry keys are plain
    2x32-bit cipher keys, so distinct counter values give independent
    streams.
    """
    if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key
    return jax.random.wrap_key_data(key.astype(jnp.uint32))


def _penalize(
    top_vals: jnp.ndarray,  # [N, k] raw candidate logits
    top_idx: jnp.ndarray,  # [N, k] candidate token ids
    hist: jnp.ndarray,  # [N, T] token history (junk beyond hist_len)
    si: SamplingInput,
) -> jnp.ndarray:
    """HF/OpenAI-semantics penalties on the candidate set."""
    t = hist.shape[1]
    valid = (
        jnp.arange(t, dtype=jnp.int32)[None, :] < si.hist_len[:, None]
    )  # [N, T]
    # counts[b, c] = occurrences of candidate c in row b's history
    eq = (hist[:, None, :] == top_idx[:, :, None]) & valid[:, None, :]
    counts = jnp.sum(eq, axis=-1).astype(jnp.float32)  # [N, k]
    seen = counts > 0
    rp = si.repetition_penalty[:, None]
    vals = jnp.where(
        seen & (top_vals > 0), top_vals / rp, top_vals
    )
    vals = jnp.where(seen & (top_vals <= 0), top_vals * rp, vals)
    vals = vals - counts * si.frequency_penalty[:, None]
    vals = vals - seen.astype(jnp.float32) * si.presence_penalty[:, None]
    return vals


def sample(
    logits: jnp.ndarray,  # [N, V] f32 or bf16 (model dtype)
    si: SamplingInput,
    hist: jnp.ndarray | None = None,  # [N, T] rows of the history ring
    num_top: int = 0,  # also return the top-K alternatives (OpenAI
    # top_logprobs; reference sampler logprobs path, sampler.cpp:29)
    need_logprobs: bool = True,  # static: skip the exact logsumexp pass
    # over [N, V] when no request in the batch reports logprobs
):
    """-> (token_ids [N] int32, logprobs [N] f32 of the chosen token
    [, top_ids [N, num_top] int32, top_logprobs [N, num_top] f32])."""
    n, v = logits.shape
    k = min(_PRUNE_K, v)

    top_vals, top_idx = jax.lax.approx_max_k(
        logits, k, recall_target=0.95, aggregate_to_topk=True
    )  # [N, k] descending
    top_vals = top_vals.astype(jnp.float32)
    if hist is not None:
        top_vals = _penalize(top_vals, top_idx, hist, si)
        # penalties reorder candidates — re-sort descending by penalized
        # value, since the positional top-k and nucleus prefix masks
        # below assume sorted candidates (HF/OpenAI apply top-k/top-p
        # over the penalized scores)
        order = jnp.argsort(-top_vals, axis=-1)
        top_vals = jnp.take_along_axis(top_vals, order, axis=-1)
        top_idx = jnp.take_along_axis(top_idx, order, axis=-1)
        greedy = top_idx[:, 0].astype(jnp.int32)
    else:
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

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
    gumbel = jax.random.gumbel(as_key(si.key), (n, k), dtype=jnp.float32)
    if si.seeds is not None:
        # per-request reproducible stream: fold_in(seed, step)
        def row_gumbel(seed, step):
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(0), seed), step
            )
            return jax.random.gumbel(key, (k,), dtype=jnp.float32)

        seeded = jax.vmap(row_gumbel)(si.seeds, si.steps)
        gumbel = jnp.where((si.seeds >= 0)[:, None], seeded, gumbel)
    sampled_local = jnp.argmax(masked + gumbel, axis=-1)
    sampled = jnp.take_along_axis(top_idx, sampled_local[:, None], axis=-1)[:, 0]

    tokens = jnp.where(si.temperature == 0.0, greedy, sampled).astype(jnp.int32)

    if not need_logprobs and num_top == 0:
        # no request in the batch reports logprobs: skip the exact
        # full-vocab logsumexp pass (the values are never surfaced)
        return tokens, jnp.zeros((n,), jnp.float32)

    # logprob of the chosen token under the raw (temperature-free) model
    # dist; the f32 upcast fuses into the reduction loop (no [N, V] copy)
    logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(logits, tokens[:, None], axis=-1)[
        :, 0
    ].astype(jnp.float32)
    logprobs = chosen - logz
    if num_top > 0:
        # raw-logit candidates (pre-penalty: alternatives report the model
        # distribution, matching the OpenAI semantics)
        raw_vals, raw_idx = jax.lax.approx_max_k(
            logits, min(num_top, k), recall_target=0.95,
            aggregate_to_topk=True,
        )
        return tokens, logprobs, raw_idx, (
            raw_vals.astype(jnp.float32) - logz[:, None]
        )
    return tokens, logprobs
