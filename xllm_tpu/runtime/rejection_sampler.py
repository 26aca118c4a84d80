"""Speculative-decoding rejection sampler (device side, jit-friendly).

Counterpart of the reference RejectionSampler
(reference xllm/core/framework/sampling/rejection_sampler.cpp:65): given k
draft tokens per sequence and the target model's logits at each of the k+1
verify positions, accept the longest draft prefix per the speculative
sampling rule and emit one bonus/resample token — so each verified step
yields between 1 and k+1 tokens.

Greedy rows (temperature 0) accept while target argmax == draft; sampled
rows use the standard accept-with-prob(min(1, p/q)) rule with q taken as
the draft distribution. The suffix/ngram drafter proposes deterministic
drafts (q = one-hot), for which the rule degenerates to accept iff
u < p[draft] — implemented as the ``deterministic_draft`` mode.

All shapes static: returns a dense [B, k+1] token matrix plus
``num_accepted`` — callers take ``tokens[b, :num_accepted[b]]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rejection_sample(
    draft_tokens: jnp.ndarray,  # [B, k] int32 (padded rows: anything)
    draft_lens: jnp.ndarray,  # [B] int32 actual drafts per row (0..k)
    target_logits: jnp.ndarray,  # [B, k+1, V] f32
    temperature: jnp.ndarray,  # [B] f32 (0 = greedy)
    key: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (tokens [B, k+1] int32, num_accepted [B] int32 in [1, k+1]).

    tokens[b, :num_accepted[b]] are the emitted tokens: the accepted draft
    prefix followed by the target's own token at the first mismatch (or the
    bonus token when everything was accepted).
    """
    b, k1, v = target_logits.shape
    k = k1 - 1
    from xllm_tpu.runtime.sampler import as_key

    key = as_key(key)

    greedy = jnp.argmax(target_logits, axis=-1).astype(jnp.int32)  # [B, k+1]

    # sampled-path target choice per position (gumbel-max, like the sampler)
    temp = jnp.maximum(temperature, 1e-6)[:, None, None]
    gumbel = jax.random.gumbel(key, (b, k1, v), dtype=jnp.float32)
    sampled = jnp.argmax(target_logits / temp + gumbel, axis=-1).astype(jnp.int32)
    target_choice = jnp.where(
        (temperature == 0.0)[:, None], greedy, sampled
    )  # [B, k+1]

    # deterministic-draft acceptance: position j accepted iff the target's
    # own choice equals the draft (exact for greedy; for sampled rows this
    # is the p/q rule collapsed over the gumbel choice)
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    is_draft = pos < draft_lens[:, None]  # [B, k]
    match = (target_choice[:, :k] == draft_tokens) & is_draft
    # accepted[j] = all matches in positions <= j
    acc_prefix = jnp.cumprod(match.astype(jnp.int32), axis=1)  # [B, k]
    num_match = acc_prefix.sum(axis=1)  # [B] accepted draft tokens

    # emit: accepted drafts then the target token at the break position
    num_accepted = num_match + 1  # [B] in [1, k+1]
    out_pos = jnp.arange(k1, dtype=jnp.int32)[None, :]
    take_draft = out_pos < num_match[:, None]
    draft_padded = jnp.pad(draft_tokens, ((0, 0), (0, 1)))
    break_tok = jnp.take_along_axis(
        target_choice, num_match[:, None], axis=1
    )  # [B, 1] target token at first mismatch / bonus position
    tokens = jnp.where(take_draft, draft_padded, break_tok)
    return tokens, num_accepted
