"""On-device sampler tests (reference tests/core/framework/sampling/)."""

import jax
import jax.numpy as jnp
import numpy as np

from xllm_tpu.runtime.forward_params import SamplingInput
from xllm_tpu.runtime.sampler import sample


def si(n, temperature=1.0, top_k=0, top_p=1.0, seed=0):
    return SamplingInput(
        temperature=jnp.full((n,), temperature, jnp.float32),
        top_k=jnp.full((n,), top_k, jnp.int32),
        top_p=jnp.full((n,), top_p, jnp.float32),
        key=jax.random.key(seed),
    )


def test_greedy_picks_argmax():
    logits = jnp.array(np.random.default_rng(0).normal(size=(4, 50)), jnp.float32)
    tokens, logprobs = sample(logits, si(4, temperature=0.0))
    np.testing.assert_array_equal(np.asarray(tokens), np.argmax(logits, -1))
    # logprob is log-softmax of the chosen token
    expected = jax.nn.log_softmax(logits, -1)[np.arange(4), np.asarray(tokens)]
    np.testing.assert_allclose(np.asarray(logprobs), np.asarray(expected), rtol=1e-5)


def test_top_k_1_equals_greedy():
    logits = jnp.array(np.random.default_rng(1).normal(size=(8, 64)), jnp.float32)
    tokens, _ = sample(logits, si(8, temperature=1.0, top_k=1))
    np.testing.assert_array_equal(np.asarray(tokens), np.argmax(logits, -1))


def test_top_k_restricts_support():
    rng = np.random.default_rng(2)
    logits = jnp.array(rng.normal(size=(1, 100)), jnp.float32)
    top5 = set(np.argsort(np.asarray(logits[0]))[-5:].tolist())
    seen = set()
    for seed in range(50):
        tokens, _ = sample(logits, si(1, temperature=2.0, top_k=5, seed=seed))
        seen.add(int(tokens[0]))
    assert seen <= top5
    assert len(seen) > 1  # actually samples


def test_top_p_restricts_support():
    # one dominant token (p ~ 0.97) -> top_p=0.5 must always pick it
    logits = jnp.zeros((1, 32), jnp.float32).at[0, 7].set(5.0)
    for seed in range(20):
        tokens, _ = sample(logits, si(1, temperature=1.0, top_p=0.5, seed=seed))
        assert int(tokens[0]) == 7


def test_mixed_rows():
    logits = jnp.array(np.random.default_rng(3).normal(size=(2, 40)), jnp.float32)
    inp = SamplingInput(
        temperature=jnp.array([0.0, 1.0], jnp.float32),
        top_k=jnp.array([0, 3], jnp.int32),
        top_p=jnp.array([1.0, 1.0], jnp.float32),
        key=jax.random.key(0),
    )
    tokens, _ = sample(logits, inp)
    assert int(tokens[0]) == int(jnp.argmax(logits[0]))
    top3 = set(np.argsort(np.asarray(logits[1]))[-3:].tolist())
    assert int(tokens[1]) in top3


def test_distribution_roughly_matches_softmax():
    """Temperature sampling over a tiny vocab approximates softmax freqs."""
    logits = jnp.array([[0.0, 1.0, 2.0]] , jnp.float32)
    probs = np.asarray(jax.nn.softmax(logits[0]))
    counts = np.zeros(3)
    n = 400
    for seed in range(n):
        tokens, _ = sample(logits, si(1, temperature=1.0, seed=seed))
        counts[int(tokens[0])] += 1
    freq = counts / n
    np.testing.assert_allclose(freq, probs, atol=0.08)
