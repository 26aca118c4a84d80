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


# ----------------------------------------------------------------------
# penalties + per-request seed (VERDICT r1 item 6)
# ----------------------------------------------------------------------
def _si(n, v=None, **kw):
    import numpy as np

    from xllm_tpu.runtime.forward_params import SamplingInput

    defaults = dict(
        temperature=np.zeros(n, np.float32),
        top_k=np.zeros(n, np.int32),
        top_p=np.ones(n, np.float32),
        key=jax.random.key(0),
        seeds=np.full(n, -1, np.int32),
        steps=np.zeros(n, np.int32),
        repetition_penalty=np.ones(n, np.float32),
        frequency_penalty=np.zeros(n, np.float32),
        presence_penalty=np.zeros(n, np.float32),
        hist_len=np.zeros(n, np.int32),
    )
    defaults.update(kw)
    return SamplingInput(**defaults)


def test_repetition_penalty_matches_hf_semantics():
    """Greedy + repetition penalty == HF: score/p if >0 else score*p for
    every seen token."""
    import numpy as np

    rng = np.random.default_rng(0)
    n, v, t = 4, 300, 12
    logits = jnp.asarray(rng.standard_normal((n, v)) * 3, jnp.float32)
    hist = jnp.asarray(rng.integers(0, v, size=(n, t)), jnp.int32)
    hist_len = np.asarray([t, t, 5, 0], np.int32)
    rp = np.asarray([1.8, 1.0, 2.5, 3.0], np.float32)

    si = _si(n, repetition_penalty=rp, hist_len=hist_len)
    tokens, _ = sample(logits, si, hist)

    ref = np.asarray(logits, np.float64).copy()
    for b in range(n):
        seen = set(np.asarray(hist[b, : hist_len[b]]).tolist())
        for tok in seen:
            s = ref[b, tok]
            ref[b, tok] = s / rp[b] if s > 0 else s * rp[b]
    np.testing.assert_array_equal(np.asarray(tokens), ref.argmax(-1))


def test_frequency_presence_penalties_match_openai_semantics():
    import numpy as np

    rng = np.random.default_rng(1)
    n, v, t = 3, 200, 16
    logits = jnp.asarray(rng.standard_normal((n, v)) * 2, jnp.float32)
    hist = jnp.asarray(rng.integers(0, 40, size=(n, t)), jnp.int32)
    hist_len = np.full(n, t, np.int32)
    freq = np.asarray([0.9, 0.0, 0.4], np.float32)
    pres = np.asarray([0.0, 1.3, 0.7], np.float32)

    si = _si(n, frequency_penalty=freq, presence_penalty=pres,
             hist_len=hist_len)
    tokens, _ = sample(logits, si, hist)

    ref = np.asarray(logits, np.float64).copy()
    for b in range(n):
        counts = np.bincount(np.asarray(hist[b]), minlength=v)
        ref[b] -= counts * freq[b] + (counts > 0) * pres[b]
    np.testing.assert_array_equal(np.asarray(tokens), ref.argmax(-1))


def test_per_request_seed_reproducible_and_batch_independent():
    import numpy as np

    rng = np.random.default_rng(2)
    v = 500
    logits4 = np.asarray(rng.standard_normal((4, v)), np.float32)
    logits4[1] = logits4[0]  # rows 0/1: same seed + same logits
    logits4 = jnp.asarray(logits4)
    temps = np.full(4, 0.9, np.float32)

    si_a = _si(4, temperature=temps,
               seeds=np.asarray([7, 7, -1, 123], np.int32),
               key=jax.random.key(11))
    si_b = _si(4, temperature=temps,
               seeds=np.asarray([7, 7, -1, 123], np.int32),
               key=jax.random.key(99))  # different engine key
    ta, _ = sample(logits4, si_a)
    tb, _ = sample(logits4, si_b)
    ta, tb = np.asarray(ta), np.asarray(tb)
    # seeded rows reproduce regardless of the engine key; same seed + same
    # logits + same step -> same token
    assert ta[0] == tb[0] and ta[1] == tb[1] and ta[3] == tb[3]
    assert ta[0] == ta[1]

    # batch composition must not change a seeded row's stream
    logits1 = logits4[0:1]
    si_1 = _si(1, temperature=temps[:1],
               seeds=np.asarray([7], np.int32), key=jax.random.key(42))
    t1, _ = sample(logits1, si_1)
    assert np.asarray(t1)[0] == ta[0]

    # a different step index moves the stream (usually)
    si_s = _si(1, temperature=temps[:1], seeds=np.asarray([7], np.int32),
               steps=np.asarray([5], np.int32), key=jax.random.key(42))
    t5, _ = sample(logits1, si_s)
    assert t5.shape == (1,)


def test_penalties_respect_topk_ordering():
    """Regression: the positional top-k/top-p masks assumed candidates
    stayed sorted, but penalties reorder them — with top_k=1 the sampler
    kept the RAW argmax (now penalized below other candidates) instead of
    the best penalized candidate."""
    import numpy as np

    v = 100
    logits = np.full((1, v), -10.0, np.float32)
    logits[0, 7] = 5.0   # raw best — but heavily penalized below
    logits[0, 21] = 4.0  # best after penalties
    hist = jnp.asarray([[7] * 6], jnp.int32)
    si = _si(
        1,
        temperature=np.asarray([1.0], np.float32),
        top_k=np.asarray([1], np.int32),
        repetition_penalty=np.asarray([100.0], np.float32),
        hist_len=np.asarray([6], np.int32),
    )
    tokens, _ = sample(jnp.asarray(logits), si, hist)
    assert int(tokens[0]) == 21
