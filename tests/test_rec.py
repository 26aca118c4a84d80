"""Rec stack tests: OneRec T5 model, vocab trie masks, fixed-steps beam.

Coverage model: reference rec_vocab_dict_test.cpp + rec_worker_impl
beam-search semantics (kRecTotalSteps fixed rounds, constrained top-k).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xllm_tpu.rec import OneRecConfig, OneRecModel, RecEngine, RecRequest, RecVocab


def tiny_cfg(**kw):
    base = dict(vocab_size=32, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                num_decoder_layers=2, num_heads=4,
                relative_attention_num_buckets=8,
                relative_attention_max_distance=32)
    base.update(kw)
    return OneRecConfig(**base)


CATALOG = np.array([
    [3, 5, 7],
    [3, 5, 9],
    [3, 6, 7],
    [4, 5, 7],
    [4, 8, 2],
    [10, 1, 1],
], np.int32)


class TestModel:
    def test_encode_decode_shapes(self):
        cfg = tiny_cfg()
        m = OneRecModel(cfg)
        p = m.init_params(jax.random.PRNGKey(0))
        toks = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.float32)
        enc = m.encode(p, toks, mask)
        assert enc.shape == (2, 4, 32)
        dec = jnp.asarray([[0, 3, 5], [0, 4, 8]], jnp.int32)
        logits = m.decode(p, dec, enc, mask)
        assert logits.shape == (2, 3, 32)
        assert np.isfinite(np.asarray(logits)).all()

    def test_decoder_causality(self):
        """Logits at position r must not depend on tokens after r."""
        cfg = tiny_cfg()
        m = OneRecModel(cfg)
        p = m.init_params(jax.random.PRNGKey(0))
        toks = jnp.asarray([[1, 2, 3]], jnp.int32)
        mask = jnp.ones((1, 3), jnp.float32)
        enc = m.encode(p, toks, mask)
        a = m.decode(p, jnp.asarray([[0, 3, 5]], jnp.int32), enc, mask)
        b = m.decode(p, jnp.asarray([[0, 3, 9]], jnp.int32), enc, mask)
        np.testing.assert_allclose(np.asarray(a[:, :2]), np.asarray(b[:, :2]),
                                   rtol=1e-5, atol=1e-6)

    def test_encoder_mask_blocks_padding(self):
        """Padded positions must not affect unpadded outputs."""
        cfg = tiny_cfg()
        m = OneRecModel(cfg)
        p = m.init_params(jax.random.PRNGKey(0))
        mask = jnp.asarray([[1, 1, 0, 0]], jnp.float32)
        a = m.encode(p, jnp.asarray([[1, 2, 3, 4]], jnp.int32), mask)
        b = m.encode(p, jnp.asarray([[1, 2, 9, 9]], jnp.int32), mask)
        np.testing.assert_allclose(np.asarray(a[:, :2]), np.asarray(b[:, :2]),
                                   rtol=1e-5, atol=1e-6)

    def test_untied_head(self):
        cfg = tiny_cfg(tie_word_embeddings=False)
        m = OneRecModel(cfg)
        p = m.init_params(jax.random.PRNGKey(0))
        assert "lm_head" in p


class TestVocab:
    def test_first_token_mask(self):
        v = RecVocab(CATALOG, vocab_size=32)
        m = np.asarray(v.first_token_mask)
        assert set(np.nonzero(m)[0]) == {3, 4, 10}

    def test_allowed_mask_matches_bruteforce(self):
        v = RecVocab(CATALOG, vocab_size=32)
        prefixes = jnp.asarray([[3, 5, 0], [4, 0, 0], [10, 1, 0]], jnp.int32)
        for r in (1, 2):
            got = np.asarray(v.allowed_mask(prefixes, r))
            for b, pref in enumerate(np.asarray(prefixes)):
                want = set()
                for item in CATALOG:
                    if (item[:r] == pref[:r]).all():
                        want.add(int(item[r]))
                assert set(np.nonzero(got[b])[0]) == want, (r, b)

    def test_item_ids(self):
        v = RecVocab(CATALOG, vocab_size=32)
        codes = jnp.asarray([[3, 5, 9], [4, 8, 2], [3, 5, 8]], jnp.int32)
        ids = np.asarray(v.item_ids(codes))
        assert list(ids) == [1, 4, -1]


class TestBeamSearch:
    def _exhaustive_best(self, engine, tokens, mask):
        """Score every catalog item with the raw model; return argmax row."""
        m, p = engine.model, engine.params
        enc = m.encode(p, tokens, mask)
        best, best_score = None, -np.inf
        for i, item in enumerate(CATALOG):
            dec = jnp.asarray([[0] + list(item)], jnp.int32)
            logits = m.decode(p, dec, enc, mask)
            lp = jax.nn.log_softmax(logits[0, :3], -1)
            s = float(sum(lp[r, item[r]] for r in range(3)))
            if s > best_score:
                best, best_score = i, s
        return best, best_score

    def test_beam_matches_exhaustive(self):
        vocab = RecVocab(CATALOG, vocab_size=32)
        eng = RecEngine(tiny_cfg(), vocab, beam_width=8, seed=3)
        tokens = jnp.asarray([[5, 9, 2, 17]], jnp.int32)
        mask = jnp.ones((1, 4), jnp.float32)
        fn = eng._search_fn(4, 1)
        beams, scores, items = fn(eng.params, tokens, mask)
        want_item, want_score = self._exhaustive_best(eng, tokens, mask)
        assert int(items[0, 0]) == want_item
        np.testing.assert_allclose(float(scores[0, 0]), want_score,
                                   rtol=1e-4, atol=1e-4)

    def test_all_top_beams_are_catalog_items(self):
        vocab = RecVocab(CATALOG, vocab_size=32)
        eng = RecEngine(tiny_cfg(), vocab, beam_width=6, seed=1)
        tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        mask = jnp.ones((1, 4), jnp.float32)
        beams, scores, items = eng._search_fn(4, 1)(
            eng.params, tokens, mask)
        # 6 catalog items, width 6 -> every returned beam is a real item
        assert (np.asarray(items)[0] >= 0).all()
        assert len(set(np.asarray(items)[0])) == 6


class TestEngine:
    def test_batched_requests(self):
        vocab = RecVocab(CATALOG, vocab_size=32)
        eng = RecEngine(tiny_cfg(), vocab, beam_width=4, max_batch=4,
                        len_buckets=(8, 16))
        r1 = eng.recommend(RecRequest(behavior_tokens=[1, 2, 3], top_k=3))
        r2 = eng.recommend(RecRequest(behavior_tokens=list(range(12)),
                                      top_k=2))
        assert r1.items.shape == (3,)
        assert r1.codes.shape == (3, 3)
        assert r2.items.shape == (2,)
        assert np.isfinite(r1.scores).all()
        eng.stop()


def test_rec_completions_endpoint():
    """/v1/rec/completions (reference rec_completion_service_impl.cpp):
    text_completion-shaped response whose choices are recommended catalog
    items with semantic ids + beam scores."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from xllm_tpu.rec.service import RecServer

    vocab = RecVocab(CATALOG, vocab_size=32)
    eng = RecEngine(tiny_cfg(), vocab, beam_width=8, seed=3)
    eng.start()
    server = RecServer(eng, model_name="tiny-rec")
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(server.build_app()), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def go():
            r = await client.get("/health")
            assert r.status == 200
            r = await client.post("/v1/rec/completions", json={
                "behavior_tokens": [5, 9, 2, 17], "n": 3,
            })
            assert r.status == 200, await r.text()
            body = await r.json()
            assert body["object"] == "text_completion"
            assert 1 <= len(body["choices"]) <= 3
            for c in body["choices"]:
                assert 0 <= c["item_id"] < len(CATALOG)
                assert len(c["semantic_ids"]) == CATALOG.shape[1]
            # scores descend
            scores = [c["score"] for c in body["choices"]]
            assert scores == sorted(scores, reverse=True)
            r = await client.post("/v1/rec/completions", json={})
            assert r.status == 400

        loop.run_until_complete(go())
    finally:
        loop.run_until_complete(client.close())
        loop.close()
        eng.stop()
