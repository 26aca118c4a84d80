"""Rec engine: fixed-steps constrained beam search over semantic IDs.

Counterpart of the reference's RecEngine / RecWorkerImpl /
FixedStepsScheduler
(xllm/core/distributed_runtime/rec_engine.cpp, runtime/rec_worker_impl.cpp
— prepare_onerec_beam_search_tensors at :130, beam rounds =
kRecTotalSteps (framework/request/rec_type.h:9: 1 prefill + N decode);
scheduler/fixed_steps_scheduler.h:49 batches rec requests and steps all
of them an identical, fixed number of rounds).

TPU-native redesign: the reference drives per-round NPU kernels
(rec_constrained_topk, beam_search_rec) from host. Here ONE jit
compiles: encoder forward + all beam rounds statically unrolled
(levels ≈ 3) + trie-mask constrained top-k per round + final item-id
resolution. Requests are batched by padded behavior length (bucketed),
like every other engine here.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from xllm_tpu.rec.model import OneRecConfig, OneRecModel
from xllm_tpu.rec.vocab import MASK_VALUE, RecVocab
from xllm_tpu.utils import get_logger

logger = get_logger(__name__)

NEG_INF = -1e30


@dataclass
class RecRequest:
    behavior_tokens: list[int]
    top_k: int = 10
    arrival: float = field(default_factory=time.monotonic)
    done: threading.Event = field(default_factory=threading.Event)
    items: np.ndarray | None = None    # [top_k] catalog row ids (-1 pad)
    codes: np.ndarray | None = None    # [top_k, levels]
    scores: np.ndarray | None = None   # [top_k] log-probs
    error: str | None = None


class RecEngine:
    def __init__(self, cfg: OneRecConfig, vocab: RecVocab, *,
                 beam_width: int = 32, max_batch: int = 8,
                 len_buckets: tuple = (64, 256, 1024), seed: int = 0,
                 params=None, decoder_start_token: int = 0):
        self.cfg = cfg
        self.model = OneRecModel(cfg)
        self.vocab = vocab
        self.beam_width = beam_width
        self.max_batch = max_batch
        self.len_buckets = tuple(sorted(len_buckets))
        self.start_token = decoder_start_token
        self.params = params if params is not None else \
            self.model.init_params(jax.random.PRNGKey(seed))
        self._search_cache: dict = {}
        self._queue: "queue.Queue[RecRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- the one compiled program --------------------------------------
    def _search_fn(self, seq_len: int, batch: int):
        key = (seq_len, batch)
        fn = self._search_cache.get(key)
        if fn is not None:
            return fn
        model, vocab, W = self.model, self.vocab, self.beam_width
        L = vocab.levels
        start = self.start_token

        def search(params, tokens, mask):
            B = batch
            enc = model.encode(params, tokens, mask)
            enc_rep = jnp.repeat(enc, W, axis=0)
            mask_rep = jnp.repeat(mask, W, axis=0)

            beams = jnp.zeros((B, W, L), jnp.int32)
            scores = jnp.full((B, W), NEG_INF, jnp.float32)
            scores = scores.at[:, 0].set(0.0)

            for r in range(L):  # static unroll: rounds are tiny & fixed
                flat = beams.reshape(B * W, L)
                dec_in = jnp.concatenate(
                    [jnp.full((B * W, 1), start, jnp.int32), flat], 1)
                logits = model.decode(params, dec_in, enc_rep, mask_rep)
                lp = jax.nn.log_softmax(logits[:, r, :], -1)
                allowed = vocab.allowed_mask(flat, r)
                lp = jnp.where(allowed, lp, lp + MASK_VALUE)
                cand = scores.reshape(B * W, 1) + lp
                cand = cand.reshape(B, W * vocab.vocab_size)
                scores, idx = jax.lax.top_k(cand, W)
                parent = idx // vocab.vocab_size
                tok = (idx % vocab.vocab_size).astype(jnp.int32)
                beams = jnp.take_along_axis(
                    beams, parent[..., None], axis=1)
                beams = beams.at[:, :, r].set(tok)

            items = vocab.item_ids(beams.reshape(B * W, L)).reshape(B, W)
            return beams, scores, items

        fn = jax.jit(search)
        self._search_cache[key] = fn
        return fn

    # -- batching loop --------------------------------------------------
    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def submit(self, req: RecRequest) -> RecRequest:
        self._queue.put(req)
        return req

    def _loop(self):
        pending: list[RecRequest] = []
        while not self._stop.is_set():
            try:
                pending.append(self._queue.get(timeout=0.05))
            except queue.Empty:
                if not pending:
                    continue
            while len(pending) < self.max_batch:
                try:
                    pending.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            batch, pending = pending[: self.max_batch], \
                pending[self.max_batch:]
            try:
                self._run_batch(batch)
            except Exception as e:  # noqa: BLE001 — fail the batch, not the loop
                logger.exception("rec batch failed")
                for r in batch:
                    r.error = str(e)
                    r.done.set()

    def _bucket(self, n: int) -> int:
        for b in self.len_buckets:
            if n <= b:
                return b
        return self.len_buckets[-1]

    def _run_batch(self, batch: list[RecRequest]):
        seq_len = self._bucket(max(len(r.behavior_tokens) for r in batch))
        B = len(batch)
        tokens = np.zeros((B, seq_len), np.int32)
        mask = np.zeros((B, seq_len), np.float32)
        for i, r in enumerate(batch):
            t = r.behavior_tokens[-seq_len:]
            tokens[i, : len(t)] = t
            mask[i, : len(t)] = 1.0
        fn = self._search_fn(seq_len, B)
        beams, scores, items = fn(self.params, jnp.asarray(tokens),
                                  jnp.asarray(mask))
        beams = np.asarray(beams)   # sync (axon: block_until_ready lies)
        scores = np.asarray(scores)
        items = np.asarray(items)
        for i, r in enumerate(batch):
            k = min(r.top_k, self.beam_width)
            r.codes = beams[i, :k]
            r.scores = scores[i, :k]
            r.items = items[i, :k]
            r.done.set()

    # -- sync convenience ----------------------------------------------
    def recommend(self, req: RecRequest, timeout: float = 300.0):
        if self._thread is None:
            self.start()
        self.submit(req)
        if not req.done.wait(timeout):
            raise TimeoutError("rec request timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req
