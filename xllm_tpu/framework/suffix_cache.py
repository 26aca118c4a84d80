"""Suffix-match draft-token proposer (model-free speculative decoding).

Counterpart of the reference's suffix decoding stack
(reference xllm/core/util/suffix_tree.h:129,144, SuffixDecodingCache used by
SuffixWorkerImpl, suffix_worker_impl.h:30): drafts are proposed by matching
the sequence's recent tokens against its own history (prompt + generation)
and optionally a global cache of finished generations.

Implementation: per-sequence hash map from fixed-length n-grams to the
position after their latest occurrence — O(1) append, O(match_len) lookup —
equivalent in effect to the reference's suffix-tree walk for bounded
pattern lengths.
"""

from __future__ import annotations


class SuffixProposer:
    """Per-sequence n-gram index proposing continuation drafts."""

    def __init__(self, min_match: int = 2, max_match: int = 4):
        self.min_match = min_match
        self.max_match = max_match
        # ngram tuple -> last position AFTER the ngram occurrence
        self._index: dict[tuple, int] = {}
        self._len = 0

    def extend(self, token_ids: list[int], upto: int) -> None:
        """Index token_ids[:upto] (append-only; call with growing upto)."""
        for end in range(max(self._len, self.min_match), upto):
            for n in range(self.min_match, self.max_match + 1):
                if end - n < 0:
                    break
                self._index[tuple(token_ids[end - n : end])] = end
        self._len = max(self._len, upto)

    def propose(self, token_ids: list[int], k: int) -> list[int]:
        """Draft up to k tokens continuing the current suffix."""
        n_tok = len(token_ids)
        for n in range(min(self.max_match, n_tok), self.min_match - 1, -1):
            pos = self._index.get(tuple(token_ids[n_tok - n : n_tok]))
            if pos is not None and pos < n_tok:
                draft = token_ids[pos : pos + k]
                return list(draft)
        return []


class GlobalSuffixCache:
    """Cross-request draft source over FINISHED generations.

    Counterpart of the reference's global SuffixDecodingCache tree over
    completed responses (reference suffix_tree.h:129,144 +
    suffix_worker_impl.h:30 cache update on finish): when a sequence's
    own history has no matching suffix, repeated prompts/responses from
    earlier requests still yield drafts. Finished sequences are appended
    to one token stream with an impossible-token separator (ngrams never
    span generations); the ngram index is the same structure as
    SuffixProposer / the native C++ index, with drafts read from the
    stream (si_propose_from). Capacity is bounded by an epoch reset —
    when the stream exceeds ``max_tokens`` the index restarts empty (the
    reference prunes its tree by eviction; the reset is the bounded-
    memory equivalent for a hash index).
    """

    SEP = -7

    def __init__(
        self,
        min_match: int = 2,
        max_match: int = 4,
        max_tokens: int = 500_000,
    ):
        import numpy as np

        self.min_match = min_match
        self.max_match = max_match
        self.max_tokens = max_tokens
        self._np = np
        self._reset()

    def _reset(self) -> None:
        self._stream = self._np.zeros(0, self._np.int32)
        self._n = 0
        try:
            from xllm_tpu import native

            if native.available():
                self._idx = native.NativeSuffixIndex(
                    self.min_match, self.max_match
                )
            else:
                self._idx = None
        except Exception:
            self._idx = None
        self._py_index: dict[tuple, int] = {}

    def add(self, token_ids: list[int]) -> None:
        """Index one finished generation (prompt + response)."""
        if not token_ids:
            return
        if self._n + len(token_ids) + 1 > self.max_tokens:
            self._reset()
        np = self._np
        new = np.asarray(list(token_ids) + [self.SEP], np.int32)
        if self._n + len(new) > len(self._stream):
            grown = np.zeros(
                max(len(self._stream) * 2, self._n + len(new), 4096),
                np.int32,
            )
            grown[: self._n] = self._stream[: self._n]
            self._stream = grown
        self._stream[self._n : self._n + len(new)] = new
        old_n = self._n
        self._n += len(new)
        if self._idx is not None:
            self._idx.extend(self._stream[: self._n], self._n)
        else:
            toks = self._stream
            for end in range(max(old_n, self.min_match), self._n):
                for n in range(self.min_match, self.max_match + 1):
                    if end - n < 0:
                        break
                    self._py_index[
                        tuple(int(t) for t in toks[end - n : end])
                    ] = end

    def propose(self, token_ids: list[int], k: int) -> list[int]:
        """Draft from earlier generations continuing this suffix."""
        if self._n == 0:
            return []
        if self._idx is not None:
            tail = token_ids[-self.max_match :]
            draft = self._idx.propose_from(
                self._stream[: self._n], tail, k
            )
        else:
            n_tok = len(token_ids)
            draft = []
            for n in range(
                min(self.max_match, n_tok), self.min_match - 1, -1
            ):
                key = tuple(token_ids[n_tok - n : n_tok])
                pos = self._py_index.get(key)
                if pos is not None:
                    draft = [
                        int(t)
                        for t in self._stream[pos : pos + k]
                    ]
                    break
        out = []
        for t in draft:
            if t == self.SEP:
                break
            out.append(t)
        return out
