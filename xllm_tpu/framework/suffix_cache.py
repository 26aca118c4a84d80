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

from collections import defaultdict


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
