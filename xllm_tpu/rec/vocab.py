"""Semantic-ID item vocabulary + in-graph constrained-decoding masks.

Counterpart of the reference's RecVocabDict
(xllm/core/framework/state_dict/rec_vocab_dict.h — item catalog →
semantic-ID token trie) and RecConstrainedDecoding
(framework/sampling/rec_constrained_decoding.h — first_token_mask cache
+ per-prefix decode masks, PRE_MASK_FACTOR=-1e4 additive masking).

TPU-native redesign: the reference builds masks on host with a 16-thread
pool per decode round. Here the item table lives on device as a dense
[num_items, levels] int32 array and the mask for every beam is computed
IN the beam-search scan:

    matched[b, i] = all_{l<r} (items[i, l] == prefix[b, l])
    allowed[b, v] = any_i matched[b, i] & (items[i, r] == v)

— one compare-reduce plus one bool matmul against a per-round one-hot of
the items' r-th code. No host round-trips; masks are exact trie masks.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

MASK_VALUE = -1e4  # PRE_MASK_FACTOR (rec_constrained_decoding.h:44)


class RecVocab:
    def __init__(self, items: np.ndarray, vocab_size: int):
        """items: [num_items, levels] int32 semantic-ID codes."""
        items = np.asarray(items, np.int32)
        assert items.ndim == 2
        assert items.max() < vocab_size
        self.levels = items.shape[1]
        self.vocab_size = vocab_size
        self.items = jnp.asarray(items)
        # first_token_mask analog: cached level-0 allowed set
        first = np.zeros((vocab_size,), np.bool_)
        first[np.unique(items[:, 0])] = True
        self.first_token_mask = jnp.asarray(first)

    def allowed_mask(self, prefix: jnp.ndarray, round_idx: int):
        """prefix [B, levels] (only cols < round_idx are meaningful) ->
        allowed [B, vocab] bool. round_idx is a static Python int.
        """
        if round_idx == 0:
            return jnp.broadcast_to(self.first_token_mask,
                                    (prefix.shape[0], self.vocab_size))
        eq = self.items[None, :, :round_idx] == prefix[:, None, :round_idx]
        matched = eq.all(-1)  # [B, num_items]
        nxt = jax.nn.one_hot(self.items[:, round_idx], self.vocab_size,
                             dtype=jnp.float32)  # [num_items, V]
        return (matched.astype(jnp.float32) @ nxt) > 0.0

    def item_ids(self, codes: jnp.ndarray):
        """codes [B, levels] -> item row index, or -1 if not in catalog."""
        eq = (self.items[None] == codes[:, None]).all(-1)  # [B, num_items]
        found = eq.any(-1)
        idx = jnp.argmax(eq, -1)
        return jnp.where(found, idx, -1)
