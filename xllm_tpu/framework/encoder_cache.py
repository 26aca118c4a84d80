"""Vision-encoder output cache keyed by image content hash.

Counterpart of the reference's EncoderCache
(reference xllm/core/framework/encoder_cache/encoder_cache.h:29): repeated
images (multi-turn chats re-sending history) skip the vision tower.
Host-memory LRU over numpy embedding blocks.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


class EncoderCache:
    def __init__(self, capacity: int = 64):
        self.capacity = capacity
        self._store: OrderedDict[str, np.ndarray] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> np.ndarray | None:
        emb = self._store.get(key)
        if emb is not None:
            self._store.move_to_end(key)
            self.hits += 1
        else:
            self.misses += 1
        return emb

    def put(self, key: str, embeds: np.ndarray) -> None:
        self._store[key] = embeds
        self._store.move_to_end(key)
        while len(self._store) > self.capacity:
            self._store.popitem(last=False)
