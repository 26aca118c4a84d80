"""BlockManager backed by the native (C++) allocator + prefix cache.

Same public surface as framework.block_manager.BlockManager, with the
ref-count/LRU/hash-chain core in xllm_tpu/native/src/block_cache.cpp —
the subsystem the reference keeps in C++ (SURVEY.md §2.4). Selectable via
CacheConfig.block_backend ("python" | "native" | "auto"); equivalence is
proven operation-for-operation in tests/test_native.py.
"""

from __future__ import annotations

import numpy as np

from xllm_tpu.framework.request import Sequence
from xllm_tpu.utils import cdiv


class NativeBlockManager:
    NULL_BLOCK = 0

    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        enable_prefix_cache: bool = True,
        hierarchy=None,
        base: int = 0,  # global id of this pool's first block (DP shard)
    ) -> None:
        from xllm_tpu import native

        self.base = base
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (block 0 is reserved)")
        self._lib = native.load()
        self._h = self._lib.bc_create(
            num_blocks, block_size, int(enable_prefix_cache)
        )
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_cache = enable_prefix_cache
        self.hierarchy = hierarchy
        # seq_id -> (num_hashed_blocks, chain_hash)
        self._released: dict = {}
        self._seq_chain: dict[int, tuple[int, int]] = {}
        self._ev_blocks = np.zeros(4096, np.int32)
        self._ev_hashes = np.zeros(4096, np.uint64)

    @property
    def null_block(self) -> int:
        return self.base

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bc_destroy(self._h)
            self._h = None

    # ---- capacity ----
    @property
    def num_free_blocks(self) -> int:
        return self._lib.bc_num_free(self._h)

    @property
    def num_used_blocks(self) -> int:
        return self.num_blocks - 1 - self.num_free_blocks

    def has_capacity(self, n: int) -> bool:
        return self.num_free_blocks >= n

    def _drain_evictions(self) -> None:
        if self.hierarchy is None:
            return
        n = self._lib.bc_drain_evictions(
            self._h, self._ev_blocks, self._ev_hashes, len(self._ev_blocks)
        )
        for i in range(n):
            self.hierarchy.on_device_evict(
                self.base + int(self._ev_blocks[i]), int(self._ev_hashes[i])
            )

    # ---- sequence-level API (mirrors BlockManager) ----
    def match_prefix(self, seq: Sequence) -> int:
        if not self.enable_prefix_cache or seq.block_ids:
            return 0
        bs = self.block_size
        toks = np.asarray(seq.token_ids, np.int32)
        max_match = (seq.num_tokens - 1) // bs
        out = np.zeros(max(max_match, 1), np.int32)
        n = self._lib.bc_match_prefix(self._h, toks, len(toks), out, max_match)
        # host-tier continuation on device miss
        if self.hierarchy is not None and n < max_match:
            parent = (
                int(self._lib.bc_block_hash(self._h, int(out[n - 1])))
                if n > 0
                else 0
            )
            while n < max_match:
                h = int(
                    self._lib.bc_hash_chain(
                        np.uint64(parent), toks[n * bs : (n + 1) * bs], bs
                    )
                )
                if not self.hierarchy.probe(h):
                    break
                fresh = np.zeros(1, np.int32)
                if self._lib.bc_allocate(self._h, 1, fresh) != 0:
                    break
                self._drain_evictions()
                if not self.hierarchy.try_fetch(h, self.base + int(fresh[0])):
                    self._lib.bc_register_cached(self._h, int(fresh[0]), 0)
                    break
                self._lib.bc_register_cached(self._h, int(fresh[0]), h)
                self._lib.bc_ref_block(self._h, int(fresh[0]))
                out[n] = fresh[0]
                parent = h
                n += 1
        seq.block_ids = [self.base + int(b) for b in out[:n]]
        seq.num_cached_tokens = n * bs
        seq.num_computed_tokens = seq.num_cached_tokens
        return seq.num_cached_tokens

    def blocks_needed(self, seq: Sequence, num_new_tokens: int) -> int:
        total = seq.num_computed_tokens + num_new_tokens
        return max(0, cdiv(total, self.block_size) - len(seq.block_ids))

    def allocate(self, seq: Sequence, num_new_tokens: int) -> bool:
        need = self.blocks_needed(seq, num_new_tokens)
        if need == 0:
            return True
        out = np.zeros(need, np.int32)
        if self._lib.bc_allocate(self._h, need, out) != 0:
            return False
        self._drain_evictions()
        seq.block_ids.extend(self.base + int(b) for b in out)
        return True

    def free(self, seq: Sequence) -> None:
        if seq.block_ids:
            null = self.null_block
            ids = [b for b in seq.block_ids if b != null]
            if ids:
                arr = np.asarray(ids, np.int32) - self.base
                self._lib.bc_free_blocks(self._h, arr, len(arr))
        seq.reset_kv()
        self._seq_chain.pop(seq.seq_id, None)
        self._released.pop(seq.seq_id, None)

    def release_out_of_window(self, seq: Sequence, window: int) -> int:
        """Sliding-window page release (see the python backend's docstring
        — operation-equivalent, tests/test_native.py fuzz)."""
        if window <= 0:
            return 0
        bs = self.block_size
        dead = max(0, seq.num_tokens - window) // bs
        done = self._released.get(seq.seq_id, 0)
        if dead <= done:
            return 0
        null = self.null_block
        ids = []
        for i in range(done, dead):
            b = seq.block_ids[i]
            if b != null:
                ids.append(b - self.base)
                seq.block_ids[i] = null
        if ids:
            arr = np.asarray(ids, np.int32)
            self._lib.bc_free_blocks(self._h, arr, len(arr))
            self._drain_evictions()
        self._released[seq.seq_id] = dead
        self._seq_chain[seq.seq_id] = (10**9, 0)  # stop prefix hashing
        return dead - done

    def cache_computed_blocks(self, seq: Sequence) -> None:
        if not self.enable_prefix_cache:
            return
        bs = self.block_size
        known = min(seq.num_computed_tokens, seq.num_fixed_tokens)
        num_full = known // bs
        start, parent = self._seq_chain.get(seq.seq_id, (0, 0))
        if start >= num_full:
            return
        toks = np.asarray(seq.token_ids[start * bs : num_full * bs], np.int32)
        blocks = np.asarray(seq.block_ids[start:num_full], np.int32) - self.base
        parent = self._lib.bc_insert(
            self._h, np.uint64(parent), toks, blocks, num_full - start
        )
        self._seq_chain[seq.seq_id] = (num_full, int(parent))

    def slot_for_token(self, seq: Sequence, token_idx: int) -> int:
        bs = self.block_size
        return seq.block_ids[token_idx // bs] * bs + token_idx % bs

    # ---- beam-search forking (reference beam_searcher.cpp:21) ----
    def ref_blocks(self, global_ids: list[int]) -> None:
        for b in global_ids:
            self._lib.bc_ref_block(self._h, int(b) - self.base)

    def alloc_raw_block(self) -> int:
        out = np.zeros(1, np.int32)
        if self._lib.bc_allocate(self._h, 1, out) != 0:
            raise RuntimeError("out of blocks")
        self._drain_evictions()
        return self.base + int(out[0])

    def fork_blocks(self, parent: Sequence, child: Sequence):
        from xllm_tpu.framework.block_manager import _fork_blocks_impl

        return _fork_blocks_impl(self, parent.block_ids, child)
