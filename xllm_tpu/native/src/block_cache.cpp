// Native paged-KV block allocator + prefix cache.
//
// C++ counterpart of the reference's BlockManagerImpl + PrefixCache
// (reference xllm/core/framework/block/block_manager_impl.*,
// xllm/core/framework/prefix_cache/prefix_cache.h:44 — the reference keeps
// this entire subsystem in C++; this is the TPU framework's native twin of
// xllm_tpu/framework/block_manager.py, selectable at runtime and proven
// equivalent by tests/test_native.py).
//
// Design identical to the Python implementation so either backend can run
// the engine: ref-counted blocks, an LRU of free-but-cached blocks (front =
// eviction victim), murmur-style chained content hashes per full block.
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <list>
#include <unordered_map>
#include <vector>

namespace {

// 64-bit FNV-1a over (parent_hash, token_ids) — stable chained block hash.
// (Python side mirrors this exactly; see block_manager.hash_block_native.)
static uint64_t hash_chain(uint64_t parent, const int32_t* tokens, int n) {
  const uint64_t kPrime = 1099511628211ULL;
  uint64_t h = 14695981039346656037ULL;
  auto mix = [&](const uint8_t* p, size_t len) {
    for (size_t i = 0; i < len; ++i) {
      h ^= p[i];
      h *= kPrime;
    }
  };
  mix(reinterpret_cast<const uint8_t*>(&parent), 8);
  mix(reinterpret_cast<const uint8_t*>(tokens),
      static_cast<size_t>(n) * sizeof(int32_t));
  return h;
}

struct BlockCache {
  int num_blocks;
  int block_size;
  bool enable_prefix;

  std::vector<int> ref_counts;
  // LRU of ref==0 blocks: front = oldest (next victim)
  std::list<int> free_lru;
  std::vector<std::list<int>::iterator> lru_pos;
  std::vector<uint8_t> in_lru;
  std::unordered_map<int, uint64_t> block_hash;    // block -> content hash
  std::unordered_map<uint64_t, int> cached_blocks; // hash -> block

  // eviction notification ring for the host-KV tier (drained by Python)
  std::vector<int> evicted_blocks;
  std::vector<uint64_t> evicted_hashes;

  explicit BlockCache(int nb, int bs, bool prefix)
      : num_blocks(nb), block_size(bs), enable_prefix(prefix),
        ref_counts(nb, 0), lru_pos(nb), in_lru(nb, 0) {
    ref_counts[0] = 1; // null block reserved
    for (int i = 1; i < nb; ++i) {
      free_lru.push_back(i);
      lru_pos[i] = std::prev(free_lru.end());
      in_lru[i] = 1;
    }
  }

  int pop_free_block() {
    if (free_lru.empty()) return -1;
    int b = free_lru.front();
    free_lru.pop_front();
    in_lru[b] = 0;
    auto it = block_hash.find(b);
    if (it != block_hash.end()) {
      auto cit = cached_blocks.find(it->second);
      if (cit != cached_blocks.end() && cit->second == b) {
        evicted_blocks.push_back(b);
        evicted_hashes.push_back(it->second);
        cached_blocks.erase(cit);
      }
      block_hash.erase(it);
    }
    ref_counts[b] = 1;
    return b;
  }

  void ref_block(int b) {
    if (ref_counts[b] == 0 && in_lru[b]) {
      free_lru.erase(lru_pos[b]);
      in_lru[b] = 0;
    }
    ref_counts[b]++;
  }

  void unref_block(int b) {
    ref_counts[b]--;
    if (ref_counts[b] == 0) {
      free_lru.push_back(b);
      lru_pos[b] = std::prev(free_lru.end());
      in_lru[b] = 1;
    }
  }
};

} // namespace

extern "C" {

void* bc_create(int num_blocks, int block_size, int enable_prefix) {
  return new BlockCache(num_blocks, block_size, enable_prefix != 0);
}

void bc_destroy(void* h) { delete static_cast<BlockCache*>(h); }

int bc_num_free(void* h) {
  return static_cast<int>(static_cast<BlockCache*>(h)->free_lru.size());
}

uint64_t bc_hash_chain(uint64_t parent, const int32_t* tokens, int n) {
  return hash_chain(parent, tokens, n);
}

// Allocate `need` fresh blocks into out[]; returns 0 on success, -1 if the
// pool cannot satisfy the request (nothing allocated).
int bc_allocate(void* h, int need, int32_t* out) {
  auto* bc = static_cast<BlockCache*>(h);
  if (static_cast<int>(bc->free_lru.size()) < need) return -1;
  for (int i = 0; i < need; ++i) out[i] = bc->pop_free_block();
  return 0;
}

// Release blocks (reverse order, matching the Python manager).
void bc_free_blocks(void* h, const int32_t* blocks, int n) {
  auto* bc = static_cast<BlockCache*>(h);
  for (int i = n - 1; i >= 0; --i) bc->unref_block(blocks[i]);
}

// Prefix match: walk token_ids in full blocks, following the hash chain.
// Fills matched_blocks; returns the number of matched blocks.
int bc_match_prefix(void* h, const int32_t* token_ids, int num_tokens,
                    int32_t* matched_blocks, int max_match) {
  auto* bc = static_cast<BlockCache*>(h);
  if (!bc->enable_prefix) return 0;
  int bs = bc->block_size;
  int limit = (num_tokens - 1) / bs; // leave >=1 token to compute
  if (limit > max_match) limit = max_match;
  uint64_t parent = 0;
  int n = 0;
  for (int i = 0; i < limit; ++i) {
    uint64_t hsh = hash_chain(parent, token_ids + i * bs, bs);
    auto it = bc->cached_blocks.find(hsh);
    if (it == bc->cached_blocks.end()) break;
    matched_blocks[n++] = it->second;
    parent = hsh;
  }
  for (int i = 0; i < n; ++i) bc->ref_block(matched_blocks[i]);
  return n;
}

// Insert full blocks into the prefix cache, starting the hash chain at
// `parent`. Returns the chain hash after the last inserted block.
uint64_t bc_insert(void* h, uint64_t parent, const int32_t* token_ids,
                   const int32_t* blocks, int n_full) {
  auto* bc = static_cast<BlockCache*>(h);
  if (!bc->enable_prefix) return parent;
  int bs = bc->block_size;
  for (int i = 0; i < n_full; ++i) {
    uint64_t hsh = hash_chain(parent, token_ids + i * bs, bs);
    int b = blocks[i];
    if (bc->cached_blocks.find(hsh) == bc->cached_blocks.end()) {
      bc->cached_blocks.emplace(hsh, b);
      bc->block_hash[b] = hsh;
    }
    parent = hsh;
  }
  return parent;
}

uint64_t bc_block_hash(void* h, int block) {
  auto* bc = static_cast<BlockCache*>(h);
  auto it = bc->block_hash.find(block);
  return it == bc->block_hash.end() ? 0 : it->second;
}

// Register an externally-provided cached block (host-KV prefetch path):
// the block must be fresh (ref 1 from bc_allocate); it is re-parked in the
// LRU as a ref-0 cached block holding `hash`.
void bc_register_cached(void* h, int block, uint64_t hash) {
  auto* bc = static_cast<BlockCache*>(h);
  bc->cached_blocks[hash] = block;
  bc->block_hash[block] = hash;
  bc->unref_block(block);
}

int bc_lookup_hash(void* h, uint64_t hash) {
  auto* bc = static_cast<BlockCache*>(h);
  auto it = bc->cached_blocks.find(hash);
  return it == bc->cached_blocks.end() ? -1 : it->second;
}

void bc_ref_block(void* h, int block) {
  static_cast<BlockCache*>(h)->ref_block(block);
}

// Drain the eviction ring: returns count, fills blocks/hashes.
int bc_drain_evictions(void* h, int32_t* blocks, uint64_t* hashes, int cap) {
  auto* bc = static_cast<BlockCache*>(h);
  int n = static_cast<int>(bc->evicted_blocks.size());
  if (n > cap) n = cap;
  for (int i = 0; i < n; ++i) {
    blocks[i] = bc->evicted_blocks[i];
    hashes[i] = bc->evicted_hashes[i];
  }
  bc->evicted_blocks.clear();
  bc->evicted_hashes.clear();
  return n;
}

} // extern "C"
