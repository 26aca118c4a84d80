// Native n-gram suffix index for model-free speculative drafting.
//
// C++ counterpart of the reference's SuffixTree/SuffixDecodingCache
// (reference xllm/core/util/suffix_tree.h:129,144) — the per-step draft
// proposal is host hot-path in spec mode, so it lives in native code like
// the reference's. Semantics mirror framework/suffix_cache.SuffixProposer
// exactly (proven by tests/test_native.py).

#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  uint64_t h;
  bool operator==(const Key& o) const { return h == o.h; }
};
struct KeyHash {
  size_t operator()(const Key& k) const { return static_cast<size_t>(k.h); }
};

static uint64_t ngram_hash(const int32_t* t, int n) {
  uint64_t h = 14695981039346656037ULL;
  for (int i = 0; i < n; ++i) {
    h ^= static_cast<uint64_t>(static_cast<uint32_t>(t[i]));
    h *= 1099511628211ULL;
    h ^= static_cast<uint64_t>(n);  // length-disambiguated
    h *= 1099511628211ULL;
  }
  return h;
}

struct SuffixIndex {
  int min_match, max_match;
  // ngram hash -> position AFTER its latest occurrence
  std::unordered_map<Key, int, KeyHash> index;
  int len = 0;

  SuffixIndex(int mn, int mx) : min_match(mn), max_match(mx) {}

  void extend(const int32_t* tokens, int upto) {
    int start = len > min_match ? len : min_match;
    for (int end = start; end < upto; ++end) {
      for (int n = min_match; n <= max_match && end - n >= 0; ++n) {
        index[Key{ngram_hash(tokens + end - n, n)}] = end;
      }
    }
    if (upto > len) len = upto;
  }

  int propose(const int32_t* tokens, int n_tok, int k, int32_t* out) {
    int top = max_match < n_tok ? max_match : n_tok;
    for (int n = top; n >= min_match; --n) {
      auto it = index.find(Key{ngram_hash(tokens + n_tok - n, n)});
      if (it != index.end() && it->second < n_tok) {
        int pos = it->second;
        int cnt = 0;
        for (int j = pos; j < pos + k && j < n_tok; ++j) out[cnt++] = tokens[j];
        return cnt;
      }
    }
    return 0;
  }

  // Global-cache variant (reference SuffixDecodingCache global tree,
  // suffix_tree.h:129): the ngram comes from the tail of an EXTERNAL
  // query sequence while the draft is read from the indexed stream.
  int propose_from(const int32_t* stream, int stream_len,
                   const int32_t* query, int q_len, int k, int32_t* out) {
    int top = max_match < q_len ? max_match : q_len;
    for (int n = top; n >= min_match; --n) {
      auto it = index.find(Key{ngram_hash(query + q_len - n, n)});
      if (it != index.end() && it->second <= stream_len) {
        int pos = it->second;
        int cnt = 0;
        for (int j = pos; j < pos + k && j < stream_len; ++j)
          out[cnt++] = stream[j];
        return cnt;
      }
    }
    return 0;
  }
};

} // namespace

extern "C" {

void* si_create(int min_match, int max_match) {
  return new SuffixIndex(min_match, max_match);
}
void si_destroy(void* h) { delete static_cast<SuffixIndex*>(h); }
void si_extend(void* h, const int32_t* tokens, int upto) {
  static_cast<SuffixIndex*>(h)->extend(tokens, upto);
}
int si_propose(void* h, const int32_t* tokens, int n_tok, int k,
               int32_t* out) {
  return static_cast<SuffixIndex*>(h)->propose(tokens, n_tok, k, out);
}
int si_propose_from(void* h, const int32_t* stream, int stream_len,
                    const int32_t* query, int q_len, int k, int32_t* out) {
  return static_cast<SuffixIndex*>(h)->propose_from(stream, stream_len,
                                                    query, q_len, k, out);
}

} // extern "C"
