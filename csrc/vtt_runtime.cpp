// Native host-runtime primitives (C ABI, loaded via ctypes).
//
// The reference keeps its performance-critical host paths in C++ (csrc/,
// 74.7k LoC); in this engine the device work is Pallas/XLA, and the host
// hot loops that remain are (a) content-addressed KV block hashing (run
// for every full block of every request, core/kv_cache_utils.py) and
// (b) prompt n-gram lookup for speculative decoding (reference
// vllm/v1/spec_decode/ngram_proposer.py). Both are implemented here with
// pure-Python fallbacks implementing the identical algorithm
// (utils/native.py); equality is tested.
//
// Build: g++ -O3 -shared -fPIC csrc/vtt_runtime.cpp -o vtt_runtime.so

#include <cstdint>
#include <cstring>

extern "C" {

// --- 128-bit chained block hash ----------------------------------------------
// Two murmur3-fmix64 lanes seeded from the parent digest; each token is
// folded into both lanes with distinct multipliers. The chain makes a
// block's digest identify its whole prefix (reference
// kv_cache_utils.py:517-560 semantics).

static inline uint64_t fmix64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xFF51AFD7ED558CCDULL;
  x ^= x >> 33;
  x *= 0xC4CEB9FE1A85EC53ULL;
  x ^= x >> 33;
  return x;
}

// tokens: n_tokens int64 token ids, hashed in blocks of block_size.
// parent: 16-byte parent digest or nullptr for a chain root.
// out: n_blocks * 16 bytes (n_blocks = n_tokens / block_size, full blocks
// only — caller guarantees divisibility of the consumed span).
void vtt_hash_blocks(const int64_t* tokens, int64_t n_tokens,
                     int32_t block_size, const uint8_t* parent,
                     uint8_t* out) {
  uint64_t p1 = 0, p2 = 0;
  bool has_parent = parent != nullptr;
  if (has_parent) {
    std::memcpy(&p1, parent, 8);
    std::memcpy(&p2, parent + 8, 8);
  }
  int64_t n_blocks = n_tokens / block_size;
  for (int64_t b = 0; b < n_blocks; ++b) {
    // Each block reseeds from its parent digest so multi-block calls
    // equal repeated single-block calls (prefix-chain semantics).
    uint64_t h1 = 0x9E3779B97F4A7C15ULL;
    uint64_t h2 = 0xC2B2AE3D27D4EB4FULL;
    if (has_parent) {
      h1 ^= p1;
      h2 ^= p2;
    }
    for (int32_t i = 0; i < block_size; ++i) {
      uint64_t t = (uint64_t)tokens[b * block_size + i];
      h1 = fmix64(h1 ^ (t * 0x9DDFEA08EB382D69ULL));
      h2 = fmix64(h2 ^ (t * 0xA0761D6478BD642FULL) ^ h1);
    }
    h1 = fmix64(h1 ^ (uint64_t)block_size);
    h2 = fmix64(h2 ^ h1);
    std::memcpy(out + b * 16, &h1, 8);
    std::memcpy(out + b * 16 + 8, &h2, 8);
    p1 = h1;
    p2 = h2;
    has_parent = true;
  }
}

// --- n-gram proposer ----------------------------------------------------------
// Find the most recent earlier occurrence of the last `n` tokens of
// `tokens[0..len)` and copy up to `k` tokens following that occurrence
// into `out`. Returns the number of proposed tokens (0 = no match).
// Matches the reference NgramProposer semantics (ngram_proposer.py:11):
// longest-n first is handled by the caller looping over n values.

int32_t vtt_ngram_propose(const int64_t* tokens, int64_t len, int32_t n,
                          int32_t k, int64_t* out) {
  if (len <= n || n <= 0) return 0;
  const int64_t* suffix = tokens + len - n;
  // scan right-to-left for the most recent match before the suffix itself
  for (int64_t start = len - n - 1; start >= 0; --start) {
    if (std::memcmp(tokens + start, suffix,
                    sizeof(int64_t) * (size_t)n) == 0) {
      int64_t follow = start + n;
      int32_t count = 0;
      while (count < k && follow + count < len - 0) {
        // never propose past the end of known tokens
        if (follow + count >= len) break;
        out[count] = tokens[follow + count];
        ++count;
      }
      return count;
    }
  }
  return 0;
}

}  // extern "C"
