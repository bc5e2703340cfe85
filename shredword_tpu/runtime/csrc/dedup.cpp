// Span dedup for the device encoder.
//
// Natural text is heavily repetitive: after pre-tokenization most chunk
// occurrences are duplicates (zipf).  The device encoder only needs to
// encode each DISTINCT chunk once; the full id stream is then a cheap
// host-side gather.  On a bandwidth-constrained host<->device link this
// shrinks both directions of traffic by the duplication factor, and it
// shrinks device work the same way.  (The trainer applies the identical
// trick via its unique-word corpus — reference bpe.cpp:213-252.)

#include "shred_native.hpp"

#include <cstring>
#include <vector>

extern "C" {

// Deduplicate n byte spans (data[off[i]] .. data[off[i]+lens[i]]).
// Writes inverse[i] = dense unique id of span i (first-occurrence
// order), uniq[j] = span index of unique j's first occurrence.
// Returns the number of unique spans.  uniq must have capacity n.
int64_t shred_dedup_spans(const uint8_t* data, const int64_t* off,
                          const int64_t* lens, int64_t n,
                          int32_t* inverse, int64_t* uniq) {
  size_t cap = 16;
  while (cap < (size_t)n * 2) cap <<= 1;
  const size_t mask = cap - 1;
  // slot -> unique id + 1 (0 = empty)
  std::vector<int32_t> table(cap, 0);
  int64_t n_uniq = 0;
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* p = data + off[i];
    const int64_t len = lens[i];
    size_t slot = (size_t)(shred::fnv1a64(p, (size_t)len) & mask);
    for (;;) {
      int32_t u = table[slot];
      if (u == 0) {
        table[slot] = (int32_t)(n_uniq + 1);
        uniq[n_uniq] = i;
        inverse[i] = (int32_t)n_uniq;
        n_uniq++;
        break;
      }
      const int64_t j = uniq[u - 1];
      if (lens[j] == len && std::memcmp(data + off[j], p, len) == 0) {
        inverse[i] = u - 1;
        break;
      }
      slot = (slot + 1) & mask;
    }
  }
  return n_uniq;
}

}  // extern "C"
