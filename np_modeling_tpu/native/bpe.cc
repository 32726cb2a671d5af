// Native byte-pair-encoding merge loop for the serving tokenizer.
//
// The reference framework has no tokenizer at all (models consume integer
// ids, /root/reference/train.py); a production serving stack needs one on
// the HOST side, off the hot Python path. The split here mirrors
// dataloader.cc's philosophy: Python owns the cold, correctness-critical
// text handling (GPT-2's regex pre-tokenization, byte<->unicode mapping —
// exact HF parity), while this library owns the hot inner loop: applying
// ranked BPE merges to each pre-token's byte sequence.
//
// Algorithm: classic greedy BPE. A pre-token arrives as N single-byte
// symbols; repeatedly find the adjacent pair with the LOWEST merge rank
// and fuse it, until no mergeable pair remains. Symbols are tracked as
// (start, len) spans over the input bytes in a doubly-linked list, so a
// merge is O(1) and each scan is O(symbols). Pre-tokens are short (words),
// so the simple rescan-per-merge loop beats heap bookkeeping in practice.
//
// Vocabulary layout (one handle per tokenizer via bpe_create):
//   - token ids for all single bytes:        byte_ids[256]
//   - merge table: for merge m (rank m), the two SOURCE token ids
//     (left_ids[m], right_ids[m]) and the RESULT token id result_ids[m].
// Pair lookup uses a flat open-addressing hash of (left_id, right_id) ->
// rank, built once at create. Handles are immutable after creation, so
// concurrent encodes on one handle are safe.
//
// C ABI (ctypes): all int64 to dodge struct-layout pitfalls.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct PairHash {
  // open addressing, power-of-two table of (key, rank); key packs two
  // 32-bit token ids. Empty slot: key == kEmpty.
  static constexpr uint64_t kEmpty = ~0ULL;
  std::vector<uint64_t> keys;
  std::vector<int32_t> ranks;
  uint64_t mask = 0;

  static inline uint64_t mix(uint64_t x) {
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return x;
  }

  void build(int64_t n_merges, const int32_t* left, const int32_t* right) {
    uint64_t cap = 16;
    while (cap < static_cast<uint64_t>(n_merges) * 2) cap <<= 1;
    keys.assign(cap, kEmpty);
    ranks.assign(cap, -1);
    mask = cap - 1;
    for (int64_t m = 0; m < n_merges; ++m) {
      uint64_t key = (static_cast<uint64_t>(static_cast<uint32_t>(left[m]))
                      << 32) |
                     static_cast<uint32_t>(right[m]);
      uint64_t i = mix(key) & mask;
      while (keys[i] != kEmpty) i = (i + 1) & mask;
      keys[i] = key;
      ranks[i] = static_cast<int32_t>(m);
    }
  }

  inline int32_t find(int32_t a, int32_t b) const {
    uint64_t key = (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
                   static_cast<uint32_t>(b);
    uint64_t i = mix(key) & mask;
    while (true) {
      if (keys[i] == kEmpty) return -1;
      if (keys[i] == key) return ranks[i];
      i = (i + 1) & mask;
    }
  }
};

struct Vocab {
  int32_t byte_ids[256];
  std::vector<int32_t> merge_result;  // rank -> result token id
  PairHash pairs;
};

}  // namespace

extern "C" {

// Create a vocabulary handle (one per tokenizer instance — no process
// globals, so multiple tokenizers coexist and encodes on one are never
// affected by constructing another). byte_ids: 256 entries; left/right/
// result: n_merges entries each.
void* bpe_create(const int32_t* byte_ids, const int32_t* left,
                 const int32_t* right, const int32_t* result,
                 int64_t n_merges) {
  Vocab* v = new Vocab();
  std::memcpy(v->byte_ids, byte_ids, 256 * sizeof(int32_t));
  v->merge_result.assign(result, result + n_merges);
  v->pairs.build(n_merges, left, right);
  return v;
}

void bpe_destroy(void* handle) { delete static_cast<Vocab*>(handle); }

// Encode a batch of pre-tokens given as one concatenated byte buffer plus
// per-pre-token offsets (offsets[i]..offsets[i+1] = bytes of pre-token i;
// offsets has n_pretokens + 1 entries). Writes token ids to out (caller
// allocates >= total byte count) and per-pre-token output offsets to
// out_offsets (n_pretokens + 1 entries). Returns total ids written, or -1
// on a null handle. Thread-safe for concurrent encodes on one handle.
int64_t bpe_encode(void* handle, const uint8_t* bytes,
                   const int64_t* offsets, int64_t n_pretokens,
                   int32_t* out, int64_t* out_offsets) {
  if (handle == nullptr) return -1;
  const Vocab& v = *static_cast<const Vocab*>(handle);
  int64_t written = 0;
  out_offsets[0] = 0;
  std::vector<int32_t> ids;
  std::vector<int32_t> next;
  for (int64_t p = 0; p < n_pretokens; ++p) {
    const uint8_t* s = bytes + offsets[p];
    int64_t n = offsets[p + 1] - offsets[p];
    ids.resize(n);
    for (int64_t i = 0; i < n; ++i) ids[i] = v.byte_ids[s[i]];
    // Greedy lowest-rank merge until none applies.
    while (ids.size() >= 2) {
      int32_t best_rank = INT32_MAX;
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < ids.size(); ++i) {
        int32_t r = v.pairs.find(ids[i], ids[i + 1]);
        if (r >= 0 && r < best_rank) {
          best_rank = r;
          best_i = i;
        }
      }
      if (best_rank == INT32_MAX) break;
      // Fuse EVERY occurrence of this exact pair left-to-right (matches
      // the reference BPE: one rank chosen per round, all sites merged).
      next.clear();
      int32_t a = ids[best_i], b = ids[best_i + 1];
      for (size_t i = 0; i < ids.size();) {
        if (i + 1 < ids.size() && ids[i] == a && ids[i + 1] == b) {
          next.push_back(v.merge_result[best_rank]);
          i += 2;
        } else {
          next.push_back(ids[i]);
          i += 1;
        }
      }
      ids.swap(next);
    }
    for (int32_t id : ids) out[written++] = id;
    out_offsets[p + 1] = written;
  }
  return written;
}

}  // extern "C"
