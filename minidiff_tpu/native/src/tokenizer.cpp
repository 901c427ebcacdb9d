// Native byte-level BPE tokenizer for minidiff_tpu.
//
// The reference has no text pipeline at all (it is an array-autodiff
// library); this is the runtime counterpart that feeds the LM family:
// train byte-pair merges over a corpus, then encode/decode at C++ speed.
//
// Algorithm (kept deliberately canonical so the pure-Python fallback in
// minidiff_tpu/tokenizer.py can reproduce it BIT-FOR-BIT):
//   * token ids 0..255 are raw bytes; each merge appends one new id.
//   * training: repeatedly count adjacent pairs over the whole corpus and
//     merge the most frequent; ties break on the smaller (left, right) pair.
//   * encoding: repeatedly merge the lowest-rank adjacent pair present
//     (rank = merge training order), scanning left to right.
//
// Build: compiled into the shared library by minidiff_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <utility>
#include <vector>

namespace {

struct Tokenizer {
  // merge i: (left, right) -> id 256 + i
  std::vector<std::pair<uint32_t, uint32_t>> merges;
  std::map<std::pair<uint32_t, uint32_t>, uint32_t> rank;  // pair -> merge idx

  void index() {
    rank.clear();
    for (uint32_t i = 0; i < merges.size(); ++i) rank[merges[i]] = i;
  }

  // expand one token id to raw bytes; false if id is out of vocabulary
  bool expand(uint32_t id, std::string* out) const {
    if (id < 256) {
      out->push_back(static_cast<char>(id));
      return true;
    }
    if (id - 256 >= merges.size()) return false;
    const auto& m = merges[id - 256];
    // valid BPE merges only reference EARLIER ids; anything else is a
    // corrupt/crafted table that would recurse forever
    if (m.first >= id || m.second >= id) return false;
    return expand(m.first, out) && expand(m.second, out);
  }
};

void merge_pass(std::vector<uint32_t>& toks,
                std::pair<uint32_t, uint32_t> pair, uint32_t new_id) {
  size_t w = 0;
  for (size_t r = 0; r < toks.size(); ++r) {
    if (r + 1 < toks.size() && toks[r] == pair.first &&
        toks[r + 1] == pair.second) {
      toks[w++] = new_id;
      ++r;
    } else {
      toks[w++] = toks[r];
    }
  }
  toks.resize(w);
}

}  // namespace

extern "C" {

// Train merges over `data`; returns a handle.  vocab_size >= 256.
void* tok_train(const uint8_t* data, uint64_t len, uint32_t vocab_size) {
  auto* t = new Tokenizer();
  std::vector<uint32_t> toks(data, data + len);
  while (256 + t->merges.size() < vocab_size && toks.size() >= 2) {
    std::map<std::pair<uint32_t, uint32_t>, uint64_t> counts;
    for (size_t i = 0; i + 1 < toks.size(); ++i) {
      ++counts[{toks[i], toks[i + 1]}];
    }
    // most frequent; ties -> smallest (left, right) (std::map iterates in
    // ascending key order, so strict > keeps the first/smallest maximum)
    std::pair<uint32_t, uint32_t> best{};
    uint64_t best_n = 0;
    for (const auto& kv : counts) {
      if (kv.second > best_n) {
        best_n = kv.second;
        best = kv.first;
      }
    }
    if (best_n < 2) break;  // nothing repeats: further merges are useless
    uint32_t new_id = 256 + static_cast<uint32_t>(t->merges.size());
    t->merges.push_back(best);
    merge_pass(toks, best, new_id);
  }
  t->index();
  return t;
}

// Rebuild a tokenizer from a flat merge table [l0, r0, l1, r1, ...].
void* tok_from_merges(const uint32_t* pairs, uint32_t n_merges) {
  auto* t = new Tokenizer();
  t->merges.reserve(n_merges);
  for (uint32_t i = 0; i < n_merges; ++i) {
    t->merges.emplace_back(pairs[2 * i], pairs[2 * i + 1]);
  }
  t->index();
  return t;
}

uint32_t tok_num_merges(void* h) {
  return static_cast<uint32_t>(static_cast<Tokenizer*>(h)->merges.size());
}

void tok_get_merges(void* h, uint32_t* out) {
  auto* t = static_cast<Tokenizer*>(h);
  for (size_t i = 0; i < t->merges.size(); ++i) {
    out[2 * i] = t->merges[i].first;
    out[2 * i + 1] = t->merges[i].second;
  }
}

// Encode bytes -> ids; returns count (<= len).  out must hold len entries.
uint64_t tok_encode(void* h, const uint8_t* data, uint64_t len,
                    uint32_t* out) {
  auto* t = static_cast<Tokenizer*>(h);
  std::vector<uint32_t> toks(data, data + len);
  for (;;) {
    // lowest-rank adjacent pair present
    uint32_t best_rank = UINT32_MAX;
    for (size_t i = 0; i + 1 < toks.size(); ++i) {
      auto it = t->rank.find({toks[i], toks[i + 1]});
      if (it != t->rank.end() && it->second < best_rank) {
        best_rank = it->second;
      }
    }
    if (best_rank == UINT32_MAX) break;
    merge_pass(toks, t->merges[best_rank], 256 + best_rank);
  }
  std::memcpy(out, toks.data(), toks.size() * sizeof(uint32_t));
  return toks.size();
}

// Decode ids -> bytes; returns byte count, or UINT64_MAX if any id is out
// of vocabulary.  Call with out=NULL to size.
uint64_t tok_decode(void* h, const uint32_t* ids, uint64_t n, uint8_t* out) {
  auto* t = static_cast<Tokenizer*>(h);
  std::string buf;
  for (uint64_t i = 0; i < n; ++i) {
    if (!t->expand(ids[i], &buf)) return UINT64_MAX;
  }
  if (out != nullptr) std::memcpy(out, buf.data(), buf.size());
  return buf.size();
}

void tok_free(void* h) { delete static_cast<Tokenizer*>(h); }

}  // extern "C"
