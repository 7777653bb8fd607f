// Native byte-level BPE core (encode/decode merge machinery).
//
// TPU-native counterpart of the reference's standalone C++ BPE tokenizer
// (/root/reference/src/runtime/gpt_tokenizer.cc — byte-level BPE with
// vocab+merges, GPT2/OPT variants). The Python wrapper
// (flexflow_tpu/utils/native_tokenizer.py) does the GPT-2 regex
// pre-tokenization and byte<->unicode mapping; this core owns the hot merge
// loop and vocab lookups. C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    std::hash<std::string> h;
    return h(p.first) * 1000003ULL ^ h(p.second);
  }
};

struct BPE {
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> id_to_token;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
      merges;
  int32_t unk_id = -1;
  // word -> ids cache (the reference caches BPE results too)
  std::unordered_map<std::string, std::vector<int32_t>> cache;
};

// split a UTF-8 string into codepoint-sized chunks
std::vector<std::string> utf8_chars(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t len = 1;
    if ((c & 0x80) == 0) len = 1;
    else if ((c & 0xE0) == 0xC0) len = 2;
    else if ((c & 0xF0) == 0xE0) len = 3;
    else if ((c & 0xF8) == 0xF0) len = 4;
    if (i + len > s.size()) len = 1;
    out.emplace_back(s.substr(i, len));
    i += len;
  }
  return out;
}

}  // namespace

extern "C" {

void* bpe_create() { return new BPE(); }

void bpe_free(void* h) { delete static_cast<BPE*>(h); }

void bpe_add_token(void* h, const char* token, int32_t id) {
  BPE* b = static_cast<BPE*>(h);
  b->vocab.emplace(token, id);
  if (id >= 0) {
    if (static_cast<size_t>(id) >= b->id_to_token.size())
      b->id_to_token.resize(id + 1);
    b->id_to_token[id] = token;
  }
}

void bpe_set_unk(void* h, int32_t id) { static_cast<BPE*>(h)->unk_id = id; }

void bpe_add_merge(void* h, const char* left, const char* right, int32_t rank) {
  static_cast<BPE*>(h)->merges[{left, right}] = rank;
}

// Encode one pre-tokenized word (already byte->unicode mapped, UTF-8).
// Returns the number of ids written (<= max_out), or -1 on overflow.
int32_t bpe_encode_word(void* h, const char* word_c, int32_t* out,
                        int32_t max_out) {
  BPE* b = static_cast<BPE*>(h);
  std::string word(word_c);

  auto cached = b->cache.find(word);
  if (cached != b->cache.end()) {
    const auto& ids = cached->second;
    if (static_cast<int32_t>(ids.size()) > max_out) return -1;
    std::copy(ids.begin(), ids.end(), out);
    return static_cast<int32_t>(ids.size());
  }

  std::vector<std::string> parts = utf8_chars(word);
  // greedy lowest-rank merge loop (reference gpt_tokenizer.cc bpe())
  while (parts.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto it = b->merges.find({parts[i], parts[i + 1]});
      if (it != b->merges.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    parts[best_i] = parts[best_i] + parts[best_i + 1];
    parts.erase(parts.begin() + best_i + 1);
  }

  std::vector<int32_t> ids;
  ids.reserve(parts.size());
  for (const auto& p : parts) {
    auto it = b->vocab.find(p);
    ids.push_back(it != b->vocab.end() ? it->second : b->unk_id);
  }
  b->cache.emplace(std::move(word), ids);
  if (static_cast<int32_t>(ids.size()) > max_out) return -1;
  std::copy(ids.begin(), ids.end(), out);
  return static_cast<int32_t>(ids.size());
}

const char* bpe_id_to_token(void* h, int32_t id) {
  BPE* b = static_cast<BPE*>(h);
  if (id < 0 || static_cast<size_t>(id) >= b->id_to_token.size()) return "";
  return b->id_to_token[id].c_str();
}

}  // extern "C"
