// Native unigram (SentencePiece-style) tokenizer for the T5 text encoder.
//
// TPU-native replacement for the tokenization role the reference delegates
// to swift-transformers (reference swift/StableDiffusion/pipeline/
// T5Tokenizer.swift:12-20): the hot serving path segments prompts with a
// Viterbi best-path over the unigram piece vocabulary at C++ speed, while
// anything outside the fast path's contract (non-ASCII needing charsmap
// normalization, added special tokens inside the text, uncoverable
// characters) is routed back to the Python/HF fallback by returning -1
// (same posture as native/bpe/bpe_tokenizer.cpp).
//
// Pipeline implemented here, matching HF tokenizers' Metaspace+Unigram:
//   1. Metaspace: replace ' ' with U+2581 (\xE2\x96\x81), prepend one if the
//      text does not already start with it (prepend_scheme="always").
//   2. Split into chunks, each beginning at a U+2581 boundary (split=true,
//      behavior MergedWithNext).
//   3. Per chunk, Viterbi-segment over the piece vocabulary: best[i] =
//      max_j (best[j] + score(piece[j..i])), pieces looked up on UTF-8
//      character boundaries only.
//
// Vocab transport (C ABI, built by tokenizer/t5.py from tokenizer.json):
// a blob of n_pieces records, each [uint32 byte_len][piece bytes]
// [float64 log_prob]; the record index IS the token id.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr const char* kMetaspace = "\xE2\x96\x81";  // U+2581 LOWER ONE EIGHTH BLOCK
constexpr size_t kMetaspaceLen = 3;

struct UnigramModel {
  std::unordered_map<std::string, int32_t> piece_to_id;
  std::vector<double> scores;
  size_t max_piece_len = 0;
  std::string error;
};

// UTF-8 continuation byte?
inline bool is_cont(unsigned char b) { return (b & 0xC0) == 0x80; }

// Viterbi best segmentation of chunk[0..n). Appends token ids to `out`.
// Returns false if some suffix is uncoverable (caller falls back).
bool viterbi(const UnigramModel& m, const char* chunk, size_t n,
             std::vector<int32_t>* out) {
  constexpr double kNegInf = -1e30;
  // best score reaching byte position i, and the (start, id) that got there
  std::vector<double> best(n + 1, kNegInf);
  std::vector<size_t> back(n + 1, 0);
  std::vector<int32_t> back_id(n + 1, -1);
  best[0] = 0.0;
  std::string key;
  for (size_t i = 0; i < n; ++i) {
    if (best[i] == kNegInf) continue;
    if (is_cont(static_cast<unsigned char>(chunk[i]))) continue;
    size_t max_len = n - i;
    if (m.max_piece_len < max_len) max_len = m.max_piece_len;
    for (size_t len = 1; len <= max_len; ++len) {
      // only consider substrings ending on a character boundary
      if (i + len < n && is_cont(static_cast<unsigned char>(chunk[i + len])))
        continue;
      key.assign(chunk + i, len);
      auto it = m.piece_to_id.find(key);
      if (it == m.piece_to_id.end()) continue;
      double s = best[i] + m.scores[it->second];
      if (s > best[i + len]) {
        best[i + len] = s;
        back[i + len] = i;
        back_id[i + len] = it->second;
      }
    }
  }
  if (best[n] == kNegInf) return false;
  size_t start = out->size();
  for (size_t pos = n; pos > 0; pos = back[pos]) out->push_back(back_id[pos]);
  // backtrace emitted right-to-left; reverse the tail in place
  for (size_t a = start, b = out->size(); a + 1 < b; ++a, --b)
    std::swap((*out)[a], (*out)[b - 1]);
  return true;
}

}  // namespace

extern "C" {

void* sdtpu_unigram_create(const uint8_t* blob, int64_t blob_size,
                           int32_t n_pieces) {
  auto* m = new UnigramModel();
  m->scores.reserve(n_pieces);
  const uint8_t* p = blob;
  const uint8_t* end = blob + blob_size;
  for (int32_t id = 0; id < n_pieces; ++id) {
    if (p + sizeof(uint32_t) > end) { m->error = "truncated blob"; return m; }
    uint32_t len;
    std::memcpy(&len, p, sizeof(len));
    p += sizeof(len);
    if (p + len + sizeof(double) > end) { m->error = "truncated blob"; return m; }
    std::string piece(reinterpret_cast<const char*>(p), len);
    p += len;
    double score;
    std::memcpy(&score, p, sizeof(score));
    p += sizeof(score);
    m->piece_to_id.emplace(std::move(piece), id);
    m->scores.push_back(score);
    if (len > m->max_piece_len) m->max_piece_len = len;
  }
  if (p != end) m->error = "trailing bytes in blob";
  return m;
}

const char* sdtpu_unigram_error(void* handle) {
  auto* m = static_cast<UnigramModel*>(handle);
  return m->error.empty() ? nullptr : m->error.c_str();
}

void sdtpu_unigram_destroy(void* handle) {
  delete static_cast<UnigramModel*>(handle);
}

// Encode UTF-8 `text` (Metaspace + per-chunk Viterbi). Returns the number
// of ids written, -1 if any chunk is uncoverable by the vocab (caller must
// fall back), or -2 if `cap` is too small.
int32_t sdtpu_unigram_encode(void* handle, const char* text, int32_t* out_ids,
                             int32_t cap) {
  const auto* m = static_cast<const UnigramModel*>(handle);
  size_t text_len = std::strlen(text);

  // Metaspace transform: ' ' -> U+2581, prepend one if absent.
  std::string s;
  s.reserve(text_len + kMetaspaceLen + 8);
  if (std::strncmp(text, kMetaspace, kMetaspaceLen) != 0 && text[0] != ' ')
    s.append(kMetaspace, kMetaspaceLen);
  for (size_t i = 0; i < text_len; ++i) {
    if (text[i] == ' ')
      s.append(kMetaspace, kMetaspaceLen);
    else
      s.push_back(text[i]);
  }

  // Split into chunks, each starting at a U+2581 (MergedWithNext).
  std::vector<int32_t> ids;
  size_t chunk_start = 0;
  for (size_t i = kMetaspaceLen; i <= s.size(); ) {
    bool at_meta = i + kMetaspaceLen <= s.size() &&
                   std::memcmp(s.data() + i, kMetaspace, kMetaspaceLen) == 0;
    if (i == s.size() || at_meta) {
      if (!viterbi(*m, s.data() + chunk_start, i - chunk_start, &ids))
        return -1;
      if (i == s.size()) break;
      chunk_start = i;
      i += kMetaspaceLen;
    } else {
      ++i;
    }
  }
  if (static_cast<int32_t>(ids.size()) > cap) return -2;
  std::memcpy(out_ids, ids.data(), ids.size() * sizeof(int32_t));
  return static_cast<int32_t>(ids.size());
}

}  // extern "C"
