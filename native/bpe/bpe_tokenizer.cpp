// Native CLIP BPE tokenizer.
//
// The reference implements its tokenizer natively (Swift,
// BPETokenizer.swift:59-169); this is the TPU framework's native equivalent
// for high-throughput serving: C++ with a C ABI consumed from Python via
// ctypes (tokenizer/native.py), algorithmically identical to the Python
// implementation (tokenizer/bpe.py) — greedy lowest-rank pair merging over
// vocab.json + merges.txt with </w> end-of-word markers.
//
// Byte-level BPE: each word's UTF-8 bytes are mapped through the GPT-2/CLIP
// bytes_to_unicode table before merging, matching HF CLIPTokenizer and the
// Python implementation exactly for any input bytes.
//
// Unicode note: word segmentation treats any codepoint >= 0x80 as a letter
// and lowercases ASCII only.  This matches the Python tokenizer for ASCII
// prompts (the overwhelming majority); the Python path remains the reference
// for full Unicode category handling (e.g. non-ASCII lowercasing).

#include <array>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <limits>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 31 ^
           std::hash<std::string>()(p.second);
  }
};

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
      ranks;
  int32_t bos_id = -1;
  int32_t eos_id = -1;
  std::string error;
};

// --- minimal JSON object<string,int> parser (vocab.json) --------------------

bool parse_json_string(const std::string& s, size_t& i, std::string& out) {
  if (s[i] != '"') return false;
  ++i;
  out.clear();
  while (i < s.size()) {
    char c = s[i++];
    if (c == '"') return true;
    if (c == '\\') {
      if (i >= s.size()) return false;
      char e = s[i++];
      switch (e) {
        case '"': out += '"'; break;
        case '\\': out += '\\'; break;
        case '/': out += '/'; break;
        case 'b': out += '\b'; break;
        case 'f': out += '\f'; break;
        case 'n': out += '\n'; break;
        case 'r': out += '\r'; break;
        case 't': out += '\t'; break;
        case 'u': {
          if (i + 4 > s.size()) return false;
          unsigned cp = std::stoul(s.substr(i, 4), nullptr, 16);
          i += 4;
          // surrogate pairs
          if (cp >= 0xD800 && cp <= 0xDBFF && i + 6 <= s.size() &&
              s[i] == '\\' && s[i + 1] == 'u') {
            unsigned lo = std::stoul(s.substr(i + 2, 4), nullptr, 16);
            if (lo >= 0xDC00 && lo <= 0xDFFF) {
              cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
              i += 6;
            }
          }
          // encode UTF-8
          if (cp < 0x80) {
            out += static_cast<char>(cp);
          } else if (cp < 0x800) {
            out += static_cast<char>(0xC0 | (cp >> 6));
            out += static_cast<char>(0x80 | (cp & 0x3F));
          } else if (cp < 0x10000) {
            out += static_cast<char>(0xE0 | (cp >> 12));
            out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
            out += static_cast<char>(0x80 | (cp & 0x3F));
          } else {
            out += static_cast<char>(0xF0 | (cp >> 18));
            out += static_cast<char>(0x80 | ((cp >> 12) & 0x3F));
            out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
            out += static_cast<char>(0x80 | (cp & 0x3F));
          }
          break;
        }
        default:
          return false;
      }
    } else {
      out += c;
    }
  }
  return false;
}

void skip_ws(const std::string& s, size_t& i) {
  while (i < s.size() && (s[i] == ' ' || s[i] == '\n' || s[i] == '\t' ||
                          s[i] == '\r' || s[i] == ','))
    ++i;
}

bool parse_vocab(const std::string& text,
                 std::unordered_map<std::string, int32_t>& vocab) {
  size_t i = 0;
  skip_ws(text, i);
  if (i >= text.size() || text[i] != '{') return false;
  ++i;
  while (true) {
    skip_ws(text, i);
    if (i >= text.size()) return false;
    if (text[i] == '}') return true;
    std::string key;
    if (!parse_json_string(text, i, key)) return false;
    skip_ws(text, i);
    if (i >= text.size() || text[i] != ':') return false;
    ++i;
    skip_ws(text, i);
    size_t end = i;
    while (end < text.size() &&
           (isdigit(static_cast<unsigned char>(text[end])) || text[end] == '-'))
      ++end;
    if (end == i) return false;
    vocab[key] = static_cast<int32_t>(std::stol(text.substr(i, end - i)));
    i = end;
  }
}

// --- word segmentation (CLIP pattern, ASCII + opaque non-ASCII) -------------

bool is_letter(unsigned char c) { return isalpha(c) || c >= 0x80; }

std::vector<std::string> segment(const std::string& input) {
  // lowercase ASCII + collapse whitespace
  std::string text;
  text.reserve(input.size());
  bool prev_space = true;
  for (unsigned char c : input) {
    if (isspace(c)) {
      if (!prev_space) text += ' ';
      prev_space = true;
    } else {
      text += static_cast<char>(tolower(c));
      prev_space = false;
    }
  }
  while (!text.empty() && text.back() == ' ') text.pop_back();

  std::vector<std::string> words;
  size_t i = 0;
  const size_t n = text.size();
  auto startswith = [&](const char* s) {
    return text.compare(i, strlen(s), s) == 0;
  };
  while (i < n) {
    if (text[i] == ' ') {
      ++i;
      continue;
    }
    // contractions: 's 't 're 've 'm 'll 'd
    if (text[i] == '\'') {
      static const char* kContr[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
      bool matched = false;
      for (const char* c : kContr) {
        if (startswith(c)) {
          words.emplace_back(text.substr(i, strlen(c)));
          i += strlen(c);
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    if (is_letter(text[i])) {
      size_t j = i;
      while (j < n && is_letter(static_cast<unsigned char>(text[j]))) ++j;
      words.emplace_back(text.substr(i, j - i));
      i = j;
    } else if (isdigit(static_cast<unsigned char>(text[i]))) {
      words.emplace_back(1, text[i]);  // single digit per token (CLIP [\p{N}])
      ++i;
    } else {
      size_t j = i;
      while (j < n && text[j] != ' ' &&
             !is_letter(static_cast<unsigned char>(text[j])) &&
             !isdigit(static_cast<unsigned char>(text[j])) && text[j] != '\'')
        ++j;
      if (j == i) ++j;  // lone apostrophe
      words.emplace_back(text.substr(i, j - i));
      i = j;
    }
  }
  return words;
}

// GPT-2/CLIP bytes_to_unicode table: byte value -> UTF-8 encoding of its
// mapped printable codepoint (tokenizer/bpe.py bytes_to_unicode)
const std::array<std::string, 256>& byte_units() {
  static const std::array<std::string, 256> kTable = [] {
    std::array<std::string, 256> table;
    auto enc = [](unsigned cp) {
      std::string s;
      if (cp < 0x80) {
        s += static_cast<char>(cp);
      } else {  // all mapped codepoints are < 0x800
        s += static_cast<char>(0xC0 | (cp >> 6));
        s += static_cast<char>(0x80 | (cp & 0x3F));
      }
      return s;
    };
    std::array<bool, 256> direct{};
    for (int b = '!'; b <= '~'; ++b) direct[b] = true;
    for (int b = 0xA1; b <= 0xAC; ++b) direct[b] = true;
    for (int b = 0xAE; b <= 0xFF; ++b) direct[b] = true;
    int n = 0;
    for (int b = 0; b < 256; ++b)
      table[b] = direct[b] ? enc(b) : enc(256 + n++);
    return table;
  }();
  return kTable;
}

std::string to_byte_level(const std::string& word) {
  const auto& units = byte_units();
  std::string out;
  out.reserve(word.size() * 2);
  for (unsigned char c : word) out += units[c];
  return out;
}

// split a UTF-8 string into codepoint-level pieces
std::vector<std::string> utf8_chars(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t len = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
    out.push_back(s.substr(i, len));
    i += len;
  }
  return out;
}

std::vector<std::string> bpe(const Tokenizer& tok, const std::string& word) {
  std::vector<std::string> pieces = utf8_chars(word);
  if (pieces.empty()) return pieces;
  pieces.back() += "</w>";
  if (pieces.size() == 1) return pieces;
  while (pieces.size() > 1) {
    int32_t best_rank = std::numeric_limits<int32_t>::max();
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < pieces.size(); ++i) {
      auto it = tok.ranks.find({pieces[i], pieces[i + 1]});
      if (it != tok.ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == std::numeric_limits<int32_t>::max()) break;
    // merge ALL (non-overlapping) occurrences of the best pair, like the
    // Python reference's merge application
    const std::string a = pieces[best_i], b = pieces[best_i + 1];
    std::vector<std::string> merged;
    merged.reserve(pieces.size());
    for (size_t i = 0; i < pieces.size();) {
      if (i + 1 < pieces.size() && pieces[i] == a && pieces[i + 1] == b) {
        merged.push_back(a + b);
        i += 2;
      } else {
        merged.push_back(pieces[i]);
        ++i;
      }
    }
    pieces.swap(merged);
  }
  return pieces;
}

}  // namespace

extern "C" {

void* sdtpu_bpe_create(const char* vocab_path, const char* merges_path) {
  auto* tok = new Tokenizer();
  {
    std::ifstream f(vocab_path);
    if (!f) {
      tok->error = "cannot open vocab";
      return tok;
    }
    std::stringstream ss;
    ss << f.rdbuf();
    if (!parse_vocab(ss.str(), tok->vocab)) {
      tok->error = "vocab parse error";
      return tok;
    }
  }
  {
    std::ifstream f(merges_path);
    if (!f) {
      tok->error = "cannot open merges";
      return tok;
    }
    std::string line;
    int32_t rank = 0;
    while (std::getline(f, line)) {
      if (!line.empty() && line.back() == '\r') line.pop_back();
      if (line.empty() || line[0] == '#') continue;
      size_t sp = line.find(' ');
      if (sp == std::string::npos) continue;
      tok->ranks[{line.substr(0, sp), line.substr(sp + 1)}] = rank++;
    }
  }
  auto bos = tok->vocab.find("<|startoftext|>");
  auto eos = tok->vocab.find("<|endoftext|>");
  if (bos == tok->vocab.end() || eos == tok->vocab.end()) {
    tok->error = "missing special tokens";
    return tok;
  }
  tok->bos_id = bos->second;
  tok->eos_id = eos->second;
  return tok;
}

const char* sdtpu_bpe_error(void* handle) {
  auto* tok = static_cast<Tokenizer*>(handle);
  return tok->error.empty() ? nullptr : tok->error.c_str();
}

void sdtpu_bpe_destroy(void* handle) {
  delete static_cast<Tokenizer*>(handle);
}

int32_t sdtpu_bpe_bos(void* handle) {
  return static_cast<Tokenizer*>(handle)->bos_id;
}

int32_t sdtpu_bpe_eos(void* handle) {
  return static_cast<Tokenizer*>(handle)->eos_id;
}

// Encode text (no specials).  Returns number of ids written (<= max_out);
// unknown pieces map to eos (matching tokenizer/bpe.py).
int32_t sdtpu_bpe_encode(void* handle, const char* text, int32_t* out,
                         int32_t max_out) {
  auto* tok = static_cast<Tokenizer*>(handle);
  int32_t count = 0;
  for (const auto& word : segment(text)) {
    for (const auto& piece : bpe(*tok, to_byte_level(word))) {
      if (count >= max_out) return count;
      auto it = tok->vocab.find(piece);
      out[count++] = it == tok->vocab.end() ? tok->eos_id : it->second;
    }
  }
  return count;
}

}  // extern "C"
