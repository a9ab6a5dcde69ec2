// Native safetensors header parser/validator.
//
// The artifact store (convert/artifacts.py) plays the role of the
// reference's compiled .mlmodelc bundle + metadata.json input schema
// (coreml_model.py:65-84).  The reference loads those through the
// closed-source Core ML runtime's native deserializer; this is the
// TPU framework's native equivalent for its own artifact format:
// parse + validate the safetensors header in C++, hand Python a tensor
// table (name/dtype/shape/offset) it maps zero-copy over an mmap.
//
// Format: 8-byte little-endian u64 header length, then that many bytes of
// JSON {"name": {"dtype": "F32", "shape": [..], "data_offsets": [b, e]},
// "__metadata__": {..}}, then the raw data buffer.  We validate that every
// tensor's byte span lies inside the data buffer and matches
// prod(shape) * itemsize, so Python-side views can never read out of
// bounds.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct TensorEntry {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  int64_t begin = 0;
  int64_t end = 0;
};

struct Handle {
  std::vector<TensorEntry> tensors;
  int64_t data_offset = 0;  // 8 + header_len
  int64_t file_size = 0;
  std::string error;
};

int64_t dtype_size(const std::string& d) {
  if (d == "F64" || d == "I64" || d == "U64") return 8;
  if (d == "F32" || d == "I32" || d == "U32") return 4;
  if (d == "F16" || d == "BF16" || d == "I16" || d == "U16") return 2;
  if (d == "I8" || d == "U8" || d == "BOOL" || d == "F8_E4M3" ||
      d == "F8_E5M2")
    return 1;
  return -1;
}

// --- minimal JSON parser for the safetensors header schema ---------------

struct Parser {
  const char* p;
  const char* end;
  std::string error;

  bool fail(const char* msg) {
    if (error.empty()) error = msg;
    return false;
  }

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }

  bool expect(char c) {
    ws();
    if (p >= end || *p != c) return fail("unexpected character");
    ++p;
    return true;
  }

  bool peek(char c) {
    ws();
    return p < end && *p == c;
  }

  bool parse_string(std::string* out) {
    ws();
    if (p >= end || *p != '"') return fail("expected string");
    ++p;
    out->clear();
    while (p < end && *p != '"') {
      char c = *p++;
      if (c == '\\') {
        if (p >= end) return fail("bad escape");
        char e = *p++;
        switch (e) {
          case '"': out->push_back('"'); break;
          case '\\': out->push_back('\\'); break;
          case '/': out->push_back('/'); break;
          case 'b': out->push_back('\b'); break;
          case 'f': out->push_back('\f'); break;
          case 'n': out->push_back('\n'); break;
          case 'r': out->push_back('\r'); break;
          case 't': out->push_back('\t'); break;
          case 'u': {
            if (end - p < 4) return fail("bad \\u escape");
            unsigned cp = 0;
            for (int i = 0; i < 4; i++) {
              char h = *p++;
              cp <<= 4;
              if (h >= '0' && h <= '9') cp |= h - '0';
              else if (h >= 'a' && h <= 'f') cp |= h - 'a' + 10;
              else if (h >= 'A' && h <= 'F') cp |= h - 'A' + 10;
              else return fail("bad hex in \\u escape");
            }
            // encode UTF-8 (tensor names are ASCII in practice; surrogate
            // pairs unsupported -> replacement)
            if (cp < 0x80) {
              out->push_back(static_cast<char>(cp));
            } else if (cp < 0x800) {
              out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
              out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
            } else {
              out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
              out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
              out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
            }
            break;
          }
          default:
            return fail("unknown escape");
        }
      } else {
        out->push_back(c);
      }
    }
    if (p >= end) return fail("unterminated string");
    ++p;  // closing quote
    return true;
  }

  bool parse_int(int64_t* out) {
    ws();
    bool neg = false;
    if (p < end && *p == '-') {
      neg = true;
      ++p;
    }
    if (p >= end || *p < '0' || *p > '9') return fail("expected integer");
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      if (v > (INT64_MAX - 9) / 10) return fail("integer overflow");
      v = v * 10 + (*p++ - '0');
    }
    *out = neg ? -v : v;
    return true;
  }

  // skip any JSON value (used for __metadata__ contents)
  bool skip_value() {
    ws();
    if (p >= end) return fail("truncated value");
    char c = *p;
    if (c == '"') {
      std::string s;
      return parse_string(&s);
    }
    if (c == '{' || c == '[') {
      char open = c, close = (c == '{') ? '}' : ']';
      int depth = 0;
      bool in_str = false;
      while (p < end) {
        char x = *p++;
        if (in_str) {
          if (x == '\\') {
            if (p < end) ++p;
          } else if (x == '"') {
            in_str = false;
          }
        } else if (x == '"') {
          in_str = true;
        } else if (x == open) {
          ++depth;
        } else if (x == close) {
          if (--depth == 0) return true;
        }
      }
      return fail("unterminated container");
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']' && *p != ' ' &&
           *p != '\n' && *p != '\t' && *p != '\r')
      ++p;
    return true;
  }

  bool parse_int_array(std::vector<int64_t>* out) {
    if (!expect('[')) return false;
    out->clear();
    if (peek(']')) {
      ++p;
      return true;
    }
    while (true) {
      int64_t v;
      if (!parse_int(&v)) return false;
      out->push_back(v);
      ws();
      if (p >= end) return fail("unterminated array");
      if (*p == ',') {
        ++p;
        continue;
      }
      if (*p == ']') {
        ++p;
        return true;
      }
      return fail("bad array separator");
    }
  }

  bool parse_tensor_info(TensorEntry* t) {
    if (!expect('{')) return false;
    if (peek('}')) {
      ++p;
      return fail("empty tensor info");
    }
    bool saw_dtype = false, saw_shape = false, saw_offsets = false;
    while (true) {
      std::string key;
      if (!parse_string(&key)) return false;
      if (!expect(':')) return false;
      if (key == "dtype") {
        if (!parse_string(&t->dtype)) return false;
        saw_dtype = true;
      } else if (key == "shape") {
        if (!parse_int_array(&t->shape)) return false;
        saw_shape = true;
      } else if (key == "data_offsets") {
        std::vector<int64_t> off;
        if (!parse_int_array(&off)) return false;
        if (off.size() != 2) return fail("data_offsets must have 2 entries");
        t->begin = off[0];
        t->end = off[1];
        saw_offsets = true;
      } else {
        if (!skip_value()) return false;
      }
      ws();
      if (p >= end) return fail("unterminated tensor info");
      if (*p == ',') {
        ++p;
        continue;
      }
      if (*p == '}') {
        ++p;
        break;
      }
      return fail("bad object separator");
    }
    if (!saw_dtype || !saw_shape || !saw_offsets)
      return fail("tensor info missing dtype/shape/data_offsets");
    return true;
  }

  bool parse_header(Handle* h) {
    if (!expect('{')) return false;
    if (peek('}')) {
      ++p;
      return true;  // empty file: zero tensors
    }
    while (true) {
      std::string name;
      if (!parse_string(&name)) return false;
      if (!expect(':')) return false;
      if (name == "__metadata__") {
        if (!skip_value()) return false;
      } else {
        TensorEntry t;
        t.name = name;
        if (!parse_tensor_info(&t)) return false;
        h->tensors.push_back(std::move(t));
      }
      ws();
      if (p >= end) return fail("unterminated header");
      if (*p == ',') {
        ++p;
        continue;
      }
      if (*p == '}') {
        ++p;
        return true;
      }
      return fail("bad header separator");
    }
  }
};

bool validate(Handle* h) {
  const int64_t data_size = h->file_size - h->data_offset;
  for (const auto& t : h->tensors) {
    const int64_t isz = dtype_size(t.dtype);
    if (isz < 0) {
      h->error = "unknown dtype " + t.dtype + " for tensor " + t.name;
      return false;
    }
    int64_t count = 1;
    for (int64_t d : t.shape) {
      if (d < 0) {
        h->error = "negative dim in tensor " + t.name;
        return false;
      }
      if (d != 0 && count > INT64_MAX / (d ? d : 1)) {
        h->error = "shape overflow in tensor " + t.name;
        return false;
      }
      count *= d;
    }
    if (t.begin < 0 || t.end < t.begin || t.end > data_size) {
      h->error = "data_offsets out of bounds for tensor " + t.name;
      return false;
    }
    if (t.end - t.begin != count * isz) {
      h->error = "byte span does not match shape*itemsize for tensor " +
                 t.name;
      return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Parse + validate the header of a safetensors file.  Returns a handle
// (free with sdtpu_st_free).  On any failure the handle carries an error
// string (sdtpu_st_errmsg) and zero tensors.
void* sdtpu_st_parse(const char* path) {
  Handle* h = new Handle();
  FILE* f = fopen(path, "rb");
  if (!f) {
    h->error = "cannot open file";
    return h;
  }
  fseek(f, 0, SEEK_END);
  h->file_size = ftell(f);
  fseek(f, 0, SEEK_SET);
  uint8_t lenbuf[8];
  if (h->file_size < 8 || fread(lenbuf, 1, 8, f) != 8) {
    h->error = "file too small for safetensors header";
    fclose(f);
    return h;
  }
  uint64_t header_len = 0;
  for (int i = 7; i >= 0; --i) header_len = (header_len << 8) | lenbuf[i];
  if (header_len > static_cast<uint64_t>(h->file_size) - 8 ||
      header_len > (100ull << 20)) {
    h->error = "header length out of bounds";
    fclose(f);
    return h;
  }
  std::string header(header_len, '\0');
  if (fread(header.data(), 1, header_len, f) != header_len) {
    h->error = "truncated header";
    fclose(f);
    return h;
  }
  fclose(f);
  h->data_offset = 8 + static_cast<int64_t>(header_len);

  Parser parser{header.data(), header.data() + header_len, {}};
  if (!parser.parse_header(h)) {
    h->tensors.clear();
    h->error = "header parse error: " + parser.error;
    return h;
  }
  if (!validate(h)) h->tensors.clear();
  return h;
}

const char* sdtpu_st_errmsg(void* hp) {
  Handle* h = static_cast<Handle*>(hp);
  return h->error.empty() ? nullptr : h->error.c_str();
}

int64_t sdtpu_st_count(void* hp) {
  return static_cast<Handle*>(hp)->tensors.size();
}

int64_t sdtpu_st_data_offset(void* hp) {
  return static_cast<Handle*>(hp)->data_offset;
}

const char* sdtpu_st_name(void* hp, int64_t i) {
  return static_cast<Handle*>(hp)->tensors[i].name.c_str();
}

const char* sdtpu_st_dtype(void* hp, int64_t i) {
  return static_cast<Handle*>(hp)->tensors[i].dtype.c_str();
}

int32_t sdtpu_st_ndim(void* hp, int64_t i) {
  return static_cast<int32_t>(
      static_cast<Handle*>(hp)->tensors[i].shape.size());
}

void sdtpu_st_shape(void* hp, int64_t i, int64_t* out) {
  const auto& s = static_cast<Handle*>(hp)->tensors[i].shape;
  for (size_t d = 0; d < s.size(); ++d) out[d] = s[d];
}

// byte span relative to the data section (add sdtpu_st_data_offset)
int64_t sdtpu_st_begin(void* hp, int64_t i) {
  return static_cast<Handle*>(hp)->tensors[i].begin;
}

int64_t sdtpu_st_end(void* hp, int64_t i) {
  return static_cast<Handle*>(hp)->tensors[i].end;
}

void sdtpu_st_free(void* hp) { delete static_cast<Handle*>(hp); }

}  // extern "C"
