// Native safetensors reader: mmap + header parse + zero-copy tensor views.
//
// TPU-native counterpart of the reference's native weight loader
// (/root/reference/src/runtime/file_loader.cc — C++ per-tensor binary reads
// feeding Legion tasks). Here the checkpoint stays in the HF safetensors
// format: the file is mmap'd once, the JSON header parsed with a minimal
// in-place parser, and each tensor is exposed as a (dtype, shape, pointer)
// view straight into the page cache — Python wraps the pointers as numpy
// arrays with zero copies (flexflow_tpu/utils/native_safetensors.py).
//
// C ABI (ctypes-friendly); thread-safe for concurrent readers after open.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct TensorInfo {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;
  uint64_t end = 0;
};

struct File {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  const uint8_t* data = nullptr;  // start of the tensor-data region
  std::vector<TensorInfo> tensors;
  std::string error;
};

// --- minimal JSON parser for the safetensors header (flat enough) ---

struct Parser {
  const char* p;
  const char* end;

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool expect(char c) {
    ws();
    if (p < end && *p == c) { p++; return true; }
    return false;
  }
  bool string(std::string* out) {
    ws();
    if (p >= end || *p != '"') return false;
    p++;
    out->clear();
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) { p++; }
      out->push_back(*p++);
    }
    if (p >= end) return false;
    p++;  // closing quote
    return true;
  }
  bool integer(int64_t* out) {
    ws();
    bool neg = false;
    if (p < end && *p == '-') { neg = true; p++; }
    if (p >= end || *p < '0' || *p > '9') return false;
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    *out = neg ? -v : v;
    return true;
  }
  // skip any JSON value (for __metadata__)
  bool skip_value() {
    ws();
    if (p >= end) return false;
    if (*p == '"') { std::string s; return string(&s); }
    if (*p == '{') {
      p++;
      ws();
      if (p < end && *p == '}') { p++; return true; }
      while (true) {
        std::string k;
        if (!string(&k) || !expect(':') || !skip_value()) return false;
        ws();
        if (p < end && *p == ',') { p++; continue; }
        return expect('}');
      }
    }
    if (*p == '[') {
      p++;
      ws();
      if (p < end && *p == ']') { p++; return true; }
      while (true) {
        if (!skip_value()) return false;
        ws();
        if (p < end && *p == ',') { p++; continue; }
        return expect(']');
      }
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') p++;
    return true;
  }
};

bool parse_header(const char* json, size_t len, File* f) {
  Parser ps{json, json + len};
  if (!ps.expect('{')) return false;
  ps.ws();
  if (ps.p < ps.end && *ps.p == '}') return true;
  while (true) {
    std::string key;
    if (!ps.string(&key) || !ps.expect(':')) return false;
    if (key == "__metadata__") {
      if (!ps.skip_value()) return false;
    } else {
      TensorInfo t;
      t.name = key;
      if (!ps.expect('{')) return false;
      while (true) {
        std::string field;
        if (!ps.string(&field) || !ps.expect(':')) return false;
        if (field == "dtype") {
          if (!ps.string(&t.dtype)) return false;
        } else if (field == "shape") {
          if (!ps.expect('[')) return false;
          ps.ws();
          if (ps.p < ps.end && *ps.p == ']') {
            ps.p++;
          } else {
            while (true) {
              int64_t d;
              if (!ps.integer(&d)) return false;
              t.shape.push_back(d);
              ps.ws();
              if (ps.p < ps.end && *ps.p == ',') { ps.p++; continue; }
              if (!ps.expect(']')) return false;
              break;
            }
          }
        } else if (field == "data_offsets") {
          int64_t b, e;
          if (!ps.expect('[') || !ps.integer(&b)) return false;
          if (!ps.expect(',') || !ps.integer(&e) || !ps.expect(']')) return false;
          t.begin = static_cast<uint64_t>(b);
          t.end = static_cast<uint64_t>(e);
        } else {
          if (!ps.skip_value()) return false;
        }
        ps.ws();
        if (ps.p < ps.end && *ps.p == ',') { ps.p++; continue; }
        if (!ps.expect('}')) return false;
        break;
      }
      f->tensors.push_back(std::move(t));
    }
    ps.ws();
    if (ps.p < ps.end && *ps.p == ',') { ps.p++; continue; }
    return ps.expect('}');
  }
}

}  // namespace

extern "C" {

void* stx_open(const char* path) {
  File* f = new File();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) { f->error = "open failed"; return f; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) {
    f->error = "stat failed / file too small";
    return f;
  }
  f->size = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (m == MAP_FAILED) { f->error = "mmap failed"; return f; }
  f->base = static_cast<const uint8_t*>(m);
  uint64_t header_len;
  std::memcpy(&header_len, f->base, 8);  // little-endian u64
  if (8 + header_len > f->size) { f->error = "bad header length"; return f; }
  f->data = f->base + 8 + header_len;
  if (!parse_header(reinterpret_cast<const char*>(f->base + 8),
                    header_len, f)) {
    f->error = "header parse failed";
    f->tensors.clear();
  }
  return f;
}

const char* stx_error(void* h) {
  File* f = static_cast<File*>(h);
  return f->error.empty() ? nullptr : f->error.c_str();
}

int stx_num_tensors(void* h) {
  return static_cast<int>(static_cast<File*>(h)->tensors.size());
}

const char* stx_name(void* h, int i) {
  return static_cast<File*>(h)->tensors[i].name.c_str();
}

const char* stx_dtype(void* h, int i) {
  return static_cast<File*>(h)->tensors[i].dtype.c_str();
}

int stx_ndim(void* h, int i) {
  return static_cast<int>(static_cast<File*>(h)->tensors[i].shape.size());
}

void stx_shape(void* h, int i, int64_t* out) {
  const auto& s = static_cast<File*>(h)->tensors[i].shape;
  for (size_t d = 0; d < s.size(); ++d) out[d] = s[d];
}

const void* stx_data(void* h, int i, int64_t* nbytes) {
  File* f = static_cast<File*>(h);
  const TensorInfo& t = f->tensors[i];
  if (nbytes) *nbytes = static_cast<int64_t>(t.end - t.begin);
  return f->data + t.begin;
}

void stx_close(void* h) {
  File* f = static_cast<File*>(h);
  if (f->base) munmap(const_cast<uint8_t*>(f->base), f->size);
  if (f->fd >= 0) close(f->fd);
  delete f;
}

}  // extern "C"
