// Fast parser for DBoW2 vocabulary text files — the native runtime piece
// behind tpuslam/place/dbow_compat.py.
//
// The reference loads its ~145 MB ORBvoc.txt with a per-line stringstream
// parse (Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1350-1437), taking
// many seconds at startup (System.cc:69-75 prints a "This could take a
// while" banner).  This parser mmap-style slurps the file once and scans it
// with a single strtof/strtol pass into one flat float32 row-major matrix
// (n_rows x n_cols), which Python reshapes into the tree arrays.  Format
// (TemplatedVocabulary.h:1350-1437): header line "k L scoring weighting",
// then one node per line: "parent is_leaf d0 .. d31 weight".
//
// Build: native/build.sh -> tpuslam/io/_native/libtpuslam_vocab.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Parsed {
  int header[4] = {0, 0, 0, 0};
  int n_cols = 0;
  std::vector<float> data;  // n_rows * n_cols
};

}  // namespace

extern "C" {

// Parse the whole file.  Returns an opaque handle (nullptr on failure).
// *n_rows/*n_cols receive the node matrix shape; header_out[4] gets
// {k, L, scoring, weighting}.
void* vocab_parse_text(const char* path, int* n_rows, int* n_cols,
                       int* header_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);
  buf[size] = '\0';

  auto* out = new Parsed();
  char* p = buf.data();
  char* end = buf.data() + size;

  // header: k L scoring weighting
  for (int i = 0; i < 4; i++) out->header[i] = static_cast<int>(std::strtol(p, &p, 10));
  while (p < end && *p != '\n') p++;
  if (p < end) p++;

  // per-node lines: count columns from the first line, then stream
  {
    char* q = p;
    int cols = 0;
    while (q < end && *q != '\n') {
      while (q < end && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
      if (q >= end || *q == '\n') break;
      std::strtof(q, &q);
      cols++;
    }
    out->n_cols = cols;
  }
  if (out->n_cols <= 2) {
    delete out;
    return nullptr;
  }
  out->data.reserve(1 << 20);
  while (p < end) {
    // skip whitespace/newlines between tokens; strtof does this itself,
    // so one flat token stream is enough given the fixed column count
    char* q;
    float v = std::strtof(p, &q);
    if (q == p) break;  // no more numbers
    out->data.push_back(v);
    p = q;
  }
  size_t rows = out->data.size() / out->n_cols;
  out->data.resize(rows * out->n_cols);  // drop a trailing partial line
  *n_rows = static_cast<int>(rows);
  *n_cols = out->n_cols;
  std::memcpy(header_out, out->header, sizeof(out->header));
  return out;
}

const float* vocab_data(void* h) {
  return static_cast<Parsed*>(h)->data.data();
}

void vocab_free(void* h) { delete static_cast<Parsed*>(h); }

}  // extern "C"
