// Native ingest: FASTQ/FASTA(.gz) -> packed 2-bit-code arrays.
//
// The reference's read layer is native C++ + zlib (SURVEY.md §2
// "FASTQ/FASTA reader"); this is its TPU-framework equivalent: a
// host-side hot loop that streams (optionally gzipped) read files into
// the int8 code arrays the device pipeline consumes ('N'/unknown -> A,
// matching sage2_tpu.ops.bitpack.encode_ascii). Exposed as a C API and
// bound via ctypes (sage2_tpu/io/native.py).
//
// Build: see sage2_tpu/io/native.py (g++ -O3 -shared -fPIC ... -lz).

#include <zlib.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// 2-bit codes: A=0 C=1 G=2 T=3; everything else -> A (0).
int8_t kCode[256];
struct CodeInit {
  CodeInit() {
    memset(kCode, 0, sizeof(kCode));
    kCode[(unsigned)'C'] = kCode[(unsigned)'c'] = 1;
    kCode[(unsigned)'G'] = kCode[(unsigned)'g'] = 2;
    kCode[(unsigned)'T'] = kCode[(unsigned)'t'] = 3;
  }
} code_init;

bool read_all(const char* path, std::vector<char>& out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  char buf[1 << 20];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) {
    out.insert(out.end(), buf, buf + n);
  }
  bool ok = n == 0;
  gzclose(f);
  return ok;
}

struct Parsed {
  std::vector<int8_t> codes;  // n_reads * read_len
  int64_t n_reads = 0;
  int64_t read_len = 0;
  std::string error;
};

// length_policy: 0 = strict (error on mixed), 1 = trim to dominant
// length (drop shorter), 2 = filter to dominant length exactly.
void finalize(std::vector<std::pair<const char*, int64_t>>& seqs,
              int policy, Parsed* out) {
  if (seqs.empty()) {
    out->n_reads = 0;
    out->read_len = 0;
    return;
  }
  // dominant length
  std::vector<std::pair<int64_t, int64_t>> hist;  // (len, count)
  for (auto& s : seqs) {
    bool found = false;
    for (auto& h : hist)
      if (h.first == s.second) {
        h.second++;
        found = true;
        break;
      }
    if (!found) hist.push_back({s.second, 1});
  }
  int64_t target = hist[0].first;
  if (hist.size() > 1) {
    if (policy == 0) {
      out->error = "mixed read lengths (use length_policy trim/filter)";
      return;
    }
    int64_t best = -1;
    for (auto& h : hist)
      if (h.second > best || (h.second == best && h.first < target)) {
        best = h.second;
        target = h.first;
      }
  }
  out->read_len = target;
  out->codes.reserve(seqs.size() * target);
  for (auto& s : seqs) {
    if (s.second == target ||
        (policy == 1 && s.second > target)) {
      const char* p = s.first;
      for (int64_t j = 0; j < target; ++j)
        out->codes.push_back(kCode[(unsigned char)p[j]]);
      out->n_reads++;
    }
  }
}

void parse_fastq_buf(const std::vector<char>& data, int policy, Parsed* out) {
  std::vector<std::pair<const char*, int64_t>> seqs;
  const char* p = data.data();
  const char* end = p + data.size();
  int line = 0;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    if (!nl) nl = end;
    int64_t len = nl - p;
    if (len > 0 && p[len - 1] == '\r') len--;
    if (len > 0) {
      int phase = line % 4;
      if (phase == 0 && p[0] != '@') {
        out->error = "malformed FASTQ header at line " + std::to_string(line);
        return;
      }
      if (phase == 1) seqs.push_back({p, len});
      line++;
    }
    p = nl + 1;
  }
  finalize(seqs, policy, out);
}

void parse_fasta_buf(std::vector<char>& data, int policy, Parsed* out) {
  // sequences may wrap lines: compact each record in place
  std::vector<std::pair<const char*, int64_t>> seqs;
  char* w = data.data();
  const char* p = data.data();
  const char* end = p + data.size();
  char* cur_start = nullptr;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    if (!nl) nl = end;
    int64_t len = nl - p;
    if (len > 0 && p[len - 1] == '\r') len--;
    if (len > 0) {
      if (p[0] == '>') {
        if (cur_start) seqs.push_back({cur_start, w - cur_start});
        cur_start = w;
      } else if (p[0] == ';') {
        // legacy FASTA comment line: skip (matches _parse_fasta_py)
      } else if (cur_start) {
        memmove(w, p, len);
        w += len;
      }
    }
    p = nl + 1;
  }
  if (cur_start) seqs.push_back({cur_start, w - cur_start});
  finalize(seqs, policy, out);
}

thread_local std::string g_error;

}  // namespace

extern "C" {

// Parse a FASTQ or FASTA file (gz ok). Returns a malloc'd int8 buffer of
// n_reads*read_len codes (caller frees with sage2_free), or nullptr on
// error (message via sage2_last_error). is_fasta: 0 fastq, 1 fasta.
int8_t* sage2_parse(const char* path, int is_fasta, int length_policy,
                    int64_t* n_reads, int64_t* read_len) {
  std::vector<char> data;
  if (!read_all(path, data)) {
    g_error = std::string("cannot read ") + path;
    return nullptr;
  }
  Parsed out;
  if (is_fasta)
    parse_fasta_buf(data, length_policy, &out);
  else
    parse_fastq_buf(data, length_policy, &out);
  if (!out.error.empty()) {
    g_error = out.error;
    return nullptr;
  }
  *n_reads = out.n_reads;
  *read_len = out.read_len;
  int8_t* buf = (int8_t*)malloc(out.codes.size() ? out.codes.size() : 1);
  if (!out.codes.empty())
    memcpy(buf, out.codes.data(), out.codes.size());
  g_error.clear();
  return buf;
}

void sage2_free(int8_t* p) { free(p); }

const char* sage2_last_error() { return g_error.c_str(); }

}  // extern "C"
