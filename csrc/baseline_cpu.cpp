// Single-threaded C++ baseline: the reference stand-in for benchmarks.
//
// The reference mount was empty (SURVEY.md §0/§6), so per-chip speedup is
// measured against this honest single-threaded C++ implementation of the
// same stages the reference's hot loops perform (SURVEY.md §3.3): exact
// k-mer counting into a hash table, and suffix-prefix overlap detection
// via a prefix-seed hash index + exact extension. It follows the
// reference's documented approach ("prefix/suffix hashing or sorted seed
// index; exact extension", SURVEY.md §2) with standard C++ data
// structures at -O3.
//
// stdin/argv protocol (driven by bench.py):
//   baseline_cpu count   <reads.bin> <N> <L> <k>
//   baseline_cpu overlap <reads.bin> <N> <L> <min_overlap>
// reads.bin: N*L int8 codes. Prints one line: "<result> <seconds>".

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

using Clock = std::chrono::steady_clock;

static std::vector<int8_t> load(const char* path, int64_t n) {
  std::vector<int8_t> buf(n);
  FILE* f = fopen(path, "rb");
  if (!f || fread(buf.data(), 1, n, f) != (size_t)n) {
    fprintf(stderr, "cannot read %s\n", path);
    exit(1);
  }
  fclose(f);
  return buf;
}

// canonical k-mer counting (k <= 31), 64-bit packed keys
static int64_t run_count(const int8_t* reads, int64_t N, int64_t L, int k) {
  std::unordered_map<uint64_t, uint32_t> table;
  table.reserve((size_t)(N * (L - k + 1) / 4));
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  for (int64_t i = 0; i < N; ++i) {
    const int8_t* r = reads + i * L;
    uint64_t fwd = 0, rc = 0;
    for (int64_t j = 0; j < L; ++j) {
      fwd = ((fwd << 2) | (uint64_t)r[j]) & mask;
      rc = (rc >> 2) | ((uint64_t)(3 - r[j]) << (2 * (k - 1)));
      if (j >= k - 1) {
        uint64_t canon = fwd < rc ? fwd : rc;
        table[canon]++;
      }
    }
  }
  return (int64_t)table.size();
}

// all-pairs exact suffix-prefix overlaps >= min_overlap via prefix-seed
// hash index + memcmp extension; returns edge count (longest per pair
// is what the graph keeps, but for throughput parity we count all
// verified maximal candidates like the device kernel's verify stage)
static int64_t run_overlap(const int8_t* reads, int64_t N, int64_t L,
                           int min_ovl) {
  const int s = min_ovl < 32 ? min_ovl : 32;
  const uint64_t mask = (s < 32) ? ((1ULL << (2 * s)) - 1) : ~0ULL;
  // index: prefix seed of every read
  std::unordered_map<uint64_t, std::vector<int32_t>> index;
  index.reserve((size_t)N * 2);
  for (int64_t b = 0; b < N; ++b) {
    const int8_t* r = reads + b * L;
    uint64_t key = 0;
    for (int j = 0; j < s; ++j) key = (key << 2) | (uint64_t)r[j];
    index[key].push_back((int32_t)b);
  }
  int64_t edges = 0;
  for (int64_t a = 0; a < N; ++a) {
    const int8_t* ra = reads + a * L;
    // rolling seed over suffix start positions p in [1, L - min_ovl]
    uint64_t key = 0;
    for (int j = 0; j < s; ++j) key = (key << 2) | (uint64_t)ra[j];
    for (int64_t p = 1; p + min_ovl <= L; ++p) {
      key = ((key << 2) | (uint64_t)ra[p + s - 1]) & mask;
      auto it = index.find(key);
      if (it == index.end()) continue;
      int64_t ovl = L - p;
      for (int32_t b : it->second) {
        if (b == a) continue;
        const int8_t* rb = reads + (int64_t)b * L;
        if (memcmp(ra + p + s, rb + s, ovl - s) == 0) edges++;
      }
    }
  }
  return edges;
}

int main(int argc, char** argv) {
  if (argc != 6) {
    fprintf(stderr,
            "usage: %s count|overlap reads.bin N L k_or_minovl\n", argv[0]);
    return 1;
  }
  const char* mode = argv[1];
  int64_t N = atoll(argv[3]);
  int64_t L = atoll(argv[4]);
  int param = atoi(argv[5]);
  auto reads = load(argv[2], N * L);
  auto t0 = Clock::now();
  int64_t result;
  if (!strcmp(mode, "count"))
    result = run_count(reads.data(), N, L, param);
  else if (!strcmp(mode, "overlap"))
    result = run_overlap(reads.data(), N, L, param);
  else {
    fprintf(stderr, "unknown mode %s\n", mode);
    return 1;
  }
  double secs =
      std::chrono::duration<double>(Clock::now() - t0).count();
  printf("%lld %.6f\n", (long long)result, secs);
  return 0;
}
