// Native transitive-reduction backend (Myers 2005) over a host-resident
// edge list.
//
// Semantics are IDENTICAL to sage2_tpu.graph.reduce.transitive_reduction
// (pinned by refmodel.oracle.oracle_transitive_reduction): edge v->x with
// offset sl_vx = len(v) - ovl is removed when some middle vertex w has
// v->w and w->x with sl_vx = sl_vw + sl_wx, implication defined on the
// ORIGINAL edge set.
//
// Why this exists (measured, BASELINE.md round-3): after the overlap
// stage the pipeline holds the edge list on HOST at large scale (the
// chunked device reduction was built because an 84.5M-edge device sort
// crashed the TPU worker). Feeding the device kernel then costs ~2.4 GB
// of relay uploads at ~25 MB/s plus E-sized numpy prep — ~300 s of the
// 621 s E. coli reduce stage — while the expansion/probe loop itself is
// a cache-friendly irregular walk that a CPU does at >100 M
// expansions/s/core. On real TPU hardware the edges stay in HBM after
// overlap and the device kernel (graph/reduce.py) remains the right
// backend; this file is the host-resident backend the dispatcher
// (reduce.transitive_reduction_auto) picks when the operands already
// live on host. Reference equivalent: SAGE2's in-memory C++ reduction
// pass (SURVEY.md §2 "Transitive reduction"; reference mount empty — no
// file:line citation possible, SURVEY.md §0).
//
// Layout contract (same as the device kernels):
//   * src/dst/ovl are int32 arrays of length E, sorted by (src, dst);
//     padding rows have src == INT32_MAX and sit at the tail.
//   * read lengths: fixed_len >= 0 for fixed-length reads, else
//     fixed_len < 0 and lens[] holds per-VERTEX lengths (ragged).
//   * removed_out: E bytes, zero-initialised by the caller; set to 1 at
//     every removed edge position.
//
// Parallelism: vertices are dealt to threads in blocks via an atomic
// cursor. Every removal mark for expansions of v's out-edges lands
// inside v's own (src, dst)-run, so thread-private vertex ranges imply
// race-free writes by construction.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t kI32Max = 2147483647;

struct Shared {
  const int32_t* src;
  const int32_t* dst;
  const int32_t* ovl;
  const int32_t* lens;  // nullptr when fixed
  int32_t fixed_len;    // <0 when ragged
  int64_t n_real;
  int32_t n_vertices;
  const int64_t* startd;   // V+1 run starts in the (src, dst) order
  const int32_t* ss_sl;    // per-edge sl, sorted by (src, sl) within runs
  const int32_t* ss_dst;   // matching dst payload
  const int32_t* sl;       // per-edge sl in the original (src, dst) order
  const int32_t* maxsl;    // per-vertex max out-edge sl (-1 when none)
  uint8_t* removed;
};

// Expansion + membership probe for vertices [v_lo, v_hi).
int64_t reduce_range(const Shared& s, int32_t v_lo, int32_t v_hi) {
  int64_t expansions = 0;
  for (int32_t v = v_lo; v < v_hi; ++v) {
    const int64_t run_lo = s.startd[v];
    const int64_t run_hi = s.startd[v + 1];
    if (run_lo == run_hi) continue;
    const int32_t len_v =
        s.fixed_len >= 0 ? s.fixed_len : s.lens[v];
    const int32_t max_v = s.maxsl[v];
    for (int64_t e = run_lo; e < run_hi; ++e) {
      const int32_t w = s.dst[e];
      const int32_t bound = max_v - s.sl[e];
      if (bound < 0) continue;
      const int64_t w_lo = s.startd[w];
      const int64_t w_hi = s.startd[w + 1];
      const int32_t sl1 = s.sl[e];
      for (int64_t j = w_lo; j < w_hi && s.ss_sl[j] <= bound; ++j) {
        ++expansions;
        const int32_t x = s.ss_dst[j];
        if (x == v) continue;
        const int32_t sls = sl1 + s.ss_sl[j];
        // lower_bound of x among v's dsts (ascending within the run)
        int64_t lo = run_lo, hi = run_hi;
        while (lo < hi) {
          const int64_t mid = (lo + hi) >> 1;
          if (s.dst[mid] < x) lo = mid + 1; else hi = mid;
        }
        if (lo < run_hi && s.dst[lo] == x && len_v - s.ovl[lo] == sls) {
          s.removed[lo] = 1;
        }
      }
    }
  }
  return expansions;
}

}  // namespace

extern "C" {

// Returns the exact length-2-path expansion total (>= 0), or -1 on a
// malformed input (dst out of range / unsorted src run detected).
int64_t sage2_transitive_reduce(const int32_t* src, const int32_t* dst,
                                const int32_t* ovl, int64_t n_total,
                                int32_t n_vertices, int32_t fixed_len,
                                const int32_t* lens, int32_t n_threads,
                                uint8_t* removed_out) {
  const int32_t V = n_vertices;
  // real edges are the prefix (sorted by (src, dst); sentinels sort last)
  int64_t n_real = n_total;
  while (n_real > 0 && src[n_real - 1] == kI32Max) --n_real;
  if (n_real == 0) return 0;

  // O(E) layout validation: src in [0, V) and (src, dst) globally
  // non-decreasing over the real prefix. Negative or locally-unsorted
  // src would silently produce wrong runs (and wrong removal marks)
  // below, so it must be a hard error, matching the header contract.
  if (src[0] < 0 || src[n_real - 1] >= V) return -1;
  for (int64_t e = 1; e < n_real; ++e) {
    if (src[e] < src[e - 1]) return -1;
    if (src[e] == src[e - 1] && dst[e] < dst[e - 1]) return -1;
  }

  // run starts per vertex in the given (src, dst) order
  std::vector<int64_t> startd(static_cast<size_t>(V) + 1);
  {
    int64_t e = 0;
    for (int32_t v = 0; v <= V; ++v) {
      while (e < n_real && src[e] < v) ++e;
      startd[v] = e;
    }
    if (startd[V] != n_real) return -1;  // src out of [0, V)
  }

  // per-edge sl in original order; per-run (sl, dst) views sorted by sl
  std::vector<int32_t> sl(static_cast<size_t>(n_real));
  std::vector<int32_t> ss_sl(static_cast<size_t>(n_real));
  std::vector<int32_t> ss_dst(static_cast<size_t>(n_real));
  std::vector<int32_t> maxsl(static_cast<size_t>(V), -1);

  const int nt = std::max(1, static_cast<int>(n_threads));
  std::atomic<int32_t> cursor{0};
  std::atomic<int64_t> bad{0};
  constexpr int32_t kBlock = 8192;

  auto prep_worker = [&]() {
    std::vector<std::pair<int32_t, int32_t>> buf;
    for (;;) {
      const int32_t v0 = cursor.fetch_add(kBlock);
      if (v0 >= V) break;
      const int32_t v1 = std::min(V, v0 + kBlock);
      for (int32_t v = v0; v < v1; ++v) {
        const int64_t a = startd[v], b = startd[v + 1];
        if (a == b) continue;
        const int32_t len_v = fixed_len >= 0 ? fixed_len : lens[v];
        buf.clear();
        for (int64_t e = a; e < b; ++e) {
          if (dst[e] < 0 || dst[e] >= V) { bad.store(1); return; }
          sl[e] = len_v - ovl[e];
          buf.emplace_back(sl[e], dst[e]);
        }
        std::sort(buf.begin(), buf.end());
        for (int64_t e = a; e < b; ++e) {
          ss_sl[e] = buf[e - a].first;
          ss_dst[e] = buf[e - a].second;
        }
        maxsl[v] = ss_sl[b - 1];
      }
    }
  };
  {
    std::vector<std::thread> ts;
    for (int t = 1; t < nt; ++t) ts.emplace_back(prep_worker);
    prep_worker();
    for (auto& t : ts) t.join();
  }
  if (bad.load()) return -1;

  Shared s{src,          dst,          ovl,   lens,
           fixed_len,    n_real,       V,     startd.data(),
           ss_sl.data(), ss_dst.data(), sl.data(), maxsl.data(),
           removed_out};

  cursor.store(0);
  std::atomic<int64_t> expansions{0};
  auto main_worker = [&]() {
    int64_t local = 0;
    for (;;) {
      const int32_t v0 = cursor.fetch_add(kBlock);
      if (v0 >= V) break;
      local += reduce_range(s, v0, std::min(V, v0 + kBlock));
    }
    expansions.fetch_add(local);
  };
  {
    std::vector<std::thread> ts;
    for (int t = 1; t < nt; ++t) ts.emplace_back(main_worker);
    main_worker();
    for (auto& t : ts) t.join();
  }
  return expansions.load();
}

}  // extern "C"
