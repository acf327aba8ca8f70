"""Time the native C++ reduction at E. coli scale on a synthetic string
graph with the real run's statistics (E=84.5M, V=4.6M, ~11 exp/edge)."""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sage2_tpu.graph.reduce import transitive_reduction_native

rng = np.random.default_rng(0)
V = 4_600_000
L = 100
MIN_OVL = 40
# reads at random genome positions; edge i->j iff 0 < pos_j - pos_i <= L-MIN_OVL
GENOME = V * L // 37  # ~37x equivalent density -> ~18-20 out-edges/vertex
pos = np.sort(rng.integers(0, GENOME, size=V).astype(np.int64))

t0 = time.perf_counter()
# out-edges: for each i, all j in (i, hi] with pos[j] <= pos[i] + (L-MIN_OVL)
hi = np.searchsorted(pos, pos + (L - MIN_OVL), side="right")
counts = (hi - np.arange(V) - 1).astype(np.int64)
E = int(counts.sum())
print(f"V={V:,} E={E:,} avg_deg={E/V:.1f}  (built in {time.perf_counter()-t0:.1f}s)")
starts = np.zeros(V + 1, np.int64); np.cumsum(counts, out=starts[1:])
src = np.repeat(np.arange(V, dtype=np.int32), counts)
rank = np.arange(E, dtype=np.int64) - starts[src] + 1
dst = (src + rank).astype(np.int32)
ovl = (L - (pos[dst] - pos[src])).astype(np.int32)
# already sorted by (src, dst) since dst ascends within each src run
print(f"edge build total {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
red = transitive_reduction_native(src, dst, ovl, V, L)
dt = time.perf_counter() - t0
print(f"native reduce: {dt:.1f}s  n_edges={int(red.n_edges):,} "
      f"expansions={int(red.n_expansions):,} "
      f"({int(red.n_expansions)/dt/1e6:.0f} M exp/s)")
