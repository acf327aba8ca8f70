"""Where does the e2e correct stage spend its time? One 500k-read chunk
on the bench chip: count vs per-sub-pass correction."""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.kmer import count_kmers, correct_reads

N, L, K = 500_000, 100, 25
genome = simulate_genome(int(N * L / 50), seed=3)
reads, _ = simulate_reads(genome, read_len=L, coverage=50.0,
                          error_rate=0.005, seed=4)
reads = reads[:N]
print(f"{N} reads x {L} bp, k={K}", file=sys.stderr)

r = jnp.asarray(reads.astype(np.int32))
r.block_until_ready()

for name, fn in [
    ("count", lambda: count_kmers(r, K)),
]:
    t0 = time.perf_counter(); out = fn()
    jax.block_until_ready(out)
    t1 = time.perf_counter(); out2 = fn()
    jax.block_until_ready(out2)
    t2 = time.perf_counter()
    print(f"{name}: first {t1-t0:.1f}s steady {t2-t1:.1f}s", file=sys.stderr)
table = out2

t0 = time.perf_counter()
c = correct_reads(r, K, 2, rounds=1, table=table)
c.block_until_ready()
t1 = time.perf_counter()
c = correct_reads(r, K, 2, rounds=1, table=table)
c.block_until_ready()
t2 = time.perf_counter()
print(f"correct(1 round, given table): first {t1-t0:.1f}s steady {t2-t1:.1f}s",
      file=sys.stderr)
