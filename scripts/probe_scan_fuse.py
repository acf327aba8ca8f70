"""Measure the run-accounting scan block variants in isolation
(round-5 lever; BASELINE.md round-4 ledger: scan block 9.4 ms/shard,
floor ~3-4 if fused).

Variants at the production shape (N=1.6M sorted rows, K=16 stacked,
fetch-per-iteration protocol):
  a) round-4 block: cumsum(is_entry) + 2-col cummax + cumsum(counts)
  b) round-5 block (production): 2-col cummax + cumsum(counts)
  c) fused: ONE 5-tuple jax.lax.associative_scan producing run_start,
     first-query index, and offsets in a single pass.

Usage: python scripts/probe_scan_fuse.py [K] [repeats]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    N = 1_600_000

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sage2_tpu.utils.platform import ensure_backend, warmup_compile

    ensure_backend()
    warmup_compile()
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}; N={N}, K={K}", file=sys.stderr)

    rng = np.random.default_rng(7)
    # synthetic sorted-run structure: ~N/3 runs, entries before queries
    run_len = rng.integers(1, 6, N // 3)
    run_id = np.repeat(np.arange(run_len.size), run_len)[:N]
    if run_id.size < N:
        run_id = np.concatenate(
            [run_id, np.full(N - run_id.size, run_id[-1])]
        )
    is_head_np = np.concatenate([[True], run_id[1:] != run_id[:-1]])
    pos_in_run = np.arange(N) - np.maximum.accumulate(
        np.where(is_head_np, np.arange(N), 0)
    )
    n_entries = rng.integers(0, 4, N)[run_id]
    is_entry_np = pos_in_run < n_entries
    is_query_np = ~is_entry_np
    h3 = jnp.asarray(np.broadcast_to(is_head_np, (K, N)).copy())
    e3 = jnp.asarray(np.broadcast_to(is_entry_np, (K, N)).copy())
    q3 = jnp.asarray(np.broadcast_to(is_query_np, (K, N)).copy())

    iota_n = jnp.arange(N, dtype=jnp.int32)

    def block_a(is_head, is_entry, is_query):
        entrycum = jnp.cumsum(is_entry.astype(jnp.int32))
        fill = jax.lax.cummax(
            jnp.stack([jnp.where(is_head, iota_n, 0),
                       jnp.where(is_head, entrycum - is_entry, 0)],
                      axis=1), axis=0)
        run_start, entry_base = fill[:, 0], fill[:, 1]
        counts = jnp.where(is_query, entrycum - entry_base, 0)
        offsets = jnp.cumsum(counts)
        return run_start, counts, offsets

    def block_b(is_head, is_entry, is_query):
        prev_q = jnp.concatenate([jnp.zeros(1, bool), is_query[:-1]])
        first_q = is_query & (is_head | ~prev_q)
        fill = jax.lax.cummax(
            jnp.stack([jnp.where(is_head, iota_n, 0),
                       jnp.where(first_q, iota_n, 0)], axis=1), axis=0)
        run_start, q_start = fill[:, 0], fill[:, 1]
        counts = jnp.where(is_query, q_start - run_start, 0)
        offsets = jnp.cumsum(counts)
        return run_start, counts, offsets

    def block_c(is_head, is_entry, is_query):
        # one associative scan: (seen-head h, run_start s, first_q f,
        # entries-before-first-head-queries... simplified: carry
        # (h, s, fq, c) where c = cumulative candidate count.
        prev_q = jnp.concatenate([jnp.zeros(1, bool), is_query[:-1]])
        first_q = is_query & (is_head | ~prev_q)
        s0 = jnp.where(is_head, iota_n, 0)
        f0 = jnp.where(first_q, iota_n, 0)
        # counts depend on (f - s) at query rows; to fuse the offsets
        # cumsum too we need counts inside the scan — but counts at row
        # i need f_i and s_i (the scanned values), so a second pass is
        # unavoidable without a custom 5-tuple op. Here: fuse the two
        # cummax columns + the offsets cumsum into ONE associative_scan
        # over a 3-tuple (max, max, sum-after-the-fact is impossible) —
        # so this variant measures a 2-col cummax via associative_scan
        # + cumsum, testing whether associative_scan beats lax.cummax.
        fill = jax.lax.associative_scan(
            jnp.maximum, jnp.stack([s0, f0], axis=1), axis=0
        )
        run_start, q_start = fill[:, 0], fill[:, 1]
        counts = jnp.where(is_query, q_start - run_start, 0)
        offsets = jnp.cumsum(counts)
        return run_start, counts, offsets

    for name, fn in (("a_round4", block_a), ("b_production", block_b),
                     ("c_assoc", block_c)):
        @jax.jit
        def run(h3, e3, q3, fn=fn):
            def body(c, x):
                rs, ct, of = fn(*x)
                return c + of[-1] + rs[-1], 0
            c, _ = jax.lax.scan(body, jnp.int32(0), (h3, e3, q3))
            return c

        t0 = time.perf_counter()
        keep = [int(jax.device_get(run(h3, e3, q3)))]
        compile_s = time.perf_counter() - t0
        best = 1e30
        for _ in range(repeats):
            t0 = time.perf_counter()
            keep.append(int(jax.device_get(run(h3, e3, q3))))
            best = min(best, time.perf_counter() - t0)
        assert all(v == keep[0] for v in keep[1:])
        print(f"{name:14s} {best:7.3f}s total  {1e3*best/K:6.2f} ms/shard"
              f"  [compile {compile_s:.0f}s]", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
