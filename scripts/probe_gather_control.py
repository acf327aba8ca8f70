"""Speed-of-light CONTROL for the overlap join (VERDICT round-3 #1).

The fused join performs, per candidate, exactly 2 random row gathers
(query-side admin+payload row, entry-side payload row) — the
algorithmically irreducible reads of ANY exact seed-join that verifies
candidate pairs. This probe times a kernel that does ONLY those two
gathers (indices precomputed, widths identical to the production
kernel's narrowed views, K-stacked under lax.scan so the dispatch floor
divides out, data-dependent sum so nothing is DCE'd, device_get per
iteration per the round-4 measurement protocol).

If even this pure kernel cannot run in the ~25 ms/shard the >=10x
north star leaves for ALL marginal work, then no exact
2-gathers-per-candidate design reaches 10x on this relay — the bound
is the hardware relay's gather rate, not the algorithm.

Variants:
  2g   — both gathers at production widths (the control)
  1g   — query-side gather only (what a hypothetical 1-gather design pays)
  2g/2 — both gathers at half width (payload-narrowing headroom)

Usage: python scripts/probe_gather_control.py   (env: SAGE2_BENCH_READS, K)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_reads = int(os.environ.get("SAGE2_BENCH_READS", 100_000))
    K = int(os.environ.get("K", 16))
    repeats = 3
    L, min_ovl, s = 100, 40, 32

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax.numpy as jnp

    from sage2_tpu.overlap import detect

    geo = detect.join_geometry(L, min_ovl, s)
    R, Wt = geo.R, geo.Wt
    N = n_reads * R
    # the bench kernel's memoized steady-state capacity: round-3/4 runs
    # see ~1.04 M candidates -> round_up(1.05x) at 2^16 grain
    C = -(-int(1.04e6 * 1.05) // (1 << 16)) * (1 << 16)
    Wa = Wt + 5   # query-side row: packed | payload | run_start | starts
    Wb = Wt + 3   # entry-side narrowed view (pays[:, :Wt+3])

    rng = np.random.default_rng(11)
    pays = jnp.asarray(
        rng.integers(0, 2**32, size=(K, N, Wa), dtype=np.uint32)
    )
    qidx = jnp.asarray(
        rng.integers(0, N, size=(K, C), dtype=np.int32))
    bidx = jnp.asarray(
        rng.integers(0, N, size=(K, C), dtype=np.int32))

    def variant(kind):
        def one(p, qi, bi):
            if kind == "2g":
                a = p[qi]                   # (C, Wa)
                b = p[:, :Wb][bi]           # (C, Wb)
                return jnp.sum(a) + jnp.sum(b)
            if kind == "1g":
                return jnp.sum(p[qi])
            if kind == "2g/2":
                a = p[:, : Wa // 2][qi]
                b = p[:, : Wb // 2][bi]
                return jnp.sum(a) + jnp.sum(b)
            raise ValueError(kind)
        return one

    print(f"K={K} shards; N={N} rows x W={Wa}; C={C} candidates/shard; "
          f"widths a={Wa} b={Wb}", file=sys.stderr)
    for kind in ("2g", "1g", "2g/2"):
        fn = variant(kind)

        @jax.jit
        def run(p3, q3, b3, fn=fn):
            def body(c, x):
                return c + fn(*x).astype(jnp.uint32), 0
            c, _ = jax.lax.scan(body, jnp.uint32(0), (p3, q3, b3))
            return c

        t0 = time.perf_counter()
        keep = [jax.device_get(run(pays, qidx, bidx))]
        compile_s = time.perf_counter() - t0
        best = 1e30
        for _ in range(repeats):
            t0 = time.perf_counter()
            keep.append(jax.device_get(run(pays, qidx, bidx)))
            best = min(best, time.perf_counter() - t0)
        assert all(v == keep[0] for v in keep[1:]), keep
        per_shard = 1e3 * best / K
        ns_per_row = 1e9 * best / (K * C * (2 if kind != "1g" else 1))
        print(f"{kind:5s} {best:7.3f}s total  {per_shard:7.2f} ms/shard"
              f"  ({ns_per_row:5.2f} ns/gathered row)"
              f"  [compile {compile_s:.0f}s]", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
