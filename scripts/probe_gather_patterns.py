"""Measure row-gather cost vs INDEX PATTERN and ROW WIDTH on the bench
chip, plus scatter width scaling.

Round-3 localized the overlap kernel's remaining gap to its two
per-candidate row gathers (~8-9 ns/row, width-independent per
probe_marginal).  The round-4 redesign options differ in what access
pattern they produce:

  * random        — baseline (what probe_marginal measured)
  * monotone      — sorted indices (the qpos gather is cummax output,
                    i.e. non-decreasing with avg step <1)
  * iota          — pure sequential (control / speed-of-light)
  * blockseq      — run_start + small rank resets (the bslot pattern)

If monotone/blockseq gathers are materially cheaper than random, a
candidate re-sort by gather index pays; if width matters, a two-phase
narrow-then-wide verify pays; if neither, the 2-gather structure is the
relay's floor and BASELINE.md gets the speed-of-light control instead.

Each variant runs K times under lax.scan so the dispatch floor divides
out (probe_marginal harness).  Sums ride out so nothing is DCE'd.

Usage: python scripts/probe_gather_patterns.py
Env: N (table rows, default 1.6M), C (gather count, default 2^20), K (8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    N = int(os.environ.get("N", 1_600_000))
    C = int(os.environ.get("C", 1 << 20))
    K = int(os.environ.get("K", 8))
    repeats = 3

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # K DIFFERENT index arrays per pattern — identical indices every scan
    # iteration get hoisted out of the loop by XLA (loop-invariant code
    # motion), which made a first cut of this probe report 0.01 ns/row
    def stack_k(maker):
        return np.stack([maker(k) for k in range(K)]).astype(np.int32)

    idx_random = stack_k(lambda k: rng.integers(0, N, size=C))
    idx_mono = np.sort(idx_random, axis=1)
    idx_iota = stack_k(
        lambda k: (np.arange(C, dtype=np.int64) * N // C + k) % N
    )
    # blockseq: run starts with short sequential ranks (bslot pattern,
    # avg run ~1.5): random bases, rank cycles 0,1,0,0,1,2...
    def mk_block(k):
        starts = rng.integers(0, N - 4, size=C)
        ranks = (np.arange(C) % 3) % 2 + (np.arange(C) % 7 == 0)
        return np.minimum(starts + ranks, N - 1)

    idx_block = stack_k(mk_block)

    patterns = {
        "iota": idx_iota,
        "monotone": idx_mono,
        "blockseq": idx_block,
        "random": idx_random,
    }
    widths = [1, 2, 4, 8, 11, 16]

    print(f"N={N} table rows, C={C} gathers, K={K} scans", file=sys.stderr)

    def time_fn(fn, *args):
        fn_j = jax.jit(fn)
        r = fn_j(*args)
        r.block_until_ready()
        print(f"    [warmup result {r} on {r.device}]", file=sys.stderr,
              flush=True)
        best = 1e30
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn_j(*args).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- gathers: pattern x width -------------------------------------
    for W in widths:
        tbl = jnp.asarray(
            rng.integers(0, 2**31, size=(N, W)).astype(np.uint32)
        )
        line = [f"gather W={W:2d}:"]
        for name, idx in patterns.items():
            idx_d = jnp.asarray(idx)

            def run(tbl, idx_d):
                def body(c, ix):
                    g = tbl[ix]
                    return c + jnp.sum(g, dtype=jnp.uint32) + c * 2, 0

                c, _ = jax.lax.scan(body, jnp.uint32(0), idx_d)
                return c

            best = time_fn(run, tbl, idx_d)
            ns_per_row = 1e9 * best / (K * C)
            line.append(f"{name}={ns_per_row:6.2f}ns/row({best:.3f}s)")
        print("  ".join(line), file=sys.stderr, flush=True)

    # ---- scatter width scaling ----------------------------------------
    U = C // 2  # update count
    sidx3 = jnp.asarray(np.sort(
        rng.integers(0, C, size=(K, U)), axis=1
    ).astype(np.int32))
    for W in [1, 2, 4, 8, 11]:
        upd3 = jnp.asarray(
            rng.integers(0, 2**31, size=(K, U, W)).astype(np.uint32)
        )

        def run(upd3, sidx3):
            def body(c, x):
                upd, sidx = x
                grid = jnp.zeros((C, W), jnp.uint32).at[sidx].set(
                    upd, mode="drop"
                )
                return c + jnp.sum(grid, dtype=jnp.uint32), 0

            c, _ = jax.lax.scan(body, jnp.uint32(0), (upd3, sidx3))
            return c

        best = time_fn(run, upd3, sidx3)
        ns = 1e9 * best / (K * U)
        print(f"scatter W={W:2d} (monotone idx): {ns:6.2f} ns/update-row",
              file=sys.stderr)

    # ---- wide cummax (segment fill over (C, W)) ------------------------
    for W in [1, 2, 8, 11]:
        grid3 = jnp.asarray(
            rng.integers(0, 2**31, size=(K, C, W)).astype(np.int32)
        )

        def run(grid3):
            def body(c, grid):
                f = jax.lax.cummax(grid, axis=0)
                return c + jnp.sum(f, dtype=jnp.int32), 0

            c, _ = jax.lax.scan(body, jnp.int32(0), grid3)
            return c

        best = time_fn(run, grid3)
        ns = 1e9 * best / (K * C)
        print(f"cummax  W={W:2d}: {ns:6.2f} ns/row", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
