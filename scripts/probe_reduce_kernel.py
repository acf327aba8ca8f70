"""Time the chunked-reduction kernel's pieces at E. coli scale.

The e2e reduce stage costs ~28 s per 16.7M-candidate chunk (~1.7 us per
candidate) — orders of magnitude above the overlap kernel's per-row
rates. This probe builds synthetic device-resident inputs at the same
scale and times kernel PREFIXES: expand-only, +gathers, +probe,
+scatter, to find the hot op.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    E = int(os.environ.get("E", 1 << 26))        # ~67M edges
    V = int(os.environ.get("V", 3_600_000))
    e_c = int(os.environ.get("EC", 1_460_000))   # chunk edge width
    cap = int(os.environ.get("CAP", 1 << 24))    # candidate capacity
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax.numpy as jnp

    from sage2_tpu.ops.sort import expand_by_counts

    I32 = 2**31 - 1
    print(f"E={E} V={V} e_c={e_c} cap={cap}", file=sys.stderr)
    # synthetic sorted edge structure built ON DEVICE (no host upload):
    # vertex v owns deg consecutive edges; dst ascending within a run
    deg = E // V + 1
    Ei = jnp.arange(E, dtype=jnp.int32)
    src = jnp.minimum(Ei // deg, V - 1)
    dst = (src + 1 + (Ei % deg)) % V
    ovl = jnp.full(E, 60, jnp.int32)
    sl = jnp.full(E, 40, jnp.int32)
    ss_sl = sl
    ss_dst = dst
    start = jnp.minimum(
        jnp.arange(V, dtype=jnp.int32) * deg, E - 1
    )
    startd = jnp.concatenate([
        jnp.minimum(jnp.arange(V, dtype=jnp.int32) * deg, E),
        jnp.asarray([E], jnp.int32),
    ])
    steps = max(1, int(deg).bit_length())
    c_src = src[:e_c]
    c_dst = dst[:e_c]
    c_sl = sl[:e_c]
    counts = jnp.full(e_c, cap // e_c, jnp.int32)   # ~11/edge like E.coli
    removed = jnp.zeros(E, bool)

    def lvl_fn(level):
        def run(removed_acc, c_src, c_dst, c_sl, c_counts,
                src, dst, ovl, ss_sl, ss_dst, start, startd):
            total = jnp.sum(c_counts)
            e1, rank, valid = expand_by_counts(c_counts, cap)
            if level == 0:       # expansion only
                return removed_acc, total + jnp.sum(e1) + jnp.sum(rank)
            e2 = jnp.minimum(
                start[jnp.clip(c_dst[e1], 0, V - 1)] + rank, E - 1
            )
            v = c_src[e1]
            x = ss_dst[e2]
            sls = c_sl[e1] + ss_sl[e2]
            valid = valid & (x != v)
            if level == 1:       # + the 5 expansion gathers
                return removed_acc, total + jnp.sum(x) + jnp.sum(sls)
            vc = jnp.clip(v, 0, V - 1)
            lo = startd[vc]
            hi = startd[vc + 1]
            hi0 = hi
            for _ in range(steps):
                active = lo < hi
                mid = (lo + hi) >> 1
                dmid = dst[jnp.minimum(mid, E - 1)]
                go_right = dmid < x
                lo = jnp.where(active & go_right, mid + 1, lo)
                hi = jnp.where(active & ~go_right, mid, hi)
            pos_c = jnp.minimum(lo, E - 1)
            hit = valid & (lo < hi0) & (dst[pos_c] == x) & (
                100 - ovl[pos_c] == sls
            )
            if level == 2:       # + bisection probe
                return removed_acc, total + jnp.sum(hit)
            out = removed_acc.at[jnp.where(hit, pos_c, E)].set(
                True, mode="drop"
            )
            return out, total    # full kernel

        return jax.jit(run)

    names = ["expand", "+gathers", "+probe", "+scatter(full)"]
    prev = 0.0
    for lvl in range(4):
        fn = lvl_fn(lvl)

        def args_of(rep):
            # vary an input per repeat so no layer can serve a cached
            # result for identical operands
            c = counts + (rep % 2)
            return (c_src, c_dst, c_sl, c,
                    src, dst, ovl, ss_sl, ss_dst, start, startd)

        t0 = time.perf_counter()
        r, t = fn(removed, *args_of(0))
        r.block_until_ready()
        t.block_until_ready()
        comp = time.perf_counter() - t0
        best = 1e30
        for rep in range(1, 4):
            t0 = time.perf_counter()
            r, t = fn(removed, *args_of(rep))
            r.block_until_ready()
            t.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"{names[lvl]:16s} {best:7.3f}s  (+{best - prev:6.3f})"
              f"  [compile {comp:.0f}s]", file=sys.stderr)
        prev = best
    return 0


if __name__ == "__main__":
    sys.exit(main())
