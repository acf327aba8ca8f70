"""Stage timing of the CURRENT fused find_overlaps path + microbenches
informing the round-2 kernel redesign (VERDICT.md next-round item 1).

Splits the exact code of detect.find_overlaps into jitted stages at the
bench workload shape, and measures the primitives the redesign trades
between: row-gather rate vs row width, scatter rate, 2-operand sort rate
vs size, cummax/streaming rate.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp

from sage2_tpu.utils.platform import ensure_backend

ensure_backend()

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.overlap import detect, prepare_reads
from sage2_tpu.ops.sort import expand_with_payload, sort_by_keys


def bench(f, *args, n=5, name=""):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best*1e3:9.2f} ms", flush=True)
    return out, best


def main():
    n_reads, read_len, min_ovl = 100_000, 100, 40
    genome = simulate_genome(int(n_reads * read_len / 45.0), seed=7)
    reads, _ = simulate_reads(genome, read_len=read_len, coverage=45.0,
                              error_rate=0.005, seed=8)
    reads = reads[:n_reads]
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    reads2, valid2 = rs.reads2, rs.valid2
    M, L = reads2.shape
    s = 32
    pa = L - min_ovl
    g = detect.auto_stride(min_ovl, s, pa)
    n_pos = -(-pa // g)
    W = -(-L // 16)
    print(f"M={M} L={L} W={W} g={g} n_pos={n_pos} n_unique={int(rs.n_unique)}")

    # ---- current pipeline, staged exactly as find_overlaps ------------
    shifted = jax.jit(detect.shifted_word_packs)(reads2)
    b_hi, b_lo = jax.jit(
        lambda sh: detect.seed_keys_at_positions(sh, s, list(range(g)), L)
    )(shifted)
    a_hi, a_lo = jax.jit(
        lambda sh: detect.seed_keys_at_positions(
            sh, s, [g * (j + 1) for j in range(n_pos)], L)
    )(shifted)
    b_valid = jnp.repeat(valid2, g)

    def join(b_hi, b_lo, b_valid, a_hi, a_lo, valid2):
        return detect._prefix_join_parts(
            b_hi.reshape(-1), b_lo.reshape(-1), b_valid,
            a_hi, a_lo, valid2, seed_bits=2 * s)
    (b_entry, lo_idx, counts), t_join = bench(
        jax.jit(join), b_hi, b_lo, b_valid, a_hi, a_lo, valid2,
        name="join: B sort + table + probe")

    ncand = int(jnp.sum(counts))
    cap = -(-int(ncand * 1.05) // (1 << 16)) * (1 << 16)
    print(f"n_candidates={ncand} capacity={cap}")

    def tbl_sort(b_hi, b_valid):
        q_hi = jnp.where(b_valid, b_hi.reshape(-1), jnp.uint32(0xFFFFFFFF))
        Mg = q_hi.shape[0]
        packed = jnp.where(
            b_valid, jnp.uint32(0), jnp.uint32(0x80000000)
        ) | jnp.arange(Mg, dtype=jnp.uint32)
        return sort_by_keys([q_hi, packed])
    _, t_ts = bench(jax.jit(tbl_sort), b_hi, b_valid,
                    name="  join: 2-op B sort only")

    def slab_build(shifted, b_entry):
        words0 = shifted[:, 0, :]
        return jnp.concatenate(
            [b_entry[:, None].astype(jnp.uint32),
             words0[jnp.minimum(b_entry // g, M - 1)]], axis=1)
    slab, t_slab = bench(jax.jit(slab_build), shifted, b_entry,
                         name="slab build (Mg row gathers, 8-wide)")

    def expand(counts, lo_idx):
        return expand_with_payload(
            counts.reshape(-1), lo_idx.reshape(-1), cap)
    (entry, rank, lo_of_entry, cand_valid), t_exp = bench(
        jax.jit(expand), counts, lo_idx, name="expand_with_payload")

    def decode(entry, rank, lo_of_entry, cand_valid, slab):
        cand_a = entry // n_pos
        cand_p = (entry % n_pos + 1) * g
        b_slot = jnp.minimum(lo_of_entry + rank, M * g - 1)
        row = slab[b_slot]
        e_b = row[:, 0].astype(jnp.int32)
        b_words = row[:, 1:]
        cand_b = e_b // g
        cand_p0 = cand_p - (e_b - cand_b * g)
        cand_valid = cand_valid & (cand_a != cand_b) & (cand_p0 <= pa)
        return cand_a, jnp.clip(cand_p0, 1, pa), cand_b, b_words, cand_valid
    (cand_a, cand_p0, cand_b, b_words, cand_valid), t_dec = bench(
        jax.jit(decode), entry, rank, lo_of_entry, cand_valid, slab,
        name="slab gather + decode (C row gathers)")

    def verify(shifted, cand_a, cand_p0, cand_b, b_words, cand_valid):
        return detect.verify_candidates(
            reads2, cand_a, cand_p0, cand_b, shifted=shifted,
            words0=shifted[:, 0, :], max_p=pa, b_words=b_words,
        ) & cand_valid
    ok, t_ver = bench(jax.jit(verify), shifted, cand_a, cand_p0, cand_b,
                      b_words, cand_valid,
                      name="verify (C a-row gathers + w0 shift)")
    print(f"  n_verified={int(jnp.sum(ok))}")
    # how many candidates match the full 64-bit seed? (collision diag)
    full_hi = a_hi.reshape(-1)
    full_lo = a_lo.reshape(-1)
    bq_hi = b_hi.reshape(-1)
    bq_lo = b_lo.reshape(-1)
    qa = entry
    e_bslot = jnp.minimum(lo_of_entry + rank, M * g - 1)
    e_b_entry = slab[e_bslot, 0].astype(jnp.int32)
    seed_match = (full_hi[qa] == bq_hi[e_b_entry]) & (
        full_lo[qa] == bq_lo[e_b_entry]) & cand_valid
    print(f"  full-64bit-seed matches among candidates: "
          f"{int(jnp.sum(seed_match))} / {ncand}")

    def reduce(ok, cand_a, cand_b, cand_p0):
        ovl = L - cand_p0
        return detect.reduce_edge_candidates(ok, cand_a, cand_b, ovl, L, M)
    _, t_red = bench(jax.jit(reduce), ok, cand_a, cand_b, cand_p0,
                     name="reduce (2x 2-op sort of cap)")

    total = t_join + t_slab + t_exp + t_dec + t_ver + t_red
    print(f"{'SUM (stages)':52s} {total*1e3:9.2f} ms")

    # ---- microbenches --------------------------------------------------
    print("\n--- microbenches ---")
    key = jax.random.PRNGKey(0)
    C = cap
    idx = jax.random.randint(key, (C,), 0, M * g, dtype=jnp.int32)
    for width in (1, 2, 4, 8, 10, 12, 16):
        tbl = jnp.ones((M * g, width), jnp.uint32)
        f = jax.jit(lambda t, i: t[i])
        _, t = bench(f, tbl, idx, name=f"row gather C={C} width={width}")
        print(f"   -> {C/t/1e6:.0f}M rows/s")
    # scatter
    upd = jnp.ones((1 << 21,), jnp.int32)
    sidx = jax.random.randint(key, (1 << 21,), 0, C, dtype=jnp.int32)
    f = jax.jit(lambda i, u: jnp.zeros(C, jnp.int32).at[i].max(u))
    _, t = bench(f, sidx, upd, name=f"scatter-max n={1<<21} into C")
    print(f"   -> {(1<<21)/t/1e6:.0f}M scatters/s")
    # sorts
    for n in (1 << 20, 1 << 22, C):
        a = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        b = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        f = jax.jit(lambda a, b: sort_by_keys([a, b]))
        _, t = bench(f, a, b, name=f"2-op sort n={n}")
        print(f"   -> {t/n*1e9:.1f} ns/elem")
    # cummax streaming
    a = jax.random.randint(key, (C,), 0, 1 << 30, dtype=jnp.int32)
    f = jax.jit(lambda a: jax.lax.cummax(a))
    _, t = bench(f, a, name=f"cummax n={C}")
    print(f"   -> {C*4/t/1e9:.1f} GB/s")
    # pure elementwise xor+mask over (C, 7)
    aw = jnp.ones((C, 7), jnp.uint32)
    bw = jnp.ones((C, 7), jnp.uint32)
    f = jax.jit(lambda a, b: jnp.all((a ^ b) == 0, axis=1))
    _, t = bench(f, aw, bw, name=f"xor+all over (C,7)")
    print(f"   -> {C*7*8/t/1e9:.1f} GB/s eff")


if __name__ == "__main__":
    main()
