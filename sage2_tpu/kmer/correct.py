"""Spectrum-based read error correction (RACER-style).

Method (SURVEY.md §2 "Error corrector"; RACER, Ilie & Molnar 2013): a base
is corrected when the k-mer covering it is weak (count below threshold)
and exactly one alternative base makes that k-mer solid. Each round:

  1. recount canonical k-mers of the current reads;
  2. FORWARD sub-pass — for every window, test the 4 variants of its LAST
     base; all verdicts are computed from the pre-pass reads and applied
     at once (base p in [k-1, L-1] is judged by window w = p-k+1);
  3. BACKWARD sub-pass — on the forward-updated reads, same table, test
     variants of each window's FIRST base (covers p in [0, L-k]).

Replacement rule (shared with the oracle, sage2_tpu/refmodel/oracle.py):
replace iff count(current) < threshold, max count of the 4 variants >=
threshold, and that max is attained by exactly one base.

TPU design: the 4 variant keys per window are O(1) edits of the window's
(hi, lo) key pair (a base owns a fixed 2-bit field), so a pass is pure
vector arithmetic plus 4 binary-search probes of the sorted count table —
no per-base scalar loop, everything batched over (N, P) windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sage2_tpu.kmer.count import SENTINEL, KmerTable, lookup_counts
from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import sort_by_keys


def variant_keys_last(reads, k: int):
    """Canonical keys of the 4 last-base variants of every window.

    Returns (ch, cl) of shape (4, N, P) and the current last bases (N, P).
    """
    fh, fl = bitpack.kmer_keys(reads, k)
    rh, rl = bitpack.revcomp_kmer_keys(reads, k)
    P = reads.shape[-1] - k + 1
    cur = reads[..., k - 1 : k - 1 + P]  # last base of each window
    chs, cls = [], []
    for b in range(4):
        bb = jnp.full(cur.shape, b, cur.dtype)
        # forward key: edit base at k-mer position k-1
        vfh, vfl = bitpack.set_base(fh, fl, k, k - 1, cur, bb)
        # rc key: last fwd base is rc position 0 with complemented code
        vrh, vrl = bitpack.set_base(rh, rl, k, 0, 3 - cur, 3 - bb)
        ch, cl = bitpack.canonicalize_pair(vfh, vfl, vrh, vrl)
        chs.append(ch)
        cls.append(cl)
    return jnp.stack(chs), jnp.stack(cls), cur


def variant_keys_first(reads, k: int):
    """Canonical keys of the 4 first-base variants of every window."""
    fh, fl = bitpack.kmer_keys(reads, k)
    rh, rl = bitpack.revcomp_kmer_keys(reads, k)
    P = reads.shape[-1] - k + 1
    cur = reads[..., :P]  # first base of each window
    chs, cls = [], []
    for b in range(4):
        bb = jnp.full(cur.shape, b, cur.dtype)
        vfh, vfl = bitpack.set_base(fh, fl, k, 0, cur, bb)
        # first fwd base is rc position k-1 with complemented code
        vrh, vrl = bitpack.set_base(rh, rl, k, k - 1, 3 - cur, 3 - bb)
        ch, cl = bitpack.canonicalize_pair(vfh, vfl, vrh, vrl)
        chs.append(ch)
        cls.append(cl)
    return jnp.stack(chs), jnp.stack(cls), cur


def _variant_counts_last(reads, table: KmerTable, k: int):
    ch, cl, cur = variant_keys_last(reads, k)
    return jnp.moveaxis(lookup_counts(table, ch, cl), 0, -1), cur


def _variant_counts_first(reads, table: KmerTable, k: int):
    ch, cl, cur = variant_keys_first(reads, k)
    return jnp.moveaxis(lookup_counts(table, ch, cl), 0, -1), cur


def apply_verdicts(reads, counts4, cur, base_pos_offset: int, threshold: int,
                   window_valid=None):
    """Apply the replacement rule; window w's verdict edits base
    w + base_pos_offset. ``window_valid``: (N, P) mask for ragged reads
    (windows past a read's end never edit)."""
    m = jnp.max(counts4, axis=-1)
    n_at_max = jnp.sum((counts4 == m[..., None]).astype(jnp.int32), axis=-1)
    cur_cnt = jnp.take_along_axis(
        counts4, cur[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    best = jnp.argmax(counts4, axis=-1).astype(reads.dtype)
    replace = (cur_cnt < threshold) & (m >= threshold) & (n_at_max == 1)
    if window_valid is not None:
        replace = replace & window_valid
    P = cur.shape[-1]
    new = reads
    sl = slice(base_pos_offset, base_pos_offset + P)
    seg = new[..., sl]
    new = new.at[..., sl].set(jnp.where(replace, best, seg))
    return new


def _correct_impl(
    reads: jnp.ndarray,
    table_arrays,
    k: int,
    threshold: int,
    rounds: int,
    lengths=None,
) -> jnp.ndarray:
    P = reads.shape[-1] - k + 1
    wvalid = None
    if lengths is not None:
        wvalid = jnp.arange(P)[None, :] < (lengths[:, None] - (k - 1))
    for r in range(rounds):
        if r == 0 and table_arrays is not None:
            t = KmerTable(*table_arrays, k)
        else:
            from sage2_tpu.kmer.count import _count_impl

            t = KmerTable(*_count_impl(reads, k, lengths), k)
        counts4, cur = _variant_counts_last(reads, t, k)
        reads = apply_verdicts(reads, counts4, cur, k - 1, threshold, wvalid)
        counts4, cur = _variant_counts_first(reads, t, k)
        reads = apply_verdicts(reads, counts4, cur, 0, threshold, wvalid)
    return reads


def voting_round(reads, lookup, k: int, threshold: int, lengths=None):
    """One round of the covering-window VOTING rule given a counts
    lookup callable (semantics pinned by oracle_correct_voting).

    ``lookup(ch, cl) -> counts`` answers canonical-key count queries of
    shape (4, N, P) — the in-core path passes a sorted-table join, the
    sharded path a routed distributed lookup, so the rule has exactly
    one implementation.

    The 4 variant keys of every window-internal position j are O(1) key
    edits; solidity verdicts accumulate into a (N, L, 4) vote array by
    shifted slice-adds (window w's position j votes for base position
    w + j), so the pass is k batched table probes with no per-base
    scalar loop.
    """
    N, L = reads.shape
    P = L - k + 1
    wvalid = None
    if lengths is not None:
        wvalid = jnp.arange(P)[None, :] < (lengths[:, None] - (k - 1))
    fh, fl = bitpack.kmer_keys(reads, k)
    rh, rl = bitpack.revcomp_kmer_keys(reads, k)
    votes = jnp.zeros((4, N, L), jnp.int32)
    for j in range(k):
        cur = reads[..., j : j + P]
        chs, cls = [], []
        for b in range(4):
            bb = jnp.full(cur.shape, b, cur.dtype)
            vfh, vfl = bitpack.set_base(fh, fl, k, j, cur, bb)
            # window position j is rc position k-1-j, complemented
            vrh, vrl = bitpack.set_base(
                rh, rl, k, k - 1 - j, 3 - cur, 3 - bb
            )
            ch, cl = bitpack.canonicalize_pair(vfh, vfl, vrh, vrl)
            chs.append(ch)
            cls.append(cl)
        cnt = lookup(jnp.stack(chs), jnp.stack(cls))
        solid = (cnt >= threshold).astype(jnp.int32)
        if wvalid is not None:
            solid = solid * wvalid[None].astype(jnp.int32)
        votes = votes.at[:, :, j : j + P].add(solid)
    votes = jnp.moveaxis(votes, 0, -1)                     # (N, L, 4)
    vcur = jnp.take_along_axis(
        votes, reads[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    m = jnp.max(votes, axis=-1)
    n_at_max = jnp.sum(
        (votes == m[..., None]).astype(jnp.int32), axis=-1
    )
    best = jnp.argmax(votes, axis=-1).astype(reads.dtype)
    replace = (m > vcur) & (n_at_max == 1)
    if lengths is not None:
        replace = replace & (jnp.arange(L)[None, :] < lengths[:, None])
    return jnp.where(replace, best, reads)


def _correct_voting_impl(
    reads: jnp.ndarray,
    table_arrays,
    k: int,
    threshold: int,
    rounds: int,
    lengths=None,
) -> jnp.ndarray:
    """Covering-window VOTING rule: per-round recount + voting_round
    with the in-core sorted-table lookup."""
    for r in range(rounds):
        if r == 0 and table_arrays is not None:
            t = KmerTable(*table_arrays, k)
        else:
            from sage2_tpu.kmer.count import _count_impl

            t = KmerTable(*_count_impl(reads, k, lengths), k)
        reads = voting_round(
            reads, lambda ch, cl: lookup_counts(t, ch, cl), k, threshold,
            lengths,
        )
    return reads


_correct_jit = jax.jit(_correct_impl, static_argnums=(2, 3, 4))
_correct_voting_jit = jax.jit(_correct_voting_impl, static_argnums=(2, 3, 4))


# ---------------------------------------------------------------------------
# Two-phase weak-window corrector (round-4 performance path)
#
# The replacement rule can only fire for a window whose CURRENT k-mer is
# weak (count < threshold) — apply_verdicts requires cur_cnt < threshold.
# So the 4-variant table lookup over EVERY window (the dominant cost of
# the correct stage at E. coli scale: sorts of T + 4*N*P rows per
# sub-pass) is replaced by:
#
#   phase 1 — ONE current-key lookup over all windows (T + N*P rows),
#             then compact the weak windows' flat indices (1-op sort);
#   phase 2 — the 4-variant lookup on the compacted ~10% weak subset
#             (T + 4*n_weak rows), verdicts scattered back.
#
# A second verdict-invariant cut: table entries with count < threshold
# can never change ANY verdict (cur_cnt < threshold holds whether the
# lookup returns 0 or threshold-1, and a sub-threshold variant can never
# attain m >= threshold or tie a max that does), and at sequencing error
# rates they are the MAJORITY of unique keys (error k-mers are mostly
# singletons). prune_table_for_correction() drops them once per round,
# shrinking the table that rides every lookup sort ~4x.
#
# Both are exact: equality with correct_reads is tested
# (tests/test_correct.py::test_twophase_*).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3,))
def _prune_impl(hi, lo, cnt, threshold: int):
    keep = cnt >= threshold
    k_hi = jnp.where(keep, hi, SENTINEL)
    k_lo = jnp.where(keep, lo, SENTINEL)
    s_hi, s_lo, s_cnt = sort_by_keys(
        [k_hi, k_lo], [jnp.where(keep, cnt, 0)]
    )
    return s_hi, s_lo, s_cnt, jnp.sum(keep.astype(jnp.int32))


def prune_table_for_correction(table: KmerTable, threshold: int) -> KmerTable:
    """Drop sub-threshold entries and trim capacity (host sync on the
    kept count). Verdict-invariant for both correction rules; see module
    comment above."""
    s_hi, s_lo, s_cnt, n_keep = _prune_impl(
        table.hi, table.lo, table.count, threshold
    )
    n = int(n_keep)
    cap = min(1 << max(n, 1).bit_length(), s_hi.shape[0])
    return KmerTable(s_hi[:cap], s_lo[:cap], s_cnt[:cap],
                     jnp.int32(n), table.k)


@functools.lru_cache(maxsize=32)
def _phase1_kernel(k: int, threshold: int, ragged: bool):
    def run(reads, t_hi, t_lo, t_cnt, t_n, lengths):
        fh, fl = bitpack.kmer_keys(reads, k)
        rh, rl = bitpack.revcomp_kmer_keys(reads, k)
        ch, cl = bitpack.canonicalize_pair(fh, fl, rh, rl)
        t = KmerTable(t_hi, t_lo, t_cnt, t_n, k)
        cnt = lookup_counts(t, ch, cl)
        P = ch.shape[-1]
        weak = cnt < threshold
        if ragged:
            weak &= jnp.arange(P)[None, :] < (lengths[:, None] - (k - 1))
        flat = weak.reshape(-1)
        NP = flat.shape[0]
        key = jnp.where(
            flat, jnp.arange(NP, dtype=jnp.int32), jnp.int32(NP)
        )
        (s_idx,) = sort_by_keys([key])
        return s_idx, jnp.sum(flat.astype(jnp.int32))

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _phase2_kernel(k: int, threshold: int, which: str):
    def run(reads, t_hi, t_lo, t_cnt, t_n, widx):
        N, L = reads.shape
        P = L - k + 1
        NP = N * P
        off = k - 1 if which == "last" else 0
        fh, fl = bitpack.kmer_keys(reads, k)
        rh, rl = bitpack.revcomp_kmer_keys(reads, k)
        cur_all = reads[..., off : off + P]
        # one row gather delivers a weak window's key state + current
        # base (5 uint32 columns) instead of 5 separate element gathers
        slab = jnp.stack(
            [fh.reshape(-1), fl.reshape(-1), rh.reshape(-1),
             rl.reshape(-1), cur_all.reshape(-1).astype(jnp.uint32)],
            axis=1,
        )
        row_valid = widx < NP
        wi = jnp.minimum(widx, NP - 1)
        rows = slab[wi]
        wfh, wfl, wrh, wrl = (rows[:, 0], rows[:, 1], rows[:, 2],
                              rows[:, 3])
        cur = rows[:, 4].astype(reads.dtype)
        chs, cls = [], []
        for b in range(4):
            bb = jnp.full(cur.shape, b, cur.dtype)
            if which == "last":
                vfh, vfl = bitpack.set_base(wfh, wfl, k, k - 1, cur, bb)
                vrh, vrl = bitpack.set_base(wrh, wrl, k, 0, 3 - cur,
                                            3 - bb)
            else:
                vfh, vfl = bitpack.set_base(wfh, wfl, k, 0, cur, bb)
                vrh, vrl = bitpack.set_base(wrh, wrl, k, k - 1, 3 - cur,
                                            3 - bb)
            ch, cl = bitpack.canonicalize_pair(vfh, vfl, vrh, vrl)
            chs.append(ch)
            cls.append(cl)
        t = KmerTable(t_hi, t_lo, t_cnt, t_n, k)
        cnt4 = jnp.moveaxis(
            lookup_counts(t, jnp.stack(chs), jnp.stack(cls)), 0, -1
        )                                              # (cap, 4)
        m = jnp.max(cnt4, axis=-1)
        n_at_max = jnp.sum(
            (cnt4 == m[..., None]).astype(jnp.int32), axis=-1
        )
        cur_cnt = jnp.take_along_axis(
            cnt4, cur[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        best = jnp.argmax(cnt4, axis=-1).astype(reads.dtype)
        replace = ((cur_cnt < threshold) & (m >= threshold)
                   & (n_at_max == 1) & row_valid)
        # edit targets are unique per sub-pass (window w edits base
        # w + off; weak windows are distinct)
        target = (wi // P) * L + (wi % P) + off
        flat = reads.reshape(-1)
        new = flat.at[jnp.where(replace, target, N * L)].set(
            best, mode="drop"
        )
        return new.reshape(N, L)

    return jax.jit(run)


# memoized weak-window capacity per (N, L, k, threshold) problem shape
_WEAK_CAP_MEMO: dict = {}


def _weak_capacity(memo_key, n_weak: int) -> int:
    grain = 1 << 14
    cap = _WEAK_CAP_MEMO.get(memo_key, 0)
    if n_weak > cap:
        cap = max(-(-int(n_weak * 1.1) // grain) * grain, grain)
        if len(_WEAK_CAP_MEMO) > 256:
            _WEAK_CAP_MEMO.pop(next(iter(_WEAK_CAP_MEMO)))
        _WEAK_CAP_MEMO[memo_key] = cap
    return cap


def twophase_round(
    reads: jnp.ndarray,
    pruned: KmerTable,
    k: int,
    threshold: int,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One forward+backward correction round of the single_window rule
    against an already-pruned table (prune_table_for_correction).
    Host syncs: one scalar fetch (n_weak) per sub-pass. The streamed
    corrector calls this per chunk with the global per-round table."""
    N, L = reads.shape
    P = L - k + 1
    ragged = lengths is not None
    lens = lengths if ragged else jnp.zeros((N,), jnp.int32)
    pt = pruned
    for which in ("last", "first"):
        s_idx, n_weak_dev = _phase1_kernel(k, threshold, ragged)(
            reads, pt.hi, pt.lo, pt.count, pt.n_unique, lens
        )
        n_weak = int(n_weak_dev)
        cap = _weak_capacity((N, L, k, threshold), n_weak)
        reads = _phase2_kernel(k, threshold, which)(
            reads, pt.hi, pt.lo, pt.count, pt.n_unique,
            s_idx[: min(cap, N * P)],
        )
    return reads


def correct_reads_twophase(
    reads: jnp.ndarray,
    k: int,
    threshold: int,
    rounds: int,
    table: KmerTable | None = None,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Host-orchestrated fast path of the single_window rule.

    Bit-identical to correct_reads(..., rule="single_window") (tested);
    ~3-4x less sort volume per sub-pass at E. coli scale. Host syncs per
    sub-pass: one scalar fetch (n_weak) plus the per-round pruned-table
    size — call this from host-driven stages (pipeline, streaming), not
    under jit (use correct_reads there).
    """
    from sage2_tpu.kmer.count import count_kmers

    for r in range(rounds):
        t = table if (r == 0 and table is not None) else count_kmers(
            reads, k, lengths
        )
        pt = prune_table_for_correction(t, threshold)
        reads = twophase_round(reads, pt, k, threshold, lengths)
    return reads


def correct_reads(
    reads: jnp.ndarray,
    k: int,
    threshold: int,
    rounds: int,
    table: KmerTable | None = None,
    lengths: jnp.ndarray | None = None,
    rule: str = "single_window",
) -> jnp.ndarray:
    """Correct reads (N, L). Returns corrected reads.

    ``table``: optional precomputed count table for the FIRST round (the
    pipeline passes the counting stage's artifact); later rounds recount.
    ``lengths``: per-read lengths for ragged (0-padded) inputs — windows
    past a read's end neither vote nor edit. One jit per (shape, k,
    threshold, rounds): eager per-op dispatch costs ~24 ms/op on the
    bench device (BASELINE.md round-2 anatomy).

    ``rule``: "single_window" (default, the pinned round-1/2 rule: each
    base judged by one covering window per sub-pass) or
    "vote_all_windows" (RACER-style covering-window voting — SURVEY.md
    §10 names this the likely reference-parity difference; both are
    oracle-pinned so the eventual citation pass is a config change).
    """
    ta = None if table is None else (
        table.hi, table.lo, table.count, table.n_unique
    )
    if rule == "single_window":
        return _correct_jit(reads, ta, k, threshold, rounds, lengths)
    if rule == "vote_all_windows":
        return _correct_voting_jit(reads, ta, k, threshold, rounds, lengths)
    raise ValueError(f"unknown correction rule {rule!r}")
