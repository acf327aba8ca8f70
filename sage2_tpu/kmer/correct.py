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

import jax
import jax.numpy as jnp

from sage2_tpu.kmer.count import KmerTable, lookup_counts
from sage2_tpu.ops import bitpack


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


def _correct_voting_impl(
    reads: jnp.ndarray,
    table_arrays,
    k: int,
    threshold: int,
    rounds: int,
    lengths=None,
) -> jnp.ndarray:
    """Covering-window VOTING rule (semantics pinned by
    refmodel.oracle.oracle_correct_voting — see there for the rule).

    Per round, the 4 variant keys of every window-internal position j
    are O(1) key edits; solidity verdicts accumulate into a (N, L, 4)
    vote array by shifted slice-adds (window w's position j votes for
    base position w + j), so the pass is k batched table probes with no
    per-base scalar loop.
    """
    N, L = reads.shape
    P = L - k + 1
    wvalid = None
    if lengths is not None:
        wvalid = jnp.arange(P)[None, :] < (lengths[:, None] - (k - 1))
    for r in range(rounds):
        if r == 0 and table_arrays is not None:
            t = KmerTable(*table_arrays, k)
        else:
            from sage2_tpu.kmer.count import _count_impl

            t = KmerTable(*_count_impl(reads, k, lengths), k)
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
            cnt = lookup_counts(t, jnp.stack(chs), jnp.stack(cls))
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
        reads = jnp.where(replace, best, reads)
    return reads


_correct_jit = jax.jit(_correct_impl, static_argnums=(2, 3, 4))
_correct_voting_jit = jax.jit(_correct_voting_impl, static_argnums=(2, 3, 4))


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
