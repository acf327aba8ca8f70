"""Slow, obviously-correct implementations of each pipeline stage.

These define the exact semantics (thresholds, tie-breaks, pass order)
that the device pipeline must reproduce bit-for-bit (SURVEY.md §7 "Hard
parts": until the real reference binary is available, this model defines
tie-breaking and parity targets self-consistency).

Everything operates on small NumPy code arrays (A=0 C=1 G=2 T=3).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Set, Tuple

import numpy as np


def revcomp(codes: np.ndarray) -> np.ndarray:
    return (3 - codes)[::-1]


def kmer_tuple(codes: np.ndarray) -> Tuple[int, ...]:
    return tuple(int(c) for c in codes)


def canonical(codes: np.ndarray) -> Tuple[int, ...]:
    f = kmer_tuple(codes)
    r = kmer_tuple(revcomp(codes))
    return min(f, r)


def oracle_kmer_counts(reads: np.ndarray, k: int) -> Counter:
    """Canonical k-mer counts via collections.Counter."""
    c: Counter = Counter()
    for read in reads:
        for w in range(len(read) - k + 1):
            c[canonical(read[w : w + k])] += 1
    return c


def _lookup(counts: Counter, codes: np.ndarray) -> int:
    return counts[canonical(codes)]


def oracle_correct(
    reads: np.ndarray, k: int, threshold: int, rounds: int
) -> np.ndarray:
    """RACER-style spectrum correction; semantics the device must match.

    Per round: recount k-mers; forward sub-pass edits the LAST base of each
    window (all verdicts computed from the pre-pass reads, applied at
    once); then backward sub-pass (on the forward-updated reads, same
    table) edits the FIRST base of each window. A base is replaced iff its
    current k-mer count < threshold, the best alternative's count >=
    threshold, and the maximum is attained by exactly one base.
    """
    reads = np.array(reads, dtype=np.int32, copy=True)
    N, L = reads.shape
    P = L - k + 1
    for _ in range(rounds):
        counts = oracle_kmer_counts(reads, k)
        for last in (True, False):  # forward then backward sub-pass
            new_reads = reads.copy()
            for i in range(N):
                for w in range(P):
                    win = reads[i, w : w + k].copy()
                    pos_in_win = k - 1 if last else 0
                    p = w + pos_in_win
                    cur = int(win[pos_in_win])
                    cnt = np.zeros(4, dtype=np.int64)
                    for b in range(4):
                        win[pos_in_win] = b
                        cnt[b] = _lookup(counts, win)
                    m = cnt.max()
                    if (
                        cnt[cur] < threshold
                        and m >= threshold
                        and int((cnt == m).sum()) == 1
                    ):
                        new_reads[i, p] = int(np.argmax(cnt))
            reads = new_reads
    return reads


def oracle_correct_voting(
    reads: np.ndarray, k: int, threshold: int, rounds: int
) -> np.ndarray:
    """RACER-style covering-window VOTING correction (the alternative
    rule pinned for the eventual reference-parity pass; SURVEY.md §10).

    Per round: recount k-mers of the current reads, then ONE voting pass
    with all verdicts computed from the pre-round reads and applied at
    once. For base position p and candidate base b, votes(p, b) = number
    of windows w covering p whose k-mer, with position p set to b, is
    solid (count >= threshold). Base p is replaced by b* iff b* is the
    UNIQUE argmax of votes(p, .) and votes(p, b*) > votes(p, cur) — a
    strictly better-supported base exists. No forward/backward
    sub-passes: voting already weighs every covering window of every
    base symmetrically.
    """
    reads = np.array(reads, dtype=np.int32, copy=True)
    N, L = reads.shape
    P = L - k + 1
    for _ in range(rounds):
        counts = oracle_kmer_counts(reads, k)
        new_reads = reads.copy()
        for i in range(N):
            for p in range(L):
                votes = np.zeros(4, dtype=np.int64)
                for w in range(max(0, p - k + 1), min(p, P - 1) + 1):
                    win = reads[i, w : w + k].copy()
                    for b in range(4):
                        win[p - w] = b
                        if _lookup(counts, win) >= threshold:
                            votes[b] += 1
                cur = int(reads[i, p])
                m = votes.max()
                if m > votes[cur] and int((votes == m).sum()) == 1:
                    new_reads[i, p] = int(np.argmax(votes))
        reads = new_reads
    return reads


def oracle_overlaps(
    reads: np.ndarray, min_overlap: int
) -> Dict[Tuple[int, int], int]:
    """All maximal proper exact suffix-prefix overlaps >= min_overlap.

    Ordered pairs (a, b), a != b: the LONGEST l in [min_overlap, L-1] with
    reads[a][L-l:] == reads[b][:l] (full-length identity is excluded —
    duplicates are removed before overlap detection).
    """
    N, L = reads.shape
    out: Dict[Tuple[int, int], int] = {}
    for a in range(N):
        for b in range(N):
            if a == b:
                continue
            for l in range(L - 1, min_overlap - 1, -1):
                if np.array_equal(reads[a, L - l :], reads[b, :l]):
                    out[(a, b)] = l
                    break
    return out


def oracle_transitive_reduction(
    edges: Dict[Tuple[int, int], int], read_len: int, lengths=None
) -> Dict[Tuple[int, int], int]:
    """Myers-style transitive reduction for exact overlap graphs.

    Edge v->x (offset sl = len(v) - overlap) is removed iff some w not
    in {v, x} has v->w and w->x with sl_vx == sl_vw + sl_wx. Exact
    overlaps need no fuzz parameter. (SURVEY.md §2 "Transitive
    reduction"; Myers 2005.) ``lengths``: per-vertex lengths for ragged
    reads (default: every read is read_len).
    """
    def _len(v):
        return read_len if lengths is None else lengths[v]

    sl = {e: _len(e[0]) - l for e, l in edges.items()}
    out_adj: Dict[int, List[int]] = {}
    for (v, w) in edges:
        out_adj.setdefault(v, []).append(w)
    kept = {}
    for (v, x), l in edges.items():
        transitive = False
        for w in out_adj.get(v, ()):
            if w in (v, x):
                continue
            if (w, x) in sl and sl[(v, x)] == sl[(v, w)] + sl[(w, x)]:
                transitive = True
                break
        if not transitive:
            kept[(v, x)] = l
    return kept


def oracle_unitigs(
    edges: Dict[Tuple[int, int], int], n_vertices: int
) -> List[List[int]]:
    """Maximal unambiguous chains: edge u->v is a chain edge iff
    outdeg(u) == 1 and indeg(v) == 1. Cycles are broken at their minimum
    vertex id (deterministic)."""
    outdeg = Counter(u for (u, _v) in edges)
    indeg = Counter(v for (_u, v) in edges)
    nxt = {}
    for (u, v) in edges:
        if outdeg[u] == 1 and indeg[v] == 1:
            nxt[u] = v
    prv = {v: u for u, v in nxt.items()}
    chains = []
    seen: Set[int] = set()
    for v in range(n_vertices):
        if v in seen or v in prv:
            continue
        chain = [v]
        seen.add(v)
        while chain[-1] in nxt and nxt[chain[-1]] not in seen:
            chain.append(nxt[chain[-1]])
            seen.add(chain[-1])
        chains.append(chain)
    # pure cycles: every remaining vertex is inside one
    for v in range(n_vertices):
        if v in seen:
            continue
        cyc = [v]
        seen.add(v)
        w = nxt.get(v)
        while w is not None and w != v:
            cyc.append(w)
            seen.add(w)
            w = nxt.get(w)
        start = int(np.argmin(cyc))
        chains.append(cyc[start:] + cyc[:start])
    return chains


def oracle_overlaps_ragged(
    reads: List[np.ndarray], min_overlap: int
) -> Tuple[Dict[Tuple[int, int], int], Set[int]]:
    """Ragged-read overlap semantics (pins the variable-length kernel).

    reads: list of code arrays (arbitrary lengths). Returns
    (edges, contained):

    - DOVETAIL edge (a, b) -> v: the LARGEST v with
      min_overlap <= v < len(b), v < len(a) (suffix start >= 1), and
      reads[a][-v:] == reads[b][:v].
    - CONTAINMENT: b in `contained` iff some a != b has
      len(b) < len(a), len(b) >= min_overlap, and reads[b] occurring
      anywhere in reads[a]. (Reads shorter than min_overlap form no
      edges and no containments — they cannot carry a seed.)

    Note edges are reported for ALL vertex pairs including contained
    ones; the pipeline removes contained vertices and their incident
    edges afterward (SAGE's containment removal).
    """
    out: Dict[Tuple[int, int], int] = {}
    contained: Set[int] = set()
    n = len(reads)
    for a in range(n):
        ra = reads[a]
        la = len(ra)
        for b in range(n):
            if a == b:
                continue
            rb = reads[b]
            lb = len(rb)
            if lb < min_overlap:
                continue
            hi = min(la - 1, lb - 1)
            for v in range(hi, min_overlap - 1, -1):
                if np.array_equal(ra[la - v :], rb[:v]):
                    out[(a, b)] = v
                    break
            if lb < la:
                for q in range(la - lb + 1):
                    if np.array_equal(ra[q : q + lb], rb):
                        contained.add(b)
                        break
    return out, contained
