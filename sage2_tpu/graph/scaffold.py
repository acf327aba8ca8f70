"""Mate-pair scaffolding: order/orient contigs with paired-end links.

BASELINE.json config #1 is "Illumina 100bp PAIRED" — pairing survives
ingest and dedup as vertex mate pairs (pipeline `_mate_pairs`); this
module spends them. Because contigs are stitched from read-vertices, each
vertex's exact position/orientation inside its contig is known from the
emission pass (finish.emit_contigs_with_placements) — no read-mapping
stage is needed, placements are exact by construction.

Method (standard insert-size scaffolding, host-side — the scaffold graph
is tiny, ~#contigs):

  1. Insert size is estimated from same-contig proper pairs (median,
     outlier-trimmed), unless pinned by config.
  2. Each cross-contig pair votes for an ordered, oriented join: both
     mates' STORED orientations point into the fragment, so mate 1 must
     point rightward off its contig and mate 2 leftward into the next;
     the vote carries a gap estimate insert - tail1 - head2.
  3. Votes aggregate per canonical (contig, orient) -> (contig, orient)
     link; links need >= min_links supporting pairs and must be the
     UNAMBIGUOUS best at both touched contig ends (a rival with >= half
     the support kills the join — conservative, misjoins are worse than
     missed joins).
  4. Accepted links chain contigs into scaffolds; gaps are emitted as N
     runs (code 4) of the median estimated size (floor 1).

Reference semantics unverifiable (empty mount, SURVEY.md §0): whether
SAGE2 itself scaffolds is unknown; pairing data is carried end-to-end so
the capability exists either way.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

GAP_CODE = 4  # emitted as 'N' by io.writer / ops.bitpack decode


def _oriented(
    s: int, l: int, d: int, clen: int, orient: int
) -> Tuple[int, int]:
    """Placement (start s, dir d) under contig orientation ``orient``
    (+1 keep, -1 flip): returns (oriented start, oriented dir)."""
    if orient == 1:
        return s, d
    return clen - s - l, -d


def resolve_pair_placements(
    mate_pairs: np.ndarray,
    placements: Dict[int, Tuple[int, int, int]],
    rlen: np.ndarray,
    cap: int,
) -> List[Tuple[Tuple[int, int, int, int], Tuple[int, int, int, int]]]:
    """Map vertex mate pairs onto contig coordinates.

    A vertex family {v, rc(v)} anchors via whichever member was emitted:
    if rc(v) sits at [s, s+l) with dir d, then v sits there with dir -d.
    Families with conflicting double placements are skipped. Returns a
    list of ((cid, start, dir, len), (cid, start, dir, len)) per usable
    pair.
    """
    def lookup(v: int):
        l = int(rlen[v])
        p = placements.get(v)
        w = (v + cap) % (2 * cap)
        q = placements.get(w)
        if p is not None and q is not None:
            cid, s, d = p
            cid2, s2, d2 = q
            if cid != cid2 or d2 != -d or s2 != s:
                return None  # conflicting anchors: unusable
            return (cid, s, d, l)
        if p is not None:
            cid, s, d = p
            return (cid, s, d, l)
        if q is not None:
            cid, s, d = q
            return (cid, s, -d, l)
        return None

    out = []
    for v1, v2 in np.asarray(mate_pairs):
        a = lookup(int(v1))
        b = lookup(int(v2))
        if a is not None and b is not None:
            out.append((a, b))
    return out


def estimate_insert_size(
    resolved, default: int = 400
) -> Tuple[int, int]:
    """Median outer insert from same-contig proper pairs (one two-sided
    outlier-trim pass at [median/3, 3*median] — chimeric pairs can be
    shorter OR longer than the true insert). Returns (insert,
    n_proper)."""
    spans = []
    for (c1, s1, d1, l1), (c2, s2, d2, l2) in resolved:
        if c1 != c2 or d1 == d2:
            continue
        (sp, lp), (sm, lm) = ((s1, l1), (s2, l2)) if d1 == 1 else (
            (s2, l2), (s1, l1)
        )
        span = (sm + lm) - sp
        if span > 0:
            spans.append(span)
    if not spans:
        return default, 0
    med = float(np.median(spans))
    kept = [s for s in spans if med / 3 <= s <= 3 * med]
    if not kept:
        kept = spans
    return int(round(float(np.median(kept)))), len(kept)


def collect_links(
    resolved,
    contig_lens: List[int],
    insert: int,
) -> Dict[Tuple[int, int, int, int], List[int]]:
    """Aggregate cross-contig pairs into oriented link votes.

    Key (c1, o1, c2, o2): contig c1 under orientation o1 followed by c2
    under o2. Canonical form puts the smaller contig id first (the same
    physical join read right-to-left is (c2, -o2) -> (c1, -o1)). Value:
    list of per-pair gap estimates.
    """
    links: Dict[Tuple[int, int, int, int], List[int]] = {}
    for (c1, s1, d1, l1), (c2, s2, d2, l2) in resolved:
        if c1 == c2:
            continue
        o1, o2 = d1, -d2
        len1, len2 = contig_lens[c1], contig_lens[c2]
        s1o, _ = _oriented(s1, l1, d1, len1, o1)
        s2o, _ = _oriented(s2, l2, d2, len2, o2)
        tail1 = len1 - s1o
        head2 = s2o + l2
        gap = insert - tail1 - head2
        if gap < -insert:
            continue  # geometrically impossible vote
        key = (c1, o1, c2, o2)
        if (c2, -o2) < (c1, -o1):
            key = (c2, -o2, c1, -o1)
        links.setdefault(key, []).append(int(gap))
    return links


def select_links(
    links: Dict[Tuple[int, int, int, int], List[int]],
    min_links: int,
    ambiguity_ratio: float = 0.5,
) -> Dict[Tuple[int, int, int, int], int]:
    """Keep links that are well-supported AND the unambiguous best at
    both contig ends. Returns accepted {key: median gap}."""
    # an oriented link (c1,o1)->(c2,o2) occupies c1's oriented RIGHT end
    # and c2's oriented LEFT end; in end form: (c, 'R' if o=+1 else 'L')
    def ends(key):
        c1, o1, c2, o2 = key
        e1 = (c1, "R" if o1 == 1 else "L")
        e2 = (c2, "L" if o2 == 1 else "R")
        return e1, e2

    by_end: Dict[Tuple[int, str], List[Tuple[int, tuple]]] = {}
    for key, gaps in links.items():
        for e in ends(key):
            by_end.setdefault(e, []).append((len(gaps), key))
    choice: Dict[Tuple[int, str], tuple] = {}
    for e, cand in by_end.items():
        cand.sort(key=lambda t: (-t[0], t[1]))
        best_n, best_key = cand[0]
        if best_n < min_links:
            continue
        if len(cand) > 1 and cand[1][0] >= ambiguity_ratio * best_n:
            continue  # rival too close: end is a branch point
        choice[e] = best_key
    accepted = {}
    for key, gaps in links.items():
        e1, e2 = ends(key)
        if choice.get(e1) == key and choice.get(e2) == key:
            accepted[key] = int(round(float(np.median(gaps))))
    return accepted


def chain_scaffolds(
    n_contigs: int,
    accepted: Dict[Tuple[int, int, int, int], int],
) -> List[List[Tuple[int, int, int]]]:
    """Walk accepted links into chains. Returns scaffolds as lists of
    (contig, orient, gap_before) — gap_before of the first entry is 0.
    Unlinked contigs come out as singletons; cycles are broken at the
    smallest contig id."""
    # right[(c, o)] = (next c, next o, gap): the join at oriented-right
    right: Dict[Tuple[int, int], Tuple[int, int, int]] = {}
    for (c1, o1, c2, o2), gap in sorted(accepted.items()):
        right[(c1, o1)] = (c2, o2, gap)
        right[(c2, -o2)] = (c1, -o1, gap)  # same join walked leftward
    has_left = {(c2, o2) for (c2, o2, _g) in right.values()}
    scaffolds = []
    used = set()
    # chain starts: oriented contigs with a right-join but no left-join;
    # key (c, -o) prefers the +1 orientation start when both are free
    starts = sorted(
        ((c, o) for (c, o) in right
         if (c, o) not in has_left and c not in used),
        key=lambda co: (co[0], -co[1]),
    )
    for c, o in starts:
        if c in used:
            continue
        chain = [(c, o, 0)]
        used.add(c)
        cur = (c, o)
        while cur in right:
            nc, no, gap = right[cur]
            if nc in used:
                break
            chain.append((nc, no, gap))
            used.add(nc)
            cur = (nc, no)
        scaffolds.append(chain)
    # cycles: every member has both joins; break at the smallest id
    # (same (c, -o) key: prefer the +1 orientation entry point)
    for c, o in sorted(right, key=lambda co: (co[0], -co[1])):
        if c in used:
            continue
        chain = [(c, o, 0)]
        used.add(c)
        cur = (c, o)
        while cur in right:
            nc, no, gap = right[cur]
            if nc in used:
                break
            chain.append((nc, no, gap))
            used.add(nc)
            cur = (nc, no)
        scaffolds.append(chain)
    for c in range(n_contigs):
        if c not in used:
            scaffolds.append([(c, 1, 0)])
    return scaffolds


def emit_scaffolds(
    contigs: List[np.ndarray],
    chains: List[List[Tuple[int, int, int]]],
    min_gap: int = 1,
) -> List[np.ndarray]:
    """Stitch chains into scaffold sequences; gaps become runs of
    GAP_CODE (written as 'N'). Output sorted by (-length, bytes)."""
    out = []
    for chain in chains:
        pieces = []
        for i, (c, o, gap) in enumerate(chain):
            if i > 0:
                pieces.append(
                    np.full(max(min_gap, gap), GAP_CODE, np.int8)
                )
            seq = contigs[c]
            pieces.append(seq if o == 1 else (3 - seq)[::-1].astype(seq.dtype))
        out.append(np.concatenate(pieces))
    return sorted(out, key=lambda c: (-len(c), c.tobytes()))


def scaffold_contigs(
    contigs: List[np.ndarray],
    placements: Dict[int, Tuple[int, int, int]],
    mate_pairs: np.ndarray,
    rlen: np.ndarray,
    cap: int,
    min_links: int = 3,
    insert_size: Optional[int] = None,
) -> Tuple[List[np.ndarray], Dict[str, int]]:
    """Full scaffolding pass: contigs + vertex placements + mate pairs ->
    (scaffolds, report). ``cap`` is the RC-augmentation half-size of the
    vertex space (rc(v) = (v + cap) % (2*cap)); ``rlen`` per-vertex read
    lengths."""
    if len(contigs) == 0 or len(mate_pairs) == 0:
        return list(contigs), {
            "n_scaffolds": len(contigs), "n_joins": 0,
            "insert_size": insert_size or 0, "n_links_used": 0,
        }
    resolved = resolve_pair_placements(mate_pairs, placements, rlen, cap)
    est, n_proper = estimate_insert_size(resolved)
    insert = insert_size if insert_size is not None else est
    links = collect_links(resolved, [len(c) for c in contigs], insert)
    accepted = select_links(links, min_links)
    chains = chain_scaffolds(len(contigs), accepted)
    scaffolds = emit_scaffolds(contigs, chains)
    report = {
        "n_scaffolds": len(scaffolds),
        "n_joins": sum(len(ch) - 1 for ch in chains),
        "insert_size": int(insert),
        "n_proper_pairs": int(n_proper),
        "n_cross_pairs": int(sum(len(g) for g in links.values())),
        "n_links_used": len(accepted),
    }
    return scaffolds, report
