"""2-bit base encoding and k-mer key arithmetic.

Design (SURVEY.md §7): the whole pipeline is integer-exact. Bases are the
2-bit codes A=0, C=1, G=2, T=3 (complement = 3 - code). A k-mer (k <= 31)
is the big-endian base-4 integer sum(code[i] * 4**(k-1-i)), held as a pair
of uint32 words ``(hi, lo)``: ``lo`` carries the last min(k, 16) bases and
``hi`` the rest. TPUs have no native 64-bit integers, so every k-mer
comparison/sort in the framework is lexicographic on (hi, lo).

The reference's equivalent layer is its C++ read store / k-mer extraction
(SURVEY.md §2 "Read store", "k-mer counter"; reference mount empty — no
file:line citation possible, see SURVEY.md §0).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# 2-bit base codes.
BASE_A, BASE_C, BASE_G, BASE_T = 0, 1, 2, 3

_ASCII_TO_CODE = np.full(256, 0, dtype=np.uint8)   # unknown (incl. 'N') -> A
for _ch, _code in (("A", 0), ("C", 1), ("G", 2), ("T", 3),
                   ("a", 0), ("c", 1), ("g", 2), ("t", 3)):
    _ASCII_TO_CODE[ord(_ch)] = _code
_CODE_TO_ASCII = np.frombuffer(b"ACGTN", dtype=np.uint8)  # 4 = scaffold gap


def encode_ascii(seqs: np.ndarray) -> np.ndarray:
    """ASCII byte array -> 2-bit codes (host side). 'N'/unknown map to A.

    The reference replaces ambiguous bases during ingest as well (RACER
    paper; SURVEY.md §2 "FASTQ/FASTA reader" — N handling). NOTE: this
    makes the encoding lossy for scaffold FASTA (gap code 4 decodes to
    'N' but 'N' re-encodes to A) — scaffolds.fasta is an OUTPUT format,
    not re-ingestable as reads; feed contigs.fasta or the original reads
    back in instead.
    """
    return _ASCII_TO_CODE[seqs]


def decode_to_ascii(codes: np.ndarray) -> np.ndarray:
    """2-bit codes -> ASCII byte array (host side)."""
    return _CODE_TO_ASCII[np.asarray(codes, dtype=np.int64)]


def codes_to_str(codes: np.ndarray) -> str:
    return decode_to_ascii(codes).tobytes().decode()


def str_to_codes(s: str) -> np.ndarray:
    return encode_ascii(np.frombuffer(s.encode(), dtype=np.uint8))


def revcomp_codes(reads: jnp.ndarray) -> jnp.ndarray:
    """Reverse complement of fixed-length reads, shape (..., L)."""
    return (3 - reads)[..., ::-1]


def _pow4(n: int) -> np.ndarray:
    """[4^(n-1), ..., 4^1, 4^0] as uint32 (n <= 16 so all fit exactly)."""
    assert 0 <= n <= 16
    return (np.uint32(1) << np.arange(2 * (n - 1), -2, -2, dtype=np.uint32)).astype(
        np.uint32
    ) if n > 0 else np.zeros(0, np.uint32)


def _windows(reads: jnp.ndarray, k: int) -> jnp.ndarray:
    """All length-k windows of each read: (N, L) -> (N, P, k), P = L - k + 1.

    Built from k static slices so XLA sees a fully static gather-free graph.
    """
    L = reads.shape[-1]
    P = L - k + 1
    if P < 1:
        raise ValueError(f"k ({k}) exceeds read length ({L})")
    cols = [reads[..., j : j + P] for j in range(k)]
    return jnp.stack(cols, axis=-1)


def _dot_pow4(codes: jnp.ndarray, n: int) -> jnp.ndarray:
    """Base-4 value of the last axis (length n <= 16 codes) as uint32."""
    if n == 0:
        return jnp.zeros(codes.shape[:-1], jnp.uint32)
    w = jnp.asarray(_pow4(n))
    return jnp.sum(codes.astype(jnp.uint32) * w, axis=-1, dtype=jnp.uint32)


def shifted_word_packs(reads: jnp.ndarray) -> jnp.ndarray:
    """Word packings of every read at all 16 base shifts: (N, 16, W).

    shifted[n, r, t] packs bases [r + 16t, r + 16t + 16) of read n
    (zero-padded past the end), so the 16-base word starting at ANY
    position p is shifted[n, p % 16, p // 16]. One-time O(16 N L) cost
    that makes every window extraction a static slice.
    """
    L = reads.shape[-1]
    pad = jnp.zeros(reads.shape[:-1] + (15,), reads.dtype)
    rp = jnp.concatenate([reads, pad], axis=-1)
    packs = [pack_read_words(rp[..., r : r + L]) for r in range(16)]
    return jnp.stack(packs, axis=-2)


def _keys_from_packs(
    shifted: jnp.ndarray, k: int, P: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(hi, lo) integer keys of windows [p, p+k) for p in [0, P) from
    shifted word packs — O(N*P) memory (the previous windowed
    formulation materialized (N, P, k) and fell over at scale)."""
    his, los = [], []
    for p in range(P):
        w0 = shifted[..., p % 16, p // 16]
        if k <= 16:
            his.append(jnp.zeros_like(w0))
            los.append(w0 >> jnp.uint32(2 * (16 - k)))
        else:
            q = p + k - 16
            his.append(w0 >> jnp.uint32(2 * (32 - k)))
            los.append(shifted[..., q % 16, q // 16])
    return jnp.stack(his, axis=-1), jnp.stack(los, axis=-1)


def kmer_keys(reads: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-strand keys of every k-mer of every read.

    reads: (..., L) int codes. Returns (hi, lo) uint32 arrays of shape
    (..., L - k + 1). hi holds the first k-16 bases (0 if k <= 16), lo the
    last min(k, 16).
    """
    # k = 32 is allowed here (used for overlap seeds); count tables
    # restrict to k <= 31 so their SENTINEL stays unambiguous.
    if not 1 < k <= 32:
        raise ValueError(f"k must be in (1, 32], got {k}")
    L = reads.shape[-1]
    P = L - k + 1
    if P < 1:
        raise ValueError(f"k ({k}) exceeds read length ({L})")
    return _keys_from_packs(shifted_word_packs(reads), k, P)


def revcomp_kmer_keys(reads: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse-complement-strand keys of every k-mer (same window order).

    Window p's reverse complement equals window (P-1-p) of the
    reverse-complemented read, so the keys are the RC read's keys with
    the window axis reversed.
    """
    L = reads.shape[-1]
    P = L - k + 1
    if P < 1:
        raise ValueError(f"k ({k}) exceeds read length ({L})")
    hi, lo = _keys_from_packs(shifted_word_packs(revcomp_codes(reads)), k, P)
    return hi[..., ::-1], lo[..., ::-1]


def canonical_kmer_keys(
    reads: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Canonical (strand-independent) keys: lexicographic min(fwd, rc)."""
    fh, fl = kmer_keys(reads, k)
    rh, rl = revcomp_kmer_keys(reads, k)
    take_rc = (rh < fh) | ((rh == fh) & (rl < fl))
    return jnp.where(take_rc, rh, fh), jnp.where(take_rc, rl, fl)


def canonicalize_pair(
    fh: jnp.ndarray, fl: jnp.ndarray, rh: jnp.ndarray, rl: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Canonical key given forward and reverse-complement keys."""
    take_rc = (rh < fh) | ((rh == fh) & (rl < fl))
    return jnp.where(take_rc, rh, fh), jnp.where(take_rc, rl, fl)


# --- incremental key editing (used by the spectrum corrector) -------------
#
# A k-mer key pair can be edited in O(1) when one base changes, because the
# base occupies a fixed 2-bit field of the 2k-bit value. ``pos`` is the
# base's index within the k-mer (0 = most significant / first base).


def set_base(
    hi: jnp.ndarray, lo: jnp.ndarray, k: int, pos: int,
    old: jnp.ndarray, new: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Replace the base at static position ``pos`` (old code -> new code)."""
    n_lo = min(k, 16)
    shift = 2 * (k - 1 - pos)
    if shift < 2 * n_lo:
        w = (jnp.uint32(1) << shift)
        lo = lo + (new.astype(jnp.uint32) - old.astype(jnp.uint32)) * w
    else:
        w = (jnp.uint32(1) << (shift - 2 * n_lo))
        hi = hi + (new.astype(jnp.uint32) - old.astype(jnp.uint32)) * w
    return hi, lo


def pack_read_words(reads: jnp.ndarray) -> jnp.ndarray:
    """Pack fixed-length reads to uint32 words, 16 bases per word.

    (..., L) codes -> (..., ceil(L/16)) uint32, big-endian within a word,
    final word left-aligned (low bits zero-padded) so that word-wise
    lexicographic order equals base-wise lexicographic order.
    """
    L = reads.shape[-1]
    W = -(-L // 16)
    pad = W * 16 - L
    if pad:
        reads = jnp.concatenate(
            [reads, jnp.zeros(reads.shape[:-1] + (pad,), reads.dtype)], axis=-1
        )
    grouped = reads.reshape(reads.shape[:-1] + (W, 16))
    return _dot_pow4(grouped, 16)


def unpack_read_words(words: np.ndarray, L: int) -> np.ndarray:
    """Inverse of pack_read_words (host side)."""
    words = np.asarray(words, dtype=np.uint64)
    W = words.shape[-1]
    shifts = np.arange(30, -2, -2, dtype=np.uint64)
    codes = (words[..., :, None] >> shifts) & np.uint64(3)
    return codes.reshape(words.shape[:-1] + (W * 16,))[..., :L].astype(np.uint8)
