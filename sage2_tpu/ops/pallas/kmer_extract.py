"""Pallas kernel: canonical k-mer key extraction.

Native checklist item 1 (SURVEY.md §2): 2-bit pack + canonical k-mer
extraction. For each read row, emits the (hi, lo) uint32 key pair of
every window's lexicographic min(forward, reverse-complement) k-mer.

Kernel shape: a 1-D grid over blocks of reads; each block's codes sit in
VMEM and the K window columns are built by static slicing — pure VPU
multiply-add arithmetic, no gathers, no MXU. The rolling-hash
formulation (each key from its predecessor) would serialize along the
read; the windowed dot stays fully data-parallel across the (block, P)
surface, which is what the 8x128 VPU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sage2_tpu.ops import bitpack


def _kernel(k: int, reads_ref, hi_ref, lo_ref):
    codes = reads_ref[:, :].astype(jnp.uint32)
    R, L = codes.shape
    P = L - k + 1
    n_lo = min(k, 16)
    n_hi = k - n_lo

    def windowed_value(offset: int, n: int) -> jnp.ndarray:
        """Base-4 value of bases [offset+j, offset+j+n) per window j."""
        acc = jnp.zeros((R, P), jnp.uint32)
        for t in range(n):
            w = jnp.uint32(1) << jnp.uint32(2 * (n - 1 - t))
            acc = acc + codes[:, offset + t : offset + t + P] * w
        return acc

    def windowed_rc_value(offset: int, n: int) -> jnp.ndarray:
        """Same for the reverse complement: rc[t] = 3 - fwd[k-1-t]."""
        acc = jnp.zeros((R, P), jnp.uint32)
        for t in range(n):
            src = k - 1 - (offset + t)
            w = jnp.uint32(1) << jnp.uint32(2 * (n - 1 - t))
            acc = acc + (jnp.uint32(3) - codes[:, src : src + P]) * w
        return acc

    f_lo = windowed_value(n_hi, n_lo)
    f_hi = windowed_value(0, n_hi) if n_hi else jnp.zeros((R, P), jnp.uint32)
    r_lo = windowed_rc_value(n_hi, n_lo)
    r_hi = (
        windowed_rc_value(0, n_hi) if n_hi else jnp.zeros((R, P), jnp.uint32)
    )
    take_rc = (r_hi < f_hi) | ((r_hi == f_hi) & (r_lo < f_lo))
    hi_ref[:, :] = jnp.where(take_rc, r_hi, f_hi)
    lo_ref[:, :] = jnp.where(take_rc, r_lo, f_lo)


@functools.partial(jax.jit, static_argnums=(1, 2))
def canonical_kmer_keys_pallas(
    reads: jnp.ndarray, k: int, block_rows: int = 256
):
    """Canonical (hi, lo) keys of every k-mer; Pallas TPU kernel.

    reads: (N, L) int codes. Returns uint32 arrays (N, L - k + 1).
    Semantically identical to ops.bitpack.canonical_kmer_keys (tested).
    """
    N, L = reads.shape
    P = L - k + 1
    if not 1 < k <= 31:
        raise ValueError(f"k must be in (1, 31], got {k}")
    if P < 1:
        raise ValueError(f"k ({k}) exceeds read length ({L})")
    nb = -(-N // block_rows)
    pad = nb * block_rows - N
    r = reads.astype(jnp.int32)
    if pad:
        r = jnp.concatenate(
            [r, jnp.zeros((pad, L), jnp.int32)], axis=0
        )

    grid = (nb,)
    hi, lo = pl.pallas_call(
        functools.partial(_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * block_rows, P), jnp.uint32),
            jax.ShapeDtypeStruct((nb * block_rows, P), jnp.uint32),
        ),
    )(r)
    return hi[:N], lo[:N]


def canonical_kmer_keys(reads: jnp.ndarray, k: int):
    """Dispatcher: Pallas on TPU, XLA elsewhere (SURVEY.md §7 fallback)."""
    platform = jax.devices()[0].platform
    if platform == "tpu":
        try:
            return canonical_kmer_keys_pallas(reads, k)
        except Exception:
            pass
    return bitpack.canonical_kmer_keys(reads, k)
