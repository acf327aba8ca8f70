"""Pallas kernels vs their XLA fallbacks (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.ops import bitpack


@pytest.mark.parametrize("k", [5, 16, 25])
def test_kmer_extract_kernel_matches_xla(rng, k):
    # CPU: run the Pallas kernel in interpreter mode
    from jax.experimental import pallas as pl
    import sage2_tpu.ops.pallas.kmer_extract as mod

    reads = rng.integers(0, 4, size=(70, 40)).astype(np.int32)
    expect_hi, expect_lo = bitpack.canonical_kmer_keys(jnp.asarray(reads), k)

    import functools
    from unittest import mock

    orig = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(mod.pl, "pallas_call", interp_call):
        hi, lo = mod.canonical_kmer_keys_pallas.__wrapped__(
            jnp.asarray(reads), k, 32
        )
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(expect_hi))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(expect_lo))


def test_dispatcher_falls_back_on_cpu(rng):
    from sage2_tpu.ops.pallas.kmer_extract import canonical_kmer_keys

    reads = rng.integers(0, 4, size=(10, 30)).astype(np.int32)
    hi, lo = canonical_kmer_keys(jnp.asarray(reads), 15)
    eh, el = bitpack.canonical_kmer_keys(jnp.asarray(reads), 15)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(eh))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(el))
