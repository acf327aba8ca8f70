"""Empirical probe: which dynamic-gather shapes Mosaic supports in Pallas
TPU kernels, and at what throughput. Informs the fused overlap-join
kernel design (SURVEY.md §9 perf roadmap).

Each probe compiles a tiny kernel; failures print the error class only.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sage2_tpu.utils.platform import ensure_backend

ensure_backend()


def timeit(f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def probe(name, fn):
    try:
        out, t = fn()
        print(f"OK   {name:60s} {t*1e3:8.2f} ms")
        return out, t
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {name:60s} {type(e).__name__}: {msg}")
        return None, None


def gather_axis0_kernel(tbl_ref, idx_ref, out_ref):
    # out[i,j] = tbl[idx[i,j], j]
    out_ref[:, :] = jnp.take_along_axis(tbl_ref[:, :], idx_ref[:, :], axis=0)


def gather_axis1_kernel(tbl_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(tbl_ref[:, :], idx_ref[:, :], axis=1)


def make_gather(N, W, axis):
    kern = gather_axis0_kernel if axis == 0 else gather_axis1_kernel
    tbl = jnp.arange(N * W, dtype=jnp.int32).reshape(N, W)
    hi = N if axis == 0 else W
    idx = jax.random.randint(jax.random.PRNGKey(0), (N, W), 0, hi,
                             dtype=jnp.int32)

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    def f():
        out, t = timeit(run, tbl, idx)
        # correctness spot check
        ref = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=axis)
        np.testing.assert_array_equal(np.asarray(out), ref)
        print(f"     -> {N*W/t/1e6:.0f}M lookups/s")
        return out, t
    return f


def main():
    print(f"device: {jax.devices()[0]}")
    # sublane-axis gathers (axis=0): table column per lane
    for (N, W) in [(8, 128), (64, 128), (1024, 128), (8192, 128),
                   (65536, 128), (1024, 8), (16384, 8)]:
        probe(f"take_along_axis axis=0 shape=({N},{W})", make_gather(N, W, 0))
    # lane-axis gathers (axis=1): per-row table in lanes
    for (N, W) in [(8, 128), (256, 128), (8, 256), (8, 512), (8, 2048),
                   (256, 512), (2048, 2048)]:
        probe(f"take_along_axis axis=1 shape=({N},{W})", make_gather(N, W, 1))

    # XLA (non-pallas) comparison: same gathers via jnp
    for (N, W, axis) in [(65536, 128, 0), (1 << 20, 128, 0)]:
        tbl = jnp.arange(N * W, dtype=jnp.int32).reshape(N, W)
        idx = jax.random.randint(jax.random.PRNGKey(0), (N, W), 0, N,
                                 dtype=jnp.int32)
        f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=0))
        try:
            _, t = timeit(f, tbl, idx)
            print(f"OK   XLA take_along_axis axis=0 ({N},{W})"
                  f"{'':24s} {t*1e3:8.2f} ms -> {N*W/t/1e6:.0f}M/s")
        except Exception as e:
            print("FAIL xla", e)


if __name__ == "__main__":
    main()
