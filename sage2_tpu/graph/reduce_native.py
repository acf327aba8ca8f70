"""ctypes binding + lazy build of the native transitive-reduction backend
(csrc/reduce_host.cpp).

Same packaging pattern as sage2_tpu.io.native: compiled on first use with
g++ (cached in csrc/build), plain C ABI via ctypes, graceful degradation
to the device kernels when no toolchain is present.

When to use which backend (measured, BASELINE.md round-3):

* ``graph.reduce.transitive_reduction`` / ``transitive_reduction_chunked``
  — the TPU path. Right when the edge list is already device-resident
  (real-TPU deployments: overlap output stays in HBM) or small.
* this module — the host path. Right when the edge list lives on host
  (the large-scale pipeline is host-first there) and device dispatch
  would pay O(E) transfers for a memory-bound irregular walk.

``transitive_reduction_auto`` in graph.reduce makes the choice.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_CSRC = os.path.join(_ROOT, "csrc")
_BUILD = os.path.join(_CSRC, "build")
_LIB_PATH = os.path.join(_BUILD, "libsage2reduce.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile(src: str, out: str) -> bool:
    # build to a private temp path, then rename atomically: a concurrent
    # process must never CDLL a partially written .so
    os.makedirs(_BUILD, exist_ok=True)
    tmp = f"{out}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", src, "-o", tmp,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"[sage2.reduce_native] build failed: {e}", file=sys.stderr)
        return False
    if r.returncode != 0:
        print(f"[sage2.reduce_native] build failed:\n{r.stderr}",
              file=sys.stderr)
        return False
    os.replace(tmp, out)
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.join(_CSRC, "reduce_host.cpp")
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(src):
            if not _compile(src, _LIB_PATH):
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sage2_transitive_reduce.restype = ctypes.c_int64
        lib.sage2_transitive_reduce.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # src
            ctypes.POINTER(ctypes.c_int32),  # dst
            ctypes.POINTER(ctypes.c_int32),  # ovl
            ctypes.c_int64,                  # n_total
            ctypes.c_int32,                  # n_vertices
            ctypes.c_int32,                  # fixed_len (<0 = ragged)
            ctypes.POINTER(ctypes.c_int32),  # lens (or NULL)
            ctypes.c_int32,                  # n_threads
            ctypes.POINTER(ctypes.c_uint8),  # removed_out
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def reduce_marks(
    src: np.ndarray,
    dst: np.ndarray,
    ovl: np.ndarray,
    n_vertices: int,
    read_len,
    n_threads: int | None = None,
    removed_out: np.ndarray | None = None,
) -> tuple[np.ndarray, int] | None:
    """Removal bitmask + exact expansion total, or None when unavailable.

    Inputs are the (src, dst)-sorted int32 edge arrays (padding
    src == INT32_MAX at the tail), exactly as the device kernels take
    them; ``read_len`` is an int or a per-vertex length array. Memmap
    inputs pass straight through to the C++ side (no copy: ctypes reads
    the pages via the OS cache). ``removed_out``: optional preallocated
    (E,) uint8 destination (e.g. a spill memmap) for the marks.
    """
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    ovl = np.ascontiguousarray(ovl, np.int32)
    E = src.shape[0]
    if removed_out is not None:
        assert removed_out.shape == (E,) and removed_out.dtype == np.uint8
        removed = removed_out
        removed[:] = 0
    else:
        removed = np.zeros(E, np.uint8)
    if isinstance(read_len, (int, np.integer)):
        fixed, lens, lens_ptr = int(read_len), None, None
    else:
        fixed = -1
        lens = np.ascontiguousarray(read_len, np.int32)
        if lens.shape[0] < n_vertices:
            # the C++ side indexes lens[v] for every v < n_vertices; a
            # short array would be an out-of-bounds read there
            raise ValueError(
                f"reduce_marks: lens has {lens.shape[0]} entries but "
                f"n_vertices={n_vertices}"
            )
        lens_ptr = _ptr(lens)
    nt = n_threads or os.cpu_count() or 1
    total = lib.sage2_transitive_reduce(
        _ptr(src), _ptr(dst), _ptr(ovl), ctypes.c_int64(E),
        ctypes.c_int32(int(n_vertices)), ctypes.c_int32(fixed),
        lens_ptr, ctypes.c_int32(int(nt)),
        removed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if total < 0:
        raise ValueError(
            "sage2_transitive_reduce: malformed edge list (src/dst out of "
            "range or not (src, dst)-sorted)"
        )
    if removed_out is not None:
        # no bool copy: the caller reads its own (possibly memmap) buffer
        return removed, int(total)
    return removed.astype(bool), int(total)
