"""ctypes binding + lazy build of the native circulation solver
(csrc/flow_host.cpp) — same packaging pattern as graph.reduce_native.

The min-cost flow (negative-cycle canceling) measured as the DOMINANT
stage of the 10 Mbp repeat-rich rehearsal (round 5): pure-Python
Bellman-Ford is O(V*E) per canceled cycle with interpreter constants.
The C++ port replays the exact same arc order, comparisons, and cycle
walks, so flows — and therefore contigs — are bit-identical (tested);
graceful degradation to the Python loops when no toolchain is present.
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
_LIB_PATH = os.path.join(_BUILD, "libsage2flow.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile(src: str, out: str) -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    tmp = f"{out}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        src, "-o", tmp,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"[sage2.flow_native] build failed: {e}", file=sys.stderr)
        return False
    if r.returncode != 0:
        print(f"[sage2.flow_native] build failed:\n{r.stderr}",
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
        src = os.path.join(_CSRC, "flow_host.cpp")
        if not os.path.exists(src):
            _build_failed = True
            return None
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            if not _compile(src, _LIB_PATH):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            print(f"[sage2.flow_native] load failed: {e}",
                  file=sys.stderr)
            _build_failed = True
            return None
        lib.sage2_solve_circulation.restype = ctypes.c_int64
        lib.sage2_solve_circulation.argtypes = [
            ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def solve_circulation(
    n: int,
    to: np.ndarray,
    cap: np.ndarray,
    cost: np.ndarray,
    max_iters: int,
) -> Optional[np.ndarray]:
    """Solve; returns the (m,) int64 flow array, or None if the native
    backend is unavailable. Flows are bit-identical to
    Circulation.solve's Python loops (same algorithm, same order)."""
    lib = _load()
    if lib is None:
        return None
    to = np.ascontiguousarray(to, np.int32)
    cap = np.ascontiguousarray(cap, np.int64)
    cost = np.ascontiguousarray(cost, np.int64)
    flow = np.zeros(to.shape[0], np.int64)
    rc = lib.sage2_solve_circulation(
        np.int32(n), np.int64(to.shape[0]),
        to.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flow.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.int64(max_iters),
    )
    if rc < 0:
        return None   # max_iters exhausted — caller falls back
    return flow
