"""ctypes binding + lazy build of the native C++ ingest (csrc/sage2io.cpp).

The shared library is compiled on first use with g++ (cached next to the
sources); absence of a toolchain degrades gracefully to the pure-Python
parser in sage2_tpu.io.fastq. pybind11 isn't available in this
environment, so the binding is a plain C ABI + ctypes (no build-time
Python dependency at all).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_ROOT, "csrc")
_BUILD = os.path.join(_CSRC, "build")
_LIB_PATH = os.path.join(_BUILD, "libsage2io.so")
_BASELINE_PATH = os.path.join(_BUILD, "baseline_cpu")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_POLICY = {"strict": 0, "trim": 1, "filter": 2}


def _compile(src: str, out: str, shared: bool) -> bool:
    # build to a private temp path, then rename atomically: a concurrent
    # process must never CDLL/exec a partially written artifact
    os.makedirs(_BUILD, exist_ok=True)
    tmp = f"{out}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", src, "-o", tmp, "-lz"]
    if shared:
        cmd[1:1] = ["-shared", "-fPIC"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"[sage2.native] build failed: {e}", file=sys.stderr)
        return False
    if r.returncode != 0:
        print(f"[sage2.native] build failed:\n{r.stderr}", file=sys.stderr)
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
        src = os.path.join(_CSRC, "sage2io.cpp")
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(src):
            if not _compile(src, _LIB_PATH, shared=True):
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sage2_parse.restype = ctypes.POINTER(ctypes.c_int8)
        lib.sage2_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sage2_free.argtypes = [ctypes.POINTER(ctypes.c_int8)]
        lib.sage2_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _parse(path: str, is_fasta: bool, length_policy: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise ImportError("native io unavailable")
    n = ctypes.c_int64()
    l = ctypes.c_int64()
    buf = lib.sage2_parse(
        path.encode(), int(is_fasta), _POLICY[length_policy],
        ctypes.byref(n), ctypes.byref(l),
    )
    if not buf:
        raise ValueError(lib.sage2_last_error().decode())
    try:
        if n.value == 0:
            return np.zeros((0, 0), np.int8)
        arr = np.ctypeslib.as_array(buf, shape=(n.value, l.value)).copy()
    finally:
        lib.sage2_free(buf)
    return arr.astype(np.int8, copy=False)


def parse_fastq(path: str, length_policy: str = "strict") -> np.ndarray:
    return _parse(path, False, length_policy)


def parse_fasta(path: str, length_policy: str = "strict") -> np.ndarray:
    return _parse(path, True, length_policy)


def baseline_binary() -> Optional[str]:
    """Build (if needed) and return the single-threaded C++ baseline."""
    src = os.path.join(_CSRC, "baseline_cpu.cpp")
    with _lock:
        if not os.path.exists(_BASELINE_PATH) or os.path.getmtime(
            _BASELINE_PATH
        ) < os.path.getmtime(src):
            if not _compile(src, _BASELINE_PATH, shared=False):
                return None
    return _BASELINE_PATH
