"""Collective-volume ledger: the config-#4 communication model.

SURVEY.md §5 "Metrics / logging" asks for per-collective bytes in the
metrics stream; VERDICT r4 #6 asks for a logged collective-volume table
as the multi-host communication model. Collectives execute inside
compiled shard_map programs, so volumes are recorded at TRACE time
(shapes are static) through the thin wrappers below, deduplicated per
(label, op, shape, dtype); the host wrappers count dispatches via
``label(...)``. bytes_per_dispatch is the per-device array size of each
collective operand — for all_to_all each device sends (ndev-1)/ndev of
that over the interconnect; for psum/all_gather the wire cost depends
on the reduction topology — this ledger reports operand volume, the
quantity that scales.

The pipeline drains the ledger into metrics.jsonl after each meshed
stage (event "comm"). Recording costs one dict update per traced
collective and nothing per dispatch beyond a counter.
"""

from __future__ import annotations

import threading
from typing import Any, Dict

import jax
import numpy as np

_tls = threading.local()

# label -> {"dispatches": int, "calls": {(op, shape, dtype): count}}
LEDGER: Dict[str, Dict[str, Any]] = {}


class label:
    """Context manager marking one dispatch of a labeled sharded
    program; trace-time collective records attach to the innermost
    active label."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        stack = getattr(_tls, "stack", None)
        if stack is None:
            stack = _tls.stack = []
        stack.append(self.name)
        e = LEDGER.setdefault(
            self.name, {"dispatches": 0, "calls": {}}
        )
        e["dispatches"] += 1
        return self

    def __exit__(self, *exc):
        _tls.stack.pop()
        return False


def _rec(op: str, shape, dtype) -> None:
    stack = getattr(_tls, "stack", None)
    if not stack:
        return
    e = LEDGER[stack[-1]]
    # record only the label's FIRST dispatch: wrappers that build a
    # fresh jit per call re-trace every dispatch (the XLA cache dedupes
    # compilation, tracing still runs) and would double-count; cached
    # step functions trace once anyway. The model therefore uses
    # first-trace shapes (tail-chunk shape variants are not added).
    if e["dispatches"] != 1:
        return
    key = (op, tuple(int(s) for s in shape), np.dtype(dtype).str)
    e["calls"][key] = e["calls"].get(key, 0) + 1


def all_to_all(x, axis_name, split_axis, concat_axis, *, tiled=False):
    _rec("all_to_all", x.shape, x.dtype)
    return jax.lax.all_to_all(
        x, axis_name, split_axis, concat_axis, tiled=tiled
    )


def psum(x, axis_name):
    _rec("psum", getattr(x, "shape", ()), getattr(x, "dtype", np.int32))
    return jax.lax.psum(x, axis_name)


def all_gather(x, axis_name, **kw):
    _rec("all_gather", x.shape, x.dtype)
    return jax.lax.all_gather(x, axis_name, **kw)


def ppermute(x, axis_name, perm):
    _rec("ppermute", x.shape, x.dtype)
    return jax.lax.ppermute(x, axis_name, perm)


def summary() -> Dict[str, Any]:
    """Per-label per-op operand bytes (per dispatch, from trace-time
    shapes) and dispatch counts. NOTE: if one label was traced at
    several shapes (e.g. tail chunks), per-dispatch bytes aggregate
    over the traced variants — an upper bound for the model."""
    out = {}
    for name, e in LEDGER.items():
        ops: Dict[str, int] = {}
        for (op, shape, dt), cnt in e["calls"].items():
            nbytes = int(np.prod(shape, dtype=np.int64)) * np.dtype(
                dt
            ).itemsize * cnt
            ops[op] = ops.get(op, 0) + nbytes
        out[name] = {
            "dispatches": e["dispatches"],
            "bytes_per_dispatch": ops,
            "total_bytes": {
                op: b * e["dispatches"] for op, b in ops.items()
            },
        }
    return out


def reset() -> None:
    LEDGER.clear()
