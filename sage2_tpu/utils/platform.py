"""Backend initialization hardening.

The environment's TPU plugin (axon relay) registers its PJRT platform at
interpreter start; depending on relay timing it occasionally registers
under a different platform name than the one pinned in
``jax_platforms``, making every jax call raise "Backend 'axon' is not in
the list of known backends". ``ensure_backend()`` detects that state and
falls back to automatic backend selection so the same CLI invocation
works on TPU, CPU, or a flaky relay.
"""

from __future__ import annotations

import sys


def ensure_backend() -> str:
    """Return the platform of the default device, repairing a broken
    jax_platforms pin if needed."""
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError as e:
        msg = str(e)
        if "not in the list of known backends" in msg:
            print(
                f"[sage2] pinned backend unavailable ({msg.splitlines()[0]}); "
                "falling back to auto selection",
                file=sys.stderr,
            )
            jax.config.update("jax_platforms", "")
            return jax.devices()[0].platform
        raise


def warmup_compile(verbose: bool = True) -> float:
    """Absorb the per-process first-compile penalty before timers start.

    BASELINE.md round-4: the FIRST compile in a fresh process costs an
    unpredictable 280-1500 s on the bench relay (subsequent compiles
    ~30-110 s), which is the mechanism behind the ~2-3x stage-time
    variance of identical runs (VERDICT r4 Weak #3) — whichever stage
    compiles first absorbs it. Dispatching ONE small program of the
    production op class (sort + gather + scan) first moves that cost
    out of every timed stage. Returns the warmup's wall seconds.
    """
    import time

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()

    @jax.jit
    def _warm(x):
        s = jnp.sort(x)
        g = s[jnp.clip(x[:64].astype(jnp.int32), 0, x.shape[0] - 1)]
        return jnp.cumsum(g)[-1] + jax.lax.cummax(s)[-1]

    out = _warm(jnp.arange(1024, dtype=jnp.uint32)[::-1])
    jax.device_get(out)  # fetch: the relay lazily skips unfetched work
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[sage2] warmup_compile: {dt:.1f}s", file=sys.stderr)
    return dt
