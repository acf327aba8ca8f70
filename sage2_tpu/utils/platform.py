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
