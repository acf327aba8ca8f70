"""Measure relay host->device and device->host bandwidth at reduce-stage sizes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)

for mb in (8, 64, 256):
    n = mb * (1 << 20) // 4
    a = np.arange(n, dtype=np.int32)
    # upload
    t0 = time.perf_counter()
    d = jax.device_put(a, dev)
    d.block_until_ready()
    up = time.perf_counter() - t0
    # download
    t0 = time.perf_counter()
    b = np.asarray(d)
    dn = time.perf_counter() - t0
    print(f"{mb:4d} MB  up {up:6.2f}s ({mb/up:7.1f} MB/s)   down {dn:6.2f}s ({mb/dn:7.1f} MB/s)")
    del d, b
