"""Probe: careful tunnel transfer measurement.

d2h must read an array PRODUCED on device (arrays created from numpy keep
a cached host buffer, making np.asarray a no-op).  h2d swept over sizes;
random payload (the relay might compress)."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    xor = jax.jit(lambda x: x ^ jnp.uint8(1))
    for mb in (1, 2, 4, 8, 16):
        n = mb << 20
        host = np.random.default_rng(mb).integers(0, 255, n, dtype=np.uint8)
        ts = []
        for _ in range(3):
            t0 = time.time()
            dev = jax.block_until_ready(jax.device_put(host))
            ts.append(time.time() - t0)
        h2d = n / min(ts) / 1e6
        y = jax.block_until_ready(xor(dev))  # produced on device, no host cache
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = jax.device_get(y)
            ts.append(time.time() - t0)
        d2h = n / min(ts) / 1e6
        assert out[0] == host[0] ^ 1
        log(f"{mb:3d} MB: h2d={h2d:8.1f} MB/s  d2h={d2h:8.1f} MB/s")


if __name__ == "__main__":
    main()
