"""Probe: host<->device transfer bandwidth through the axon tunnel, plus
on-chip HBM copy rate — decides how much result data the encode pipeline
can afford to ship back per input byte."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    for mb in (1, 8, 32):
        n = mb << 20
        host = np.random.default_rng(0).integers(0, 255, n, dtype=np.uint8)
        # host -> device
        t = []
        for _ in range(3):
            t0 = time.time()
            dev = jax.block_until_ready(jnp.asarray(host))
            t.append(time.time() - t0)
        h2d = n / min(t) / 1e6
        # device -> host
        t = []
        for _ in range(3):
            t0 = time.time()
            back = np.asarray(dev)
            t.append(time.time() - t0)
        d2h = n / min(t) / 1e6
        assert back[0] == host[0]
        log(f"{mb} MB: h2d={h2d:.0f} MB/s d2h={d2h:.0f} MB/s")

    # on-chip copy (HBM->HBM through VMEM): sanity ceiling
    x = jnp.asarray(np.zeros(64 << 20, np.uint8))
    f = jax.jit(lambda a: a + 1)
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(5):
        y = f(x)
    jax.block_until_ready(y)
    per = (time.time() - t0) / 5
    log(f"on-chip 64MB elementwise: {64/per/1e3:.1f} GB/s")


if __name__ == "__main__":
    main()
