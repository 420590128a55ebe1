"""Probe 5: on-chip timing of the sorted-neighborhood matcher pieces.

Times (delta method: rate from t(m2)-t(m1) of chained calls, clearing the
~31 ms tunnel sync floor):
  a) sortnet.sort_records at n in {2^16, 2^17}, planes in {4, 5, 6}
  b) sortmatch._neighbor_scan probe kernel at 2^17
  c) full sortmatch.match_segment at 2^17 (the production candidate)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from smallz4_tpu.ops import sortnet, sortmatch  # noqa: E402


def log(*a):
    print(*a, flush=True)


def timed(fn, args, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best


def delta(make, m1=1, m2=2):
    f1, a = make(m1)
    f2, _ = make(m2)
    t0 = time.time(); jax.block_until_ready(f1(*a)); c1 = time.time() - t0
    jax.block_until_ready(f2(*a))
    t1, t2 = timed(f1, a), timed(f2, a)
    per = (t2 - t1) / (m2 - m1)
    return per, c1


def bench_sort(n, n_planes, n_keys=2):
    def make(m):
        @jax.jit
        def f(*planes):
            planes = list(planes)
            for _ in range(m):
                planes = list(sortnet.sort_records(*planes, n_keys=n_keys))
            return planes[0][:8]
        rng = np.random.default_rng(0)
        args = [jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
                for _ in range(n_planes)]
        args[n_keys] = jnp.asarray(np.arange(n, dtype=np.int32))
        return f, tuple(args)
    try:
        per, c1 = delta(make)
        log(f"sort n={n} planes={n_planes}: compile={c1:.1f}s "
            f"per-sort={per*1e3:.3f}ms ({n/per/1e6:.1f} M rec/s)")
    except Exception as e:  # noqa: BLE001
        log(f"sort n={n} planes={n_planes}: FAIL {type(e).__name__}: {e}")


def bench_probe(n):
    def make(m):
        @jax.jit
        def f(k1, pos, e1, e2):
            for _ in range(m):
                k1, pos, e1 = sortmatch._neighbor_scan(k1, pos, e1, e2)
            return k1[:8]
        rng = np.random.default_rng(0)
        a = tuple(jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
                  for _ in range(4))
        return f, a
    try:
        per, c1 = delta(make)
        log(f"probe n={n}: compile={c1:.1f}s per={per*1e3:.3f}ms "
            f"({n/per/1e6:.1f} M rec/s)")
    except Exception as e:  # noqa: BLE001
        log(f"probe n={n}: FAIL {type(e).__name__}: {e}")


def bench_match(n_entries):
    def make(m):
        @jax.jit
        def f(buf):
            acc = jnp.int32(0)
            lens = dists = conv = None
            for i in range(m):
                lens, dists, conv = sortmatch.match_segment(
                    buf, jnp.int32(i), jnp.int32(n_entries),
                    n_entries=n_entries, chain_steps=14)
                acc = acc + lens[0]
            return acc, lens[:8], dists[:8]
        rng = np.random.default_rng(1)
        buf = jnp.asarray(
            rng.integers(97, 102, n_entries + 16).astype(np.uint8))
        return f, (buf,)
    try:
        per, c1 = delta(make, 1, 2)
        log(f"match_segment n={n_entries}: compile={c1:.1f}s "
            f"per={per*1e3:.3f}ms ({n_entries/per/1e6:.1f} MB/s searched)")
    except Exception as e:  # noqa: BLE001
        log(f"match_segment n={n_entries}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    log("devices:", jax.devices())
    t_all = time.time()
    bench_sort(1 << 16, 5, n_keys=2)
    bench_sort(1 << 17, 5, n_keys=2)
    bench_probe(1 << 17)
    bench_match(1 << 17)
    log(f"total {time.time()-t_all:.0f}s")
