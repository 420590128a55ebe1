"""Probe: chunkmatch production kernels on the real chip.

Times sort_chunk and probe_pair at CHUNK=2^16 with honest sync (tiny
result fetch forces completion on the async axon backend) and the delta
method for per-op cost.  Also sanity-checks claims on real text.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from smallz4_tpu.ops import chunkmatch  # noqa: E402

C = chunkmatch.CHUNK


def log(*a):
    print(*a, flush=True)


def sync(x):
    return np.asarray(jax.device_get(x))


def main():
    log("devices:", jax.devices())
    data = open("/root/reference/smallz4.h", "rb").read() * 100
    buf = np.frombuffer(data[: C + 16], np.uint8)
    buf2 = np.frombuffer(data[C : 2 * C + 16], np.uint8)

    t0 = time.time()
    d1 = jax.device_put(buf)
    d2 = jax.device_put(buf2)
    s1 = chunkmatch.sort_chunk(d1, jnp.int32(0), jnp.int32(C))
    _ = sync(s1[0][:4])
    log(f"sort_chunk compile+first: {time.time()-t0:.1f}s")

    # chained sorts: m sorts of the same chunk (device-resident), delta
    def chain_sort(m):
        @jax.jit
        def f(b):
            acc = jnp.int32(0)
            for i in range(m):
                planes = chunkmatch.sort_chunk(b, jnp.int32(i % 3), jnp.int32(C))
                acc = acc + planes[1].view(jnp.int32)[0]
            return acc
        return f

    f1, f2 = chain_sort(1), chain_sort(9)
    t0 = time.time(); _ = sync(f1(d1)); log(f"chain1 compile: {time.time()-t0:.1f}s")
    t0 = time.time(); _ = sync(f2(d1)); log(f"chain3 compile: {time.time()-t0:.1f}s")
    def best(f, a, reps=4):
        b = 1e9
        for _ in range(reps):
            t0 = time.time(); _ = sync(f(a)); b = min(b, time.time()-t0)
        return b
    t1, t2 = best(f1, d1), best(f2, d1)
    per_sort = (t2 - t1) / 8
    log(f"sort_chunk: {per_sort*1e3:.3f} ms ({C/per_sort/1e6:.1f} M rec/s)")

    # probe_pair chained
    s2 = chunkmatch.sort_chunk(d2, jnp.int32(0), jnp.int32(C))
    def chain_probe(m):
        @jax.jit
        def f(h0, h1, h2, h3, c0, c1, c2, c3):
            halo, cur = (h0, h1, h2, h3), (c0, c1, c2, c3)
            acc = jnp.int32(0)
            for i in range(m):
                lens, dists, conv, _lk = chunkmatch.probe_pair(
                    halo, cur, jnp.int32(0), jnp.int32(-1),
                    jnp.int32(i % 2), jnp.int32(C - 11), jnp.int32(C - 5))
                acc = acc + lens.astype(jnp.int32)[0]
            return acc, lens, dists, conv
        return f
    g1, g2 = chain_probe(1), chain_probe(7)
    t0 = time.time(); r = g1(*s1, *s2); _ = sync(r[0]); log(f"probe compile: {time.time()-t0:.1f}s")
    t0 = time.time(); _ = sync(g2(*s1, *s2)[0]); log(f"probe3 compile: {time.time()-t0:.1f}s")
    def bestp(f, reps=4):
        b = 1e9
        for _ in range(reps):
            t0 = time.time(); _ = sync(f(*s1, *s2)[0]); b = min(b, time.time()-t0)
        return b
    t1, t2 = bestp(g1), bestp(g2)
    per_probe = (t2 - t1) / 6
    log(f"probe_pair: {per_probe*1e3:.3f} ms")
    per_chunk = per_sort + per_probe
    log(f"total per chunk: {per_chunk*1e3:.3f} ms -> "
        f"{C/per_chunk/1e6:.1f} MB/s device-resident match rate")

    # correctness spot-check on real text (claims byte-verified)
    lens, dists, conv = (np.asarray(jax.device_get(x)) for x in
                         (r[1], r[2], r[3]))
    arr = np.frombuffer(data[: 2 * C + 16], np.uint8)
    bad = 0
    idx = np.flatnonzero(lens >= 4)
    for p in idx[:: max(1, len(idx) // 4000)]:
        l, d = int(lens[p]), int(dists[p])
        gp = C + p
        if not (arr[gp - d : gp - d + l] == arr[gp : gp + l]).all():
            bad += 1
    log(f"claims checked: {len(idx[::max(1,len(idx)//4000)])} bad={bad} "
        f"conv_frac={conv.mean():.3f} match_frac={(lens>=4).mean():.3f} "
        f"mean_len={lens[lens>=4].mean():.1f}")


if __name__ == "__main__":
    main()
