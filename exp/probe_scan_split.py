"""Stage costs of the chunk engine measured INSIDE a fused lax.scan.

Lone pallas_call dispatches through the dev tunnel cost ~1.4 ms of
round-trip latency each, flooring any individual-kernel measurement
(exp/probe_kernel_split.py is useless in that weather).  Here every
variant runs as a 64-iteration device-resident scan — one dispatch per
measurement — so differences between variants are pure kernel time.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from smallz4_tpu import format as fmt
from smallz4_tpu.ops import chunkmatch as cm
from smallz4_tpu.ops import sortnet

CH = cm.CHUNK
G = 64


def bench(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps / G
    print(f"{name:24s} {dt*1e3:7.3f} ms/chunk ({CH/dt/1e6:7.1f} MB/s)",
          flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    data = open("/tmp/corpus10m.bin", "rb").read()[: G * CH + 16]
    arr = np.zeros(G * CH + 16, np.uint8)
    arr[: len(data)] = np.frombuffer(data, np.uint8)
    bufs = jnp.asarray(np.stack([arr[j*CH : j*CH + CH + 16] for j in range(G)]))
    cand = jnp.full(G, CH, jnp.int32)
    lim = jnp.asarray([G*CH - j*CH - 5 for j in range(G)], jnp.int32)
    halo = cm.empty_halo()

    # 1. sort only
    @jax.jit
    def scan_sort(halo, bufs):
        def step(carry, buf):
            cur = cm.sort_chunk(buf, jnp.int32(0), jnp.int32(CH))
            return cur, cur[0][0]
        return jax.lax.scan(step, halo, bufs)

    t_sort = bench("sort", scan_sort, halo, bufs)

    # 2. sort + merge
    @jax.jit
    def scan_merge(halo, bufs):
        def step(carry, buf):
            cur = cm.sort_chunk(buf, jnp.int32(0), jnp.int32(CH))
            cur_combo = (cur[1].view(jnp.int32) + CH).view(jnp.uint32)
            planes = [jnp.concatenate([h, c]) for h, c in
                      zip(carry, (cur[0], cur_combo, cur[2], cur[3]))]
            m = sortnet.merge_sorted(*planes, n_keys=2)
            return cur, m[0][0]
        return jax.lax.scan(step, halo, bufs)

    t_merge = bench("sort+merge", scan_merge, halo, bufs)

    # 3. sort + merge + probe kernel
    @jax.jit
    def scan_probe(halo, bufs):
        def step(carry, buf):
            cur = cm.sort_chunk(buf, jnp.int32(0), jnp.int32(CH))
            cur_combo = (cur[1].view(jnp.int32) + CH).view(jnp.uint32)
            planes = [jnp.concatenate([h, c]) for h, c in
                      zip(carry, (cur[0], cur_combo, cur[2], cur[3]))]
            m_k1, m_combo, m_e1, m_e2 = sortnet.merge_sorted(*planes, n_keys=2)
            cut = jnp.stack([jnp.int32(0), jnp.int32(-1)]).reshape(1, 2)
            p_pay, p_key = cm._pallas_planes(
                functools.partial(cm._probe_kernel, CH),
                [m_k1.view(jnp.int32), m_combo.view(jnp.int32), m_e1, m_e2],
                2, scalars=cut)
            return cur, p_pay[0]
        return jax.lax.scan(step, halo, bufs)

    t_probe = bench("sort+merge+probe", scan_probe, halo, bufs)

    # 4. full probe_pair (adds compact + unsort + chain)
    @jax.jit
    def scan_full(halo, bufs, lims):
        def step(carry, xs):
            buf, ml = xs
            cur = cm.sort_chunk(buf, jnp.int32(0), jnp.int32(CH))
            lens, dists, conv, _lk = cm.probe_pair(
                carry, cur, jnp.int32(0), jnp.int32(-1), jnp.int32(0),
                jnp.int32(CH), ml)
            return cur, lens[0]
        return jax.lax.scan(step, halo, (bufs, lim))

    t_full = bench("probe_pair full", scan_full, halo, bufs, lim)

    # 5. + pack (= production match_chunks)
    @jax.jit
    def scan_pack(halo, bufs, cand, lims):
        return cm.match_chunks(halo, bufs, cand, cand, lims,
                               jnp.int32(0), jnp.int32(-1))

    t_all = bench("match_chunks (prod)", scan_pack, halo, bufs, cand, lim)

    print(f"\nderived: sort {t_sort*1e3:.3f}  merge {(t_merge-t_sort)*1e3:.3f}"
          f"  probe {(t_probe-t_merge)*1e3:.3f}"
          f"  compact+unsort+chain {(t_full-t_probe)*1e3:.3f}"
          f"  pack {(t_all-t_full)*1e3:.3f}  (ms/chunk)")


if __name__ == "__main__":
    main()
