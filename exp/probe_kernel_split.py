"""Per-component timing of the chunk engine on the real chip.

Times sort_chunk, merge_sorted, probe kernel, compact, unsort, chain and
pack separately (block_until_ready between reps) to direct kernel work
(VERDICT r2 #3: device match rate toward 400+ MB/s).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from smallz4_tpu.ops import chunkmatch as cm
from smallz4_tpu.ops import sortnet


def bench(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:24s} {dt*1e3:8.3f} ms  ({cm.CHUNK/dt/1e6:7.1f} MB/s per chunk)",
          flush=True)
    return out, dt


def main():
    print("devices:", jax.devices(), flush=True)
    CH = cm.CHUNK
    data = open("/tmp/corpus_bench.bin", "rb").read()[: 2 * CH + 16]
    arr = np.frombuffer(data, np.uint8)
    buf0 = jnp.asarray(np.ascontiguousarray(arr[: CH + 16]))
    buf1 = jnp.asarray(np.ascontiguousarray(arr[CH : 2 * CH + 16]))

    halo, t_sort = bench("sort_chunk", cm.sort_chunk, buf0, jnp.int32(0),
                         jnp.int32(CH))
    cur, _ = bench("sort_chunk(2)", cm.sort_chunk, buf1, jnp.int32(0),
                   jnp.int32(CH))

    @jax.jit
    def merged(halo, cur):
        cur_combo = (cur[1].view(jnp.int32) + CH).view(jnp.uint32)
        planes = [jnp.concatenate([h, c]) for h, c in
                  zip(halo, (cur[0], cur_combo, cur[2], cur[3]))]
        return sortnet.merge_sorted(*planes, n_keys=2)

    m, t_merge = bench("merge_sorted", merged, halo, cur)

    import functools
    from jax.experimental import pallas as pl

    @jax.jit
    def probe(m_k1, m_combo, m_e1, m_e2):
        cut = jnp.stack([jnp.int32(0), jnp.int32(-1)]).reshape(1, 2)
        return cm._pallas_planes(
            functools.partial(cm._probe_kernel, CH),
            [m_k1.view(jnp.int32), m_combo.view(jnp.int32), m_e1, m_e2],
            2, scalars=cut)

    (p_pay, p_key), t_probe = bench("probe", probe, *m)

    @jax.jit
    def compact(p_key, p_pay):
        ck, cp = cm._pallas_planes(
            functools.partial(cm._compact_kernel, CH), [p_key, p_pay], 2)
        return ck[:CH], cp[:CH]

    (c_key, c_pay), t_compact = bench("compact", compact, p_key, p_pay)

    @jax.jit
    def unsort(c_key, c_pay):
        return sortnet.sort_records(c_key.view(jnp.uint32), c_pay, n_keys=1)

    (s_key, s_pay), t_unsort = bench("unsort", unsort, c_key, c_pay)

    @jax.jit
    def full(halo, buf):
        cur = cm.sort_chunk(buf, jnp.int32(0), jnp.int32(CH))
        lens, dists, conv, _lk = cm.probe_pair(
            halo, cur, jnp.int32(0), jnp.int32(-1), jnp.int32(0),
            jnp.int32(CH), jnp.int32(2 * CH))
        return cur, lens, dists, conv

    _, t_full = bench("probe_pair+sort (full)", full, halo, buf1)

    @jax.jit
    def full_pack(halo, buf):
        cur = cm.sort_chunk(buf, jnp.int32(0), jnp.int32(CH))
        lens, dists, conv, _lk = cm.probe_pair(
            halo, cur, jnp.int32(0), jnp.int32(-1), jnp.int32(0),
            jnp.int32(CH), jnp.int32(2 * CH))
        return cur, cm.pack_results(lens, dists, conv, _lk)

    _, t_fp = bench("full + pack", full_pack, halo, buf1)
    print(f"\ncomponents: sort {t_sort*1e3:.3f} merge {t_merge*1e3:.3f} "
          f"probe {t_probe*1e3:.3f} compact {t_compact*1e3:.3f} "
          f"unsort {t_unsort*1e3:.3f}")
    print(f"sum {1e3*(t_sort+t_merge+t_probe+t_compact+t_unsort):.3f} ms vs "
          f"fused full {t_full*1e3:.3f} ms, +pack {t_fp*1e3:.3f} ms")


if __name__ == "__main__":
    main()
