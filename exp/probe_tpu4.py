"""Probe 4: the production bitonic sort kernel on the real chip, plus
MXU / multi-word-record re-measures with enough work to clear the ~31 ms
tunnel sync floor.  Delta timing: rate from t(m2) - t(m1) of chained calls.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from smallz4_tpu.ops import sortnet  # noqa: E402


def log(*a):
    print(*a, flush=True)


def timed(fn, args, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best


def chain_sort(m, n, n_payload):
    pay_args = list(range(n_payload))

    @jax.jit
    def f(k, p, *ws):
        ws = list(ws)
        for _ in range(m):
            out = sortnet.sort_records(k, p, *ws)
            k, p, ws = out[0], out[1], list(out[2:])
        return k[:8] + p[:8] + (ws[0][:8] if ws else 0)

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
    p = jnp.asarray(np.arange(n, dtype=np.int32))
    ws = [jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))
          for _ in range(n_payload)]
    return f, (k, p, *ws)


def bench_sort(n, n_payload, m1=1, m2=5):
    try:
        f1, a = chain_sort(m1, n, n_payload)
        f2, _ = chain_sort(m2, n, n_payload)
        t0 = time.time(); np.asarray(f1(*a)); c1 = time.time() - t0
        t0 = time.time(); np.asarray(f2(*a)); c2 = time.time() - t0
        t1, t2 = timed(f1, a), timed(f2, a)
        per = (t2 - t1) / (m2 - m1)
        log(f"sort n={n} payload={n_payload}: compile={c1:.1f}/{c2:.1f}s "
            f"t1={t1*1e3:.2f}ms t2={t2*1e3:.2f}ms  per-sort={per*1e3:.3f}ms "
            f"({n/per/1e6:.1f} M rec/s)")
    except Exception as e:  # noqa: BLE001
        log(f"sort n={n} payload={n_payload}: FAIL {type(e).__name__}: "
            f"{str(e)[:300]}")


def verify_sort_on_chip(n=8192):
    rng = np.random.default_rng(1)
    key = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    pos = np.arange(n, dtype=np.int32)
    k2, p2 = (np.asarray(x) for x in sortnet.sort_records(
        jnp.asarray(key), jnp.asarray(pos)))
    order = np.lexsort((pos, key))
    ok = np.array_equal(np.asarray(k2).astype(np.uint32), key[order]) and \
        np.array_equal(p2, pos[order])
    log(f"on-chip sort correctness n={n}: {'OK' if ok else 'MISMATCH'}")


def main():
    log(f"devices={jax.devices()}")
    verify_sort_on_chip()
    bench_sort(65536, 0)
    bench_sort(65536, 2)
    bench_sort(131072, 2)
    bench_sort(131072, 4)
    bench_sort(262144, 2)

    # MXU with enough reps
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_mxu(reps, K):
        def kernel(a_ref, b_ref, o_ref):
            def body(i, acc):
                return acc + jnp.dot(a_ref[:], b_ref[:],
                                     preferred_element_type=jnp.int32)
            r = jax.lax.fori_loop(0, reps, body,
                                  jnp.zeros((512, 512), jnp.int32))
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(lambda a, b: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b))
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(-2, 2, (512, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-2, 2, (K, 512)), jnp.int8)
        return fn, (a, b)

    for K, r1, r2 in ((512, 256, 2048), (32, 1024, 8192)):
        try:
            f1, a = make_mxu(r1, K)
            f2, _ = make_mxu(r2, K)
            np.asarray(f1(*a)); np.asarray(f2(*a))
            t1, t2 = timed(f1, a), timed(f2, a)
            ops = 512 * K * 512 * 2 * (r2 - r1)
            log(f"MXU int8 512x{K}x512: t1={t1*1e3:.2f}ms t2={t2*1e3:.2f}ms "
                f"{ops/(t2-t1)/1e12:.2f} T ops/s")
        except Exception as e:  # noqa: BLE001
            log(f"MXU K={K} FAIL: {str(e)[:200]}")

    log("probe4 complete")


if __name__ == "__main__":
    main()
