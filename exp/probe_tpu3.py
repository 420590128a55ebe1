"""Probe round 3: real rates with forced synchronization.

On the axon platform block_until_ready returns early (probe2 showed
impossible rates), so every benched function reduces its result to a
scalar on device and the timer fetches it to host — a true data-dependent
sync.  Each kernel runs at two in-kernel repetition counts; the rate comes
from the difference, cancelling dispatch/fetch overhead.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def log(*a):
    print(*a, flush=True)


def timed(fn, args, reps=5):
    vals = []
    for _ in range(reps):
        t0 = time.time()
        v = np.asarray(fn(*args))  # device->host fetch of a tiny array
        vals.append(time.time() - t0)
    return min(vals), v


def bench_pair(name, make, units, units_per_rep, r1=8, r2=64):
    """make(reps) -> jitted fn returning a small array; rate from the delta."""
    try:
        f1, args1 = make(r1)
        f2, args2 = make(r2)
        np.asarray(f1(*args1)); np.asarray(f2(*args2))  # compile both
        t1, _ = timed(f1, args1)
        t2, _ = timed(f2, args2)
        dt = t2 - t1
        if dt <= 0:
            log(f"{name:44s} t({r1})={t1*1e3:8.3f}ms t({r2})={t2*1e3:8.3f}ms  (delta<=0!)")
            return
        rate = units_per_rep * (r2 - r1) / dt / 1e9
        log(f"{name:44s} t({r1})={t1*1e3:8.3f}ms t({r2})={t2*1e3:8.3f}ms  "
            f"{rate:9.3f} G {units}/s")
    except Exception as e:  # noqa: BLE001
        log(f"{name:44s} FAIL {type(e).__name__}: {str(e)[:200]}")


def pcall(kernel, out_shape, n_in):
    return lambda *args: pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(*args)


def main():
    log(f"jax {jax.__version__}  devices={jax.devices()}")

    # sync-fetch floor
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 128), jnp.int32)
    np.asarray(f(x))
    t, _ = timed(f, (x,))
    log(f"{'tiny jit + scalar fetch':44s} {t*1e3:8.3f} ms")

    ROWS = 512  # 64 Ki elements per tile

    def make_dense(reps):
        def kernel(x_ref, o_ref):
            def body(i, v):
                return v * 3 + i
            r = jax.lax.fori_loop(0, reps * 100, body, x_ref[:])
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 1))
        return fn, (jnp.ones((ROWS, LANES), jnp.int32),)

    bench_pair("dense VPU mul-add (64Ki x100)", make_dense, "elemops",
               ROWS * LANES * 100 * 2)

    def make_roll(reps):
        def kernel(x_ref, o_ref):
            def body(i, v):
                w = pltpu.roll(v, 8, 0)
                return jnp.where((v & 1) == 0, jnp.minimum(v, w),
                                 jnp.maximum(v, w))
            r = jax.lax.fori_loop(0, reps * 100, body, x_ref[:])
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 1))
        x = jnp.asarray(np.random.randint(0, 1 << 30, (ROWS, LANES)), jnp.int32)
        return fn, (x,)

    bench_pair("roll(8,ax0)+cmpex (64Ki x100)", make_roll, "CEs",
               ROWS * LANES * 100)

    def make_roll_lane(reps):
        def kernel(x_ref, o_ref):
            def body(i, v):
                w = pltpu.roll(v, 1, 1)
                return jnp.where((v & 1) == 0, jnp.minimum(v, w),
                                 jnp.maximum(v, w))
            r = jax.lax.fori_loop(0, reps * 100, body, x_ref[:])
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 1))
        x = jnp.asarray(np.random.randint(0, 1 << 30, (ROWS, LANES)), jnp.int32)
        return fn, (x,)

    bench_pair("roll(1,ax1)+cmpex (64Ki x100)", make_roll_lane, "CEs",
               ROWS * LANES * 100)

    def make_bigtile_roll(reps):
        R2 = 8192  # 1M elements
        def kernel(x_ref, o_ref):
            def body(i, v):
                w = pltpu.roll(v, 8, 0)
                return jnp.where((v & 1) == 0, jnp.minimum(v, w),
                                 jnp.maximum(v, w))
            r = jax.lax.fori_loop(0, reps * 10, body, x_ref[:])
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 1))
        x = jnp.asarray(np.random.randint(0, 1 << 30, (R2, LANES)), jnp.int32)
        return fn, (x,)

    bench_pair("roll+cmpex (1Mi x10)", make_bigtile_roll, "CEs",
               8192 * LANES * 10)

    def make_lgather(reps):
        def kernel(t_ref, i_ref, o_ref):
            tab = t_ref[:]
            def body(i, acc):
                j = (acc + i) & (LANES - 1)
                return jnp.take_along_axis(tab, j, axis=1)
            r = jax.lax.fori_loop(0, reps * 20, body, i_ref[:])
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 2))
        tab = jnp.asarray(np.random.randint(0, LANES, (ROWS, LANES)), jnp.int32)
        idx = jnp.asarray(np.random.randint(0, LANES, (ROWS, LANES)), jnp.int32)
        return fn, (tab, idx)

    bench_pair("lane gather ax1 (64Ki x20)", make_lgather, "gathers",
               ROWS * LANES * 20)

    def make_sgather8(reps):
        def kernel(t_ref, i_ref, o_ref):
            tab = t_ref[:]
            def body(i, acc):
                j = (acc + i) & 7
                return jnp.take_along_axis(tab, j, axis=0)
            r = jax.lax.fori_loop(0, reps * 20, body, i_ref[:])
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 2))
        tab = jnp.asarray(np.random.randint(0, 8, (8, LANES)), jnp.int32)
        idx = jnp.asarray(np.random.randint(0, 8, (8, LANES)), jnp.int32)
        return fn, (tab, idx)

    bench_pair("sublane gather 1-vreg (1Ki x20)", make_sgather8, "gathers",
               8 * LANES * 20)

    def make_mxu(reps):
        def kernel(a_ref, b_ref, o_ref):
            def body(i, acc):
                return acc + jnp.dot(a_ref[:], b_ref[:],
                                     preferred_element_type=jnp.int32)
            r = jax.lax.fori_loop(0, reps * 4, body,
                                  jnp.zeros((512, 512), jnp.int32))
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 2))
        a = jnp.asarray(np.random.randint(-2, 2, (512, 512)), jnp.int8)
        b = jnp.asarray(np.random.randint(-2, 2, (512, 512)), jnp.int8)
        return fn, (a, b)

    bench_pair("MXU int8 512^3 (x4)", make_mxu, "ops", 4 * 512**3 * 2)

    def make_mxu_thin(reps):
        def kernel(a_ref, b_ref, o_ref):
            def body(i, acc):
                return acc + jnp.dot(a_ref[:], b_ref[:],
                                     preferred_element_type=jnp.int32)
            r = jax.lax.fori_loop(0, reps * 16, body,
                                  jnp.zeros((512, 512), jnp.int32))
            o_ref[:] = jnp.sum(r).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 2))
        a = jnp.asarray(np.random.randint(-1, 2, (512, 32)), jnp.int8)
        b = jnp.asarray(np.random.randint(-1, 2, (32, 512)), jnp.int8)
        return fn, (a, b)

    bench_pair("MXU int8 512x32x512 (x16)", make_mxu_thin, "ops",
               16 * 512 * 32 * 512 * 2)

    # multi-word compare-exchange (sort record: key + 3 payload words)
    def make_record_ce(reps):
        def kernel(k_ref, p0_ref, p1_ref, p2_ref, o_ref):
            def body(i, state):
                k, p0, p1, p2 = state
                k2 = pltpu.roll(k, 8, 0)
                q0 = pltpu.roll(p0, 8, 0)
                q1 = pltpu.roll(p1, 8, 0)
                q2 = pltpu.roll(p2, 8, 0)
                swap = (k > k2) ^ ((i & 1) == 0)
                return (jnp.where(swap, k2, k), jnp.where(swap, q0, p0),
                        jnp.where(swap, q1, p1), jnp.where(swap, q2, p2))
            k, p0, p1, p2 = jax.lax.fori_loop(
                0, reps * 25, body,
                (k_ref[:], p0_ref[:], p1_ref[:], p2_ref[:]))
            o_ref[:] = (jnp.sum(k) + jnp.sum(p0) + jnp.sum(p1) + jnp.sum(p2)).reshape(1, 1)
        fn = jax.jit(pcall(kernel, jax.ShapeDtypeStruct((1, 1), jnp.int32), 4))
        mk = lambda: jnp.asarray(
            np.random.randint(0, 1 << 30, (ROWS, LANES)), jnp.int32)
        return fn, (mk(), mk(), mk(), mk())

    bench_pair("4-word record CE (64Ki x25)", make_record_ce, "recCEs",
               ROWS * LANES * 25)

    log("probe3 complete")


if __name__ == "__main__":
    main()
