"""TPU hardware probe for the device-matcher architecture decision.

Measures, on the real chip, the primitives every candidate design depends
on: per-lane (sublane) dynamic gather at several table sizes, lane-axis
gather, dense VPU rate, pltpu.roll (sort-stage building block), MXU int8
matmul, scalar chained loads, host<->device transfer bandwidth through the
tunnel, and VMEM capacity.  Prints one line per probe, incrementally.

Run: python exp/probe_tpu.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def bench(name, build, units, n_units, reps=3):
    """build() -> (fn, args).  Times compile and best-of-reps execution."""
    try:
        fn, args = build()
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        tc = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        rate = n_units / best / 1e9
        log(f"{name:42s} compile={tc:7.1f}s  best={best*1e3:9.3f}ms  "
            f"{rate:9.3f} G {units}/s")
        return best
    except Exception as e:  # noqa: BLE001 - probe must survive any failure
        msg = str(e).replace("\n", " | ")[:300]
        log(f"{name:42s} FAIL {type(e).__name__}: {msg}")
        return None


LANES = 128


# --- probe 0: VMEM capacity ------------------------------------------------

def vmem_probe(mb):
    rows = mb * 1024 * 1024 // (LANES * 4)

    def kernel(x_ref, out_ref, scratch):
        scratch[0:8, :] = x_ref[:]
        out_ref[:] = scratch[0:8, :] + scratch[rows - 8 : rows, :]

    def build():
        x = jnp.ones((8, LANES), jnp.int32)
        fn = jax.jit(
            lambda x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=134217728
                ),
            )(x)
        )
        return fn, (x,)

    return bench(f"vmem scratch {mb} MB", build, "calls", 1, reps=1)


# --- probe 1: sublane dynamic gather --------------------------------------

def gather_sublane(R, OUT_ROWS=512, REPS=32, dtype=jnp.int32):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(i, acc):
            j = (acc + i) & (R - 1)
            return jnp.take_along_axis(tab, j, axis=0)

        out_ref[:] = jax.lax.fori_loop(0, REPS, body, idx_ref[:])

    def build():
        tab = jnp.asarray(
            np.random.randint(0, R, (R, LANES)), dtype
        )
        idx = jnp.asarray(
            np.random.randint(0, R, (OUT_ROWS, LANES)), dtype
        )
        fn = jax.jit(
            lambda t, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((OUT_ROWS, LANES), dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=134217728
                ),
            )(t, i)
        )
        return fn, (tab, idx)

    n = OUT_ROWS * LANES * REPS
    return bench(
        f"sublane gather R={R} ({R*LANES*4>>20} MB tab)", build, "gathers", n
    )


# --- probe 2: lane-axis gather ---------------------------------------------

def gather_lane(REPS=32):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(i, acc):
            j = (acc + i) & (LANES - 1)
            return jnp.take_along_axis(tab, j, axis=1)

        out_ref[:] = jax.lax.fori_loop(0, REPS, body, idx_ref[:])

    def build():
        tab = jnp.asarray(np.random.randint(0, LANES, (512, LANES)), jnp.int32)
        idx = jnp.asarray(np.random.randint(0, LANES, (512, LANES)), jnp.int32)
        fn = jax.jit(
            lambda t, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((512, LANES), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)
        )
        return fn, (tab, idx)

    n = 512 * LANES * REPS
    return bench("lane gather axis=1", build, "gathers", n)


# --- probe 3: dense VPU ------------------------------------------------------

def dense(REPS=512, ROWS=2048):
    def kernel(x_ref, out_ref):
        def body(i, v):
            return v * 3 + i

        out_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    def build():
        x = jnp.ones((ROWS, LANES), jnp.int32)
        fn = jax.jit(
            lambda x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        )
        return fn, (x,)

    n = ROWS * LANES * REPS * 2
    return bench("dense VPU mul-add", build, "elemops", n)


# --- probe 4: roll (sort-stage building block) -------------------------------

def roll_stage(REPS=136, ROWS=512, axis=0):
    def kernel(x_ref, out_ref):
        def body(i, v):
            w = pltpu.roll(v, 8, axis)
            lo = jnp.minimum(v, w)
            hi = jnp.maximum(v, w)
            return jnp.where((v & 1) == 0, lo, hi)

        out_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    def build():
        x = jnp.asarray(np.random.randint(0, 1 << 30, (ROWS, LANES)), jnp.int32)
        fn = jax.jit(
            lambda x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        )
        return fn, (x,)

    n = ROWS * LANES * REPS
    return bench(f"roll+cmpex axis={axis} (sort stage)", build, "CEs", n)


# --- probe 5: MXU int8 -------------------------------------------------------

def mxu_int8(REPS=64, M=512, K=512, N=512):
    def kernel(a_ref, b_ref, out_ref):
        def body(i, acc):
            return acc + jnp.dot(
                a_ref[:], b_ref[:], preferred_element_type=jnp.int32
            )

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((M, N), jnp.int32)
        )

    def build():
        a = jnp.asarray(np.random.randint(-2, 2, (M, K)), jnp.int8)
        b = jnp.asarray(np.random.randint(-2, 2, (K, N)), jnp.int8)
        fn = jax.jit(
            lambda a, b: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)
        )
        return fn, (a, b)

    n = REPS * M * K * N * 2
    return bench(f"MXU int8 {M}x{K}x{N}", build, "ops", n)


def mxu_thin_k(REPS=256, M=128, K=32, N=128):
    """K=32 thin matmul — the self-correlation matcher's shape."""
    def kernel(a_ref, b_ref, out_ref):
        def body(i, acc):
            return acc + jnp.dot(
                a_ref[:], b_ref[:], preferred_element_type=jnp.int32
            )

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((M, N), jnp.int32)
        )

    def build():
        a = jnp.asarray(np.random.randint(-1, 2, (M, K)), jnp.int8)
        b = jnp.asarray(np.random.randint(-1, 2, (K, N)), jnp.int8)
        fn = jax.jit(
            lambda a, b: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, b)
        )
        return fn, (a, b)

    n = REPS * M * K * N * 2
    return bench(f"MXU int8 thin {M}x{K}x{N}", build, "ops", n)


# --- probe 6: scalar chained SMEM loads --------------------------------------

def scalar_chain(REPS=4096, R=1024):
    def kernel(tab_ref, out_ref):
        def body(i, s):
            return tab_ref[s & (R - 1)]

        out_ref[0] = jax.lax.fori_loop(0, REPS, body, jnp.int32(1))

    def build():
        tab = jnp.asarray(np.random.randint(0, R, (R,)), jnp.int32)
        fn = jax.jit(
            lambda t: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(t)
        )
        return fn, (tab,)

    return bench("scalar chained SMEM load", build, "loads", REPS)


# --- probe 7: transfer bandwidth ---------------------------------------------

def transfers(mb=8):
    x = np.random.randint(0, 256, mb << 20, dtype=np.uint8)
    try:
        t0 = time.time()
        d = jax.block_until_ready(jax.device_put(x))
        t_first = time.time() - t0
        best_h2d = float("inf")
        for _ in range(3):
            t0 = time.time()
            d = jax.block_until_ready(jax.device_put(x))
            best_h2d = min(best_h2d, time.time() - t0)
        best_d2h = float("inf")
        for _ in range(3):
            t0 = time.time()
            _ = np.asarray(d)
            best_d2h = min(best_d2h, time.time() - t0)
        log(f"{'h2d/d2h %d MB' % mb:42s} first={t_first:6.2f}s  "
            f"h2d={mb/best_h2d:8.1f} MB/s  d2h={mb/best_d2h:8.1f} MB/s")
    except Exception as e:  # noqa: BLE001
        log(f"transfer probe FAIL: {e}")


# --- probe 8: dispatch latency ------------------------------------------------

def dispatch_latency():
    f = jax.jit(lambda x: x + 1)
    x = jnp.ones((8, 128), jnp.int32)
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(10):
        t0 = time.time()
        jax.block_until_ready(f(x))
        best = min(best, time.time() - t0)
    log(f"{'tiny-op dispatch+sync latency':42s} {best*1e3:9.3f} ms")


def main():
    log(f"jax {jax.__version__}  devices={jax.devices()}")
    dispatch_latency()
    transfers(8)
    dense()
    vmem_probe(16)
    vmem_probe(32)
    vmem_probe(64)
    vmem_probe(100)
    gather_sublane(512)
    gather_sublane(4096)
    gather_sublane(16384)
    gather_sublane(32768)
    gather_lane()
    roll_stage(axis=0)
    roll_stage(axis=1)
    mxu_int8()
    mxu_thin_k()
    scalar_chain()
    log("probe complete")


if __name__ == "__main__":
    main()
