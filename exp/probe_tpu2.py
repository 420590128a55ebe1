"""Probe round 2: separate the per-dispatch floor from real compute rates.

Probe 1 showed every pallas_call lands at ~31 ms wall regardless of work
(tiny jit op: 78 us), h2d ~111 MB/s through the tunnel, and the sublane
dynamic-gather lowering crashing the remote compile helper.  This round:
floor measurement, async pipelining, 10x-work scaling runs, real d2h, and
gather variants.
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


def bench(name, fn, args, units, n_units, reps=3):
    try:
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        tc = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        rate = n_units / best / 1e9
        log(f"{name:46s} compile={tc:6.1f}s  best={best*1e3:9.3f}ms  "
            f"{rate:9.3f} G {units}/s")
        return best
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:260]
        log(f"{name:46s} FAIL {type(e).__name__}: {msg}")
        return None


LANES = 128
VMEM = pltpu.VMEM


def pcall(kernel, out_shape, n_in, vmem_mb=100):
    return lambda *args: pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20
        ),
    )(*args)


def main():
    log(f"jax {jax.__version__}  devices={jax.devices()}")

    # --- floor: minimal pallas passthrough ---------------------------------
    def pass_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    x8 = jnp.ones((8, LANES), jnp.int32)
    f_pass = jax.jit(pcall(pass_kernel, jax.ShapeDtypeStruct((8, LANES), jnp.int32), 1))
    bench("pallas passthrough (8,128)", f_pass, (x8,), "calls", 1, reps=5)

    # --- pipelining: 32 un-synced dispatches --------------------------------
    try:
        jax.block_until_ready(f_pass(x8))
        t0 = time.time()
        y = x8
        for _ in range(32):
            y = f_pass(y)
        jax.block_until_ready(y)
        dt = time.time() - t0
        log(f"{'32 chained pallas dispatches':46s} total={dt*1e3:9.3f}ms  per={dt/32*1e3:7.3f}ms")
    except Exception as e:  # noqa: BLE001
        log(f"pipelining probe FAIL: {e}")

    # --- dense scaling: REPS=5120 -------------------------------------------
    def dense_kernel(x_ref, o_ref):
        def body(i, v):
            return v * 3 + i
        o_ref[:] = jax.lax.fori_loop(0, 5120, body, x_ref[:])

    xd = jnp.ones((2048, LANES), jnp.int32)
    f_dense = jax.jit(pcall(dense_kernel, jax.ShapeDtypeStruct((2048, LANES), jnp.int32), 1))
    bench("dense VPU mul-add x5120", f_dense, (xd,), "elemops",
          2048 * LANES * 5120 * 2)

    # --- roll scaling: REPS=1360 --------------------------------------------
    def roll_kernel(x_ref, o_ref):
        def body(i, v):
            w = pltpu.roll(v, 8, 0)
            return jnp.where((v & 1) == 0, jnp.minimum(v, w), jnp.maximum(v, w))
        o_ref[:] = jax.lax.fori_loop(0, 1360, body, x_ref[:])

    xr = jnp.asarray(np.random.randint(0, 1 << 30, (512, LANES)), jnp.int32)
    f_roll = jax.jit(pcall(roll_kernel, jax.ShapeDtypeStruct((512, LANES), jnp.int32), 1))
    bench("roll+cmpex x1360", f_roll, (xr,), "CEs", 512 * LANES * 1360)

    # --- lane gather scaling: REPS=512 ---------------------------------------
    def lgather_kernel(t_ref, i_ref, o_ref):
        tab = t_ref[:]
        def body(i, acc):
            j = (acc + i) & (LANES - 1)
            return jnp.take_along_axis(tab, j, axis=1)
        o_ref[:] = jax.lax.fori_loop(0, 512, body, i_ref[:])

    tab = jnp.asarray(np.random.randint(0, LANES, (512, LANES)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, LANES, (512, LANES)), jnp.int32)
    f_lg = jax.jit(pcall(lgather_kernel, jax.ShapeDtypeStruct((512, LANES), jnp.int32), 2))
    bench("lane gather axis=1 x512", f_lg, (tab, idx), "gathers",
          512 * LANES * 512)

    # --- sublane gather variants ---------------------------------------------
    def sg_kernel_same(t_ref, i_ref, o_ref):
        tab = t_ref[:]
        def body(i, acc):
            j = (acc + i) & 511
            return jnp.take_along_axis(tab, j, axis=0)
        o_ref[:] = jax.lax.fori_loop(0, 64, body, i_ref[:])

    tab5 = jnp.asarray(np.random.randint(0, 512, (512, LANES)), jnp.int32)
    idx5 = jnp.asarray(np.random.randint(0, 512, (512, LANES)), jnp.int32)
    f_sg = jax.jit(pcall(sg_kernel_same, jax.ShapeDtypeStruct((512, LANES), jnp.int32), 2))
    bench("sublane gather same-shape 512 x64", f_sg, (tab5, idx5), "gathers",
          512 * LANES * 64)

    def sg_kernel_tiny(t_ref, i_ref, o_ref):
        tab = t_ref[:]
        def body(i, acc):
            j = (acc + i) & 7
            return jnp.take_along_axis(tab, j, axis=0)
        o_ref[:] = jax.lax.fori_loop(0, 64, body, i_ref[:])

    tab8 = jnp.asarray(np.random.randint(0, 8, (8, LANES)), jnp.int32)
    idx8 = jnp.asarray(np.random.randint(0, 8, (8, LANES)), jnp.int32)
    f_sg8 = jax.jit(pcall(sg_kernel_tiny, jax.ShapeDtypeStruct((8, LANES), jnp.int32), 2))
    bench("sublane gather (8,128) x64", f_sg8, (tab8, idx8), "gathers",
          8 * LANES * 64)

    # one-hot MXU gather: 128 queries from a 2048-row table per step
    def onehot_kernel(t_ref, i_ref, o_ref):
        tab = t_ref[:]  # (2048, 128) f32
        def body(i, acc):
            j = (acc[:, :1].astype(jnp.int32) + i) % 2048  # (128,1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, 2048), 1)
            oh = (rows == j).astype(jnp.float32)  # one-hot (128, 2048)
            return jnp.dot(oh, tab, preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, 64, body, i_ref[:])

    tabf = jnp.asarray(np.random.rand(2048, 128), jnp.float32)
    idxf = jnp.asarray(np.random.rand(128, 128), jnp.float32)
    f_oh = jax.jit(pcall(onehot_kernel, jax.ShapeDtypeStruct((128, 128), jnp.float32), 2))
    bench("one-hot MXU gather 2048-tab x64", f_oh, (tabf, idxf),
          "gathers(rowsof128)", 128 * 64)

    # --- MXU big --------------------------------------------------------------
    def mxu_kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(a_ref[:], b_ref[:],
                                 preferred_element_type=jnp.int32)
        o_ref[:] = jax.lax.fori_loop(0, 128, body,
                                     jnp.zeros((1024, 1024), jnp.int32))

    a = jnp.asarray(np.random.randint(-2, 2, (1024, 1024)), jnp.int8)
    b = jnp.asarray(np.random.randint(-2, 2, (1024, 1024)), jnp.int8)
    f_mxu = jax.jit(pcall(mxu_kernel, jax.ShapeDtypeStruct((1024, 1024), jnp.int32), 2))
    bench("MXU int8 1024^3 x128", f_mxu, (a, b), "ops",
          128 * 1024**3 * 2)

    # --- real d2h: device-computed array ---------------------------------------
    try:
        g = jax.jit(lambda k: jax.random.randint(jax.random.PRNGKey(k), (8 << 20,), 0, 255, jnp.int32).astype(jnp.uint8))
        d = jax.block_until_ready(g(0))
        best = float("inf")
        for k in range(3):
            d = jax.block_until_ready(g(k))
            t0 = time.time()
            h = np.asarray(d)
            best = min(best, time.time() - t0)
        log(f"{'d2h 8MB device-computed':46s} {8/best:9.1f} MB/s")
    except Exception as e:  # noqa: BLE001
        log(f"d2h probe FAIL: {e}")

    # --- h2d async overlap: 8 x 4MB puts dispatched together -------------------
    try:
        xs = [np.random.randint(0, 256, 4 << 20, dtype=np.uint8) for _ in range(8)]
        jax.block_until_ready(jax.device_put(xs[0]))
        t0 = time.time()
        ds = [jax.device_put(h) for h in xs]
        jax.block_until_ready(ds)
        dt = time.time() - t0
        log(f"{'h2d 8x4MB batched':46s} {32/dt:9.1f} MB/s")
    except Exception as e:  # noqa: BLE001
        log(f"h2d batch probe FAIL: {e}")

    # --- XLA (non-pallas) argsort & gather on device for calibration ----------
    key = jax.random.PRNGKey(0)
    xs = jax.random.randint(key, (1 << 20,), 0, 1 << 30, jnp.int32)
    f_sort = jax.jit(lambda v: jnp.argsort(v))
    bench("XLA argsort 1M", f_sort, (xs,), "elems", 1 << 20)
    idxg = jax.random.randint(key, (1 << 22,), 0, 1 << 20, jnp.int32)
    f_take = jax.jit(lambda v, i: v[i])
    bench("XLA flat gather 4M from 1M", f_take, (xs, idxg), "gathers", 1 << 22)

    log("probe2 complete")


if __name__ == "__main__":
    main()
