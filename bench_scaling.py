"""Scaling-efficiency report for the sharded encode step (north-star
reporting: GB/s at 1..N devices and parallel efficiency).

Runs the device-mesh match step on 1, 2, 4, ... devices over the same
total work and reports throughput plus efficiency vs the 1-device run.
On a multi-chip TPU slice this measures ICI scaling; on a single-chip or
CPU environment it exercises the virtual mesh (host-core scaling), which
validates the collective program rather than the fabric.

Prints one JSON line per mesh size (stdout); details on stderr.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# default: the 8-device virtual CPU mesh (validates the collective
# program); set SMALLZ4_TPU_SCALING_REAL=1 to measure a real multi-chip
# slice over ICI.  The config update must precede any backend use.
if not os.environ.get("SMALLZ4_TPU_SCALING_REAL"):
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    # the env var too: utils.jaxcfg keys the persistent compile cache on it
    # (CPU AOT artifacts must not land in the axon cache dir and vice versa)
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from smallz4_tpu.parallel import sharding  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _mixed_corpus(n: int) -> bytes:
    """Same mix as bench.py (text / structured / binary / runs)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.make_corpus(n)


def main() -> int:
    devs = jax.devices()
    log(f"devices: {devs}")
    if devs and devs[0].platform == "cpu":
        log("NOTE: virtual CPU mesh — efficiency here reflects host-core "
            "oversubscription, not the ICI fabric; it validates the "
            "collective program, not multi-chip scaling")
    block_size = int(os.environ.get("SMALLZ4_TPU_SCALING_BLOCK", str(1 << 20)))
    per_dev_blocks = 2
    rng = np.random.default_rng(0)
    maxdev = len(devs)
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= maxdev]
    base_mbps = None
    for nd in sizes:
        batch = nd * per_dev_blocks
        blocks = rng.integers(0, 256, (batch, block_size), dtype=np.uint8)
        blocks[:, : block_size // 2] = 65  # compressible half
        lengths = np.full(batch, block_size, np.int32)
        mesh = sharding.make_mesh(nd)
        step = sharding.sharded_match_step(mesh, block_size, max_candidates=8)
        args = (jnp.asarray(blocks), jnp.asarray(lengths), jnp.int32(0))
        jax.device_get(step(*args))  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = step(*args)
        jax.device_get(out)
        dt = (time.time() - t0) / reps
        mbps = batch * block_size / dt / 1e6
        if base_mbps is None:
            base_mbps = mbps / nd
        eff = mbps / (base_mbps * nd)
        log(f"n={nd}: {dt*1000:.0f} ms for {batch} blocks -> {mbps:.1f} MB/s "
            f"(efficiency {eff*100:.0f}%)")
        print(json.dumps({
            "metric": f"sharded_match_step_{nd}dev",
            "value": round(mbps, 2),
            "unit": "MB/s",
            "vs_baseline": round(eff, 3),
        }))

    # PRODUCTION chunk kernel shard_map'd over the mesh (per-device fused
    # scans + raw-byte halo ppermute, parallel/sharding.sharded_chunk_step).
    # On the virtual CPU mesh the Mosaic kernels run in interpret mode at
    # a reduced chunk size — this validates the collective program; real
    # multi-chip numbers need SMALLZ4_TPU_SCALING_REAL on a slice.
    from smallz4_tpu.ops import chunkmatch as cm

    on_tpu = bool(devs) and "tpu" in str(devs[0]).lower()
    if on_tpu:
        chunk_ctx, CH, n_local = None, cm.CHUNK, 4
        chunk_sizes = sizes
    else:
        # interpret mode executes kernel bodies serially in Python — any
        # timing would measure the interpreter, not the collectives.  One
        # 2-device run validates that the sharded chunk program compiles
        # and executes; per-size JSON comes from real slices only.
        from jax.experimental.pallas import tpu as pltpu

        chunk_ctx, CH, n_local = pltpu.force_tpu_interpret_mode, 1024, 2
        chunk_sizes = [n for n in (2,) if n <= maxdev]
        log("chunk step: virtual CPU mesh -> validate-only (interpret "
            "mode; no timing JSON)")
    base_ck = None
    for nd in chunk_sizes:
        B = nd * n_local
        rng_c = np.random.default_rng(1)
        bufs = rng_c.integers(0, 256, (B, CH + cm.LOOK), dtype=np.uint8)
        bufs[:, : CH // 2] = 65
        cand = np.full(B, CH, np.int32)
        lim = np.asarray([(B - j) * CH - 5 for j in range(B)], np.int32)
        cuts_g = np.zeros(B, np.int32)
        cuts_p = np.full(B, -1, np.int32)
        halo0 = np.zeros(CH + cm.LOOK, np.uint8)
        mesh = sharding.make_mesh(nd)
        import contextlib

        with (chunk_ctx() if chunk_ctx else contextlib.nullcontext()):
            step = sharding.sharded_chunk_step(mesh, n_local, chunk=CH,
                                               head_cap=CH)
            args = tuple(jnp.asarray(a) for a in
                         (bufs, cand, cand, lim, cuts_g, cuts_p)) + (
                jnp.asarray(halo0), jnp.int32(CH))
            jax.device_get(step(*args))  # compile + warm
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = step(*args)
            jax.device_get(out)
        dt = (time.time() - t0) / reps
        mbps = B * CH / dt / 1e6
        if not on_tpu:
            log(f"chunk n={nd}: sharded chunk program ok "
                f"({dt*1000:.0f} ms interpreted)")
            continue
        if base_ck is None:
            base_ck = mbps / nd
        eff = mbps / (base_ck * nd)
        log(f"chunk n={nd}: {dt*1000:.0f} ms for {B} chunks -> {mbps:.1f} "
            f"MB/s (efficiency {eff*100:.0f}%)")
        print(json.dumps({
            "metric": f"sharded_chunk_step_{nd}dev",
            "value": round(mbps, 2),
            "unit": "MB/s",
            "vs_baseline": round(eff, 3),
        }))

    # end-to-end: full compress_sharded (device match + host refine/DP/emit
    # + ordered frame assembly), constant per-device work, verified output
    from smallz4_tpu import native

    base_e2e = None
    for nd in sizes:
        n_bytes = nd * per_dev_blocks * block_size
        corpus = _mixed_corpus(n_bytes)
        mesh = sharding.make_mesh(nd)
        frame = sharding.compress_sharded(corpus, mesh, block_size=block_size,
                                          max_candidates=8)  # compile + warm
        assert native.decompress(frame) == corpus
        t0 = time.time()
        frame = sharding.compress_sharded(corpus, mesh, block_size=block_size,
                                          max_candidates=8)
        dt = time.time() - t0
        mbps = n_bytes / dt / 1e6
        if base_e2e is None:
            base_e2e = mbps / nd
        eff = mbps / (base_e2e * nd)
        log(f"e2e n={nd}: {dt*1000:.0f} ms for {n_bytes/1e6:.0f} MB -> "
            f"{mbps:.1f} MB/s (efficiency {eff*100:.0f}%)")
        print(json.dumps({
            "metric": f"compress_sharded_e2e_{nd}dev",
            "value": round(mbps, 2),
            "unit": "MB/s",
            "vs_baseline": round(eff, 3),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
