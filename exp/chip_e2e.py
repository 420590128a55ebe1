"""On-chip end-to-end: the tpu engine with the sorted-neighborhood kernel.

Checks (real chip):
  1. fast mode round-trips + size vs reference -9
  2. parity mode emits the bit-exact reference stream
  3. throughput + per-stage breakdown + convergence fraction
"""
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def make_corpus(n):
    sys.path.insert(0, "/root/repo")
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.make_corpus(n)


def main():
    import jax

    log("devices:", jax.devices())
    from smallz4_tpu import native
    from smallz4_tpu.ops import pipeline
    from smallz4_tpu.utils.profiling import RunReport

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2 * 1024 * 1024
    corpus = make_corpus(n)
    ref = subprocess.run(["/tmp/refbin/smallz4", "-9"], input=corpus,
                         capture_output=True).stdout
    log(f"corpus {n} B, reference -9 size {len(ref)}")

    # warm/compile on a small slice first
    t0 = time.time()
    pipeline.compress(corpus[: 1 << 17], 9, kernel="sort")
    log(f"compile+warm: {time.time()-t0:.1f}s")

    for parity in (False, True):
        rep = RunReport(operation="encode", engine="tpu")
        t0 = time.time()
        frame = pipeline.compress(corpus, 9, kernel="sort", parity=parity,
                                  report=rep)
        dt = time.time() - t0
        ok = native.decompress(frame) == corpus
        exact = frame == ref
        log(f"parity={parity}: {n/dt/1e6:.2f} MB/s size={len(frame)} "
            f"(+{(len(frame)/len(ref)-1)*100:.3f}% vs ref) roundtrip={ok} "
            f"bit_exact={exact}")
        log("  stages:", {k: round(v, 3) for k, v in rep.stages.items()})
        if parity and not exact:
            log("PARITY FAILURE — dumping first divergence")
            for i, (a, b) in enumerate(zip(frame, ref)):
                if a != b:
                    log(f"  first diff at byte {i}: {a:02x} != {b:02x}")
                    break
            return 1
        if not ok:
            return 1

    # convergence fraction on one production segment batch
    from smallz4_tpu.ops import sortmatch
    import jax.numpy as jnp

    SEG_BUF = 133119
    buf = np.zeros((1, SEG_BUF), np.uint8)
    take = min(len(corpus), SEG_BUF)
    buf[0, :take] = np.frombuffer(corpus[:take], np.uint8)
    lens, dists, conv = sortmatch.match_segments(
        jnp.asarray(buf), jnp.asarray([0], np.int32),
        jnp.asarray([take], np.int32), jnp.asarray([False]),
        jnp.asarray([True]))
    conv = np.asarray(conv[0])
    log(f"converged fraction (64 Ki segment): {conv.mean():.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
