"""Real-chip e2e: the chunk engine on the bench-style corpus.

Measures wall time for pipeline.compress(kernel="chunk") fast mode and
parity mode on N MB, verifies the stream against the native decoder, and
prints per-stage times from the profiling report.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from smallz4_tpu import native
from smallz4_tpu.ops import pipeline
from smallz4_tpu.utils.profiling import RunReport


def corpus(n):
    rng = np.random.default_rng(42)
    parts = []
    while sum(map(len, parts)) < n:
        r = rng.random()
        if r < 0.25:
            parts.append(bytes(rng.integers(0, 256, 4096, dtype=np.uint8)))
        elif r < 0.55:
            parts.append(bytes(rng.integers(97, 110, 8192, dtype=np.uint8)))
        elif r < 0.8 and parts:
            parts.append(parts[int(rng.integers(0, len(parts)))])
        else:
            parts.append(bytes([int(rng.integers(0, 256))])
                         * int(rng.integers(50, 5000)))
    return b"".join(parts)[:n]


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print("devices:", jax.devices(), flush=True)
    data = corpus(mb << 20)

    t0 = time.time()
    rep = RunReport(operation="encode", engine="tpu")
    frame = pipeline.compress(data, 9, kernel="chunk", parity=False, report=rep)
    t_first = time.time() - t0
    print(f"fast first-run (incl compile): {t_first:.1f}s", flush=True)
    assert native.decompress(frame) == data
    ref = native.compress(data, 9)
    print(f"ratio: ours={len(frame)} native9={len(ref)} "
          f"(+{(len(frame)-len(ref))/len(ref)*100:.3f}%)", flush=True)

    for run in range(2):
        rep = RunReport(operation="encode", engine="tpu")
        t0 = time.time()
        frame = pipeline.compress(data, 9, kernel="chunk", parity=False, report=rep)
        dt = time.time() - t0
        print(f"fast warm run {run}: {dt:.2f}s = {mb/dt:.2f} MB/s; "
              f"stages={ {k: round(v,2) for k,v in rep.stages.items()} }",
              flush=True)

    t0 = time.time()
    frame_p = pipeline.compress(data, 9, kernel="chunk", parity=True)
    dt = time.time() - t0
    print(f"parity run: {dt:.2f}s = {mb/dt:.2f} MB/s", flush=True)
    assert frame_p == ref, "parity mode must equal native -9"
    print("parity OK", flush=True)


if __name__ == "__main__":
    main()
