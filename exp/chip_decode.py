"""Real-chip decode: device expansion kernel vs host native decode."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from smallz4_tpu import native
from smallz4_tpu.ops import pipeline
from chip_chunk_e2e import corpus


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("devices:", jax.devices(), flush=True)
    data = corpus(mb << 20)
    frame = native.compress(data, 9)

    t0 = time.time()
    out = native.decompress(frame)
    t_host = time.time() - t0
    assert out == data
    print(f"host native decode: {mb/t_host:.0f} MB/s", flush=True)

    t0 = time.time()
    out = pipeline.decompress(frame)
    print(f"device decode first (incl compile): {time.time()-t0:.1f}s",
          flush=True)
    assert out == data
    for r in range(2):
        t0 = time.time()
        out = pipeline.decompress(frame)
        dt = time.time() - t0
        print(f"device decode warm {r}: {dt:.2f}s = {mb/dt:.2f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()
