"""Real-chip probe: unconverged-lane census on the bench corpus.

Runs the chunk matcher over N MB and reports the parity-refine volume and
its causes: truncated (LCP >= verification reach) vs group-overflow
(gram group extends past the +-8 probe window).  Drives VERDICT r2 #5
(cut refine volume).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from smallz4_tpu.ops import chunkmatch as cm


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus10m.bin"
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    data = open(path, "rb").read()[: mb << 20]
    print("devices:", jax.devices(), flush=True)

    CH, G = cm.CHUNK, cm.GROUP
    n_chunks = len(data) // CH
    groups = max(1, n_chunks // G)

    tot = unconv = trunc = over = heads = 0
    halo = cm.empty_halo()
    t_dev = 0.0
    for g in range(groups):
        base = g * G * CH
        arr = np.zeros(G * CH + 16, np.uint8)
        take = min(len(data) - base, len(arr))
        arr[:take] = np.frombuffer(data[base : base + take], np.uint8)
        bufs = jnp.asarray(
            np.stack([arr[j * CH : j * CH + CH + 16] for j in range(G)]))
        cand = jnp.full(G, CH, jnp.int32)
        lim = jnp.asarray(
            [len(data) - base - j * CH - 5 for j in range(G)], jnp.int32)
        t0 = time.time()
        halo, ys = cm.match_chunks(halo, bufs, cand, cand, lim,
                                   jnp.int32(0), jnp.int32(-1))
        bits, packed, n_heads, cbits = jax.block_until_ready(ys)
        t_dev += time.time() - t0
        conv = cm.unpack_bits_rows(np.asarray(cbits), CH)
        lens, dists = cm.unpack_rows(np.asarray(bits), np.asarray(packed))
        tot += conv.size
        unconv += (~conv).sum()
        trunc += ((~conv) & (lens >= cm.EXT_REACH)).sum()
        over += ((~conv) & (lens < cm.EXT_REACH)).sum()
        heads += int(np.asarray(n_heads).sum())
        print(f"group {g}: unconv={(~conv).mean()*100:.2f}% "
              f"heads/chunk={np.asarray(n_heads).mean():.0f}", flush=True)
    print(f"\ntotal positions {tot}")
    print(f"unconverged: {unconv} ({unconv/tot*100:.2f}%)")
    print(f"  truncated (len >= {cm.EXT_REACH}): {trunc} "
          f"({trunc/tot*100:.2f}%)")
    print(f"  group-overflow only: {over} ({over/tot*100:.2f}%)")
    print(f"heads: {heads} ({heads/tot*100:.2f}% of positions)")
    print(f"device wall {t_dev:.2f}s = {tot/t_dev/1e6:.1f} MB/s "
          f"(incl fetch)")


if __name__ == "__main__":
    main()
