"""Diagnose induction-certificate coverage on real chunks.

Fetches (lens, dists, conv) straight from probe_pair for a few chunks of
a corpus and measures on the host: chain_ok density, seed density, what
certified lanes look like after ideal propagation, and what blocks the
rest (broken chains / unconverged tails / distance switches).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from smallz4_tpu import format as fmt
from smallz4_tpu.ops import chunkmatch as cm


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus_bench.bin"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    data = open(path, "rb").read()[: (n_chunks + 1) * cm.CHUNK + 16]
    arr = np.frombuffer(data, np.uint8)
    CH = cm.CHUNK
    halo = cm.empty_halo()
    stats = []
    for ci in range(n_chunks):
        s = ci * CH
        buf = np.zeros(CH + 16, np.uint8)
        take = min(CH + 16, len(arr) - s)
        buf[:take] = arr[s : s + take]
        cur = cm.sort_chunk(jnp.asarray(buf), jnp.int32(0), jnp.int32(CH))
        lens, dists, conv, _lk = jax.block_until_ready(cm.probe_pair(
            halo, cur, jnp.int32(0), jnp.int32(-1), jnp.int32(0),
            jnp.int32(CH), jnp.int32(len(arr) - s - 5)))
        halo = cur
        l = np.asarray(lens).astype(np.int64)
        d = np.asarray(dists).astype(np.int64)
        cv = np.asarray(conv)
        pos = np.arange(CH)
        cap = np.maximum(len(arr) - s - 5 - pos, 0)
        match = l >= 4
        nb_l = np.concatenate([l[1:], [0]])
        nb_d = np.concatenate([d[1:], [0]])
        chain_ok = match & (l >= 5) & (l < cap) & (nb_l == l - 1) & (nb_d == d)
        # ideal backward propagation on host
        c = cv.copy()
        for p in range(CH - 2, -1, -1):
            if chain_ok[p] and c[p + 1]:
                c[p] = True
        stats.append((cv.mean(), c.mean(), chain_ok.mean(), match.mean(),
                      (l >= 12).mean()))
        # why do unconverged-with-long-len lanes fail?
        un = ~c & (l >= 12)
        brk = un & ~chain_ok      # chain breaks right here
        tailblock = un & chain_ok # chain continues but never reaches conv
        print(f"chunk {ci}: conv {cv.mean()*100:.1f}% -> {c.mean()*100:.1f}% "
              f"(chain_ok {chain_ok.mean()*100:.1f}%, match {match.mean()*100:.1f}%, "
              f"len>=12 {(l>=12).mean()*100:.1f}%)")
        print(f"  unconv&len>=12: {un.mean()*100:.1f}%  broken-here "
              f"{brk.mean()*100:.1f}%  chained-but-unreached "
              f"{tailblock.mean()*100:.1f}%")
        # among break points: what does the next lane hold?
        bp = np.nonzero(brk)[0]
        bp = bp[bp < CH - 1]
        if len(bp):
            nl, nd = nb_l[bp], nb_d[bp]
            same_d_wrong_l = (nd == d[bp]) & (nl != l[bp] - 1)
            diff_d = nd != d[bp]
            atcap = l[bp] >= cap[bp]
            print(f"  breaks: next-diff-dist {diff_d.mean()*100:.0f}%  "
                  f"same-dist-wrong-len {same_d_wrong_l.mean()*100:.0f}%  "
                  f"at-cap {atcap.mean()*100:.0f}%")
            # distribution of (l, nl) at diff-dist breaks
            k = bp[diff_d][:8]
            print("  sample diff-dist breaks (p, l, d, next_l, next_d):",
                  [(int(p), int(l[p]), int(d[p]), int(nb_l[p]), int(nb_d[p]))
                   for p in k])


if __name__ == "__main__":
    main()
