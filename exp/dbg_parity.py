"""Debug: find converged-but-wrong device claims in the e2e parity test."""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from smallz4_tpu import format as fmt, native
from smallz4_tpu.ops import chunkmatch
from test_chunkmatch import _mixed_stream, C

data = _mixed_stream(2 * C)
n = len(data)
bs = C
print("data ready", flush=True)

# stepwise per-block emulation of the driver (GROUP=1)
with pltpu.force_tpu_interpret_mode():
    padded = np.zeros(n + 16, np.uint8)
    padded[:n] = np.frombuffer(data, np.uint8)
    halo = chunkmatch.empty_halo(chunk=C)
    lens = np.ones(n, np.int32); dists = np.zeros(n, np.int32)
    conv = np.ones(n, bool)
    for bi, start in enumerate(range(0, n, bs)):
        end = min(start + bs, n)
        blen = end - start
        for j in range(-(-blen // C)):
            cs = start + j * C
            buf = jnp.asarray(padded[cs : cs + C + 16])
            real = min(C, blen - j * C)
            cur = chunkmatch.sort_chunk(buf, jnp.int32(0), jnp.int32(real), chunk=C)
            l, d, cv, _lk = chunkmatch.probe_pair(
                halo, cur, jnp.int32(0), jnp.int32(-1),
                jnp.int32(0), jnp.int32(real),
                jnp.int32(blen - j * C - fmt.BLOCK_END_LITERALS), chunk=C)
            lens[cs : cs + real] = np.asarray(l)[:real]
            dists[cs : cs + real] = np.asarray(d)[:real]
            conv[cs : cs + real] = np.asarray(cv)[:real]
            halo = cur

# driver-path emulation: match_chunks + pack + unpack, compare raw
with pltpu.force_tpu_interpret_mode():
    halo = chunkmatch.empty_halo(chunk=C)
    for bi, start in enumerate(range(0, n, bs)):
        end = min(start + bs, n)
        blen = end - start
        ng = -(-blen // C)
        bufs = np.zeros((ng, C + 16), np.uint8)
        cand = np.zeros(ng, np.int32)
        vhi = np.zeros(ng, np.int32)
        lim = np.zeros(ng, np.int32)
        for j in range(ng):
            cs = start + j * C
            take = max(0, min(C + 16, n - cs))
            bufs[j, :take] = padded[cs : cs + take]
            cand[j] = vhi[j] = max(0, min(C, blen - j * C))
            lim[j] = blen - j * C - fmt.BLOCK_END_LITERALS
        halo, (bits, packed, counts, cbits, _kbits) = chunkmatch.match_chunks(
            halo, jnp.asarray(bufs), jnp.asarray(cand), jnp.asarray(vhi),
            jnp.asarray(lim), jnp.int32(0), jnp.int32(-1),
            n_chunks=ng, head_cap=C, chunk=C)
        bits, packed, counts, cbits = map(np.asarray,
                                          (bits, packed, counts, cbits))
        for j in range(ng):
            o = start + j * C
            w = min(C, blen - j * C)
            l2, d2 = chunkmatch.unpack_results(bits[j], packed[j], chunk=C)
            cv2 = chunkmatch._unpack_bits(cbits[j], C)
            for name, a, b in (("len", l2[:w], lens[o : o + w]),
                               ("dist", d2[:w], dists[o : o + w]),
                               ("conv", cv2[:w], conv[o : o + w])):
                diff = np.flatnonzero(a != b)
                if len(diff):
                    print(f"block {start} chunk {j} {name}: "
                          f"{len(diff)} diffs, first at {diff[0]}: "
                          f"driver={a[diff[0]]} stepwise={b[diff[0]]}",
                          flush=True)

# exact native claims per block
for start in range(0, n, bs):
    end = min(start + bs, n)
    blen = end - start
    nl = np.ones(blen, np.int32); nd = np.zeros(blen, np.int32)
    lo = max(start - fmt.MAX_DISTANCE, 0)
    base = start - lo
    ctx = np.frombuffer(data[lo:end], np.uint8)
    mask = np.ones(blen, bool)
    native.match_refine(ctx, base=base, bs=blen, lookback=base,
                        mask=mask, lens=nl, dists=nd, cut_pos=-1)
    tail = min(fmt.BLOCK_END_NO_MATCH - 1, blen)
    nl[blen - tail:] = 1; nd[blen - tail:] = 0
    dl = lens[start:end].copy(); dd = dists[start:end].copy()
    dl[blen - tail:] = 1; dd[blen - tail:] = 0
    cv = conv[start:end]
    bad = np.flatnonzero(cv & ((dl != nl) | ((dl >= 4) & (dd != nd))))
    print(f"block {start}: {len(bad)} converged-mismatches", flush=True)
    for p in bad[:10]:
        print(f"  p={p} dev=({dl[p]},{dd[p]}) native=({nl[p]},{nd[p]})",
              flush=True)
