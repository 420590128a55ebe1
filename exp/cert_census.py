"""Certificate-miss census: numpy port of the probe/cert semantics.

Replays ops/chunkmatch.probe_pair's logic (suffix order, +-8 probes,
edge-LCP cert, cap clamp, chain doubling, induction) over a corpus and
categorizes every unconverged position, so certificate work targets the
classes that actually dominate refine volume.

Usage: python exp/cert_census.py [n_mb]
"""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from smallz4_tpu import format as fmt  # noqa: E402

CH = 1 << 16
REACH = 20
KEYR = 12
EDGE = 8
PROBES = list(range(1, 9)) + [12, 16, 24, 32, 48, 64]


def census(data: bytes, want_arrays: bool = False):
    n = len(data)
    arr = np.frombuffer(data, np.uint8).astype(np.uint32)
    pad = np.zeros(n + REACH, np.uint32)
    pad[:n] = arr
    # BE words at offsets 0..16
    w = [(pad[o:o + n] << 24) | (pad[o + 1:o + 1 + n] << 16)
         | (pad[o + 2:o + 2 + n] << 8) | pad[o + 3:o + 3 + n]
         for o in (0, 4, 8, 12, 16)]
    stats = {k: 0 for k in (
        "total", "conv", "trunc_d1", "trunc_other", "edge_lt12",
        "edge_12_19", "atcap", "induction_saved")}
    lens_all = np.ones(n, np.int64)
    dists_all = np.zeros(n, np.int64)
    conv_all = np.zeros(n, bool)
    tr_all = np.zeros(n, bool)
    cf_all = np.zeros(n, bool)
    l0_all = np.zeros(n, np.int64)
    d0_all = np.zeros(n, np.int64)
    gap_all = np.zeros(n, np.int64)   # nearest ≥12-byte sharer distance
                                      # (suffix-order -1 neighbor, same key)

    for c0 in range(0, n, CH):
        lo = max(0, c0 - CH)
        hi = min(n, c0 + CH)
        m = hi - lo            # merged window positions
        pos = np.arange(lo, hi)
        # lexsort uses the LAST key as primary: pass
        # (pos, x2, x1, e2, e1, k1) so k1 is the primary key
        order = np.lexsort((pos,) + tuple(w[i][lo:hi]
                                          for i in (4, 3, 2, 1, 0)))
        spos = pos[order]
        sw = [w[i][lo:hi][order].astype(np.int64) for i in range(5)]

        def lcp_pair(i, j, cap_words=5):
            l = 0
            for k in range(cap_words):
                x = int(sw[k][i]) ^ int(sw[k][j])
                if x == 0:
                    l += 4
                    continue
                for b in (24, 16, 8, 0):
                    if (x >> b) & 0xFF:
                        break
                    l += 1
                break
            return min(l, 4 * cap_words)

        cur = (spos >= c0)
        limit = np.minimum(n, np.full(m, 1 << 60))  # stream end as block end
        best_l = np.zeros(m, np.int64)
        best_d = np.zeros(m, np.int64)
        elcp = np.full((m, 2), -1, np.int64)
        M = m
        # vectorized probes
        for sk in PROBES:
            for sgn in (1, -1):
                k = sk * sgn
                i = np.arange(M)
                j = i + k
                okr = (j >= 0) & (j < M)
                jj = np.clip(j, 0, M - 1)
                x0 = sw[0] ^ sw[0][jj]
                lcp = np.zeros(M, np.int64)
                done = np.zeros(M, bool)
                for kw in range(5):
                    x = (sw[kw] ^ sw[kw][jj]).astype(np.uint64)
                    for b in (24, 16, 8, 0):
                        byte_ne = ((x >> np.uint64(b)) & np.uint64(0xFF)) != 0
                        inc = ~done & ~byte_ne
                        lcp += inc
                        done |= byte_ne
                d = spos - spos[jj]
                ok = okr & (d >= 1) & (d <= fmt.MAX_DISTANCE)
                cap = np.maximum((n - fmt.BLOCK_END_LITERALS) - spos, 0)
                le = np.minimum(np.where(ok, lcp, 0), cap)
                if sk == EDGE:
                    e = np.where(okr, np.minimum(lcp, KEYR), -1)
                    elcp[:, 0 if sgn < 0 else 1] = e
                if sk == 1 and sgn == -1:
                    # nearest ≥12-sharer: the -1 suffix-order neighbor is
                    # the nearest earlier position with the same 12-byte
                    # key (equal-key groups are pos-sorted)
                    gap12 = np.where(okr & (d >= 1) & (lcp >= KEYR), d, 0)
                better = (le > best_l) | ((le == best_l) & (le >= 1)
                                          & ok & (d < best_d))
                best_d = np.where(better & ok, d, best_d)
                best_l = np.where(better & ok, le, best_l)
        cap = np.maximum((n - fmt.BLOCK_END_LITERALS) - spos, 0)
        th = np.clip(best_l, 4, KEYR)
        cert_fail = (elcp[:, 0] >= th) | (elcp[:, 1] >= th)
        trunc = (best_l >= REACH) & (cap > REACH)

        # back to position order for the current chunk
        sel = cur
        p_idx = spos[sel] - c0 + c0  # absolute
        take = slice(c0 - lo, hi - lo)  # absolute positions c0..hi
        inv = np.empty(m, np.int64)
        inv[order] = np.arange(m)
        abs_pos = np.arange(lo, hi)
        at = inv[c0 - lo:]  # sorted index of each absolute current pos
        L0 = best_l[at]
        D0 = best_d[at]
        CF = cert_fail[at]
        TR = trunc[at]

        # chain doubling (position order)
        L1 = L0.copy()
        s = 1
        while s < len(L1):
            nb_l = np.concatenate([L1[s:], np.zeros(s, np.int64)])
            nb_d = np.concatenate([D0[s:], np.zeros(s, np.int64)])
            grow = (nb_d == D0) & (D0 >= 1) & (L1 >= s)
            L1 = np.where(grow, np.maximum(L1, s + nb_l), L1)
            s *= 2
        capc = np.maximum((n - fmt.BLOCK_END_LITERALS) - np.arange(c0, hi), 0)
        L2 = np.minimum(L1, capc)
        match = L2 >= 4
        lensb = np.where(match, L2, 1)
        distsb = np.where(match, D0, 0)
        conv = (~TR & ~CF)
        conv |= match & (L2 >= capc) & (D0 == 1)
        base_conv = conv.copy()
        chain_ok = (match & (L2 >= 5) & (L2 < capc)
                    & (np.concatenate([L2[1:], [0]]) == L2 - 1)
                    & (np.concatenate([distsb[1:], [0]]) == distsb))
        cc = conv.copy()
        ok2 = chain_ok.copy()
        s = 1
        while s < len(cc):
            cc = cc | (ok2 & np.concatenate([cc[s:], np.zeros(s, bool)]))
            ok2 = ok2 & np.concatenate([ok2[s:], np.zeros(s, bool)])
            s *= 2
        stats["induction_saved"] += int((cc & ~base_conv).sum())
        conv = cc
        nn = hi - c0
        stats["total"] += nn
        stats["conv"] += int(conv.sum())
        un = ~conv
        stats["trunc_d1"] += int((un & TR & (D0 == 1)).sum())
        stats["trunc_other"] += int((un & TR & (D0 != 1)).sum())
        stats["edge_lt12"] += int((un & ~TR & CF & (L0 < 12)).sum())
        stats["edge_12_19"] += int((un & ~TR & CF & (L0 >= 12)).sum())
        lens_all[c0:hi] = lensb
        dists_all[c0:hi] = distsb
        conv_all[c0:hi] = conv
        tr_all[c0:hi] = TR
        cf_all[c0:hi] = CF
        l0_all[c0:hi] = L0
        d0_all[c0:hi] = D0
        gap_all[c0:hi] = gap12[at]
    if want_arrays:
        return stats, {
            "lens": lens_all, "dists": dists_all, "conv": conv_all,
            "trunc": tr_all, "cert_fail": cf_all, "l0": l0_all,
            "d0": d0_all, "gap": gap_all,
        }
    return stats


def main():
    n_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    for name, data in (
        ("benchmix", bench.make_corpus(int(n_mb * 1e6))),
        ("include", (bench.real_file_corpus(int(n_mb * 1e6)) or b"")),
    ):
        if not data:
            continue
        st = census(data)
        t = st["total"]
        print(f"{name}: total={t}")
        for k, v in st.items():
            if k != "total":
                print(f"  {k:16s} {v:9d}  {100*v/t:6.2f}%")


if __name__ == "__main__":
    main()
