"""What-if census: certificate coverage at deeper verify reaches.
Simulates the edge-LCP certificate with reach/key depth D in
{20, 40, 80, 160} assuming exact LCPs to D (what prefix-doubling rank
planes would provide), same +-8 window, same induction."""
import sys, pathlib
import numpy as np
sys.path.insert(0, "/root/repo")
from smallz4_tpu import format as fmt
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)

def sim(data, D):
    n = len(data)
    a = np.frombuffer(data, np.uint8)
    pad = np.zeros(n + D, np.uint8); pad[:n] = a
    # suffix order to depth D: lexsort on D bytes (chunked keys)
    keys = [pad[o:o+n] for o in range(D)]
    order = np.lexsort((np.arange(n),) + tuple(reversed(keys)))
    spos = order
    # lcp to depth D between sorted neighbors at offsets 1..8 via
    # vectorized byte compare
    def lcp_off(k):
        i = np.arange(n); j = np.clip(i + k, 0, n - 1)
        p, q = spos[i], spos[j]
        l = np.zeros(n, np.int64); alive = (i + k >= 0) & (i + k < n)
        for b in range(D):
            eq = pad[p + b] == pad[q + b]
            l += alive & eq & (l == b)
        return l
    # incremental: lcp decreases outward; compute adjacent lcps then min-scan
    adj = lcp_off(1)
    lcps = {1: adj}
    for k in range(2, 9):
        prev = lcps[k-1]
        shifted = np.concatenate([lcps[1][k-1:], np.zeros(k-1, np.int64)])
        lcps[k] = np.minimum(prev, shifted)
    best_l = np.zeros(n, np.int64); best_d = np.zeros(n, np.int64)
    cap = np.maximum((n - fmt.BLOCK_END_LITERALS) - spos, 0)
    for k in list(range(1,9)):
        for sgn in (1,-1):
            i = np.arange(n); j = i + k*sgn
            ok = (j >= 0) & (j < n)
            jj = np.clip(j, 0, n-1)
            if sgn > 0:
                l = lcps[k]
            else:
                l = np.concatenate([np.zeros(k, np.int64), lcps[k][:-k]]) if k <= n else np.zeros(n, np.int64)
            d = spos - spos[jj]
            okc = ok & (d >= 1) & (d <= fmt.MAX_DISTANCE)
            le = np.minimum(np.where(okc, l, 0), cap)
            better = (le > best_l) | ((le == best_l) & okc & (le >= 1) & (d < best_d))
            best_d = np.where(better & okc, d, best_d)
            best_l = np.where(better & okc, le, best_l)
    e_lo = np.concatenate([np.zeros(8, np.int64), lcps[8][:-8]])
    e_lo[:8] = -1
    e_hi = lcps[8].copy(); e_hi[-8:] = -1
    th = np.clip(best_l, 4, D)
    cert_fail = (e_lo >= th) | (e_hi >= th)
    trunc = (best_l >= D) & (cap > D)
    conv_sorted = ~cert_fail & ~trunc
    # position order
    inv = np.empty(n, np.int64); inv[spos] = np.arange(n)
    L0 = best_l[inv]; D0 = best_d[inv]; CV = conv_sorted[inv]
    # chain extension + induction (position order)
    L1 = L0.copy(); s = 1
    while s < n:
        nl = np.concatenate([L1[s:], np.zeros(s, np.int64)])
        nd = np.concatenate([D0[s:], np.zeros(s, np.int64)])
        grow = (nd == D0) & (D0 >= 1) & (L1 >= s)
        L1 = np.where(grow, np.maximum(L1, s + nl), L1); s *= 2
    capp = np.maximum((n - fmt.BLOCK_END_LITERALS) - np.arange(n), 0)
    L2 = np.minimum(L1, capp)
    match = L2 >= 4
    conv = CV | (match & (L2 >= capp) & (D0 == 1))
    dists = np.where(match, D0, 0)
    chain_ok = (match & (L2 >= 5) & (L2 < capp)
                & (np.concatenate([L2[1:], [0]]) == L2 - 1)
                & (np.concatenate([dists[1:], [0]]) == dists))
    cc = conv.copy(); ok2 = chain_ok.copy(); s = 1
    while s < n:
        cc = cc | (ok2 & np.concatenate([cc[s:], np.zeros(s, bool)]))
        ok2 = ok2 & np.concatenate([ok2[s:], np.zeros(s, bool)])
        s *= 2
    return 100.0 * (~cc).sum() / n

N = 400_000
for name, data in (("benchmix", bench.make_corpus(N)),
                   ("include", bench.real_file_corpus(N))):
    if not data: continue
    row = [name]
    for D in (20, 40, 80, 160):
        row.append(f"D={D}: {sim(data, D):.1f}%")
    print("  ".join(row))
