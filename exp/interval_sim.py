"""Interval-certificate simulation: the round-5 rule set, measured.

Rules simulated on top of the round-4 claims (see exp/adopt_sim.py for
the length/distance-split rationale; this probe adds the short-claim
interval certificates that anchor the adoption chains):

  R0  at-cap length anchor: a claim clamped at the block cap has exact
      clamped length (its own doubling-verified candidate reaches cap).
  R3  short-claim length cert (claims L in {1, 4..11}): records sharing
      >= t bytes with p (t <= 12) form a contiguous capped-LCP interval
      around p in suffix order; a segmented max-pos scan per threshold
      gives B_t = max position among sharers.  If B_{L+1} is absent,
      out-of-window, or... (B > p masks: conservative fail).  For
      literal claims t = 4: no in-window earlier 4-sharer => literal is
      exact (full conv: dist trivially 0).
  R4  short-claim dist cert: with R3 passed, the nearest >=L-sharer
      (B_L when B_L < p) achieves exactly L; claim_d == p - B_L => DK.
  ADOPT  backward length adoption (candidate-shift lemma): LK(p) if
      claim(p) == claim(p+1) + 1, claim(p) >= 5, claim(p) < cap,
      < MAX_SAME_LETTER, and LK(p+1).
  R2  deep dist cert: LK & claim >= 12 & claim_d == gap12 (nearest
      >=12-sharer) => DK (nearer candidates share < 12 <= L bytes).

Outputs per corpus: conv' (full cert), LK (pre-DP refine = ~LK), DK,
post-DP chosen-walk volume, soundness vs the exact native matcher.

Usage: python exp/interval_sim.py [n_mb]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from smallz4_tpu import format as fmt  # noqa: E402
from smallz4_tpu import native  # noqa: E402

CH = 1 << 16
REACH = 20
KEYR = 12
EDGE = 8
PROBES = list(range(1, 9)) + [12, 16, 24, 32, 48, 64]
NEG = np.int64(-1 << 40)


def device_claims(data: bytes):
    """Faithful numpy replay of ops/chunkmatch.probe_pair: 12-byte-key +
    pos sort (equal-key groups ARE pos-sorted, unlike the 20-byte census
    order), +-probes with 20-byte verify, edge-LCP cert, cap clamp,
    doubling, induction.  Returns position-order arrays incl. ``gap`` =
    the -1 in-group neighbor distance (the nearest >=12-byte sharer)."""
    n = len(data)
    arr = np.frombuffer(data, np.uint8).astype(np.uint32)
    pad = np.zeros(n + REACH, np.uint32)
    pad[:n] = arr
    w = [(pad[o:o + n] << 24) | (pad[o + 1:o + 1 + n] << 16)
         | (pad[o + 2:o + 2 + n] << 8) | pad[o + 3:o + 3 + n]
         for o in (0, 4, 8, 12, 16)]
    lens_all = np.ones(n, np.int64)
    dists_all = np.zeros(n, np.int64)
    conv_all = np.zeros(n, bool)
    gap_all = np.zeros(n, np.int64)

    for c0 in range(0, n, CH):
        lo = max(0, c0 - CH)
        hi = min(n, c0 + CH)
        m = hi - lo
        pos = np.arange(lo, hi)
        # DEVICE order: 12-byte key then pos (sortnet n_keys=4)
        order = np.lexsort((pos, w[2][lo:hi], w[1][lo:hi], w[0][lo:hi]))
        spos = pos[order].astype(np.int64)
        sw = [w[i][lo:hi][order].astype(np.int64) for i in range(5)]

        best_l = np.zeros(m, np.int64)
        best_d = np.zeros(m, np.int64)
        elcp = np.full((m, 2), -1, np.int64)
        gap12 = np.zeros(m, np.int64)
        for sk in PROBES:
            for sgn in (1, -1):
                k = sk * sgn
                i = np.arange(m)
                j = i + k
                okr = (j >= 0) & (j < m)
                jj = np.clip(j, 0, m - 1)
                lcp = np.zeros(m, np.int64)
                done = np.zeros(m, bool)
                for kw in range(5):
                    x = (sw[kw] ^ sw[kw][jj]).astype(np.uint64)
                    for b in (24, 16, 8, 0):
                        ne = ((x >> np.uint64(b)) & np.uint64(0xFF)) != 0
                        lcp += ~done & ~ne
                        done |= ne
                d = spos - spos[jj]
                ok = okr & (d >= 1) & (d <= fmt.MAX_DISTANCE)
                cap = np.maximum((n - fmt.BLOCK_END_LITERALS) - spos, 0)
                le = np.minimum(np.where(ok, lcp, 0), cap)
                if sk == EDGE:
                    elcp[:, 0 if sgn < 0 else 1] = np.where(
                        okr, np.minimum(lcp, KEYR), -1)
                if sk == 1 and sgn == -1:
                    gap12 = np.where(okr & (d >= 1) & (lcp >= KEYR), d, 0)
                better = (le > best_l) | ((le == best_l) & (le >= 1)
                                          & ok & (d < best_d))
                best_d = np.where(better & ok, d, best_d)
                best_l = np.where(better & ok, le, best_l)
        cap = np.maximum((n - fmt.BLOCK_END_LITERALS) - spos, 0)
        th = np.clip(best_l, 4, KEYR)
        cert_fail = (elcp[:, 0] >= th) | (elcp[:, 1] >= th)
        trunc = (best_l >= REACH) & (cap > REACH)

        inv = np.empty(m, np.int64)
        inv[order] = np.arange(m)
        at = inv[c0 - lo:]
        L0, D0, CF, TR = best_l[at], best_d[at], cert_fail[at], trunc[at]

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
        conv = cc
        lens_all[c0:hi] = lensb
        dists_all[c0:hi] = distsb
        conv_all[c0:hi] = conv
        gap_all[c0:hi] = gap12[at]
    return {"lens": lens_all, "dists": dists_all, "conv": conv_all,
            "gap": gap_all}


def shift_up(x, s, fill):
    if s >= len(x):
        return np.full_like(x, fill)
    return np.concatenate([x[s:], np.full(s, fill, x.dtype)])


def seg_maxpos(pos, gid, reverse=False):
    """Exclusive running max of ``pos`` within equal-``gid`` runs.
    gid must be non-decreasing (group ids along the sorted order)."""
    if reverse:
        return seg_maxpos(pos[::-1], -gid[::-1])[::-1]
    big = np.int64(1) << 42
    inc = np.maximum.accumulate(pos + gid * big) - gid * big
    # exclusive: shift down one; reset at group starts
    excl = np.concatenate([[NEG], inc[:-1]])
    new_g = np.concatenate([[True], gid[1:] != gid[:-1]])
    return np.where(new_g, NEG, excl)


def interval_bt(data, n):
    """Per position and threshold t in 4..12: B_t = max pos among records
    sharing >= t bytes (capped-LCP interval in suffix order), excluding
    self.  Returns dict t -> int64[n] in position order."""
    arr = np.frombuffer(data, np.uint8).astype(np.uint32)
    pad = np.zeros(n + 20, np.uint32)
    pad[:n] = arr
    w = [(pad[o:o + n] << 24) | (pad[o + 1:o + 1 + n] << 16)
         | (pad[o + 2:o + 2 + n] << 8) | pad[o + 3:o + 3 + n]
         for o in (0, 4, 8)]
    B = {t: np.full(n, NEG) for t in range(4, 13)}
    for c0 in range(0, n, CH):
        lo = max(0, c0 - CH)
        hi = min(n, c0 + CH)
        pos = np.arange(lo, hi)
        order = np.lexsort((pos, w[2][lo:hi], w[1][lo:hi], w[0][lo:hi]))
        spos = pos[order].astype(np.int64)
        sw = [w[i][lo:hi][order].astype(np.int64) for i in range(3)]
        # adjacent capped LCP (cap 12)
        m = hi - lo
        adj = np.zeros(m, np.int64)
        done = np.zeros(m, bool)
        adj_full = np.zeros(m, np.int64)
        for kw in range(3):
            x = (sw[kw] ^ np.concatenate([[1 << 40], sw[kw][:-1]])).astype(
                np.uint64)
            for b in (24, 16, 8, 0):
                ne = ((x >> np.uint64(b)) & np.uint64(0xFF)) != 0
                adj_full += ~done & ~ne
                done |= ne
        adj = np.minimum(adj_full, KEYR)
        adj[0] = -1
        for t in range(4, 13):
            gid = np.cumsum(adj < t)
            bt = np.maximum(seg_maxpos(spos, gid),
                            seg_maxpos(spos, gid, reverse=True))
            cur = spos >= c0
            inv = np.empty(m, np.int64)
            inv[order] = np.arange(m)
            at = inv[c0 - lo:]
            B[t][c0:hi] = bt[at]
    return B


def simulate(name: str, data: bytes):
    n = len(data)
    A = device_claims(data)
    lens = A["lens"].astype(np.int64)
    dists = A["dists"].astype(np.int64)
    conv = A["conv"].copy()
    gap = A["gap"].astype(np.int64)
    capc = np.maximum(n - fmt.BLOCK_END_LITERALS - np.arange(n), 0)
    pos = np.arange(n, dtype=np.int64)
    tail = min(fmt.BLOCK_END_NO_MATCH - 1, n)
    lens[n - tail:] = 1
    dists[n - tail:] = 0
    conv[n - tail:] = True

    el, ed = native.match_block(np.frombuffer(data, np.uint8),
                                base=0, bs=n, level=9)
    el = el.astype(np.int64)
    ed = ed.astype(np.int64)
    ed[el < fmt.MIN_MATCH] = 0
    el[el < fmt.MIN_MATCH] = 1
    el[n - tail:] = 1
    ed[n - tail:] = 0

    B = interval_bt(data, n)

    def in_window_earlier(bt):
        return (bt > NEG) & (bt < pos) & (bt >= pos - fmt.MAX_DISTANCE)

    def no_sharer(bt):  # no in-window earlier sharer; B > p masks => fail
        return (bt < pos - fmt.MAX_DISTANCE) | (bt == NEG)

    # --- R3/R4: short claims ---
    lk = conv.copy()
    dk = conv.copy()
    # literal claims: t=4 — no in-window earlier 4-sharer => exact literal
    lit = lens < fmt.MIN_MATCH
    lit_ok = lit & no_sharer(B[4])
    lk |= lit_ok
    dk |= lit_ok
    # match claims 4..11 below cap: length cert at t=L+1
    sel_all = (lens >= 4) & (lens <= 11)
    r3 = np.zeros(n, bool)
    r4 = np.zeros(n, bool)
    for L in range(4, 12):
        sl = sel_all & (lens == L)
        below = sl & (lens < capc)
        r3 |= below & no_sharer(B[L + 1])
        # dist cert: nearest >=L sharer == claim (needs B_L < p)
        bL = B[L]
        r4 |= sl & in_window_earlier(bL) & (pos - bL == dists)
    lk |= r3
    # at-cap claims: clamped length exact by the claim's own candidate
    atcap = (lens >= fmt.MIN_MATCH) & (lens == capc)
    lk |= atcap
    # full short-claim conv: length + dist
    dk |= r3 & r4

    # --- adoption ---
    nxt = shift_up(lens, 1, np.int64(0))
    adopt = ((lens == nxt + 1) & (lens >= 5) & (lens < capc)
             & (lens < fmt.MAX_SAME_LETTER))
    adopt[np.arange(CH - 1, n, CH)] = False
    LK = lk.copy()
    ok = adopt.copy()
    s = 1
    while s < n:
        LK |= ok & shift_up(LK, s, False)
        ok &= shift_up(ok, s, False)
        s *= 2

    # --- R2: deep dist cert ---
    DK = dk | (LK & (lens >= 12) & (gap >= 1) & (dists == gap))

    # soundness vs oracle
    lk_m = LK & ~conv
    lk_bad = int((lens[lk_m] != el[lk_m]).sum())
    dk_m = DK & LK & ~conv
    dk_bad = int(((lens[dk_m] != el[dk_m]) | (dists[dk_m] != ed[dk_m])).sum())
    print(f"{name}: n={n}")
    print(f"  old conv:           {100 * conv.mean():6.2f}%")
    print(f"  short-cert anchors: lit {100 * lit_ok.mean():5.2f}%  "
          f"r3 {100 * r3.mean():5.2f}%  atcap {100 * atcap.mean():5.2f}%")
    print(f"  LK  (len known):    {100 * LK.mean():6.2f}%   pre-DP refine "
          f"{100 * (~LK).mean():6.2f}%")
    print(f"  DK&LK (full known): {100 * (DK & LK).mean():6.2f}%")
    print(f"  LK soundness: {lk_bad} wrong of {int(lk_m.sum())};  "
          f"DK soundness: {dk_bad} wrong of {int(dk_m.sum())}")

    # post-DP: refine ~LK with oracle, DP, chosen-walk volume
    l2 = np.where(LK, lens, el).astype(np.int32)
    d2 = np.where(LK, dists, ed).astype(np.int32)
    native.estimate_costs(l2, d2)
    chosen = []
    o = 0
    while o < n:
        if l2[o] >= fmt.MIN_MATCH:
            chosen.append(o)
            o += l2[o]
        else:
            o += 1
    chosen = np.asarray(chosen, np.int64)
    full = DK & LK
    walk = chosen[~full[chosen]] if len(chosen) else chosen
    print(f"  chosen: {len(chosen)} ({100 * len(chosen) / n:.2f}%); "
          f"post-DP walks: {len(walk)} ({100 * len(walk) / n:.3f}%)")
    # verify end-to-end parity of the scheme on this corpus: emit with
    # walk-corrected dists must equal the all-oracle stream
    d3 = d2.copy()
    d3[walk] = ed[walk]  # stand-in for the nearest-first walk
    lw = np.where(LK, lens, el).astype(np.int32)
    dw = d3.copy()
    native.estimate_costs(lw, dw)  # recompute writeback on same lens
    pay_new = native.emit_block(data, lw, d3)
    lo2 = el.astype(np.int32).copy()
    do2 = ed.astype(np.int32).copy()
    native.estimate_costs(lo2, do2)
    pay_ref = native.emit_block(data, lo2, do2)
    print(f"  scheme output == all-oracle output: {pay_new == pay_ref}")


def main():
    n_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    rng = np.random.default_rng(3)
    frag = bytearray(rng.integers(97, 105, 48, dtype=np.uint8).tobytes())
    parts, size = [], 0
    runs = [65300, 131000, 262144]
    while size < int(n_mb * 1e6):
        r = rng.random()
        if r < 0.3:
            parts.append(bytes([len(parts) & 0xFF]) * runs[len(parts) % 3])
        elif r < 0.8:
            burst = []
            for _ in range(int(rng.integers(50, 300))):
                if rng.random() < 0.2:
                    frag[int(rng.integers(0, 48))] ^= 1
                burst.append(bytes(frag))
            parts.append(b"".join(burst))
        else:
            parts.append(rng.integers(0, 256, 30000, dtype=np.uint8).tobytes())
        size += len(parts[-1])
    adv = b"".join(parts)[: int(n_mb * 1e6)]

    for name, data in (
        ("benchmix", bench.make_corpus(int(n_mb * 1e6))),
        ("include", (bench.real_file_corpus(int(n_mb * 1e6)) or b"")),
        ("adversarial", adv),
    ):
        if data:
            simulate(name, data)


if __name__ == "__main__":
    main()
