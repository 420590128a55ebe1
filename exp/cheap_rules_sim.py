"""Variant ablation for the round-5 certificate rule set.

Measures, per corpus, pre-DP refine volume (~LK) and post-DP walk volume
under increasingly cheap rule sets:

  V0  round-4 baseline (conv as shipped)
  V1  V0 + split edge rule (length-only cert: elcp < min(L+1, 12) for
      claims L <= 11; literals already covered by th=4) + at-cap anchors
      + adoption + R2 gap-dist rule + host d1-run handling
  V2  V1 + t=4 interval scan (literal cert: no in-window earlier
      4-sharer; covers multiplicity the edge rule can't)
  V3  V2 + t=5..12 interval scans (match anchors, the expensive set)

Each variant's soundness is checked against the native exact matcher.

Usage: python exp/cheap_rules_sim.py [n_mb]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from interval_sim import CH, EDGE, KEYR, PROBES, REACH, NEG, interval_bt, shift_up  # noqa: E402
from smallz4_tpu import format as fmt  # noqa: E402
from smallz4_tpu import native  # noqa: E402


def device_claims_ext(data: bytes, key_words: int = 3, verify_words: int = 5):
    """device_claims + split-edge length cert + gap-dist flag.

    key_words: words in the sort key (3 = 12-byte r4 order, 5 = 20-byte);
    verify_words: words available for byte verification (>= key_words)."""
    global KEYR, REACH
    KEYR = 4 * key_words
    REACH = 4 * verify_words
    n = len(data)
    arr = np.frombuffer(data, np.uint8).astype(np.uint32)
    pad = np.zeros(n + 4 * verify_words, np.uint32)
    pad[:n] = arr
    w = [(pad[o:o + n] << 24) | (pad[o + 1:o + 1 + n] << 16)
         | (pad[o + 2:o + 2 + n] << 8) | pad[o + 3:o + 3 + n]
         for o in range(0, 4 * verify_words, 4)]
    out = {k: np.zeros(n, np.int64) for k in ("lens", "dists", "gap")}
    out["conv"] = np.zeros(n, bool)
    out["lenok"] = np.zeros(n, bool)   # split edge: length-only cert
    out["gapflag"] = np.zeros(n, bool)  # claim dist == -1-in-group gap

    for c0 in range(0, n, CH):
        lo = max(0, c0 - CH)
        hi = min(n, c0 + CH)
        m = hi - lo
        pos = np.arange(lo, hi)
        order = np.lexsort((pos,) + tuple(w[i][lo:hi]
                                          for i in range(key_words - 1, -1, -1)))
        spos = pos[order].astype(np.int64)
        sw = [w[i][lo:hi][order].astype(np.int64) for i in range(verify_words)]

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
                for kw in range(verify_words):
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
        # split rule: a sharer at exactly L only threatens the DISTANCE;
        # length is exact iff nothing unseen shares L+1 (capped at 12,
        # so only decidable for L <= 11)
        th_len = np.clip(best_l + 1, 4, KEYR)
        len_fail = ((elcp[:, 0] >= th_len) | (elcp[:, 1] >= th_len)
                    | (best_l >= KEYR))
        trunc = (best_l >= REACH) & (cap > REACH)
        gflag = (best_d == gap12) & (gap12 >= 1)

        inv = np.empty(m, np.int64)
        inv[order] = np.arange(m)
        at = inv[c0 - lo:]
        L0, D0, CF, TR = best_l[at], best_d[at], cert_fail[at], trunc[at]
        LF = len_fail[at]
        GF = gflag[at]

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
        # length-only edge cert applies to UNDOUBLED claims (< REACH,
        # byte-verified exact for their d) below cap
        lenok = ~LF & (L0 < REACH) & (L0 == L2) & (L2 < capc)
        out["lens"][c0:hi] = lensb
        out["dists"][c0:hi] = distsb
        out["conv"][c0:hi] = conv
        out["gap"][c0:hi] = gap12[at]
        out["lenok"][c0:hi] = lenok
        out["gapflag"][c0:hi] = GF
    return out


def run_extents(data: bytes):
    """run_end[p] = one past the end of the maximal equal-byte run
    containing p; run_start[p] similarly."""
    a = np.frombuffer(data, np.uint8)
    n = len(a)
    new = np.empty(n, bool)
    new[0] = True
    new[1:] = a[1:] != a[:-1]
    rid = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:], [n]])
    return starts[rid], ends[rid]


def evaluate(name, data, el, ed, lens, dists, LK, DK, tag):
    n = len(data)
    lk_m = LK.copy()
    lk_bad = int((lens[lk_m] != el[lk_m]).sum())
    dk_m = DK & LK
    dk_bad = int(((lens[dk_m] != el[dk_m]) | (dists[dk_m] != ed[dk_m])).sum())
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
    walk = chosen[~DK[chosen]] if len(chosen) else chosen
    print(f"  {tag}: pre-DP {100 * (~LK).mean():6.2f}%  post-DP walks "
          f"{100 * len(walk) / n:6.3f}%  (LK bad {lk_bad}, DK bad {dk_bad})")


def simulate(name, data):
    n = len(data)
    A = device_claims_ext(data)
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
    print(f"{name}: n={n}")
    evaluate(name, data, el, ed, lens, dists, conv.copy(), conv.copy(), "V0")

    # --- V1: split edge + atcap + deep-run rule + adoption + R2 ---
    # model the u16 device saturation faithfully
    sat = lens > 65535
    lens_dev = np.minimum(lens, 65535)
    conv_dev = conv & ~sat

    # device-side LK anchors (all guarded below MAX_SAME_LETTER so the
    # DP's run shortcut never reads an uncertified distance)
    msl_ok = lens_dev < fmt.MAX_SAME_LETTER
    lk_dev = (conv_dev | (A["lenok"] & msl_ok)
              | ((lens_dev >= fmt.MIN_MATCH) & (lens_dev == capc) & ~sat
                 & msl_ok))
    nxt = shift_up(lens_dev, 1, np.int64(0))
    adopt = ((lens_dev == nxt + 1) & (lens_dev >= 5) & (lens_dev < capc)
             & (lens_dev < fmt.MAX_SAME_LETTER) & ~sat)
    adopt[np.arange(CH - 1, n, CH)] = False
    LK = lk_dev.copy()
    ok = adopt.copy()
    s = 1
    while s < n:
        LK |= ok & shift_up(LK, s, False)
        ok &= shift_up(ok, s, False)
        s *= 2
    DK = conv_dev | (LK & (lens_dev >= 12) & A["gapflag"])

    # host-side deep-run rule: window entirely inside the byte run =>
    # every candidate ties at e = min(run_end - p, cap); reference keeps
    # the d=1 achiever except at the shortcut-lapse position e == MSL-1
    # (insert-skip quirk, smallz4.h:631-643: the search there sees only
    # the run head / block-boundary inserts — refine instead)
    rs, re_ = run_extents(data)
    deep = (pos - rs >= fmt.MAX_DISTANCE) & (
        pos >= fmt.MAX_DISTANCE + fmt.BLOCK_END_NO_MATCH)
    e = np.minimum(re_ - pos, capc)
    deep_ok = deep & (e != fmt.MAX_SAME_LETTER - 1)
    lens_v1 = np.where(deep_ok & (e >= fmt.MIN_MATCH), e, lens_dev)
    lens_v1 = np.where(deep_ok & (e < fmt.MIN_MATCH), 1, lens_v1)
    dists_v1 = np.where(deep_ok, np.where(e >= fmt.MIN_MATCH, 1, 0), dists)
    LK = LK | deep_ok
    DK = DK | deep_ok
    # the block-tail literal rule is applied LAST in the pipeline: no
    # match may start within the final 11 positions
    lens_v1[n - tail:] = 1
    dists_v1[n - tail:] = 0
    LK[n - tail:] = True
    DK[n - tail:] = True
    evaluate(name, data, el, ed, lens_v1, dists_v1, LK, DK, "V1")
    dists = dists_v1  # downstream variants build on the corrected arrays

    # --- V2: + t=4 interval scan (literal cert) ---
    B = interval_bt(data, n)

    def no_sh(bt):
        return (bt < pos - fmt.MAX_DISTANCE) | (bt == NEG)

    def in_w(bt):
        return (bt > NEG) & (bt < pos) & (bt >= pos - fmt.MAX_DISTANCE)

    lit_ok = (lens_v1 < fmt.MIN_MATCH) & no_sh(B[4])
    lk2 = lk_dev | deep_ok | lit_ok
    LK = lk2.copy()
    ok = adopt.copy()
    s = 1
    while s < n:
        LK |= ok & shift_up(LK, s, False)
        ok &= shift_up(ok, s, False)
        s *= 2
    DK = conv_dev | deep_ok | lit_ok | (LK & (lens_v1 >= 12) & A["gapflag"])
    evaluate(name, data, el, ed, lens_v1, dists, LK, DK, "V2")

    # --- V3: + t=5..12 match-anchor scans + R4 dist scans ---
    r3 = np.zeros(n, bool)
    r4 = np.zeros(n, bool)
    for L in range(4, 12):
        sl = (lens_v1 == L)
        r3 |= sl & (lens_v1 < capc) & no_sh(B[L + 1])
        bL = B[L]
        r4 |= sl & in_w(bL) & (pos - bL == dists)
    lk3 = lk2 | r3
    LK = lk3.copy()
    ok = adopt.copy()
    s = 1
    while s < n:
        LK |= ok & shift_up(LK, s, False)
        ok &= shift_up(ok, s, False)
        s *= 2
    DK = (conv_dev | deep_ok | lit_ok | (r3 & r4)
          | (LK & (lens_v1 >= 12) & A["gapflag"]))
    evaluate(name, data, el, ed, lens_v1, dists, LK, DK, "V3")


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
