"""Length/distance-split certificate simulation (round-5 design probe).

The round-4 census proved the dominant miss class (trunc_other) is
multiplicity-limited: no bounded-reach certificate can prove "nearest
among max-achievers" for high-multiplicity prefixes.  This probe
measures the SPLIT design instead, which sidesteps that impossibility:

  * The optimal parser (smallz4.h:376-472) consumes only match LENGTHS —
    an LZ4 match costs 3 bytes (+ length extras) regardless of distance,
    so DP bit-parity needs exact lengths at every position but exact
    distances only at the positions the DP actually CHOOSES as matches.
  * LK ("length-known"): claim length == exact max length.  Certified by
    backward ADOPTION: L*(p) <= L*(p+1) + 1 whenever L*(p) >= 2 (any
    achiever r of p shifts to the candidate r+1 of p+1 with the same
    distance, still in-window), and every claim is a genuine verified
    match, so L_claim(p) <= L*(p).  Hence if L*(p+1) is exactly known
    and L_claim(p) == L*(p+1) + 1, then L*(p) == L_claim(p).  Chains
    propagate backward from fully-converged tails through match
    interiors and heads, across distance changes (the round-4 induction
    required the SAME distance; adoption does not).
  * DK ("distance-known"): claim distance == the reference's
    nearest-of-max.  conv implies LK and DK.  One cheap extra rule: if
    LK holds, L_claim >= 12, and claim_dist == the nearest ≥12-sharer
    gap (the suffix-order -1 neighbor inside the pos-sorted equal-key
    group), then every candidate nearer than claim_dist shares < 12 <= L
    bytes and cannot achieve the max, so claim_dist IS the nearest
    achiever (reference keeps the first max achiever walking
    nearest-first, smallz4.h:173-255).
  * Pipeline: pre-DP full refine only at ~LK; post-DP a nearest-first
    EARLY-STOP walk (stop at the first candidate reaching the known L*)
    only at chosen & ~DK positions.

Reports per corpus: old conv%, new pre-DP volume (~LK)%, post-DP walk
volume, and SOUNDNESS checks against the exact native matcher (LK
lengths and DK (len, dist) pairs must be 100% right — these validate the
certificate proofs empirically before the device implementation).

Usage: python exp/adopt_sim.py [n_mb]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from cert_census import CH, census  # noqa: E402
from smallz4_tpu import format as fmt  # noqa: E402
from smallz4_tpu import native  # noqa: E402


def shift_up(x, s, fill):
    if s >= len(x):
        return np.full_like(x, fill)
    return np.concatenate([x[s:], np.full(s, fill, x.dtype)])


def simulate(name: str, data: bytes):
    n = len(data)
    stats, A = census(data, want_arrays=True)
    lens = A["lens"].astype(np.int64)
    dists = A["dists"].astype(np.int64)
    conv = A["conv"].copy()
    gap = A["gap"].astype(np.int64)
    capc = np.maximum(n - fmt.BLOCK_END_LITERALS - np.arange(n), 0)

    # block-tail rule (pipeline sets the last 11 positions to literals)
    tail = min(fmt.BLOCK_END_NO_MATCH - 1, n)
    lens[n - tail:] = 1
    dists[n - tail:] = 0
    conv[n - tail:] = True

    # exact ground truth from the native matcher
    el, ed = native.match_block(np.frombuffer(data, np.uint8),
                                base=0, bs=n, level=9)
    el = el.astype(np.int64)
    ed = ed.astype(np.int64)
    ed[el < fmt.MIN_MATCH] = 0
    el[el < fmt.MIN_MATCH] = 1  # normalize literals (native uses 0 or 1)
    el[n - tail:] = 1
    ed[n - tail:] = 0

    # sanity: conv positions must already be bit-exact (r4 contract)
    bad = conv & ((lens != el) | (dists != ed))
    assert not bad.any(), f"conv soundness broken at {np.flatnonzero(bad)[:5]}"

    # --- adoption (LK) ---
    nxt = shift_up(lens, 1, 0)
    adopt = ((lens == nxt + 1) & (lens >= 5) & (lens < capc)
             & (lens < fmt.MAX_SAME_LETTER))
    # the device kernel certifies per chunk: the last position of a chunk
    # cannot see p+1
    adopt[np.arange(CH - 1, n, CH)] = False
    LK = conv.copy()
    ok = adopt.copy()
    s = 1
    while s < n:
        LK |= ok & shift_up(LK, s, False)
        ok &= shift_up(ok, s, False)
        s *= 2

    # --- DK rule ---
    DK = conv | (LK & (lens >= 12) & (gap >= 1) & (dists == gap))

    # --- soundness ---
    lk_m = LK & ~conv
    lk_bad = int((lens[lk_m] != el[lk_m]).sum())
    dk_m = DK & ~conv
    dk_bad = int(((lens[dk_m] != el[dk_m]) | (dists[dk_m] != ed[dk_m])).sum())
    print(f"{name}: n={n}")
    print(f"  old conv:        {100 * conv.mean():6.2f}%")
    print(f"  LK (len known):  {100 * LK.mean():6.2f}%   pre-DP refine "
          f"volume {100 * (~LK).mean():6.2f}%")
    print(f"  DK (dist known): {100 * DK.mean():6.2f}%")
    print(f"  LK soundness: {lk_bad} wrong lengths of {int(lk_m.sum())} "
          f"adopted;  DK soundness: {dk_bad} wrong of {int(dk_m.sum())}")

    # --- post-DP chosen-walk volume ---
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
    walk = chosen[~DK[chosen]]
    print(f"  chosen matches: {len(chosen)} ({100 * len(chosen) / n:.2f}% "
          f"of positions); post-DP walks: {len(walk)} "
          f"({100 * len(walk) / n:.3f}% of positions)")
    # distance-soundness at chosen DK positions specifically (what emit
    # actually consumes)
    cdk = chosen[DK[chosen]]
    cd_bad = int((d2[cdk] != np.where(LK, dists, ed).astype(np.int32)[cdk]
                  ).sum())  # DP doesn't touch dists; must be zero
    assert cd_bad == 0


def main():
    n_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # adversarial corpus: same generator as bench's hostile regime
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
