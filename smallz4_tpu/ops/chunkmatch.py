"""Chunk-merge device matcher: the production TPU encode kernel.

The reference's hot loop (smallz4.h:173-255,603-744) is a per-position
hash-chain walk — per-lane random gathers, the one primitive this chip
lacks.  ops/sortmatch.py re-derived the search as sorted-neighborhood
probing but re-sorts every segment's 64 KB halo with it (two full 2^17
bitonic networks per 64 Ki positions, and 2^17 networks blow Mosaic's
compile budget).  This module restructures the search around *chunks*:

  1. **sort once per chunk** — every 64 Ki-position chunk is sorted a
     single time (unrolled 2^16 bitonic, ops/sortnet.py) into true
     byte-lexicographic 20-byte suffix order: key = (bytes 0..19 packed
     big-endian as five words, then pos).  Round 5 deepened the key from
     12 to 20 bytes: the payload words were already riding through the
     sort, so the extra depth costs only lex-compare work while making
     equal-prefix groups at every depth ≤ 20 contiguous and pos-sorted.
  2. **merge, don't re-sort** — the 64 KB window means a chunk's
     candidates live in itself and its left neighbor; one bitonic merge
     (flip + 17 stages) of the two already-sorted record sets replaces a
     second full sort.
  3. **probe** sorted neighbors at static offsets (contiguous 1..8 plus a
     sparse far set): in suffix order the highest-LCP candidates are the
     nearest neighbors; each probe is byte-verified to LCP 20, zero
     gathers.  Probe LCPs are *composed* (PROBE_LCP): one adjacent-pair
     LCP plane + a log-step sparse min-table yields every probe's capped
     LCP via the suffix-array min property — bit-identical to the direct
     per-probe 5-word compare at ~2.8x fewer shifted planes (the cut
     exclusion rides a spare combo bit so probes shift one plane).
     Claim lengths are clamped to the block match cap *before* the
     nearest-distance tie-break (reference cap-then-tie semantics,
     smallz4.h:178,229-232).
  4. **compact** the current chunk's records out of the merged array with
     an LSB-first binary-shift routing (monotone packing is conflict-free
     on a butterfly — validated exhaustively), then **unsort** them by
     position (2^16 bitonic).
  5. **chain** same-distance claims in position order (log-step doubling,
     XLA shifts) — verified 20-byte claims extend into exact unbounded
     match lengths; distance-1 byte runs resolve the same way.

Record planes (6 x int32 per record):
  k1, e1, e2,
  x1, x2     = bytes pos+0..19 packed big-endian (all five are sort
               keys: byte 0 is the most significant, so uint32 order ==
               byte order; the same words double as the byte-verify
               reach)
  combo      = invalid(bit31) | pos (bits [16:0]) — final sort key;
               bit31 sinks non-candidates to their 20-byte group's tail

Convergence certificates (bit-parity contract, reference nearest-first
semantics; full derivations in docs/PARITY.md):

  * *edge-LCP rule*: in suffix order the capped LCP clcp(a, b) =
    min(LCP(a, b), 20) is non-increasing as b moves away from a (the
    suffix-array min-property for a 20-byte-truncated sort), so if
    clcp(p, edge) < clip(L, 4, 20) on BOTH sides of the contiguous +-8
    window, no unseen candidate can beat the claim or tie it nearer;
  * *split edge rule* (length-only): clcp(p, edge) < clip(L+1, 4, 20)
    certifies the LENGTH alone — a tie at exactly L only spoils the
    distance, which the DP never consumes (see probe_pair's LK block);
  * *backward adoption + induction*: length/full exactness propagates
    backward through decay chains from certified tails;
  * *nearest-sharer gap rule*: equal-key groups are pos-sorted, so the
    -1 neighbor is the nearest >=20-byte sharer; claim_d == gap plus a
    known length >= 20 pins the nearest achiever.

Positions with uncertified LENGTH are refined on the host pre-DP
(native.match_refine); certified-length positions with uncertified
distance are fixed post-DP only where chosen (native.match_refine_dist,
early-stop walk).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import format as fmt
from . import sortnet
from .sortmatch import _ext_lcp, _flat_shift, _flat_shift_neg

LANES = 128
CHUNK = 1 << 16          # positions per chunk
PAIR = CHUNK * 2         # merged record count
POS_BITS = 17
POS_MASK = (1 << POS_BITS) - 1
INVALID_BIT = jnp.int32(-0x80000000)  # bit31 of combo

import os as _os

#: byte-verification words per record.  5 (default) = the 20-byte keys
#: alone; 7 adds two payload planes (bytes 20..27) — measured to cut the
#: real-file pre-DP refine volume 37->30.4% (exp/cheap_rules_sim.py) for
#: ~+33% sort plane moves.  Env-switchable for on-chip A/B.
VERIFY_WORDS = int(_os.environ.get("SMALLZ4_TPU_VERIFY_WORDS", "5"))
assert VERIFY_WORDS in (5, 7), VERIFY_WORDS
LOOK = 4 * VERIFY_WORDS  # lookahead bytes per chunk buffer

#: probe-LCP strategy: "composed" (default) derives every probe's capped
#: LCP from ONE adjacent-pair LCP plane via the suffix-array min property
#: (clcp(i, k) = min of adjacent clcps on a prefix-sorted order) — a
#: sparse min-table replaces the per-probe 6-plane shifted lex compare,
#: cutting the probe stage's plane touches ~2.3x with bit-identical
#: values.  "direct" restores the per-probe full compare (A/B hatch).
PROBE_LCP = _os.environ.get("SMALLZ4_TPU_PROBE_LCP", "composed")
assert PROBE_LCP in ("composed", "direct"), PROBE_LCP

NEAR_PROBES = tuple(range(1, 9))
EDGE = NEAR_PROBES[-1]   # contiguous-window edge (the certificate anchor)
#: sparse far-probe offsets in suffix order.  Composed LCPs price a far
#: probe at ~3 shifted planes (vs 7 direct), so the default set reaches
#: depth 160: measured to cut the strict-window miss rate 60.7->30.7%
#: on real files (exp/reach_sim.py depth sweep), where misses are
#: suffix-order reach-limited.  Env-overridable for A/B.
_far_env = _os.environ.get("SMALLZ4_TPU_FAR_PROBES")
FAR_PROBES = (tuple(int(x) for x in _far_env.split(",")) if _far_env
              else (12, 16, 24, 32, 48, 64, 96, 128, 160))
PROBES = NEAR_PROBES + FAR_PROBES
KEY_REACH = 20           # bytes covered by the lexicographic sort key
                         # (round 5: all five words are keys — same plane
                         # moves as the r4 12-byte sort, only the lex
                         # compare deepens; measured -3pp refine volume
                         # on real files, exp/cheap_rules_sim.py)
EXT_REACH = 4 * VERIFY_WORDS  # byte-verified LCP reach (>= the key words)
CHAIN_STEPS = 16         # doubling covers runs/matches to 64 Ki


def pack_cut_gram(b4: bytes) -> int:
    """Boundary-cut gram in the probe kernel's key encoding (big-endian
    int32, matching make_records' k1 plane)."""
    v = int.from_bytes(b4, "big")
    return v - (1 << 32) if v >= 1 << 31 else v


@functools.partial(jax.jit, static_argnames=("chunk",))
def make_records(buf: jnp.ndarray, valid_lo, valid_hi, chunk: int = CHUNK):
    """Record planes for one chunk.  ``buf`` is uint8[chunk + LOOK] (the
    lookahead bytes are the next chunk's real prefix); positions with
    local index outside [valid_lo, valid_hi) are marked non-candidates.

    Words are packed big-endian so uint32 ascending order == byte
    lexicographic order: the sort becomes a true 12-byte suffix order."""
    c = buf.astype(jnp.uint32)
    g = (c[:-3] << 24) | (c[1:-2] << 16) | (c[2:-1] << 8) | c[3:]
    words = [g[4 * i : chunk + 4 * i] for i in range(VERIFY_WORDS)]
    pos = jnp.arange(chunk, dtype=jnp.int32)
    valid = (pos >= valid_lo) & (pos < valid_hi)
    combo = jnp.where(valid, pos, pos | INVALID_BIT)
    # plane order: 5 key words, combo (final key), then any extra
    # verify-payload words (VERIFY_WORDS == 7)
    return tuple(words[:5]) + (combo.view(jnp.uint32),) + tuple(words[5:])


@functools.partial(jax.jit, static_argnames=("chunk", "lean"))
def sort_chunk(buf: jnp.ndarray, valid_lo, valid_hi, chunk: int = CHUNK,
               lean: bool = False):
    """Sort one chunk's records into byte-lexicographic 20-byte suffix
    order: (bytes 0..19, invalid flag, pos) — every record word is a sort
    key, so equal-prefix groups at ALL depths up to 20 are contiguous
    and pos-sorted (the nearest-sharer gap rule's premise).

    ``lean=True`` selects the compact (fori_loop) sort network: ~4x
    slower at runtime but with O(log n) generated code — the cold-start
    variant (its Mosaic compile is a fraction of the unrolled network's;
    the pipeline swaps to the fast variant once that compile lands)."""
    planes = make_records(buf, valid_lo, valid_hi, chunk=chunk)
    # combo embeds pos -> the 6-plane key is distinct per record:
    # unique=True skips the dead pos-tiebreak compare in every stage;
    # extra verify-payload planes (VERIFY_WORDS == 7) ride along
    return sortnet.sort_records(*planes, n_keys=6, unique=True,
                                unroll=False if lean else None)


@functools.partial(jax.jit, static_argnames=("chunk", "lean"))
def empty_halo(chunk: int = CHUNK, lean: bool = False):
    """All-invalid sorted halo planes (stream start / legacy block start:
    no history carries in)."""
    return sort_chunk(jnp.zeros(chunk + LOOK, jnp.uint8),
                      jnp.int32(0), jnp.int32(0), chunk=chunk, lean=lean)


def _lcp_be(xors) -> jnp.ndarray:
    """Byte LCP (0..4*len(xors)) from XORed big-endian word pairs."""
    def bc(x):  # leading equal bytes of one BE xor word
        b0 = ((x >> 24) & 0xFF) != 0
        b1 = ((x >> 16) & 0xFF) != 0
        b2 = ((x >> 8) & 0xFF) != 0
        return jnp.where(b0, 0, jnp.where(b1, 1, jnp.where(b2, 2,
                         jnp.where(x != 0, 3, 4)))).astype(jnp.int32)

    lcp = bc(xors[0])
    for i, x in enumerate(xors[1:], start=1):
        lcp = jnp.where(lcp == 4 * i, 4 * i + bc(x), lcp)
    return lcp


def _probe_kernel(chunk, refs):
    """Neighbor probes over merged suffix-ordered planes.

    in:  scal (SMEM (1,3): cut_gram, cut_pos, match_limit),
         k1, e1, e2, x1, x2, combo
    out: payload (best_len<<16 | best_dist; len clamped to the block cap
         BEFORE the nearest tie-break — reference cap-then-tie
         semantics),
         key ((raw - chunk)<<4 | flags for current-chunk records, sunk to
         the back otherwise; flags bit0 length-truncated (= EXT_REACH
         with cap beyond it), bit1 edge-LCP certificate failed, bit2
         length-only edge certificate failed (split rule: a tie at
         exactly L only spoils the distance, so length is exact iff
         nothing unseen shares L+1), bit3 claim distance == nearest
         >=KEY_REACH-byte-sharer gap (the -1 in-group neighbor: equal-key runs
         are pos-sorted, so it IS the nearest sharer)) — two planes so
         the compact router and the position unsort move half the data
    """
    scal_ref = refs[0]
    plane_refs = refs[1 : 1 + VERIFY_WORDS + 1]
    payload_ref, key_ref = refs[1 + VERIFY_WORDS + 1 :]
    cut_gram, cut_pos = scal_ref[0, 0], scal_ref[0, 1]
    match_limit = scal_ref[0, 2]
    # plane order: 5 key words, combo, extra verify words (if any)
    planes = [r[:] for r in plane_refs]
    k1 = planes[0]
    combo = planes[5]
    vw = planes[:5] + planes[6:]  # the VERIFY_WORDS byte words, in order
    rows = k1.shape[0]
    n = rows * LANES
    slot = sortnet._flat_iota(rows)

    raw = combo & POS_MASK
    local = raw - chunk           # >= 0 for current-chunk records
    # block match cap in claim space (halo records: unbounded — their
    # claims are dropped by the compact anyway)
    cap = jnp.where(local >= 0, jnp.maximum(match_limit - local, 0),
                    jnp.int32(1 << 30))

    best_len = jnp.zeros_like(k1)
    best_dist = jnp.zeros_like(k1)
    elcp_lo = jnp.full_like(k1, -1)   # capped LCP with the -EDGE record
    elcp_hi = jnp.full_like(k1, -1)   # capped LCP with the +EDGE record
    gap = jnp.zeros_like(k1)          # distance to the -1 >=12-sharer

    composed = PROBE_LCP == "composed"
    if composed:
        # Composed probe LCPs (suffix-array min property): the merged
        # planes are sorted by the 20-byte key, so for slots a < c the
        # KEY_REACH-capped LCP obeys clcp(a, c) = min over adjacent
        # clcp(i, i+1) — one adjacent-LCP plane plus a log-step sparse
        # min-table replaces the per-probe 5-word shifted compare.  The
        # composed values are EXACTLY the direct ones (min caps compose:
        # min(min(x,20), min(y,20)) == min(min(x,y), 20)); beyond-key
        # verify words (VERIFY_WORDS == 7) extend per probe below, where
        # the key-capped LCP proves 20 shared bytes first.
        nb1 = [_flat_shift(w, 1) for w in vw[:5]]
        lcp_adj = _lcp_be([w ^ nb for w, nb in zip(vw[:5], nb1)])
        mtab = {1: lcp_adj}           # mtab[e][s] = min lcp_adj[s, s+e)
        e = 1
        while 2 * e <= max(PROBES):
            mtab[2 * e] = jnp.minimum(mtab[e], _flat_shift(mtab[e], e))
            e *= 2

        def window_min(width):
            """min lcp_adj over [s, s+width) — binary decomposition."""
            r, off = None, 0
            for e in sorted(mtab, reverse=True):
                if width & e:
                    part = mtab[e] if off == 0 else _flat_shift(mtab[e], off)
                    r = part if r is None else jnp.minimum(r, part)
                    off += e
            return r

        # boundary-cut exclusion rides the combo plane (bit 29 is free:
        # combo = invalid(31) | pos[16:0]) so probes shift ONE plane
        # instead of re-deriving the cut test from a shifted k1
        cut_hit_self = (k1 == cut_gram) & (raw < cut_pos)
        combo_probe = combo | jnp.where(cut_hit_self, jnp.int32(1) << 29,
                                        jnp.int32(0))

    for sk in PROBES:
        if composed:
            wmin = window_min(sk)
        for sgn in (1, -1):
            k = sk * sgn
            in_range = (slot + k >= 0) & (slot + k < n)
            if composed:
                lcp = wmin if sgn > 0 else _flat_shift(wmin, -sk)
                if VERIFY_WORDS > 5:
                    ext = _lcp_be([w ^ _flat_shift(w, k) for w in vw[5:]])
                    lcp = jnp.where(lcp >= KEY_REACH, KEY_REACH + ext, lcp)
                nb_combo = _flat_shift(combo_probe, k)
                cut_hit = ((nb_combo >> 29) & 1) != 0
            else:
                nb_vw = [_flat_shift(w, k) for w in vw]
                nb_k1 = nb_vw[0]
                nb_combo = _flat_shift(combo, k)
                lcp = _lcp_be([w ^ nb for w, nb in zip(vw, nb_vw)])
            if sk == EDGE:
                # certificate anchor: capped LCP with the contiguous
                # window's outermost record, regardless of its validity
                # (suffix-order monotonicity bounds everything beyond)
                e12 = jnp.where(in_range, jnp.minimum(lcp, KEY_REACH),
                                jnp.int32(-1))
                if sgn > 0:
                    elcp_hi = e12
                else:
                    elcp_lo = e12
            nb_raw = nb_combo & POS_MASK
            d = raw - nb_raw
            if sk == 1 and sgn == -1:
                # nearest >=KEY_REACH-byte sharer: the -1 neighbor when
                # it shares the full sort key (groups are pos-sorted,
                # valid records ahead of invalid ones)
                gap = jnp.where(in_range & (nb_combo >= 0) & (d >= 1)
                                & (lcp >= KEY_REACH), d, 0)
            ok = (in_range & (nb_combo >= 0) & (d >= 1)
                  & (d <= fmt.MAX_DISTANCE)
                  & ~(cut_hit if composed
                      else (nb_k1 == cut_gram) & (nb_raw < cut_pos)))
            lcp_eff = jnp.minimum(jnp.where(ok, lcp, 0), cap)
            better = (lcp_eff > best_len) | (
                (lcp_eff == best_len) & (lcp_eff >= 1) & (d < best_dist))
            best_len = jnp.where(better & ok, lcp_eff, best_len)
            best_dist = jnp.where(better & ok, d, best_dist)

    # edge-LCP certificate: an unseen record beyond the +-EDGE window
    # shares at most clcp(p, edge) bytes (capped-LCP monotonicity of the
    # suffix order); < clip(L, 4, KEY_REACH) on both sides rules out any beater
    # or equal-length-nearer candidate.  Claims are exact when also
    # byte-verified (L < EXT_REACH) or clamped at the block cap.
    th = jnp.clip(best_len, fmt.MIN_MATCH, KEY_REACH)
    cert_fail = (elcp_lo >= th) | (elcp_hi >= th)
    # split rule (length-only): an unseen sharer of exactly L can tie but
    # not beat — the LENGTH is exact iff nothing unseen shares L+1.
    # Only decidable below the key reach.
    th_len = jnp.clip(best_len + 1, fmt.MIN_MATCH, KEY_REACH)
    len_fail = ((elcp_lo >= th_len) | (elcp_hi >= th_len)
                | (best_len >= KEY_REACH))
    gap_hit = (best_dist == gap) & (gap >= 1)
    trunc = (best_len >= EXT_REACH) & (cap > EXT_REACH)
    flags = (trunc.astype(jnp.int32)
             | (cert_fail.astype(jnp.int32) << 1)
             | (len_fail.astype(jnp.int32) << 2)
             | (gap_hit.astype(jnp.int32) << 3))
    payload_ref[:] = (best_len << 16) | best_dist
    # current-chunk records carry (local pos << 4) | flags; halo records
    # sink behind them (the compact keeps keys < 16*chunk)
    key_ref[:] = jnp.where(local >= 0, (local << 4) | flags,
                           jnp.int32(16 * chunk))


def _prefix_count(keep, slot, rows):
    """Inclusive prefix count of ``keep`` (Hillis-Steele over the flat
    plane)."""
    ps = keep.astype(jnp.int32)
    k = 1
    while k < rows * LANES:
        ps = ps + jnp.where(slot >= k, _flat_shift_neg(ps, k), 0)
        k *= 2
    return ps


def _route_front(keep, slot, rows, payload):
    """Order-preserving compaction of ``keep`` slots to the front:
    LSB-first binary-shift routing (conflict-free for monotone packing —
    validated exhaustively in tests/test_chunkmatch.py)."""
    ps = _prefix_count(keep, slot, rows)
    shift = jnp.where(keep, slot - (ps - 1), 0)
    alive = keep
    s = 1
    while s < rows * LANES:
        # Mosaic can't rotate i1 vectors: shift an int32 0/1 mask instead
        mover = jnp.where(alive & ((shift & s) != 0), 1, 0)
        mv_in = (_flat_shift(mover, s) == 1) & (slot + s < rows * LANES)
        stay = alive & ((shift & s) == 0)
        payload = [jnp.where(mv_in, _flat_shift(p, s), p) for p in payload]
        shift = jnp.where(mv_in, _flat_shift(shift, s) - s, shift)
        alive = mv_in | stay
        s *= 2
    return payload, ps


def _bitmask_words(flag, slot, rows):
    """Pack a 0/1 plane into bitmask words: word w = bits of flat slots
    [32w, 32w+32), compacted to the front (n/32 meaningful words)."""
    acc = flag << (slot & 31)
    s = 1
    while s < 32:
        nxt = _flat_shift(acc, s)
        acc = jnp.where((slot & 31) + s < 32, acc | nxt, acc)
        s *= 2
    (words,), _ = _route_front((slot & 31) == 0, slot, rows, [acc])
    return words


def _compact_kernel(chunk, refs):
    """Pack records of the *current* chunk (key < 16*chunk) to the front,
    preserving order.  Two planes: key ((pos<<4)|flags), payload
    (len<<16|dist)."""
    key_ref, payload_ref, okey_ref, opay_ref = refs
    key = key_ref[:]
    rows = key.shape[0]
    keep = key < 16 * chunk
    slot = sortnet._flat_iota(rows)
    (okey, opay), _ = _route_front(keep, slot, rows, [key, payload_ref[:]])
    okey_ref[:] = okey
    opay_ref[:] = opay


def _pallas_planes(kernel, planes, n_out, scalars=None):
    rows = planes[0].shape[0] // LANES
    shaped = [p.reshape(rows, LANES) for p in planes]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(planes)
    args = shaped
    if scalars is not None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = [scalars] + shaped
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * n_out,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(*args)
    return tuple(o.reshape(planes[0].shape[0]) for o in outs)


def _pack_kernel(chunk, refs):
    """Head/delta packing of the position-order match arrays — shrinks the
    device->host result traffic ~6x (the tunnel/PCIe link prices every
    byte).  A position is *predicted* when its claim continues the
    predecessor's match: (len-1, same dist) after len >= 5, or (65535,
    same dist) after a saturated 65535 claim (giant byte runs would
    otherwise make every position a head and overflow HEAD_CAP), else
    literal (1, 0).  Unpredicted positions are heads; we ship a head
    bitmask (1 bit/pos) plus the compacted (len16 | dist16) head words,
    plus two certificate bitmasks.

    in:  lens, dists, conv, lk (position order, int32)
    out: bits (chunk/32 words, bit i of word w = head at 32w+i),
         packed (len16|dist16 at head rank), n_heads (lane 0),
         conv_bits (chunk/32 words, bit = fully converged),
         lk_bits (chunk/32 words, bit = length-known)
    """
    (len_ref, dist_ref, conv_ref, lk_ref, bits_ref, packed_ref, count_ref,
     cbits_ref, kbits_ref) = refs
    lens, dists = len_ref[:], dist_ref[:]
    rows = lens.shape[0]
    slot = sortnet._flat_iota(rows)

    prev_len = _flat_shift_neg(lens, 1)
    prev_dist = _flat_shift_neg(dists, 1)
    pred_len = jnp.where(prev_len == 65535, 65535,
                         jnp.where(prev_len >= 5, prev_len - 1, 1))
    pred_dist = jnp.where(prev_len >= 5, prev_dist, 0)
    head = (lens != pred_len) | (dists != pred_dist) | (slot == 0)

    bits_ref[:] = _bitmask_words(jnp.where(head, 1, 0), slot, rows)
    cbits_ref[:] = _bitmask_words(conv_ref[:] & 1, slot, rows)
    kbits_ref[:] = _bitmask_words(lk_ref[:] & 1, slot, rows)

    # --- compacted head payload: len16 | dist16 ---
    payload = (jnp.minimum(lens, 65535) << 16) | (dists & 0xFFFF)
    (vals,), ps = _route_front(head, slot, rows, [payload])
    # total head count lives at the last flat slot; rotate it to slot 0
    # (Mosaic has no 2D broadcast of a (1,1) slice)
    count_ref[:] = pltpu.roll(pltpu.roll(ps, 1, 0), 1, 1)
    packed_ref[:] = vals


@functools.partial(jax.jit, static_argnames=("chunk",))
def pack_results(lens: jnp.ndarray, dists: jnp.ndarray, conv: jnp.ndarray,
                 lk: jnp.ndarray, chunk: int = CHUNK):
    """Pack (lens, dists, conv, lk) into (head bitmask words, compacted
    head words, n_heads, conv bitmask words, lk bitmask words).  Host
    inverse: unpack_results."""
    bits, packed, count, cbits, kbits = _pallas_planes(
        functools.partial(_pack_kernel, chunk),
        [lens.astype(jnp.int32), dists.astype(jnp.int32),
         conv.astype(jnp.int32), lk.astype(jnp.int32)], 5)
    return (bits[: chunk // 32], packed, count[0], cbits[: chunk // 32],
            kbits[: chunk // 32])


def unpack_bits_rows(bits, chunk):
    """Bitmask words [R, chunk//32] -> bool [R, chunk]."""
    import numpy as np

    words = np.ascontiguousarray(np.asarray(bits)).astype(np.uint32)
    R = words.shape[0]
    return np.unpackbits(words.view(np.uint8).reshape(R, -1), axis=1,
                         bitorder="little")[:, :chunk].astype(bool)


def _unpack_bits(bits, chunk):
    import numpy as np

    return unpack_bits_rows(np.asarray(bits)[None], chunk)[0]


def unpack_rows(bits, packed, chunk: int = CHUNK):
    """Vectorized numpy inverse of pack_results over stacked rows.

    bits: int-like [R, chunk//32] head bitmask words; packed: [R, >=1]
    compacted head words (rows with more heads than packed columns are the
    caller's overflow problem — their output is garbage here).  Returns
    (lens, dists) as int32 [R, chunk].

    Decay-fill: from each head, len decreases by 1 and dist holds until the
    prediction floors at the literal (1, 0)."""
    import numpy as np

    words = np.ascontiguousarray(np.asarray(bits)).astype(np.uint32)
    R = words.shape[0]
    head = np.unpackbits(words.view(np.uint8).reshape(R, -1), axis=1,
                         bitorder="little")[:, :chunk].astype(bool)
    pos = np.arange(chunk, dtype=np.int32)
    seg = np.cumsum(head, axis=1, dtype=np.int32) - 1  # head rank per pos
    start = np.maximum.accumulate(np.where(head, pos, 0), axis=1)
    pk = np.asarray(packed)
    vals = np.take_along_axis(pk, np.minimum(seg, pk.shape[1] - 1), axis=1)
    base = (vals >> 16) & 0xFFFF
    fill = base - (pos - start)
    # saturated heads (65535) predict 65535 until the next head
    fill = np.where(base == 65535, 65535, fill)
    lens = np.where(fill >= fmt.MIN_MATCH, fill, 1).astype(np.int32)
    dists = np.where(lens >= fmt.MIN_MATCH, vals & 0xFFFF, 0).astype(np.int32)
    return lens, dists


def unpack_results(bits, packed, chunk: int = CHUNK):
    """Numpy inverse of pack_results: rebuild full lens/dists arrays."""
    import numpy as np

    l, d = unpack_rows(np.asarray(bits)[None], np.asarray(packed)[None],
                       chunk=chunk)
    return l[0], d[0]


HEAD_CAP = 1 << 15  # fetched head slots per chunk (overflow -> host redo).
                    # Text-heavy corpora run ~19-29 K heads per 64 Ki chunk
                    # (claim-change density), so 2^14 forced whole-chunk
                    # host redos; 2^15 covers everything measured while the
                    # adaptive fetch (collect_block) still ships only the
                    # realized head count.
GROUP = 64          # chunks per fused scan call (4 MB at CHUNK = 64 Ki):
                    # one dispatch + one result fetch per default block —
                    # the tunnel/PCIe link prices round-trips, not just bytes


@functools.partial(jax.jit, static_argnames=("n_chunks", "head_cap", "chunk",
                                             "lean"))
def match_chunks(
    halo,                  # sorted planes of the chunk preceding bufs[0]
    bufs,                  # uint8[n_chunks, chunk + LOOK]
    cand_hi,               # int32[n_chunks]: candidate validity end (local)
    valid_hi,              # int32[n_chunks]: claim validity end (local)
    match_limit,           # int32[n_chunks]: block match cap (local coords)
    cut_gram,              # int32: boundary-cut gram for chunk 0 (see below)
    cut_pos,               # int32: cut pos in halo-local coords (-1: off)
    n_chunks: int = GROUP,
    head_cap: int = HEAD_CAP,
    chunk: int = CHUNK,
    lean: bool = False,    # compact sort networks (cold-start variant)
):
    """The fused device encode path: scan ``n_chunks`` consecutive chunks,
    each sorted once and probed against its predecessor's already-sorted
    records (bitonic merge), results head/delta-packed on device.

    Carry = the current chunk's sorted planes (device-resident across
    calls, so a whole stream chains through with zero host round-trips).
    Returns (next_halo, (bits, packed[:head_cap], n_heads, conv_bits,
    lk_bits)) with the ys stacked over chunks.  Scalar ``cut_gram``/``cut_pos``
    apply to chunk 0 only (block starts align with call boundaries; the
    pipeline contract); int32[n_chunks] arrays give every chunk its own
    boundary cut (the sharded driver's contract, where one call spans
    several block starts).
    """
    cut_gram = jnp.asarray(cut_gram, jnp.int32)
    cut_pos = jnp.asarray(cut_pos, jnp.int32)
    if cut_gram.ndim == 1:
        cgs, cps = cut_gram, cut_pos
    else:
        idx = jnp.arange(n_chunks, dtype=jnp.int32)
        cgs = jnp.where(idx == 0, cut_gram, 0)
        cps = jnp.where(idx == 0, cut_pos, -1)

    def step(carry, xs):
        buf, ch, vh, ml, cg, cp = xs
        cur = sort_chunk(buf, jnp.int32(0), ch, chunk=chunk, lean=lean)
        lens, dists, conv, lk = probe_pair(
            carry, cur, cg, cp, jnp.int32(0), vh, ml, chunk=chunk,
            lean=lean)
        bits, packed, n_heads, cbits, kbits = pack_results(
            lens, dists, conv, lk, chunk=chunk)
        return cur, (bits, packed[:head_cap], n_heads, cbits, kbits)

    return jax.lax.scan(
        step, halo, (bufs, cand_hi, valid_hi, match_limit, cgs, cps))


@functools.partial(jax.jit, static_argnames=("n_chunks", "chunk"))
def match_chunks_raw(
    halo, bufs, cand_hi, valid_hi, match_limit, cut_gram, cut_pos,
    n_chunks: int = GROUP, chunk: int = CHUNK,
):
    """match_chunks without the head/delta pack: returns the raw claim
    planes (lens u16, dists u16, conv bool, lk bool) per chunk, kept ON
    DEVICE — the front half of the device-resident encode (match ->
    ops.parse DP -> ops.emit), where claims feed the device DP instead
    of crossing the host link."""
    cut_gram = jnp.asarray(cut_gram, jnp.int32)
    cut_pos = jnp.asarray(cut_pos, jnp.int32)
    if cut_gram.ndim == 1:
        cgs, cps = cut_gram, cut_pos
    else:
        idx = jnp.arange(n_chunks, dtype=jnp.int32)
        cgs = jnp.where(idx == 0, cut_gram, 0)
        cps = jnp.where(idx == 0, cut_pos, -1)

    def step(carry, xs):
        buf, ch, vh, ml, cg, cp = xs
        cur = sort_chunk(buf, jnp.int32(0), ch, chunk=chunk)
        lens, dists, conv, lk = probe_pair(
            carry, cur, cg, cp, jnp.int32(0), vh, ml, chunk=chunk)
        return cur, (lens, dists, conv, lk)

    return jax.lax.scan(
        step, halo, (bufs, cand_hi, valid_hi, match_limit, cgs, cps))


def _shift_up(x: jnp.ndarray, s: int, fill):
    """out[i] = x[i + s] (XLA slice + pad — position-order chain step)."""
    if s >= x.shape[0]:
        return jnp.full_like(x, fill)
    return jnp.concatenate([x[s:], jnp.full((s,), fill, x.dtype)])


@functools.partial(jax.jit, static_argnames=("chunk", "lean"))
def probe_pair(
    halo,                 # (k1, e1, e2, x1, x2, combo) sorted planes of chunk i-1
    cur,                  # same for chunk i
    cut_gram,             # int32: gram at the boundary-cut position
    cut_pos,              # int32: local pos of the cut in the halo (-1: off)
    valid_lo,             # int32: first searchable local pos of chunk i
    valid_hi,             # int32: one past last candidate pos of chunk i
    match_limit,          # int32: block match cap in chunk-i local coords
    chunk: int = CHUNK,
    lean: bool = False,   # compact sort networks (cold-start variant)
):
    """Match search for every position of chunk i against the merged
    (chunk i-1, chunk i) candidate set.  Returns (lens u16, dists u16,
    conv bool, lk bool) of shape [CHUNK] in position order — ``conv``
    is the full (len + nearest-dist) certificate, ``lk`` the length-only
    certificate (see the LK block below: DP parity needs only lengths;
    distances are fixed post-DP at chosen positions)."""
    # rebase chunk i positions to [chunk, 2*chunk) and merge; combo is
    # the final key, so halo records keep sorting ahead of current-chunk
    # records inside equal-20-byte groups (pos order preserved)
    cur_list = list(cur)
    cur_list[5] = (cur[5].view(jnp.int32) + chunk).view(jnp.uint32)
    planes = [jnp.concatenate([h, c]) for h, c in zip(halo, cur_list)]
    merged = sortnet.merge_sorted(*planes, n_keys=6, unique=True)

    scal = jnp.stack([
        jnp.asarray(cut_gram, jnp.int32), jnp.asarray(cut_pos, jnp.int32),
        jnp.asarray(match_limit, jnp.int32)]).reshape(1, 3)
    p_pay, p_key = _pallas_planes(
        functools.partial(_probe_kernel, chunk),
        [m.view(jnp.int32) if m.dtype == jnp.uint32 else m
         for m in merged],
        2, scalars=scal)

    c_key, c_pay = _pallas_planes(
        functools.partial(_compact_kernel, chunk), [p_key, p_pay], 2)
    c_key, c_pay = c_key[:chunk], c_pay[:chunk]

    # unsort to position order ((key >> 4) is a permutation of [0, CHUNK))
    s_key, s_pay = sortnet.sort_records(c_key.view(jnp.uint32), c_pay,
                                        n_keys=1, unique=True,
                                        unroll=False if lean else None)
    flags0 = (s_key & 15).astype(jnp.int32)
    lens0 = (s_pay >> 16) & 0xFFFF
    dists0 = s_pay & 0xFFFF

    # same-distance doubling: 20-byte claims extend to exact full lengths
    # (distance-1 byte runs resolve here too); claims stay byte-verified
    lens1 = lens0
    s = 1
    for _ in range(CHAIN_STEPS):
        nb_len = _shift_up(lens1, s, 0)
        nb_dist = _shift_up(dists0, s, 0)
        grow = (nb_dist == dists0) & (dists0 >= 1) & (lens1 >= s)
        lens1 = jnp.where(grow, jnp.maximum(lens1, s + nb_len), lens1)
        s *= 2

    pos = jnp.arange(chunk, dtype=jnp.int32)
    valid = (pos >= valid_lo) & (pos < valid_hi)
    cap = jnp.maximum(match_limit - pos, 0)
    lens2 = jnp.minimum(lens1, cap)
    match = valid & (lens2 >= fmt.MIN_MATCH)
    lens = jnp.where(match, lens2, 1)
    dists = jnp.where(match, dists0, 0)

    truncated = (flags0 & 1) != 0
    cert_fail = (flags0 & 2) != 0
    len_fail = (flags0 & 4) != 0
    gap_hit = (flags0 & 8) != 0
    conv = (~truncated & ~cert_fail) | ~valid
    # a d=1 claim at the true block cap is complete and provably the
    # nearest achiever; farther at-cap claims stay unconverged (the
    # reference keeps the nearest among equally long matches)
    conv = conv | (match & (lens2 >= cap) & (dists0 == 1))

    # Backward induction certificate (proof in docs/PARITY.md): a byte-
    # verified claim (L, d) at p with an EXACT (L-1, d) at p+1 and L
    # strictly below p's block cap is itself exact — any longer window
    # candidate at p would shift to a >L-1 candidate at p+1 (same d,
    # still in-window), contradicting p+1's exactness, and every exact-L
    # achiever at p shifts into p+1's (L-1)-achiever set, so p+1's
    # nearest-achiever distance lower-bounds p's, which claim d attains.
    # Certifies whole match runs from their certified tails (the per-
    # position reach/edge rules only certify claims with LCP < 20 or at
    # the block cap — without induction every position covered by a very
    # long match funnels to host refine on match-dense corpora).  log-step
    # propagation over the decay-chain relation.  Disabled when a
    # boundary chain cut is live in this chunk: the shift argument needs
    # candidate reachability to carry from p to p+1, which a cut on
    # gram(p+1) can break (1/64 of chunks at the default layout).
    chain_ok = (match & (lens2 >= fmt.MIN_MATCH + 1) & (lens2 < cap)
                & (_shift_up(lens2, 1, 0) == lens2 - 1)
                & (_shift_up(dists, 1, 0) == dists)
                & (cut_pos < 0))
    c = conv
    ok = chain_ok
    s = 1
    for _ in range(CHAIN_STEPS):
        c = c | (ok & _shift_up(c, s, False))
        ok = ok & _shift_up(ok, s, False)
        s *= 2
    conv = c

    # --- length-known certificate (LK): the length/distance split ---
    # The optimal parser consumes only LENGTHS (an LZ4 match costs the
    # same bytes at any distance; the sole distance-sensitive DP rule is
    # the MaxSameLetter run shortcut, excluded below), so DP bit-parity
    # needs exact lengths everywhere but exact nearest-of-max distances
    # only at DP-chosen positions (fixed post-DP by an early-stop host
    # walk).  Anchors — positions whose claim LENGTH is provably the
    # reference's max:
    #   * conv (fully exact),
    #   * split edge rule: elcp < clip(L+1, 4, 12) on both sides means
    #     nothing unseen shares L+1 bytes — a tie at exactly L spoils
    #     only the distance (byte-verified claims below the doubling
    #     reach and below cap),
    #   * at-cap claims: the claim's own doubling-verified candidate
    #     reaches the cap, so the clamped length is exact.
    # Adoption (candidate-shift lemma): L*(p) <= L*(p+1) + 1 whenever
    # L*(p) >= 2 — any achiever r of p shifts to candidate r+1 of p+1
    # with the same in-window distance.  Claims are genuine matches, so
    # claim(p) == claim(p+1) + 1 with LK(p+1) forces L*(p) == claim(p).
    # Guards: below cap (cap clamping breaks the shift), below
    # MaxSameLetter (the DP run shortcut reads the distance there), and
    # no live boundary cut (a cut on gram(r+1) breaks the shift lemma).
    msl_ok = lens2 < fmt.MAX_SAME_LETTER
    lenok = ~len_fail & ~truncated & (lens2 < cap) & match
    anchors = (conv | (lenok & msl_ok)
               | (match & (lens2 >= cap) & msl_ok & (cut_pos < 0)))
    adopt_ok = (match & (lens2 >= fmt.MIN_MATCH + 1) & (lens2 < cap)
                & msl_ok
                & (_shift_up(lens2, 1, 0) == lens2 - 1)
                & (cut_pos < 0))
    lk = anchors
    ok = adopt_ok
    s = 1
    for _ in range(CHAIN_STEPS):
        lk = lk | (ok & _shift_up(lk, s, False))
        ok = ok & _shift_up(ok, s, False)
        s *= 2

    # nearest-sharer distance rule: with LK and L >= 12, any candidate
    # nearer than the -1 in-group gap shares < 12 <= L bytes and cannot
    # achieve the max; the claim's own candidate does — so claim_d ==
    # gap IS the nearest achiever.  Lifts LK to full convergence.
    conv = conv | (lk & match & (lens2 >= KEY_REACH) & gap_hit
                   & (cut_pos < 0))
    lk = lk | conv

    saturated = lens > 65535
    conv = conv & ~saturated
    lk = lk & ~saturated
    return (jnp.minimum(lens, 65535).astype(jnp.uint16),
            dists.astype(jnp.uint16), conv, lk)
