"""Sorted-neighborhood device matcher — the gather-free TPU match finder.

The reference's hot loop (smallz4.h:173-255,603-744) walks per-position
hash chains: a pointer-chase that maps to per-lane random gathers, the
one primitive this hardware does not have (Mosaic's dynamic gather is
vreg-local; XLA's lowering measures 0.05-0.13 G/s — exp/probe_tpu*.py).
This module re-derives the search as dense sort/roll/compare work:

1. **Sort** all window positions by the composite key
   (gram4, hash8|hash16, pos) with a Pallas bitonic network
   (ops/sortnet.py).  Equal 4-byte grams become contiguous runs, ordered
   inside by 8/16-byte-prefix hashes and then by position — an
   approximate suffix order, so high-LCP candidates are sorted-adjacent.
2. **Probe neighbors**: for each sorted slot, compare against slots at
   static offsets ±k (contiguous 1..8 plus a sparse far set).  Each
   record carries its next 8 bytes (two payload words), so a probe
   yields a *byte-verified* LCP of up to 12 with zero hash trust and
   zero gathers — every comparison is a static roll.
3. **Unsort** (second bitonic, key = position).
4. **Same-distance chaining**: log-step doubling in position order
   extends verified 12-byte claims into exact unbounded match lengths
   (a match of length L at distance d implies interior positions carry
   distance-d claims, so len[p] = max(len[p], s + len[p+s]) when
   dist matches and len[p] >= s — all claims stay byte-verified).
   Distance-1 byte runs resolve analytically from the run-length array
   (the reference's MaxSameLetter shortcut, smallz4.h:631-643).

Convergence: a position whose whole gram4 group fits inside the
contiguous ±8 probe window and whose LCP stayed below the 12-byte
verification reach has provably seen *every* window candidate — its
(len, nearest dist) equals the reference -9 search bit-for-bit.  Other
positions hold a valid, verified, near-optimal match; parity mode
refines them on the host (native.match_refine), fast mode keeps them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import format as fmt
from . import sortnet

LANES = 128
INVALID_POS = jnp.int32(1 << 30)
HALO = fmt.MAX_DISTANCE  # 64 KB - 1 window history (match_finder.HALO)

# contiguous neighborhood (drives the convergence proof) + sparse far probes
NEAR_PROBES = tuple(range(1, 9))
FAR_PROBES = (12, 16, 24, 32, 48, 64)
PROBES = NEAR_PROBES + FAR_PROBES
EXT_REACH = 12  # byte-verified LCP reach: gram4 + two 4-byte payload words


def _flat_shift(plane: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = in[i + k] over the flattened (R, 128) plane (k != 0;
    wrap-around values are masked by the caller via slot indices)."""
    rows = plane.shape[0]
    if k < 0:
        return _flat_shift_neg(plane, -k)
    q, r = divmod(k, LANES)
    a = pltpu.roll(plane, rows - q % rows, 0) if q else plane
    if r == 0:
        return a
    b = pltpu.roll(a, rows - 1, 0)  # one more row ahead
    la = pltpu.roll(a, LANES - r, 1)
    lb = pltpu.roll(b, LANES - r, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane < LANES - r, la, lb)


def _flat_shift_neg(plane: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = in[i - k], k > 0."""
    rows = plane.shape[0]
    q, r = divmod(k, LANES)
    a = pltpu.roll(plane, q % rows, 0)
    if r == 0:
        return a
    b = pltpu.roll(a, 1, 0)  # one row back
    la = pltpu.roll(a, r, 1)
    lb = pltpu.roll(b, r, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane >= r, la, lb)


def _ext_lcp(xe1: jnp.ndarray, xe2: jnp.ndarray) -> jnp.ndarray:
    """Equal-byte prefix length (0..8) of two xor'd little-endian word
    pairs (bytes 4..12 of both suffixes)."""
    def word(x):
        b0 = (x & 0xFF) != 0
        b1 = (x & 0xFF00) != 0
        b2 = (x & 0xFF0000) != 0
        return jnp.where(b0, 0, jnp.where(b1, 1, jnp.where(b2, 2,
                         jnp.where(x != 0, 3, 4)))).astype(jnp.int32)
    w1 = word(xe1)
    return jnp.where(w1 < 4, w1, 4 + word(xe2))


def _scan_kernel(refs):
    """Neighbor probes over the sorted record planes.

    in:  k1 (gram4 bits), pos, e1, e2   (sorted order)
    out: best_len (0 or 4..12), best_dist, flags (bit0: ext-capped,
         bit1: group extends beyond the contiguous probe window)
    """
    k1_ref, pos_ref, e1_ref, e2_ref, len_ref, dist_ref, flag_ref = refs
    k1, pos, e1, e2 = k1_ref[:], pos_ref[:], e1_ref[:], e2_ref[:]
    rows = k1.shape[0]
    n = rows * LANES
    slot = sortnet._flat_iota(rows)

    best_len = jnp.zeros_like(k1)
    best_dist = jnp.zeros_like(k1)
    group_more = jnp.zeros_like(k1, dtype=jnp.bool_)

    for sk in PROBES:
        for sgn in (1, -1):
            k = sk * sgn
            in_range = (slot + k >= 0) & (slot + k < n)
            nb_k1 = _flat_shift(k1, k)
            nb_pos = _flat_shift(pos, k)
            d = pos - nb_pos
            eq4 = in_range & (nb_k1 == k1)
            ok = eq4 & (d >= 1) & (d <= fmt.MAX_DISTANCE)
            if sk == 8:
                group_more = group_more | eq4
            nb_e1 = _flat_shift(e1, k)
            nb_e2 = _flat_shift(e2, k)
            lcp = jnp.where(ok, 4 + _ext_lcp(e1 ^ nb_e1, e2 ^ nb_e2), 0)
            better = (lcp > best_len) | (
                (lcp == best_len) & (lcp >= 4) & (d < best_dist))
            best_len = jnp.where(better & ok, lcp, best_len)
            best_dist = jnp.where(better & ok, d, best_dist)

    flags = (best_len >= EXT_REACH).astype(jnp.int32) \
        | (group_more.astype(jnp.int32) << 1)
    len_ref[:] = best_len
    dist_ref[:] = best_dist
    flag_ref[:] = flags


def _neighbor_scan(k1, pos, e1, e2):
    n = k1.shape[0]
    rows = n // LANES
    shaped = [p.reshape(rows, LANES) for p in (k1, pos, e1, e2)]
    outs = pl.pallas_call(
        lambda *refs: _scan_kernel(refs),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(*shaped)
    return tuple(o.reshape(n) for o in outs)


def _chain_kernel(steps, refs):
    """Same-distance doubling in position order: len[p] -> s + len[p+s]
    when dist[p] == dist[p+s] and len[p] >= s (claims stay verified)."""
    len_ref, dist_ref, olen_ref = refs
    ln, dist = len_ref[:], dist_ref[:]
    rows = ln.shape[0]
    n = rows * LANES
    slot = sortnet._flat_iota(rows)
    s = 1
    for _ in range(steps):
        nb_len = _flat_shift(ln, s)
        nb_dist = _flat_shift(dist, s)
        ok = (slot + s < n) & (nb_dist == dist) & (dist >= 1) & (ln >= s)
        ln = jnp.where(ok, jnp.maximum(ln, s + nb_len), ln)
        s *= 2
    olen_ref[:] = ln


def _chain(lens, dists, steps):
    n = lens.shape[0]
    rows = n // LANES
    out = pl.pallas_call(
        lambda *refs: _chain_kernel(steps, refs),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(lens.reshape(rows, LANES), dists.reshape(rows, LANES))
    return out.reshape(n)


def _mix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cheap word-pair mix for the prefix-hash sort keys (order hints
    only — never trusted for match claims)."""
    h = (a ^ (b * jnp.uint32(0x9E3779B1)))
    return h * jnp.uint32(0x85EBCA77)


@functools.partial(jax.jit, static_argnames=("n_entries", "chain_steps"))
def match_segment(
    buf: jnp.ndarray,          # uint8[>= n_entries + 16] segment buffer
    start_valid: jnp.ndarray,  # int32: first real byte
    end_valid: jnp.ndarray,    # int32: one past last real byte
    n_entries: int = 1 << 17,  # sortable positions (power of two)
    chain_steps: int = 14,
    cut_boundary=False,        # bool: block-boundary chain cut at HALO-12
    limit_final=True,          # bool: end_valid is the true block limit
):
    """Match search over every position of ``buf[:n_entries]``.

    Returns position-order (lens, dists, conv): lens >= 1 with literal
    convention len=1 (match_finder contract), verified distances, and the
    bit-exactness certificate per the module docstring.

    ``cut_boundary``: reproduce the reference's block-boundary chain cut
    (oracle.py; smallz4.h re-insertion anomaly): candidates sharing the
    gram of position HALO-BLOCK_END_NO_MATCH that precede it are
    unreachable from the new block's searches.

    ``limit_final``: when False, ``end_valid`` is a segment read-ahead
    bound (the block continues beyond this buffer), so claims that hit
    the cap are truncation artifacts and must not be marked converged.
    """
    n = n_entries
    assert buf.shape[0] >= n + 16, "need a 16-byte gram/payload lookahead"
    cut_boundary = jnp.asarray(cut_boundary, bool)
    limit_final = jnp.asarray(limit_final, bool)
    c = buf.astype(jnp.uint32)
    g = c[:-3] | (c[1:-2] << 8) | (c[2:-1] << 16) | (c[3:] << 24)
    g4 = g[:n]
    e1 = g[4 : n + 4]
    e2 = g[8 : n + 8]
    h8 = _mix(g4, e1)
    h16 = _mix(h8, _mix(e2, g[12 : n + 12]))
    k2 = (h8 & jnp.uint32(0xFFFF0000)) | (h16 >> 16)

    pos = jnp.arange(n, dtype=jnp.int32)
    valid = (pos >= start_valid) & (pos + fmt.BLOCK_END_NO_MATCH <= end_valid)
    cut_pos = min(HALO - fmt.BLOCK_END_NO_MATCH, n - 1)  # static
    precut = cut_boundary & (g4 == g4[cut_pos]) & (pos < cut_pos)
    valid = valid & ~precut
    pos_t = jnp.where(valid, pos, pos + INVALID_POS)

    s_k1, _, s_pos, s_e1, s_e2 = sortnet.sort_records(
        g4, k2, pos_t, e1.view(jnp.int32), e2.view(jnp.int32), n_keys=2)

    blen, bdist, bflag = _neighbor_scan(
        s_k1.view(jnp.int32), s_pos, s_e1, s_e2)

    # unsort by the raw position (strip the invalid-entry offset)
    s_pos_raw = (s_pos & (INVALID_POS - 1)).view(jnp.uint32)
    _, lens0, dists0, flags0 = sortnet.sort_records(
        s_pos_raw, blen, bdist, bflag, n_keys=1)

    # distance-1 byte runs: exact analytic LCP (reference run handling,
    # smallz4.h:631-643) via the Pallas run-length kernel
    from . import pallas_kernels

    runs = pallas_kernels.run_lengths(buf[:n])
    prev_run = jnp.concatenate([jnp.zeros(1, jnp.int32), runs[:-1]])
    d1_len = prev_run - 1
    # the run's source byte (pos-1) must be a real candidate position
    d1_ok = valid & (d1_len >= 4) & (pos - 1 >= start_valid)
    # ties prefer d=1: it is the nearest possible distance (reference
    # nearest-first walk keeps the nearest among equally long matches)
    take_d1 = d1_ok & (d1_len >= lens0)
    lens1 = jnp.where(take_d1, d1_len, lens0)
    dists1 = jnp.where(take_d1, 1, dists0)
    flags1 = flags0

    lens2 = _chain(lens1, dists1, chain_steps)

    cap = jnp.maximum(end_valid - fmt.BLOCK_END_LITERALS - pos, 0)
    lens3 = jnp.minimum(lens2, cap)
    match = valid & (lens3 >= fmt.MIN_MATCH)
    lens = jnp.where(match, lens3, 1)
    dists = jnp.where(match, dists1, 0)

    truncated = (flags1 & 1) != 0
    group_more = (flags1 & 2) != 0
    conv = (~truncated & ~group_more) | ~valid
    # a d=1 claim that slammed into the *block* cap is complete AND
    # provably the nearest achiever (d=1 is the minimum distance);
    # farther claims that hit the cap stay unconverged — a nearer
    # equal-length candidate could exist, and the reference keeps the
    # nearest among equals.  A segment read-ahead cap proves nothing.
    conv = conv | (limit_final & match & (lens3 >= cap) & (dists1 == 1))
    # any claim capped by a non-final segment bound is a truncation
    conv = conv & ~(match & (lens3 >= cap) & ~limit_final)
    return lens, dists, conv


# production segment geometry (shared with ops.match_finder / pipeline):
# [ 64 KB-1 halo | 64 Ki searched positions | 1 pad ] = 2^17 records; the
# buffer additionally carries the pipeline's read-ahead tail.
N_ENTRIES = 1 << 17
SEG = N_ENTRIES - HALO - 1  # 65536 searched positions per segment


@functools.partial(jax.jit, static_argnames=("chain_steps",))
def match_segments(
    bufs: jnp.ndarray,         # uint8[B, >= N_ENTRIES + 16]
    start_valid: jnp.ndarray,  # int32[B]
    end_valid: jnp.ndarray,    # int32[B]
    cut_boundary: jnp.ndarray,  # bool[B]
    limit_final: jnp.ndarray,   # bool[B]: end_valid == block limit
    chain_steps: int = 14,
):
    """Batched sorted-neighborhood search — drop-in for
    ops.match_finder.match_segments (same compact [B, SEG] outputs).
    Each row is one segment buffer [halo | SEG positions | read-ahead].
    """
    def one(buf, sv, ev, cut, fin):
        lens, dists, conv = match_segment(
            buf, sv, ev, n_entries=N_ENTRIES, chain_steps=chain_steps,
            cut_boundary=cut, limit_final=fin)
        s = slice(HALO, HALO + SEG)
        return lens[s], dists[s], conv[s]

    lens, dists, conv = jax.vmap(one)(
        bufs, start_valid, end_valid, cut_boundary, limit_final)
    saturated = lens >= 65536
    lens16 = jnp.minimum(lens, 65535).astype(jnp.uint16)
    return lens16, dists.astype(jnp.uint16), conv & ~saturated
