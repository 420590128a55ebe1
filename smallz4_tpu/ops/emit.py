"""Device sequence emitter: LZ4 block serialization as prefix-sum pack.

Mirrors the host emitter byte-for-byte (native/src/tlz4.cpp emit_block;
reference semantics smallz4.h:259-371): the final parse decisions
(lens after the DP, dists) become token bytes, 255-chained length
extensions, literal copies and little-endian offsets — ON DEVICE, so a
device-resident encode ships compressed bytes (~0.2-0.5 B per input
byte at -9 ratios) over the host link instead of claims.

Formulation (SURVEY.md §7 step 6):

  1. **Walk marking** — the emit walk visits position 0, then hops
     +len at chosen matches / +1 at literals; its orbit is marked in
     log2(n) rounds (scatter the frontier through 2^k-hop jump tables).
  2. **Sequence table** — visited match starts terminate sequences; a
     rank cumsum compacts (literal-run start, literal count, match
     len, dist) per sequence into a fixed-shape table (padded).
  3. **Prefix-sum layout** — per-sequence byte counts (token + literal
     extensions + literals + offset + match extensions, last-token
     literals-only rule) cumsum into output segment offsets.
  4. **Output-centric gather** — each output byte finds its segment by
     searchsorted and computes itself: a token nibble pair, a 255-chain
     byte, a literal (gather from the block), or an offset byte.

Every step is jnp-level (XLA): gathers are acceptable here — this runs
in the device-resident mode whose DP is already gather-bound; the win
is the link volume, not this kernel's FLOPs.  Byte-parity with
emit_block is differentially tested (tests/test_emit.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import format as fmt


def _ext_count(v: jnp.ndarray) -> jnp.ndarray:
    """Byte count of put_ext(v): 255-chains then the remainder byte."""
    return v // 255 + 1


def _ext_byte(v: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """k-th byte of put_ext(v): 255 while whole 255s remain, then the
    remainder (v - 255*k)."""
    return jnp.where(k < v // 255, 255, v - 255 * k)


def _orbit(nxt: jnp.ndarray, N: int) -> jnp.ndarray:
    """Orbit of position 0 under i -> nxt[i] (nxt == N: walked off the
    end).  After round k the set holds everything reachable in
    <= 2^k - 1 hops; jump tables square each round."""
    visited = jnp.zeros(N, bool).at[0].set(True)
    jump = nxt
    s = 1
    while s < N:
        tgt = jnp.where(visited & (jump < N), jump, jnp.int32(N))
        visited = visited.at[tgt].max(True, mode="drop")
        jump = jnp.where(jump < N,
                         jnp.take(jump, jnp.clip(jump, 0, N - 1)),
                         jnp.int32(N))
        s *= 2
    return visited


@jax.jit
def emit_block_device(block: jnp.ndarray, lens: jnp.ndarray,
                      dists: jnp.ndarray):
    """Serialize one block's parse on device.

    block: uint8[N] raw input bytes; lens/dists: int32[N] parse
    decisions exactly as the DP writes them back (1 = literal, else the
    match length; the trailing BLOCK_END_LITERALS positions are
    literals).  The arrays must be exactly the block (no padding).
    Returns (out uint8[N + N//255 + 16], n_out int32): payload bytes
    byte-equal to native.emit_block(block, lens, dists)."""
    N = block.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    L = jnp.maximum(lens.astype(jnp.int32), 1)

    # 1. the emit walk's orbit (smallz4.h:300: positions covered by a
    # chosen match are skipped)
    nxt = jnp.minimum(idx + L, jnp.int32(N))
    visited = _orbit(nxt, N)
    m_start = visited & (L > 1)

    # 2. sequence table, compacted by rank (row n_match = the closing
    # literals-only token, smallz4.h:306-308,342-344)
    rank = jnp.cumsum(m_start.astype(jnp.int32)) - m_start.astype(jnp.int32)
    n_match = jnp.sum(m_start.astype(jnp.int32))
    S = N
    tgt = jnp.where(m_start, rank, jnp.int32(S))  # S = dropped
    mpos = jnp.zeros(S, jnp.int32).at[tgt].set(idx, mode="drop")
    mlen = jnp.zeros(S, jnp.int32).at[tgt].set(L, mode="drop")
    mdist = jnp.zeros(S, jnp.int32).at[tgt].set(dists.astype(jnp.int32),
                                                mode="drop")

    seq_i = jnp.arange(S, dtype=jnp.int32)
    is_real = seq_i < n_match
    is_last = seq_i == n_match
    # literal-run start of sequence s = end of match s-1 (0 for s = 0);
    # row n_match (the last token) gets the final match's end
    prev_end = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                (mpos + mlen)[:-1]])
    lit_from = prev_end
    num_lit = jnp.where(is_last, jnp.int32(N) - lit_from,
                        jnp.where(is_real, mpos - prev_end, 0))
    ml_code = jnp.where(is_real, mlen - fmt.MIN_MATCH, 0)

    # 3. per-sequence layout: A = token + literal-extension bytes,
    # then the literals, then B = offset + match-extension bytes
    # (absent for the last token)
    a_len = 1 + jnp.where(num_lit >= 15, _ext_count(num_lit - 15), 0)
    b_len = jnp.where(is_real,
                      2 + jnp.where(ml_code >= 15,
                                    _ext_count(ml_code - 15), 0), 0)
    live = is_real | is_last
    seq_len = jnp.where(live, a_len + num_lit + b_len, 0)
    seq_off = jnp.cumsum(seq_len) - seq_len       # exclusive
    n_out = jnp.sum(seq_len)

    BIG = jnp.int32(1 << 30)
    A0 = jnp.where(live, seq_off, BIG)
    L0 = jnp.where(live, seq_off + a_len, BIG)
    B0 = jnp.where(live, seq_off + a_len + num_lit, BIG)
    starts = jnp.stack([A0, L0, B0], axis=1).reshape(3 * S)

    # 4. output-centric evaluation: ties on equal starts resolve to the
    # LATER (non-empty) segment via side="right"
    CAP = N + N // 255 + 16
    o = jnp.arange(CAP, dtype=jnp.int32)
    seg = jnp.clip(jnp.searchsorted(starts, o, side="right") - 1,
                   0, 3 * S - 1)
    sq = seg // 3
    kind = seg % 3
    rel = o - jnp.take(starts, seg)

    s_numlit = jnp.take(num_lit, sq)
    s_mlcode = jnp.take(ml_code, sq)
    s_litfrom = jnp.take(lit_from, sq)
    s_dist = jnp.take(mdist, sq)
    s_islast = jnp.take(is_last, sq)

    token = (jnp.minimum(s_numlit, 15) << 4) \
        | jnp.where(s_islast, 0, jnp.minimum(s_mlcode, 15))
    a_byte = jnp.where(rel == 0, token, _ext_byte(s_numlit - 15, rel - 1))
    l_byte = jnp.take(block.astype(jnp.int32),
                      jnp.clip(s_litfrom + rel, 0, N - 1))
    b_byte = jnp.where(rel == 0, s_dist & 0xFF,
                       jnp.where(rel == 1, (s_dist >> 8) & 0xFF,
                                 _ext_byte(s_mlcode - 15, rel - 2)))
    val = jnp.where(kind == 0, a_byte,
                    jnp.where(kind == 1, l_byte, b_byte))
    out = jnp.where(o < n_out, val, 0).astype(jnp.uint8)
    return out, n_out
