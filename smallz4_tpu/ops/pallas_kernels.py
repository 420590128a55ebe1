"""Pallas TPU kernels for the codec's dense hot ops.

XLA's generic sort/scan/gather lowerings are the measured bottleneck on
TPU for this workload (~0.05-0.13 G elem/s vs ~5 G elem/s for dense
vector ops on v5e).  These kernels re-express the dense pieces of the
match pipeline as VMEM-resident vector code:

* ``gram_hash``   — the overlapping 4-byte little-endian gram view and the
                    reference's LCG hash (smallz4.h:157-169) in one pass.
* ``run_lengths`` — R[i] = length of the maximal equal-byte run starting
                    at i: a backward min-scan implemented as 7+3 masked
                    lane/sublane log-steps per 1024-element tile plus a
                    serial cross-tile carry (grid walked right-to-left).

Both kernels operate on int32 lanes (TPU-native words), tile as (8, 128)
row-major so flattened order matches byte order, and are exact drop-in
replacements for their jnp counterparts (tested in interpreter mode and
against NumPy oracles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import format as fmt

LANES = 128
SUBLANES = 256  # rows per grid step (min tile is 8; bigger rows amortize
                # per-step overhead: 32 Ki elements, 128 KiB VMEM per ref)
TILE = LANES * SUBLANES


def _pad_to_tiles(x: jnp.ndarray, fill) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.full(pad, fill, x.dtype)])
    return x


# ---------------------------------------------------------------------------
# gram + hash
# ---------------------------------------------------------------------------

def _gram_hash_kernel(cur_ref, nxt_ref, gram_ref, hash_ref):
    """One (8, 128) tile: build grams from the tile plus its successor
    tile's first bytes (the 3-byte lookahead)."""
    x = cur_ref[0]  # int32 bytes, shape (8, 128)
    nxt = nxt_ref[0]

    def shift_by(k):
        # element i+k of the flattened tile, with the successor tile
        # supplying the tail: roll lanes left by k, then fix the last k
        # lanes of each row with the next row's head, rows cascading into
        # the successor tile's first row.
        rolled = pltpu.roll(x, LANES - k, 1)
        next_row = jnp.concatenate([x[1:], nxt[:1]], axis=0)
        fix = pltpu.roll(next_row, LANES - k, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
        return jnp.where(lane < LANES - k, rolled, fix)

    b0 = x
    b1 = shift_by(1)
    b2 = shift_by(2)
    b3 = shift_by(3)
    gram = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    gram_ref[0] = gram
    prod = (gram * fmt.HASH_MULTIPLIER).astype(jnp.uint32)
    hash_ref[0] = (prod >> (32 - fmt.HASH_BITS)).astype(jnp.int32)


@jax.jit
def gram_hash(data_u8: jnp.ndarray):
    """-> (grams int32[n], hash20 int32[n]); the last 3 grams read
    zero-padding (callers mask them, as with ops.grams.grams4)."""
    n = data_u8.shape[0]
    x = _pad_to_tiles(data_u8.astype(jnp.int32), 0)
    tiles = x.shape[0] // TILE
    xt = x.reshape(tiles, SUBLANES, LANES)

    grid = (tiles,)
    specs = dict(
        in_specs=[
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES),
                         lambda i: (jnp.minimum(i + 1, tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    g, h = pl.pallas_call(
        _gram_hash_kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((tiles, SUBLANES, LANES), jnp.int32),
        ],
        **specs,
    )(xt, xt)
    return g.reshape(-1)[:n], h.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# run lengths (backward min-scan with carry)
# ---------------------------------------------------------------------------

def _suffix_min_tile(v: jnp.ndarray) -> jnp.ndarray:
    """Suffix-min over the flattened (8,128) tile via masked log-steps."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    # within-row suffix min (7 steps along lanes)
    k = 1
    while k < LANES:
        rolled = pltpu.roll(v, LANES - k, 1)
        v = jnp.where(lane < LANES - k, jnp.minimum(v, rolled), v)
        k *= 2
    # fold later rows' minima into earlier rows (3 steps along sublanes)
    row_min = v[:, :1]  # suffix-min of each full row = its first element
    k = 1
    while k < SUBLANES:
        shifted = jnp.concatenate(
            [row_min[k:], jnp.full((k, 1), jnp.iinfo(jnp.int32).max, v.dtype)],
            axis=0,
        )
        row_min = jnp.minimum(row_min, shifted)
        k *= 2
    # row r's elements also see min over rows > r
    below = jnp.concatenate(
        [row_min[1:], jnp.full((1, 1), jnp.iinfo(jnp.int32).max, v.dtype)],
        axis=0,
    )
    return jnp.minimum(v, below)


def _run_lengths_kernel(b_ref, out_ref, carry_ref):
    """Grid walks tiles right-to-left; carry holds the next tile's
    nearest-boundary index."""
    i = pl.program_id(0)
    tiles = pl.num_programs(0)
    big = jnp.iinfo(jnp.int32).max

    @pl.when(i == 0)
    def _():
        carry_ref[0] = big

    tile_idx = tiles - 1 - i  # right-to-left
    b = b_ref[0]  # bool (8,128): run boundary at this element
    base = tile_idx * TILE
    flat_idx = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    )
    v = jnp.where(b, flat_idx, big)
    suff = _suffix_min_tile(v)
    nb = jnp.minimum(suff, carry_ref[0])  # nearest boundary at/after i
    out_ref[0] = nb - flat_idx + 1
    carry_ref[0] = nb[0, 0]


@jax.jit
def run_lengths(data_u8: jnp.ndarray) -> jnp.ndarray:
    """R[i] = maximal equal-byte run length starting at i (int32[n]);
    exact match for ops.match_finder._run_lengths."""
    n = data_u8.shape[0]
    x = _pad_to_tiles(data_u8.astype(jnp.int32), -1)  # pad breaks runs
    m = x.shape[0]
    boundary = jnp.concatenate([x[:-1] != x[1:], jnp.ones(1, bool)])
    tiles = m // TILE
    bt = boundary.reshape(tiles, SUBLANES, LANES)

    out = pl.pallas_call(
        _run_lengths_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, SUBLANES, LANES),
                         lambda i: (tiles - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES),
                               lambda i: (tiles - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, SUBLANES, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(bt)
    return out.reshape(-1)[:n]
