"""Pallas TPU bitonic sorting network for (key, payload...) records.

XLA's generic sort lowering measures ~0.03 G elem/s on v5e — unusable.
This module re-expresses sorting as what the chip is actually fast at:
dense rolls + compare-selects in VMEM (measured ~0.3-0.4 G CE/s... per
*vector lane set*, i.e. ~3-400 G scalar CEs/s; see exp/probe_tpu3.py).

Layout: records live in row-major (R, 128) int32 planes, flat index
i = r*128 + l.  A bitonic stage with XOR distance j pairs element i with
i^j — for j < 128 that partner sits in the same row (lane roll), for
j >= 128 in the same lane (sublane roll), so every stage is exactly two
static rolls + selects: no gather, no scatter, no data-dependent shapes.

Keys are compared as unsigned with the position payload as tiebreak, so
the result is deterministic and equivalent to a stable sort by key —
matching ops.match_finder.build_prev's `jnp.argsort(stable=True)`
contract (reference chain semantics: smallz4.h:651-653 nearest-first).

The reference has no counterpart component: this replaces the hash-chain
*data structure* (smallz4.h:515-519,603-744) with sorted-neighborhood
candidate discovery (see ops/sortmatch.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _flat_iota(rows: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return r * LANES + l


def _partner(plane: jnp.ndarray, j: int) -> jnp.ndarray:
    """Value at flat index i^j for every i (two static rolls + select)."""
    rows = plane.shape[0]
    if j < LANES:
        fwd = pltpu.roll(plane, LANES - j, 1)   # out[l] = in[l + j]
        bwd = pltpu.roll(plane, j, 1)           # out[l] = in[l - j]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        return jnp.where((lane & j) == 0, fwd, bwd)
    s = j // LANES
    fwd = pltpu.roll(plane, rows - s, 0)
    bwd = pltpu.roll(plane, s, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    return jnp.where((row & s) == 0, fwd, bwd)


def _stage(state, j: int, k: int, idx: jnp.ndarray, n_payload: int):
    """One compare-exchange stage: XOR distance j inside width-k runs."""
    key = state[0]
    pos = state[1]
    pk = _partner(key, j)
    pp = _partner(pos, j)
    # unsigned key compare with position tiebreak (stable-sort equivalence)
    mine_lt = (key < pk) | ((key == pk) & (pos < pp))
    lower = (idx & j) == 0
    ascending = (idx & k) == 0
    # keep own value iff (I am the min-slot) == (my value is the smaller)
    keep = (lower == ascending) == mine_lt
    # equal records (impossible with distinct pos, but keep it total):
    keep = keep | ((key == pk) & (pos == pp))
    out = [jnp.where(keep, key, pk), jnp.where(keep, pos, pp)]
    for w in state[2:]:
        out.append(jnp.where(keep, w, _partner(w, j)))
    return tuple(out)


def _bitonic_kernel(n: int, n_payload: int, refs):
    """Full network over one resident (R,128) record set."""
    rows = n // LANES
    idx = _flat_iota(rows)
    ins = refs[: 2 + n_payload]
    outs = refs[2 + n_payload :]
    state = tuple(r[:] for r in ins)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            state = _stage(state, j, k, idx, n_payload)
            j //= 2
        k *= 2
    for o, s in zip(outs, state):
        o[:] = s


@functools.partial(jax.jit, static_argnames=("n_payload",))
def sort_records(key: jnp.ndarray, pos: jnp.ndarray, *payload, n_payload=None):
    """Sort flat uint32 `key` (ascending, unsigned) with int32 `pos` as
    tiebreak-and-payload plus any extra int32 payload planes.

    Input length must be a power of two and a multiple of 1024; callers
    pad with key=0xFFFFFFFF sentinels (they sink to the top).
    Returns the sorted planes in the same order.
    """
    if n_payload is None:
        n_payload = len(payload)
    n = key.shape[0]
    assert n & (n - 1) == 0 and n >= 1024, n
    rows = n // LANES
    planes = [key.astype(jnp.uint32).view(jnp.int32) if key.dtype != jnp.int32
              else key, pos.astype(jnp.int32)]
    planes += [p.astype(jnp.int32) for p in payload]
    # unsigned order on an int32 plane: flip the sign bit before/after
    planes[0] = planes[0] ^ jnp.int32(-0x80000000)
    shaped = [p.reshape(rows, LANES) for p in planes]

    kernel = functools.partial(_bitonic_kernel, n, n_payload)
    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
                   for _ in planes],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in planes],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in planes],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(*shaped)
    outs = [o.reshape(n) for o in outs]
    outs[0] = outs[0] ^ jnp.int32(-0x80000000)
    return tuple(outs)
