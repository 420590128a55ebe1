"""Pallas TPU bitonic sorting network for (keys..., pos, payload...) records.

XLA's generic sort lowering measures ~0.03 G elem/s on v5e — unusable.
This module re-expresses sorting as what the chip is actually fast at:
dense rolls + compare-selects in VMEM (measured 320-400 G CE/s on int32
planes; see exp/probe_tpu3.py).

Layout: records live in row-major (R, 128) int32 planes, flat index
i = r*128 + l.  A bitonic stage with XOR distance j pairs element i with
i^j — for j < 128 that partner sits in the same row (lane roll), for
j >= 128 in the same lane (sublane roll), so every stage is exactly two
static rolls + selects per plane: no gather, no scatter, no
data-dependent shapes.

Records sort lexicographically by (key planes..., pos): keys compare as
unsigned, pos as the final tiebreak, so the result is deterministic and
equivalent to a stable sort — matching ops.match_finder.build_prev's
`jnp.argsort(stable=True)` contract (reference chain semantics:
smallz4.h:651-653 nearest-first).

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
SIGN = jnp.int32(-0x80000000)


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


def _lex_lt(mine, theirs, n_keys: int, unique: bool = False):
    """Lexicographic < over the key planes with pos as final tiebreak.
    Key planes were sign-flipped by the wrapper, so int32 `<` is unsigned
    order; pos is a plain non-negative int32.  ``unique`` asserts the last
    key plane is already distinct across records (e.g. combo embeds pos) —
    the pos-tiebreak compare is then dead work and skipped: the computed
    relation is identical."""
    if unique:
        lt = mine[n_keys - 1] < theirs[n_keys - 1]
        hi = n_keys - 2
    else:
        lt = mine[n_keys] < theirs[n_keys]  # pos tiebreak (always distinct)
        hi = n_keys - 1
    for k in range(hi, -1, -1):
        lt = (mine[k] < theirs[k]) | ((mine[k] == theirs[k]) & lt)
    return lt


def _idx_bits(rows: int, log_n: int):
    """Cached boolean planes bit[b][i] = (i >> b) & 1 over flat index i.
    A stage's direction mask (lower == ascending) is bit[lj] == bit[lk]
    (idx & k == 0 for k == n is the all-zero plane, log_n entry)."""
    idx = _flat_iota(rows)
    return [(idx & (1 << b)) != 0 if b < log_n
            else jnp.zeros((rows, LANES), jnp.bool_)
            for b in range(log_n + 1)]


def _stage(state, j: int, k: int, idx: jnp.ndarray, n_keys: int,
           bits=None, unique: bool = False):
    """One compare-exchange stage: XOR distance j inside width-k runs."""
    partners = [_partner(p, j) for p in state]
    mine_lt = _lex_lt(state, partners, n_keys, unique)
    if bits is not None:
        # (idx & j == 0) == (idx & k == 0)  <=>  bit_lj == bit_lk
        direction = bits[j.bit_length() - 1] == bits[k.bit_length() - 1]
    else:
        direction = ((idx & j) == 0) == ((idx & k) == 0)
    # keep own value iff (I am the min-slot) == (my value is the smaller)
    keep = direction == mine_lt
    return tuple(jnp.where(keep, s, p) for s, p in zip(state, partners))


def _schedule(n: int) -> tuple[list[int], list[int]]:
    """Flat bitonic stage schedule: (k, log2 j) per compare-exchange pass."""
    ks, jls = [], []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            ks.append(k)
            jls.append(j.bit_length() - 1)
            j //= 2
        k *= 2
    return ks, jls


def _stage_dyn(state, jl, k, idx, n_keys: int, log_n: int,
               unique: bool = False):
    """One compare-exchange stage with *traced* (jl, k).

    The partner exchange dispatches through one lax.switch over the
    log2(n) possible XOR distances, so the generated code is O(log n)
    instead of O(log^2 n) — the monolithic unrolled network blows past
    the Mosaic compiler's budget at n = 2^17."""
    def make(jl_static: int):
        j = 1 << jl_static
        return lambda st: tuple(_partner(p, j) for p in st)

    partners = jax.lax.switch(jl, [make(b) for b in range(log_n)], state)
    j = jnp.left_shift(jnp.int32(1), jl)
    mine_lt = _lex_lt(state, partners, n_keys, unique)
    lower = (idx & j) == 0
    ascending = (idx & k) == 0
    # keep own value iff (I am the min-slot) == (my value is the smaller)
    keep = (lower == ascending) == mine_lt
    return tuple(jnp.where(keep, s, p) for s, p in zip(state, partners))


def _bitonic_kernel_compact(n: int, n_keys: int, n_planes: int, unique: bool,
                            refs):
    """Full network over one resident (R,128) record set; stage params
    stream from SMEM and the stage loop is a fori_loop.  Generated code is
    O(log n) — used above the unrolled kernel's compile budget (the
    Mosaic code size of the unrolled network is stages x rows/8 vregs:
    fine at n <= 2^16, explosive at 2^17+).  Runtime is ~4x the unrolled
    kernel (lax.switch predication), so production sorts stay unrolled."""
    rows = n // LANES
    log_n = n.bit_length() - 1
    idx = _flat_iota(rows)
    k_ref, jl_ref = refs[0], refs[1]
    ins = refs[2 : 2 + n_planes]
    outs = refs[2 + n_planes :]
    state = tuple(r[:] for r in ins)
    n_stages = log_n * (log_n + 1) // 2

    def body(s, state):
        return _stage_dyn(state, jl_ref[0, s], k_ref[0, s], idx,
                          n_keys, log_n, unique)

    state = jax.lax.fori_loop(0, n_stages, body, state)
    for o, s in zip(outs, state):
        o[:] = s


def _bitonic_kernel_unrolled(n: int, n_keys: int, n_planes: int, unique: bool,
                             refs):
    """Fully unrolled network: every stage has static roll distances —
    the fast production variant for n <= 2^16."""
    rows = n // LANES
    idx = _flat_iota(rows)
    bits = _idx_bits(rows, n.bit_length() - 1)
    ins = refs[:n_planes]
    outs = refs[n_planes:]
    state = tuple(r[:] for r in ins)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            state = _stage(state, j, k, idx, n_keys, bits, unique)
            j //= 2
        k *= 2
    for o, s in zip(outs, state):
        o[:] = s


def _to_planes(planes, n_keys):
    rows = planes[0].shape[0] // LANES
    shaped = []
    for i, p in enumerate(planes):
        q = p.view(jnp.int32) if p.dtype == jnp.uint32 else p.astype(jnp.int32)
        if i < n_keys:
            q = q ^ SIGN  # unsigned order on an int32 plane
        shaped.append(q.reshape(rows, LANES))
    return shaped


def _from_planes(outs, planes, n, n_keys):
    result = []
    for i, o in enumerate(outs):
        q = o.reshape(n)
        if i < n_keys:
            q = q ^ SIGN
        if planes[i].dtype == jnp.uint32:
            q = q.view(jnp.uint32)
        result.append(q)
    return tuple(result)


@functools.partial(jax.jit, static_argnames=("n_keys", "unroll", "unique"))
def sort_records(*planes, n_keys: int = 1, unroll: bool | None = None,
                 unique: bool = False):
    """Sort records lexicographically by the first ``n_keys`` planes
    (uint32 ascending) with the next plane (pos, int32) as tiebreak; any
    remaining planes ride along as payload.

    ``unique=True`` asserts the last key plane is distinct across records
    (it embeds the position) — the tiebreak compare is then skipped; the
    comparison relation, and hence the sorted output, is identical.  The
    distinctness requirement covers padding/sentinel records too: all-ones
    sentinel keys duplicate each other, so padded inputs must either keep
    the position embedded in the sentinels' last key plane or pass
    ``unique=False`` (tie order among identical records is otherwise
    network-dependent, and their payload planes shuffle with them).

    Record count must be a power of two >= 1024; callers pad with
    all-ones keys (sentinels sink to the top).  Returns the planes in the
    input order, sorted.
    """
    n = planes[0].shape[0]
    assert n & (n - 1) == 0 and n >= 1024, n
    # unique=True needs no separate pos plane (the last KEY is distinct);
    # otherwise the tiebreak plane follows the keys
    assert len(planes) >= n_keys + (0 if unique else 1)
    rows = n // LANES
    if unroll is None:
        unroll = n <= (1 << 16)
    shaped = _to_planes(planes, n_keys)

    if unroll:
        kernel = functools.partial(
            _bitonic_kernel_unrolled, n, n_keys, len(planes), unique)
        extra_in, extra_specs = (), []
    else:
        ks, jls = _schedule(n)
        extra_in = (jnp.asarray([ks], jnp.int32), jnp.asarray([jls], jnp.int32))
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        kernel = functools.partial(
            _bitonic_kernel_compact, n, n_keys, len(planes), unique)

    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
                   for _ in planes],
        in_specs=extra_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in planes],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in planes],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(*extra_in, *shaped)
    return _from_planes(outs, planes, n, n_keys)


@functools.partial(jax.jit, static_argnames=("n_keys", "unique"))
def merge_sorted(*planes, n_keys: int = 1, unique: bool = False):
    """Bitonic merge of two sorted halves: ``planes[i][:n/2]`` and
    ``planes[i][n/2:]`` must each be sorted ascending by the lex key.
    One flip + log2(n) static stages — the cheap way to combine a chunk's
    sorted records with its predecessor's (64 KB window adjacency) without
    re-sorting: n log n work becomes n."""
    n = planes[0].shape[0]
    assert n & (n - 1) == 0 and n >= 2048, n
    h = n // 2
    rows = n // LANES
    # reverse the upper half => the whole array is one bitonic sequence
    flipped = [jnp.concatenate([p[:h], p[h:][::-1]]) for p in planes]
    shaped = _to_planes(flipped, n_keys)

    def kernel(refs):
        idx = _flat_iota(rows)
        bits = _idx_bits(rows, n.bit_length() - 1)
        ins, outs = refs[: len(planes)], refs[len(planes) :]
        state = tuple(r[:] for r in ins)
        j = n // 2
        while j >= 1:
            state = _stage(state, j, n, idx, n_keys, bits, unique)
            j //= 2
        for o, s in zip(outs, state):
            o[:] = s

    outs = pl.pallas_call(
        lambda *refs: kernel(refs),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
                   for _ in planes],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in planes],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in planes],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(*shaped)
    return _from_planes(outs, planes, n, n_keys)
