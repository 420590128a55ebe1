"""Sorted-neighborhood device matcher (ops/sortmatch.py) + bitonic sort
network (ops/sortnet.py) — correctness in interpreter mode on CPU.

The parity contract (reference search semantics, smallz4.h:173-255):
nearest-first chain walk replacing only on strictly longer matches, i.e.
per position the longest match with the *nearest* distance among equals.
A converged position must reproduce that bit-for-bit; every position
(converged or not) must hold a byte-verified claim.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from smallz4_tpu import format as fmt
from smallz4_tpu.ops import sortmatch, sortnet


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _brute(data, start, end):
    """Nearest-first longest-match search (reference semantics)."""
    n = len(data)
    lens = np.ones(n, np.int64)
    dists = np.zeros(n, np.int64)
    limit = end - fmt.BLOCK_END_LITERALS
    for p in range(start, end - fmt.BLOCK_END_NO_MATCH + 1):
        cap = limit - p
        best, bd = 0, 0
        for q in range(p - 1, max(start, p - fmt.MAX_DISTANCE) - 1, -1):
            l = 0
            while l < cap and data[q + l] == data[p + l]:
                l += 1
            if l > best:
                best, bd = l, p - q
        if best >= fmt.MIN_MATCH:
            lens[p], dists[p] = best, bd
    return lens, dists


def _corpus(seed):
    rng = np.random.default_rng(seed)
    parts = [
        bytes(rng.integers(97, 102, 400, dtype=np.uint8)),
        b"A" * 300,
        bytes(rng.integers(0, 256, 200, dtype=np.uint8)),
        bytes(rng.integers(97, 102, 200, dtype=np.uint8)),
    ]
    return (b"".join(parts) * 2)[:1024]


def test_sort_records_multikey():
    rng = np.random.default_rng(0)
    n = 1024
    k1 = rng.integers(0, 8, n).astype(np.uint32)
    k2 = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    pos = np.arange(n, dtype=np.int32)
    rng.shuffle(pos)
    pay = rng.integers(-1000, 1000, n).astype(np.int32)
    s1, s2, sp, spay = sortnet.sort_records(
        jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(pos), jnp.asarray(pay),
        n_keys=2)
    order = np.lexsort((pos, k2, k1))
    np.testing.assert_array_equal(np.asarray(s1), k1[order])
    np.testing.assert_array_equal(np.asarray(s2), k2[order])
    np.testing.assert_array_equal(np.asarray(sp), pos[order])
    np.testing.assert_array_equal(np.asarray(spay), pay[order])


@pytest.mark.parametrize("seed", [7, 11])
def test_match_segment_verified_and_converged_exact(seed):
    data = _corpus(seed)
    arr = np.frombuffer(data, np.uint8)
    buf = np.zeros(1024 + 16, np.uint8)
    buf[:1024] = arr
    lens, dists, conv = sortmatch.match_segment(
        jnp.asarray(buf), jnp.int32(0), jnp.int32(1024),
        n_entries=1024, chain_steps=10)
    lens, dists, conv = map(np.asarray, (lens, dists, conv))

    bl, bd = _brute(arr.astype(np.int64), 0, 1024)

    for p in range(1024):
        if lens[p] >= 4:
            d, l = int(dists[p]), int(lens[p])
            assert 1 <= d <= fmt.MAX_DISTANCE and p - d >= 0
            assert data[p - d : p - d + l] == data[p : p + l], (p, l, d)
            assert l <= bl[p]  # never claims longer than optimal
        if conv[p]:
            want_l = bl[p] if bl[p] >= 4 else 1
            assert lens[p] == want_l, (p, lens[p], want_l)
            if want_l >= 4:
                assert dists[p] == bd[p], (p, dists[p], bd[p])


def test_match_segment_partial_validity():
    """start/end_valid clamp the searchable region (segment head/tail)."""
    rng = np.random.default_rng(3)
    arr = rng.integers(97, 100, 1024 + 16).astype(np.uint8)
    lens, dists, conv = sortmatch.match_segment(
        jnp.asarray(arr), jnp.int32(100), jnp.int32(900),
        n_entries=1024, chain_steps=10)
    lens, dists = np.asarray(lens), np.asarray(dists)
    data = arr.astype(np.int64)
    limit = 900 - fmt.BLOCK_END_LITERALS
    for p in range(1024):
        if p < 100 or p + fmt.BLOCK_END_NO_MATCH > 900:
            assert lens[p] == 1, p
            continue
        if lens[p] >= 4:
            q, l = p - int(dists[p]), int(lens[p])
            assert q >= 100  # candidates never reach into pre-start padding
            assert p + l <= limit
            assert (data[q : q + l] == data[p : p + l]).all()


def test_merge_sorted_halves():
    rng = np.random.default_rng(5)
    n = 2048
    h = n // 2
    k1 = rng.integers(0, 6, n).astype(np.uint32)
    pos = np.arange(n, dtype=np.int32)
    pay = rng.integers(0, 1 << 30, n).astype(np.int32)
    # sort each half independently (ground truth by lexsort)
    for lo, hi in ((0, h), (h, n)):
        order = np.lexsort((pos[lo:hi], k1[lo:hi])) + lo
        k1[lo:hi], pos[lo:hi], pay[lo:hi] = k1[order], pos[order], pay[order]
    s1, sp, spay = sortnet.merge_sorted(
        jnp.asarray(k1), jnp.asarray(pos), jnp.asarray(pay), n_keys=1)
    order = np.lexsort((pos, k1))
    np.testing.assert_array_equal(np.asarray(s1), k1[order])
    np.testing.assert_array_equal(np.asarray(sp), pos[order])
    np.testing.assert_array_equal(np.asarray(spay), pay[order])


def test_sort_records_compact_variant():
    rng = np.random.default_rng(9)
    n = 2048
    k1 = rng.integers(0, 50, n).astype(np.uint32)
    pos = np.arange(n, dtype=np.int32)
    rng.shuffle(pos)
    s1, sp = sortnet.sort_records(jnp.asarray(k1), jnp.asarray(pos),
                                  n_keys=1, unroll=False)
    order = np.lexsort((pos, k1))
    np.testing.assert_array_equal(np.asarray(s1), k1[order])
    np.testing.assert_array_equal(np.asarray(sp), pos[order])
