"""Chunk-merge device matcher (ops/chunkmatch.py) — interpreter mode.

Drives a 2-chunk stream through sort_chunk + probe_pair and checks the
parity contract against a nearest-first brute-force search: every claim
byte-verified and never longer than optimal; converged positions exact.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from smallz4_tpu import format as fmt
from smallz4_tpu.ops import chunkmatch

C = 1024  # test chunk size


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


def _run_stream(data: bytes):
    """Drive n_chunks of C positions; returns lens/dists/conv [len(data)]."""
    n = len(data)
    assert n % C == 0
    padded = np.zeros(n + 16, np.uint8)
    padded[:n] = np.frombuffer(data, np.uint8)
    lens = np.ones(n, np.int32)
    dists = np.zeros(n, np.int32)
    conv = np.ones(n, bool)
    halo = chunkmatch.empty_halo(chunk=C)
    for ci in range(n // C):
        s = ci * C
        buf = jnp.asarray(padded[s : s + C + 16])
        hi = min(C, n - fmt.BLOCK_END_NO_MATCH + 1 - s)
        cur = chunkmatch.sort_chunk(buf, jnp.int32(0), jnp.int32(hi), chunk=C)
        l, d, cv = chunkmatch.probe_pair(
            halo, cur, jnp.int32(0), jnp.int32(-1),
            jnp.int32(0), jnp.int32(hi),
            jnp.int32(n - fmt.BLOCK_END_LITERALS - s), chunk=C)
        lens[s : s + C] = np.asarray(l).astype(np.int32)
        dists[s : s + C] = np.asarray(d).astype(np.int32)
        conv[s : s + C] = np.asarray(cv)
        halo = cur
    return lens, dists, conv


def _corpus(seed, n):
    rng = np.random.default_rng(seed)
    parts = [
        bytes(rng.integers(97, 102, 400, dtype=np.uint8)),
        b"A" * 300,
        bytes(rng.integers(0, 256, 200, dtype=np.uint8)),
        bytes(rng.integers(97, 102, 200, dtype=np.uint8)),
    ]
    return (b"".join(parts) * 4)[:n]


@pytest.mark.parametrize("seed", [7, 13])
def test_chunk_stream_verified_and_converged_exact(seed):
    data = _corpus(seed, 2 * C)
    arr = np.frombuffer(data, np.uint8).astype(np.int64)
    lens, dists, conv = _run_stream(data)
    bl, bd = _brute(arr, 0, len(data))

    n_conv = 0
    for p in range(len(data)):
        if lens[p] >= 4:
            d, l = int(dists[p]), int(lens[p])
            assert 1 <= d <= fmt.MAX_DISTANCE and p - d >= 0, (p, d)
            assert (arr[p - d : p - d + l] == arr[p : p + l]).all(), (p, l, d)
            assert l <= bl[p], (p, l, bl[p])
        if conv[p]:
            n_conv += 1
            want_l = bl[p] if bl[p] >= 4 else 1
            assert lens[p] == want_l, (p, lens[p], want_l)
            if want_l >= 4:
                assert dists[p] == bd[p], (p, dists[p], bd[p])
    assert n_conv > len(data) // 4  # certificate isn't vacuous


def test_chunk_boundary_cut():
    """The boundary-cut gram's pre-cut occurrences are not candidates."""
    rng = np.random.default_rng(3)
    base = bytes(rng.integers(97, 105, C, dtype=np.uint8))
    data = base + base  # chunk 1 repeats chunk 0 at distance C
    padded = np.zeros(2 * C + 16, np.uint8)
    padded[: 2 * C] = np.frombuffer(data, np.uint8)

    halo = chunkmatch.sort_chunk(
        jnp.asarray(padded[: C + 16]), jnp.int32(0), jnp.int32(C), chunk=C)
    cur = chunkmatch.sort_chunk(
        jnp.asarray(padded[C : 2 * C + 16]), jnp.int32(0), jnp.int32(C),
        chunk=C)
    cut_pos = C - fmt.BLOCK_END_NO_MATCH
    g = padded[cut_pos : cut_pos + 4].astype(np.uint32)
    cut_gram = int(g[0] | (g[1] << 8) | (g[2] << 16) | (g[3] << 24))
    cut_gram = np.int32(np.uint32(cut_gram).astype(np.int64) - (1 << 32)
                        if cut_gram >= 1 << 31 else cut_gram)
    limit = jnp.int32(2 * C - fmt.BLOCK_END_LITERALS - C)

    l0, d0, _ = chunkmatch.probe_pair(
        halo, cur, jnp.int32(0), jnp.int32(-1),
        jnp.int32(0), jnp.int32(C), limit, chunk=C)
    l1, d1, _ = chunkmatch.probe_pair(
        halo, cur, jnp.int32(cut_gram), jnp.int32(cut_pos),
        jnp.int32(0), jnp.int32(C), limit, chunk=C)
    l0, d0, l1, d1 = map(np.asarray, (l0, d0, l1, d1))

    arr = padded[: 2 * C].astype(np.int64)
    # claims stay byte-verified under the cut
    for p in range(C):
        if l1[p] >= 4:
            q = C + p - int(d1[p])
            assert (arr[q : q + l1[p]] == arr[C + p : C + p + l1[p]]).all()
    # the cut must suppress at least one pre-cut candidate the un-cut
    # search used (base repeats, so early chunk-1 positions match the
    # cut gram's earlier occurrences)
    assert (d0 != d1).any() or (l0 != l1).any()
