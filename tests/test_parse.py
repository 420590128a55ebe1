"""Device optimal parser (ops/parse.py) vs the native DP — bit parity.

The contract: estimate_costs_device's choice array element-wise equals
the lens array tlz4_estimate_costs writes back (the reference
estimateCosts semantics, smallz4.h:376-472), for any claims the match
finder produces — hence identical emitted payloads.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from smallz4_tpu import native
from smallz4_tpu.ops import parse


def _claims(data: bytes):
    """Level-9 claims for one block (the DP's input)."""
    n = len(data)
    lens, dists = native.match_block(np.frombuffer(data, np.uint8),
                                     base=0, bs=n, level=9)
    import smallz4_tpu.format as fmt

    tail = min(fmt.BLOCK_END_NO_MATCH - 1, n)
    lens[n - tail:] = 1
    dists[n - tail:] = 0
    return lens, dists


def _check(data: bytes, pad: int = 0):
    n = len(data)
    lens, dists = _claims(data)
    want = lens.copy()
    native.estimate_costs(want, dists)

    dl = np.ones(n + pad, np.int32)
    dd = np.zeros(n + pad, np.int32)
    dl[:n] = lens
    dd[:n] = dists
    choice, cost, converged = parse.estimate_costs_device(
        jnp.asarray(dl), jnp.asarray(dd), n)
    choice = np.asarray(choice)[:n]
    assert bool(converged), "policy iteration hit the round cap"
    mism = np.nonzero(choice != want)[0]
    assert mism.size == 0, (
        f"{mism.size} mismatches, first at {mism[:5]}: "
        f"got {choice[mism[:5]]}, want {want[mism[:5]]}")
    # identical decisions => identical emitted payload
    assert native.emit_block(data, choice.astype(np.int32), dists) \
        == native.emit_block(data, want, dists)


def test_text():
    data = (b"the quick brown fox jumps over the lazy dog. " * 40)[:1600]
    _check(data)


def test_text_padded():
    data = (b"lz4 block stream token frame parse " * 60)[:1800]
    _check(data, pad=248)


def test_random_incompressible():
    rng = np.random.default_rng(0)
    _check(rng.integers(0, 256, 2000, dtype=np.uint8).tobytes())


def test_long_literal_runs_cross_extension_thresholds():
    """Literal runs > 270 exercise the num_lit extra-byte thresholds
    (smallz4.h:398-404)."""
    rng = np.random.default_rng(1)
    parts = [rng.integers(0, 256, 300, dtype=np.uint8).tobytes(),
             b"needle" * 8,
             rng.integers(0, 256, 700, dtype=np.uint8).tobytes(),
             b"needle" * 8,
             rng.integers(0, 256, 300, dtype=np.uint8).tobytes()]
    _check(b"".join(parts))


def test_byte_runs_and_shortcut():
    """Distance-1 runs: short ones scan tiers, MaxSameLetter-length ones
    take the forced shortcut (smallz4.h:409-416)."""
    data = b"x" * 900 + b"abcd" * 30 + b"y" * 400 + b"z" * 80
    _check(data)

    import smallz4_tpu.format as fmt

    big = b"Q" * (fmt.MAX_SAME_LETTER + 4000) + b"tail data here" * 10
    _check(big)


def test_deep_tiers():
    """Matches spanning several 255-wide tiers (len in the hundreds)."""
    rng = np.random.default_rng(3)
    frag = rng.integers(32, 127, 700, dtype=np.uint8).tobytes()
    data = frag + b"-=-" + frag + b"+" + frag[:500] + frag
    _check(data)


def test_mixed_adversarial():
    rng = np.random.default_rng(7)
    frag = bytearray(rng.integers(97, 103, 120, dtype=np.uint8).tobytes())
    parts = []
    while sum(map(len, parts)) < 6000:
        frag[int(rng.integers(0, len(frag)))] ^= 1
        parts.append(bytes(frag))
        if rng.random() < 0.3:
            parts.append(bytes([int(rng.integers(97, 100))]) * 50)
        if rng.random() < 0.2:
            parts.append(rng.integers(0, 256, 200, dtype=np.uint8).tobytes())
    _check(b"".join(parts)[:6000])


@pytest.mark.slow
def test_large_block_parity():
    """A 256 KB mixed block — tier depth, runs and literal thresholds at
    realistic scale."""
    rng = np.random.default_rng(11)
    parts = []
    while sum(map(len, parts)) < (1 << 18):
        r = rng.random()
        if r < 0.3:
            parts.append(rng.integers(97, 105, 1500, dtype=np.uint8).tobytes())
        elif r < 0.6 and parts:
            parts.append(parts[int(rng.integers(0, len(parts)))])
        elif r < 0.8:
            parts.append(bytes([int(rng.integers(32, 127))])
                         * int(rng.integers(40, 70000)))
        else:
            parts.append(rng.integers(0, 256, 2000, dtype=np.uint8).tobytes())
    _check(b"".join(parts)[: 1 << 18])
