"""xxHash32 — clean-room from the public spec.

The reference avoids carrying an xxhash implementation by precomputing the
single header-checksum byte for its fixed FLG/BD pair (smallz4.h:493).
The framework implements the real thing, which unlocks spec-complete
frames: arbitrary FLG/BD header checksums, optional content checksums and
optional per-block checksums (generated *and* verified — the reference
decoder only skips them, smallz4cat.c:345-356).

Validated against the reference's precomputed 0xDF byte and the published
test vectors (xxh32("") == 0x02CC5D05).  Python implementation for the
oracle/tests; the native runtime carries the production C++ version.
"""
from __future__ import annotations

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def xxh32(data: bytes, seed: int = 0) -> int:
    data = bytes(data)
    n = len(data)
    i = 0
    if n >= 16:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed & _M
        a4 = (seed - _P1) & _M
        while i + 16 <= n:
            l0 = int.from_bytes(data[i : i + 4], "little")
            l1 = int.from_bytes(data[i + 4 : i + 8], "little")
            l2 = int.from_bytes(data[i + 8 : i + 12], "little")
            l3 = int.from_bytes(data[i + 12 : i + 16], "little")
            a1 = (_rotl((a1 + l0 * _P2) & _M, 13) * _P1) & _M
            a2 = (_rotl((a2 + l1 * _P2) & _M, 13) * _P1) & _M
            a3 = (_rotl((a3 + l2 * _P2) & _M, 13) * _P1) & _M
            a4 = (_rotl((a4 + l3 * _P2) & _M, 13) * _P1) & _M
            i += 16
        acc = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        acc = (_rotl((acc + lane * _P3) & _M, 17) * _P4) & _M
        i += 4
    while i < n:
        acc = (_rotl((acc + data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M
    acc ^= acc >> 13
    acc = (acc * _P3) & _M
    acc ^= acc >> 16
    return acc


def frame_header_checksum(descriptor: bytes) -> int:
    """The frame-descriptor checksum byte: (xxh32(descriptor) >> 8) & 0xFF.
    For the reference's fixed descriptor 40 70 this is 0xDF."""
    return (xxh32(descriptor) >> 8) & 0xFF
