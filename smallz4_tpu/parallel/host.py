"""Host-parallel exact encoder: LZ4 blocks across CPU threads.

The same block-independence property that drives the device mesh layer
(64 KB halo => blocks compress independently, bit-identical to the
sequential stream; see parallel.sharding) applies to host threads: the
native matcher releases the GIL, so a thread pool scales the *exact* -9
search across cores.  This is the framework's fast path when no (or one
slow) accelerator is available, and the post-processing stage (DP + emit)
of the hybrid TPU pipeline.

Bit-parity domain (same as the sharded path): block_size >= 65548 so the
sequential encoder's lookback at each boundary is the full 12 bytes, and
no byte-run longer than MaxSameLetter crosses a block boundary window.
"""
from __future__ import annotations

import concurrent.futures as cf
import os

import numpy as np

from .. import format as fmt


def compress(
    data: bytes,
    level: int = 9,
    block_size: int = fmt.MAX_BLOCK_SIZE,
    dictionary: bytes | None = None,
    threads: int | None = None,
) -> bytes:
    """Thread-parallel modern-frame compression, bit-identical to the
    sequential native encoder for block_size >= 64 KB + 12."""
    from .. import native

    if block_size < fmt.MAX_DISTANCE + fmt.BLOCK_END_NO_MATCH + 1:
        raise ValueError("host-parallel path needs block_size > 64 KB + 12")
    fmt.level_to_max_chain(level)
    if level == 0:
        return native.compress(data, 0, block_size=block_size)
    data = bytes(data)
    dict_tail = bytes(dictionary)[-fmt.MAX_DISTANCE:] if dictionary else b""
    vdata = dict_tail + data
    d = len(dict_tail)
    n = len(data)
    starts = list(range(0, n, block_size))

    def one_block(start: int) -> tuple[bytes, bool]:
        end = min(start + block_size, n)
        bs = end - start
        lo = max(start + d - fmt.MAX_DISTANCE, 0)
        base = start + d - lo
        ctx = np.frombuffer(vdata[lo : end + d], np.uint8)
        lens = np.zeros(bs, np.int32)
        dists = np.zeros(bs, np.int32)
        cut = start >= fmt.MAX_DISTANCE + fmt.BLOCK_END_NO_MATCH
        native.match_block_ex(
            ctx, base=base, bs=bs, level=level, lookback=base,
            cut_pos=(base - fmt.BLOCK_END_NO_MATCH) if cut else -1,
            lens=lens, dists=dists,
        )
        if bs > fmt.BLOCK_END_NO_MATCH and fmt.level_to_max_chain(level) > fmt.SHORT_CHAINS_GREEDY:
            native.estimate_costs(lens, dists)
        payload = native.emit_block(data[start:end], lens, dists)
        if len(payload) < bs:
            return payload, False
        return data[start:end], True

    pool = _pool(threads)
    out = bytearray(fmt.build_frame_header(False))
    for payload, stored in pool.map(one_block, starts):
        out += fmt.build_block_header(len(payload), stored, False)
        out += payload
    out += fmt.build_end_mark(False)
    return bytes(out)


_POOL: cf.ThreadPoolExecutor | None = None
_POOL_SIZE = 0


def _pool(threads: int | None) -> cf.ThreadPoolExecutor:
    """Persistent executor: the native matcher keeps ~90 MB of thread-local
    tables warm per worker (reset-free reuse), so threads must outlive
    individual compress() calls."""
    global _POOL, _POOL_SIZE
    want = threads or min(32, os.cpu_count() or 1)
    if _POOL is None or _POOL_SIZE < want:
        _POOL = cf.ThreadPoolExecutor(max_workers=want)
        _POOL_SIZE = want
    return _POOL
