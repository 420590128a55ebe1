"""Soak: chunk engine vs native across random configs (tiny chunks,
interpret mode).  Parity mode must be bit-exact; fast mode must round-trip
and stay within 12% of the -9 size."""
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from smallz4_tpu import native
from smallz4_tpu.ops import chunkmatch, pipeline
from test_chunkmatch import _mixed_stream

C = 1024
chunkmatch.CHUNK, chunkmatch.GROUP, chunkmatch.HEAD_CAP = C, 1, C

rng = np.random.default_rng(99)
fails = 0
with pltpu.force_tpu_interpret_mode():
    for trial in range(14):
        n = int(rng.integers(200, 4 * C))
        seed = int(rng.integers(0, 10000))
        data = _mixed_stream(n, seed=seed)
        kind = trial % 4
        try:
            if kind == 0:      # single-block parity
                bs = ((n + C - 1) // C) * C
                want = native.compress(data, 9, block_size=bs)
                got = pipeline.compress(data, 9, block_size=bs, parity=True,
                                        kernel="chunk")
                assert got == want, "parity"
            elif kind == 1:    # multi-block fast roundtrip
                got = pipeline.compress(data, 9, block_size=C, kernel="chunk", parity=False)
                assert native.decompress(got) == data
                ref = native.compress(data, 9, block_size=C)
                assert len(got) <= int(len(ref) * 1.12) + 64, (len(got), len(ref))
            elif kind == 2:    # dictionary parity (dict <= one chunk)
                dlen = int(rng.integers(16, C - 16))
                dict_data = _mixed_stream(dlen, seed=seed + 1)
                small = data[: C - 20]
                want = native.compress(small, 9, block_size=C,
                                       dictionary=dict_data)
                got = pipeline.compress(small, 9, block_size=C, parity=True,
                                        kernel="chunk", dictionary=dict_data)
                assert got == want, "dict parity"
            else:              # legacy single block
                want = native.compress(data[:C], 9, legacy=True, block_size=C)
                got = pipeline.compress(data[:C], 9, legacy=True,
                                        block_size=C, parity=True,
                                        kernel="chunk")
                assert got == want, "legacy parity"
            print(f"trial {trial} kind {kind} n={n} seed={seed}: ok",
                  flush=True)
        except AssertionError as e:  # noqa: PERF203
            fails += 1
            print(f"trial {trial} kind {kind} n={n} seed={seed}: FAIL {e}",
                  flush=True)
print("fails:", fails, flush=True)
sys.exit(1 if fails else 0)
