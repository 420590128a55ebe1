"""Replicate the failing e2e test and bisect the diverging block."""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from smallz4_tpu import format as fmt, native
from smallz4_tpu.ops import chunkmatch, pipeline
from test_chunkmatch import _mixed_stream, C

chunkmatch.CHUNK = C
chunkmatch.GROUP = 1
chunkmatch.HEAD_CAP = C

data = _mixed_stream(2 * C)
bs = C
want = native.compress(data, 9, block_size=bs)

# instrument finish inputs: wrap native.estimate_costs to capture claims
captured = []
orig_ec = native.estimate_costs


def spy_ec(lens, dists):
    captured.append((lens.copy(), dists.copy()))
    orig_ec(lens, dists)


native.estimate_costs = spy_ec
with pltpu.force_tpu_interpret_mode():
    got = pipeline.compress(data, 9, block_size=bs, parity=True,
                            kernel="chunk")
native.estimate_costs = orig_ec
print("equal:", got == want, len(got), len(want), flush=True)

# reference claims per block via full refine
for bi, start in enumerate(range(0, len(data), bs)):
    end = min(start + bs, len(data))
    blen = end - start
    nl = np.ones(blen, np.int32)
    nd = np.zeros(blen, np.int32)
    lo = max(start - fmt.MAX_DISTANCE, 0)
    base = start - lo
    native.match_refine(np.frombuffer(data[lo:end], np.uint8), base=base,
                        bs=blen, lookback=base,
                        mask=np.ones(blen, bool), lens=nl, dists=nd,
                        cut_pos=-1)
    tail = min(fmt.BLOCK_END_NO_MATCH - 1, blen)
    nl[blen - tail:] = 1
    nd[blen - tail:] = 0
    # captured order may be pool order; match by length
    for cl, cd in captured:
        if len(cl) == blen:
            diff = np.flatnonzero((cl != nl) | (cd != nd))
            if len(diff) and bi == 0 or len(diff) and start:
                pass
    cl, cd = captured[bi]
    diff = np.flatnonzero((cl != nl) | (cd != nd))
    print(f"block {start}: {len(diff)} claim diffs", flush=True)
    for p in diff[:10]:
        print(f"  p={p} got=({cl[p]},{cd[p]}) want=({nl[p]},{nd[p]})",
              flush=True)

import struct


def parse(stream):
    info = fmt.parse_frame_header(stream)
    pos = info.header_size
    blocks = []
    while True:
        size, comp = fmt.parse_block_header(stream[pos:pos+4], info.legacy)
        pos += 4
        if size == 0:
            break
        blocks.append((size, comp))
        pos += size
    return info.header_size, blocks


print("want:", parse(want), flush=True)
print("got: ", parse(got), flush=True)
print("first diff at", next(i for i, (a, b) in
                            enumerate(zip(got, want)) if a != b), flush=True)
