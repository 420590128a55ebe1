"""Batched multi-frame device decode (ops/decoder.decompress_batch)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from smallz4_tpu import native
from smallz4_tpu.ops import decoder


def _frames():
    rng = np.random.default_rng(4)
    text = b"the quick brown fox jumps over the lazy dog. " * 120
    frames, raws = [], []
    # mixed batch: compressible, incompressible (stored blocks),
    # multi-block (small block size), legacy, empty-ish
    cases = [
        (text, dict()),
        (rng.integers(0, 256, 9000, dtype=np.uint8).tobytes(), dict()),
        (text * 4, dict(block_size=1 << 16)),
        (text[:3000], dict(legacy=True)),
        (b"x" * 20000 + text[:500], dict()),
        (b"short", dict()),
    ]
    for raw, kw in cases:
        frames.append(native.compress(raw, 9, **kw))
        raws.append(raw)
    return frames, raws


def test_batch_roundtrip():
    frames, raws = _frames()
    got = decoder.decompress_batch(frames)
    assert len(got) == len(raws)
    for g, r in zip(got, raws):
        assert g == r


def test_batch_with_dictionary():
    dict_data = b"dictionary seed content " * 40
    raw = dict_data[100:400] + b" payload tail " * 30
    fr = native.compress(raw, 9, dictionary=dict_data)
    got = decoder.decompress_batch([fr, fr], dictionary=dict_data)
    assert got == [raw, raw]


def test_batch_empty():
    assert decoder.decompress_batch([]) == []


def test_public_api_batch():
    import smallz4_tpu

    raws = [b"alpha " * 200, b"beta " * 150]
    frames = [native.compress(r, 9) for r in raws]
    assert smallz4_tpu.decompress_batch(frames) == raws
    assert smallz4_tpu.decompress_batch(frames, engine="tpu") == raws
