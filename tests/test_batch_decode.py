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


def test_batch_skippable_prefix():
    """Engine parity: batched decode accepts leading skippable frames
    like every other decode path."""
    import struct

    raw = b"skippable test payload " * 60
    fr = native.compress(raw, 9)
    sk = struct.pack("<II", 0x184D2A50, 6) + b"ABCDEF"
    assert decoder.decompress_batch([sk + fr]) == [raw]


def test_batch_corrupt_block_size_rejected():
    """A corrupt frame whose sequences sum past the declared maximum
    block size raises FormatError instead of sizing device buffers."""
    import smallz4_tpu.format as fmt

    # token 0x10 = 1 literal + match len 19 -> many sequences
    # amplifying far past MAX_BLOCK_SIZE from a small payload
    seq = b"\x1f" + b"A" + b"\x01\x00" + b"\xff" * 120 + b"\x00"
    payload = seq * 2000
    frame = (fmt.build_frame_header(False)
             + fmt.build_block_header(len(payload), False, False)
             + payload + fmt.build_end_mark(False))
    with pytest.raises(fmt.FormatError):
        decoder.decompress_batch([frame])
