"""Host-parallel exact encoder tests."""
import numpy as np
import pytest

from smallz4_tpu import native, oracle
from smallz4_tpu.parallel import host


@pytest.fixture(scope="module", autouse=True)
def _need_native():
    if not native.available():
        pytest.skip("native runtime not built")


def _corpus(n):
    rng = np.random.default_rng(21)
    out = bytearray()
    while len(out) < n:
        out += b"parallel blocks compress independently given the halo. "
        out += rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
    return bytes(out[:n])


def test_bit_identical_to_sequential():
    data = _corpus(5 * 131072 + 777)
    for level in (1, 5, 9):
        assert host.compress(data, level, block_size=131072) == native.compress(
            data, level, block_size=131072
        ), level


def test_roundtrip_and_dictionary():
    data = _corpus(300000)
    dictionary = data[:30000]
    frame = host.compress(data[50000:], 9, block_size=131072, dictionary=dictionary)
    assert native.decompress(frame, dictionary=dictionary) == data[50000:]
    assert frame == native.compress(data[50000:], 9, block_size=131072,
                                    dictionary=dictionary)


def test_rejects_tiny_blocks():
    with pytest.raises(ValueError):
        host.compress(b"x" * 100, 9, block_size=4096)


def test_level0_passthrough():
    data = _corpus(200000)
    assert oracle.decompress(host.compress(data, 0, block_size=131072)) == data
