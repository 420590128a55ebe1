"""Oracle codec differential tests against the reference binaries.

The oracle is the semantic anchor: these tests prove bit-identical streams
for every level, both frame formats, plus spec-correct round-trips for the
features where we intentionally deviate (dictionaries: SURVEY.md
"Reference bugs" #1).
"""
import pytest

from smallz4_tpu import format as fmt
from smallz4_tpu import oracle

FAST_LEVELS = [0, 2, 6, 9]
ALL_LEVELS = list(range(10))


@pytest.mark.parametrize("level", FAST_LEVELS)
def test_bit_exact_modern(reference, corpora, level):
    for name, data in corpora.items():
        mine = oracle.compress(data, level)
        ref = reference.compress(data, level)
        assert mine == ref, f"{name} -{level}: {len(mine)} vs {len(ref)}"


@pytest.mark.parametrize("level", [3, 9])
def test_bit_exact_legacy(reference, corpora, level):
    for name, data in corpora.items():
        mine = oracle.compress(data, level, legacy=True)
        ref = reference.compress(data, level, legacy=True)
        assert mine == ref, f"{name} -{level} -l: {len(mine)} vs {len(ref)}"


@pytest.mark.slow
@pytest.mark.parametrize("level", ALL_LEVELS)
@pytest.mark.parametrize("legacy", [False, True])
def test_bit_exact_full_matrix(reference, corpora, level, legacy):
    if legacy and level == 0:
        pytest.skip("legacy rejects level 0")
    for name, data in corpora.items():
        mine = oracle.compress(data, level, legacy=legacy)
        ref = reference.compress(data, level, legacy=legacy)
        assert mine == ref, f"{name} -{level} legacy={legacy}"


def test_decode_reference_streams(reference, corpora):
    for name, data in corpora.items():
        for level in (0, 3, 9):
            assert oracle.decompress(reference.compress(data, level)) == data, name
        assert oracle.decompress(reference.compress(data, 9, legacy=True)) == data, name


def test_reference_decodes_ours(reference, corpora):
    for name, data in corpora.items():
        if not data:
            continue  # piping an empty frame is fine but pointless
        assert reference.decompress(oracle.compress(data, 9)) == data, name
        assert reference.decompress(oracle.compress(data, 9, legacy=True)) == data, name


def test_custom_block_sizes_roundtrip(reference, corpora):
    """Smaller-than-4MB blocks are spec-legal (sharding granularity);
    dependent-block history must survive block boundaries."""
    data = corpora["text"] + corpora["struct"] + corpora["run_mid"]
    for bs in (300, 1000, 65536, 100000):
        frame = oracle.compress(data, 9, block_size=bs)
        assert oracle.decompress(frame) == data, bs
        assert reference.decompress(frame) == data, bs


def test_cross_block_matching_shrinks_output():
    # second block begins with a copy of the first block's tail: a dependent
    # block must exploit the 64 KB carried history
    data = (b"0123456789abcdef" * 40) * 2
    one = oracle.compress(data, 9, block_size=len(data) // 2)
    solid = oracle.compress(data, 9)
    assert len(one) < len(data) // 2  # second block compressed against history
    assert oracle.decompress(one) == data
    assert abs(len(one) - len(solid)) < 32


def test_stored_block_fallback(reference):
    import numpy as np
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    mine = oracle.compress(data, 9)
    ref = reference.compress(data, 9)
    assert mine == ref
    assert len(mine) == 300_000 + 15  # header(7)+blockhdr(4)+endmark(4): all stored
    assert oracle.decompress(mine) == data


def test_level0_passthrough(reference, corpora):
    data = corpora["text"]
    mine = oracle.compress(data, 0)
    assert mine == reference.compress(data, 0)
    assert len(mine) == len(data) + 15


def test_dictionary_roundtrip(reference, tmp_path, corpora):
    """Spec-correct dictionaries: the reference *decoder* must accept our
    dictionary streams (its encoder's dict mode is broken; SURVEY.md bug #1)."""
    dict_data = corpora["text"][:8000]
    data = dict_data[2000:6000] + b" extra tail " + dict_data[:512]
    frame = oracle.compress(data, 9, dictionary=dict_data)
    baseline = oracle.compress(data, 9)
    assert len(frame) < len(baseline)  # dictionary must actually help
    assert oracle.decompress(frame, dictionary=dict_data) == data
    dict_path = tmp_path / "dict.bin"
    dict_path.write_bytes(dict_data)
    assert reference.decompress(frame, dict_path=str(dict_path)) == data


def test_dictionary_large_uses_tail():
    dict_data = b"Z" * 70000 + b"unique-dictionary-payload " * 100
    data = b"unique-dictionary-payload " * 50
    frame = oracle.compress(data, 9, dictionary=dict_data)
    assert len(frame) < 60
    assert oracle.decompress(frame, dictionary=dict_data) == data


def test_legacy_rejects_dict_and_level0():
    with pytest.raises(ValueError):
        oracle.compress(b"x", 9, legacy=True, dictionary=b"d")
    with pytest.raises(ValueError):
        oracle.compress(b"x", 0, legacy=True)


def test_decoder_error_taxonomy():
    with pytest.raises(fmt.FormatError, match="invalid signature"):
        oracle.decompress(b"\x00\x00\x00\x00\x00")
    with pytest.raises(fmt.FormatError, match="version"):
        oracle.decompress(fmt.MAGIC_MODERN_BYTES + bytes([0x80, 0x70, 0x00, 0, 0, 0, 0]))
    # zero offset inside a sequence
    bad_block = bytes([0x10, 0x41, 0x00, 0x00, 0x04])  # 1 literal, offset 0
    frame = fmt.build_frame_header() + fmt.build_block_header(len(bad_block), False) + bad_block + fmt.END_MARK
    with pytest.raises(fmt.FormatError, match="invalid offset"):
        oracle.decompress(frame)
    # truncated stream
    good = oracle.compress(b"hello hello hello hello world", 9)
    with pytest.raises(fmt.FormatError, match="out of data"):
        oracle.decompress(good[: len(good) - 6])


def test_empty_input_frames(reference):
    assert oracle.compress(b"", 9) == reference.compress(b"", 9)
    assert oracle.compress(b"", 9, legacy=True) == reference.compress(b"", 9, legacy=True)
    assert oracle.decompress(oracle.compress(b"", 9)) == b""
