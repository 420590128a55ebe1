"""Format-layer unit tests: headers, token codec, cost model."""
import pytest

from smallz4_tpu import format as fmt


def test_modern_header_bytes():
    # the exact 7 bytes the reference emits (smallz4.h:486-495)
    assert fmt.build_frame_header(False) == bytes.fromhex("04224d184070df")


def test_legacy_header_bytes():
    assert fmt.build_frame_header(True) == bytes.fromhex("02214c18")


def test_header_roundtrip_modern():
    info = fmt.parse_frame_header(fmt.build_frame_header(False) + b"\x00" * 8)
    assert not info.legacy
    assert info.header_size == 7
    assert not info.has_block_checksum


def test_header_roundtrip_legacy():
    info = fmt.parse_frame_header(fmt.build_frame_header(True))
    assert info.legacy and info.header_size == 4


def test_header_optional_fields():
    # FLG with content size + dict id + both checksums
    flg = (1 << 6) | 16 | 8 | 4 | 1
    buf = fmt.MAGIC_MODERN_BYTES + bytes([flg, 0x70]) + b"\x00" * 13 + b"\x00"
    info = fmt.parse_frame_header(buf)
    assert info.has_block_checksum and info.has_content_size
    assert info.has_content_checksum and info.has_dictionary_id
    assert info.header_size == 4 + 2 + 8 + 4 + 1


def test_bad_magic():
    with pytest.raises(fmt.FormatError, match="invalid signature"):
        fmt.parse_frame_header(b"\x00\x00\x00\x00")


def test_bad_version():
    buf = fmt.MAGIC_MODERN_BYTES + bytes([0x80, 0x70, 0x00])
    with pytest.raises(fmt.FormatError, match="version 1"):
        fmt.parse_frame_header(buf)


def test_block_header_stored_bit():
    hdr = fmt.build_block_header(100, stored=True)
    size, compressed = fmt.parse_block_header(hdr, legacy=False)
    assert size == 100 and not compressed
    hdr = fmt.build_block_header(100, stored=False)
    size, compressed = fmt.parse_block_header(hdr, legacy=False)
    assert size == 100 and compressed


def test_legacy_blocks_always_compressed():
    hdr = fmt.build_block_header(7, stored=True, legacy=True)
    size, compressed = fmt.parse_block_header(hdr, legacy=True)
    assert size == 7 and compressed


@pytest.mark.parametrize(
    "nlit,mlen,dist",
    [(0, 4, 1), (3, 18, 65535), (15, 19, 7), (14, 0, 0), (270, 273, 300), (271, 274, 1)],
)
def test_sequence_cost_matches_encoding(nlit, mlen, dist):
    seq = fmt.encode_sequence(b"A" * nlit, mlen, dist)
    assert len(seq) == fmt.sequence_cost(nlit, mlen)


def test_match_extra_cost_breakpoints():
    # token+offset = 3 up to len 18; +1 at 19; next increase at 274 (19+255)
    assert fmt.match_extra_cost(4) == 3
    assert fmt.match_extra_cost(18) == 3
    assert fmt.match_extra_cost(19) == 4
    assert fmt.match_extra_cost(273) == 4
    assert fmt.match_extra_cost(274) == 5
    assert fmt.match_extra_cost(274 + 254) == 5
    assert fmt.match_extra_cost(274 + 255) == 6


def test_level_mapping():
    assert fmt.level_to_max_chain(0) == 0
    assert fmt.level_to_max_chain(5) == 5
    assert fmt.level_to_max_chain(9) == 65535
    with pytest.raises(ValueError):
        fmt.level_to_max_chain(10)


def test_max_compressed_block_bound():
    # token-stream worst case: one literals-only token + extension bytes
    assert fmt.max_compressed_block_size(4096) >= 4096 + 4096 // 255 + 1
    assert fmt.max_compressed_block_size(0) >= 1
