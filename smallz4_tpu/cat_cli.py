"""Decompressor CLI — parity with the reference smallz4cat
(smallz4cat.c:373-417): at most one input filename, -D dict, '-' = stdin,
output always to stdout.  The reference's argv bug (it only accepts -D
*after* the filename, smallz4cat.c:408) is fixed: -D works in any position."""
from __future__ import annotations

import sys

from . import format as fmt
from .utils import io as uio


def error(msg: str, code: int = 1):
    print(f"ERROR: {msg}", file=sys.stderr)
    raise SystemExit(code)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    in_path: str | None = None
    dictionary_path: str | None = None

    i = 0
    while i < len(argv):
        cur = argv[i]
        if cur.startswith("-D"):
            if len(cur) > 2:
                dictionary_path = cur[2:]
            else:
                if i + 1 >= len(argv):
                    error("no dictionary filename found")
                i += 1
                dictionary_path = argv[i]
        elif cur != "-" and cur.startswith("-") and len(cur) > 1:
            error("unknown flag")
        else:
            if in_path is not None:
                error("can only decompress one file at a time")
            in_path = cur
        i += 1

    dictionary = None
    if dictionary_path is not None:
        try:
            dictionary = uio.load_dictionary(dictionary_path)
        except OSError:
            error("cannot open dictionary")

    try:
        src = uio.open_input(in_path)
    except OSError:
        error("file not found")
    dst = sys.stdout.buffer

    from . import native
    try:
        if native.available():
            # constant-memory path: 64 KB ring + 64 KB read chunks — the
            # reference decoder's memory profile (smallz4cat.c:73,162-166)
            with native.RingDecoder(dictionary=dictionary) as dec:
                uio.pump_chunks(dec, src, dst)
        else:
            uio.pump(_OracleDecoder(dictionary), src, dst)
    except fmt.FormatError as e:
        error(str(e))
    return 0


class _OracleDecoder:
    """Whole-buffer fallback when the native runtime isn't built."""

    def __init__(self, dictionary):
        self.dictionary = dictionary
        self.buf = bytearray()

    def write(self, chunk, final=False) -> bytes:
        self.buf += chunk
        if not final:
            return b""
        from . import oracle
        return oracle.decompress(bytes(self.buf), dictionary=self.dictionary)


if __name__ == "__main__":
    raise SystemExit(main())
