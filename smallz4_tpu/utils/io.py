"""Streaming I/O layer — the framework's analog of the reference's
GET_BYTES/SEND_BYTES callback pairs (smallz4.h:41-44, smallz4cat.c:63-65).

The extension point is any file-like object pair; these helpers pump a
codec's streaming context between them in bounded memory."""
from __future__ import annotations

import sys
from typing import BinaryIO

CHUNK = 4 * 1024 * 1024


def open_input(path: str | None) -> BinaryIO:
    if path is None or path == "-":
        return sys.stdin.buffer
    return open(path, "rb")


def open_output(path: str | None, force: bool = False) -> BinaryIO:
    if path is None or path == "-":
        return sys.stdout.buffer
    if not force:
        try:
            with open(path, "rb"):
                raise FileExistsError(f"output file already exists: {path}")
        except FileNotFoundError:
            pass
    return open(path, "wb")


def load_dictionary(path: str) -> bytes:
    """Load the last 64 KB of a dictionary file (smallz4.cpp:282-304)."""
    with open(path, "rb") as f:
        f.seek(0, 2)
        size = f.tell()
        f.seek(max(0, size - 65536))
        return f.read()


def pump(codec, src: BinaryIO, dst: BinaryIO, progress=None, chunk: int = CHUNK) -> None:
    """Stream src through a codec context (Encoder/Decoder .write API) into
    dst in bounded memory."""
    while True:
        data = src.read(chunk)
        final = not data
        out = codec.write(data or b"", final=final)
        if progress is not None:
            progress.add_in(len(data or b""))
        if out:
            dst.write(out)
            if progress is not None:
                progress.add_out(len(out))
        if final:
            break
    dst.flush()


def pump_chunks(codec, src: BinaryIO, dst: BinaryIO, chunk: int = 1 << 16) -> None:
    """Like pump, but for codecs exposing a piecewise ``chunks`` API (the
    constant-memory ring decoder): peak live memory stays O(chunk + 64 KB)
    end to end — the reference decoder's profile (smallz4cat.c:73,162-166)."""
    while True:
        data = src.read(chunk)
        final = not data
        for piece in codec.chunks(data or b"", final=final):
            dst.write(piece)
        if final or getattr(codec, "done", False):
            break
    dst.flush()
