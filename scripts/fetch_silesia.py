#!/usr/bin/env python3
"""Vendor the Silesia corpus for the benchmark (BASELINE.json north star
names Silesia; the build environment has zero network egress, so this
must be run on a machine with access, or the files copied in by hand).

Downloads http://sun.aei.polsl.pl/~sdeor/corpus/ (the corpus's canonical
home; also mirrored at https://github.com/MiloszKrajewski/SilesiaCorpus)
into benchdata/silesia/.  bench.py automatically switches its headline
corpus (and metric name) from the synthetic "silesia_like" mix to the
real corpus when the directory is present and complete.

Each file's well-known decompressed size is checked after download; a
size mismatch aborts (the corpus is immutable, so sizes are a stable
integrity check that needs no secret pinning).
"""
from __future__ import annotations

import hashlib
import pathlib
import sys
import urllib.request
import zlib

#: HTTPS first; the plain-HTTP canonical home only as a fallback
BASES = ("https://sun.aei.polsl.pl/~sdeor/corpus/",
         "http://sun.aei.polsl.pl/~sdeor/corpus/")
DEST = pathlib.Path(__file__).resolve().parent.parent / "benchdata" / "silesia"

#: canonical member sizes (bytes), as published with the corpus
SIZES = {
    "dickens": 10_192_446,
    "mozilla": 51_220_480,
    "mr": 9_970_564,
    "nci": 33_553_445,
    "ooffice": 6_152_192,
    "osdb": 10_085_684,
    "reymont": 6_627_202,
    "samba": 21_606_400,
    "sao": 7_251_944,
    "webster": 41_458_703,
    "xml": 5_345_280,
    "x-ray": 8_474_240,
}

#: per-member sha256 of the DECOMPRESSED bytes.  The corpus is immutable,
#: so digests are the real integrity check (size alone cannot catch
#: tampered or corrupted-but-right-size payloads).  This build
#: environment has zero egress, so the digests cannot be computed here:
#: on first successful fetch the script PRINTS each digest for the
#: operator to pin below; any member with a pinned digest is verified.
SHA256: dict[str, str] = {}


def main() -> int:
    DEST.mkdir(parents=True, exist_ok=True)
    for name, want in SIZES.items():
        out = DEST / name
        if out.exists() and out.stat().st_size == want:
            print(f"{name}: already present ({want} bytes)")
            continue
        raw = None
        for base in BASES:
            url = f"{base}{name}.bz2"
            print(f"fetching {url} ...")
            try:
                raw = urllib.request.urlopen(url, timeout=120).read()
                break
            except OSError as e:
                err = e
        if raw is None:
            print(f"FAILED to fetch {name}: {err}\n"
                  f"(no network egress here? run this script on a "
                  f"connected machine and copy benchdata/silesia/ in)",
                  file=sys.stderr)
            return 1
        try:
            import bz2

            data = bz2.decompress(raw)
        except Exception:
            try:
                data = zlib.decompress(raw)  # some mirrors serve zlib
            except Exception:
                print(f"FAILED: {name} payload is neither bz2 nor zlib "
                      f"(mirror error page?)", file=sys.stderr)
                return 1
        if len(data) != want:
            print(f"FAILED: {name} decompressed to {len(data)} bytes, "
                  f"expected {want}", file=sys.stderr)
            return 1
        digest = hashlib.sha256(data).hexdigest()
        pinned = SHA256.get(name)
        if pinned is None:
            print(f"{name}: sha256 {digest} — UNPINNED; add it to SHA256 "
                  f"in this script to lock the corpus bytes",
                  file=sys.stderr)
        elif digest != pinned:
            print(f"FAILED: {name} sha256 {digest} != pinned {pinned} "
                  f"(tampered or corrupted payload)", file=sys.stderr)
            return 1
        out.write_bytes(data)
        print(f"{name}: ok ({want} bytes)")
    print(f"Silesia corpus complete at {DEST}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
