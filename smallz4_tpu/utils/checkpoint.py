"""Block-indexed checkpoint/resume for long compressions (SURVEY.md §5).

The reference is one-pass streaming with no persisted state; the
framework's block-parallel design makes resume natural: a manifest maps
block index -> (input span, payload digest, stored flag, payload bytes on
disk).  Resuming recompresses only the missing blocks and reassembles the
frame in order.

Layout on disk (directory):
    manifest.json             {"block_size": ..., "level": ..., "n": ...,
                               "blocks": {"0": {...}, ...}}
    block_<i>.bin             compressed payload (or raw bytes if stored)
"""
from __future__ import annotations

import hashlib
import json
import os
import pathlib

from .. import format as fmt


class CheckpointedCompressor:
    def __init__(self, directory: str, level: int = 9,
                 block_size: int = fmt.MAX_BLOCK_SIZE):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.level = level
        self.block_size = block_size
        self.manifest_path = self.dir / "manifest.json"
        self.manifest = self._load()

    def _load(self) -> dict:
        if self.manifest_path.exists():
            m = json.loads(self.manifest_path.read_text())
            if m.get("block_size") != self.block_size or m.get("level") != self.level:
                raise ValueError("existing checkpoint has different parameters")
            return m
        return {"block_size": self.block_size, "level": self.level,
                "n": None, "blocks": {}}

    def _save(self) -> None:
        tmp = self.manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.manifest))
        os.replace(tmp, self.manifest_path)

    def compress(self, data: bytes, engine=None) -> bytes:
        """Compress with per-block persistence; safe to interrupt and call
        again — finished blocks are verified by digest and reused."""
        from .. import native

        data = bytes(data)
        self.manifest["n"] = len(data)
        blocks = self.manifest["blocks"]
        n = len(data)
        starts = list(range(0, max(n, 1), self.block_size)) if n else []
        out = bytearray(fmt.build_frame_header(False))
        for i, start in enumerate(starts):
            end = min(start + self.block_size, n)
            span = data[start:end]
            # the digest covers the 64 KB history window too: a change in a
            # neighboring block invalidates dependent matches
            digest = hashlib.sha256(
                data[max(0, start - fmt.MAX_DISTANCE) : end]
            ).hexdigest()[:24]
            entry = blocks.get(str(i))
            path = self.dir / f"block_{i}.bin"
            if entry and entry["digest"] == digest and path.exists():
                payload = path.read_bytes()
                stored = entry["stored"]
            else:
                if engine is not None:
                    payload, stored = engine(data, start, end)
                else:
                    hist = data[max(0, start - fmt.MAX_DISTANCE) : start]
                    import numpy as np
                    ctx = np.frombuffer(hist + span, np.uint8)
                    lens = np.zeros(end - start, np.int32)
                    dists = np.zeros(end - start, np.int32)
                    cut = start >= fmt.MAX_DISTANCE + fmt.BLOCK_END_NO_MATCH
                    native.match_block_ex(
                        ctx, base=len(hist), bs=end - start, level=self.level,
                        lookback=len(hist),
                        cut_pos=(len(hist) - fmt.BLOCK_END_NO_MATCH) if cut else -1,
                        lens=lens, dists=dists)
                    if end - start > fmt.BLOCK_END_NO_MATCH and \
                            fmt.level_to_max_chain(self.level) > fmt.SHORT_CHAINS_GREEDY:
                        native.estimate_costs(lens, dists)
                    payload = native.emit_block(span, lens, dists)
                    stored = len(payload) >= len(span)
                    if stored:
                        payload = span
                path.write_bytes(payload)
                blocks[str(i)] = {"digest": digest, "stored": stored,
                                  "size": len(payload)}
                self._save()
            out += fmt.build_block_header(len(payload), stored, False)
            out += payload
        out += fmt.build_end_mark(False)
        self._save()
        return bytes(out)

    def completed_blocks(self) -> int:
        return len(self.manifest["blocks"])
