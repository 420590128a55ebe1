"""Verbose progress reporting (parity: smallz4.cpp:82-102).

Emits the reference's stderr progress line — bytes in/out, ratio, %%done,
elapsed, kByte/s, ETA — driven from every output write, plus the final
summary line (smallz4.cpp:321-323)."""
from __future__ import annotations

import sys
import time


class Progress:
    def __init__(self, enabled: bool, total_size: int = 0, out=sys.stderr):
        self.enabled = enabled
        self.total_size = total_size
        self.bytes_in = 0
        self.bytes_out = 0
        self.start = time.time()
        self.out = out

    def add_in(self, n: int) -> None:
        self.bytes_in += n

    def add_out(self, n: int) -> None:
        self.bytes_out += n
        if self.enabled:
            self.report()

    def report(self) -> None:
        if self.bytes_in == 0:
            return
        duration = int(time.time() - self.start)
        if duration == 0:
            return
        line = (
            f"\r{self.bytes_in} bytes => {self.bytes_out} bytes "
            f"({100 * self.bytes_out // self.bytes_in}%"
        )
        estimated = (
            duration * self.total_size // self.bytes_in if self.total_size else 0
        )
        if estimated > 0:
            line += f", {100 * duration // estimated}% done"
        line += f"), after {duration} seconds @ {self.bytes_in // duration // 1024} kByte/s"
        if estimated > 0:
            line += f", about {estimated - duration} seconds left  "
        print(line, end="", file=self.out, flush=True)

    def summary(self) -> None:
        if not self.enabled or self.bytes_in == 0:
            return
        duration = int(time.time() - self.start)
        print(
            f"\r{self.bytes_in} bytes => {self.bytes_out} bytes "
            f"({100 * self.bytes_out // self.bytes_in}%) after {duration} seconds"
            + " " * 60,
            file=self.out,
        )
