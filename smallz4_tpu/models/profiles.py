"""Codec profiles: the framework's "model zoo" — named configurations of
level, frame format, block geometry and engine parameters.

The reference exposes a single knob (level -> maxChainLength,
smallz4.cpp:144-155); the framework adds engine/topology choices.  A
profile is a plain dataclass consumed by the public API and the CLIs.
"""
from __future__ import annotations

import dataclasses

from .. import format as fmt


@dataclasses.dataclass(frozen=True)
class CodecProfile:
    """One named codec configuration."""
    name: str
    level: int = 9
    legacy: bool = False
    block_size: int | None = None          # None: format default
    engine: str = "auto"                   # auto | native | tpu | oracle
    max_candidates: int = 16               # tpu turbo walk cap
    parity: bool = True                    # exact -9 streams on tpu engine (default);
                                           # False = raw device claims (diagnostic)
    threads: int | None = None             # host-parallel worker cap

    @property
    def max_chain_length(self) -> int:
        return fmt.level_to_max_chain(self.level)

    def validate(self) -> None:
        fmt.level_to_max_chain(self.level)
        if self.legacy and self.level == 0:
            raise ValueError("legacy format doesn't support uncompressed files")


#: reference-equivalent defaults (one per level)
LEVELS = {lv: CodecProfile(name=f"level{lv}", level=lv) for lv in range(10)}

#: named profiles
PROFILES = {
    **{p.name: p for p in LEVELS.values()},
    "max": CodecProfile(name="max", level=9, engine="native"),
    # raw device claims break the <= -9 size contract: diagnostic only,
    # named accordingly (round-5 naming fix; "turbo" now means the exact
    # default engine)
    "unsafe-raw": CodecProfile(name="unsafe-raw", level=9, engine="tpu",
                               max_candidates=16, parity=False),
    "turbo": CodecProfile(name="turbo", level=9, engine="tpu",
                          max_candidates=16, parity=True),
    "turbo-exact": CodecProfile(name="turbo-exact", level=9, engine="tpu",
                                max_candidates=16, parity=True),
    "legacy": CodecProfile(name="legacy", level=9, legacy=True),
    "archive-1m": CodecProfile(name="archive-1m", level=9,
                               block_size=1 << 20),
}


def get(name: str) -> CodecProfile:
    try:
        profile = PROFILES[name]
    except KeyError:
        raise ValueError(f"unknown codec profile {name!r}; "
                         f"available: {sorted(PROFILES)}") from None
    profile.validate()
    return profile
