"""Test environment: virtual 8-device CPU mesh (SURVEY.md §4) + reference
binaries built on demand as the golden-stream fixture."""
import os
import pathlib
import subprocess

# Simulate an 8-chip mesh on CPU.  The container's sitecustomize imports
# jax at interpreter start with JAX_PLATFORMS pinned to the TPU plugin, so
# setting the env here is too late — update jax.config directly (backends
# are initialized lazily, on first device use).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np
import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
REFBIN_DIR = pathlib.Path("/tmp/refbin")


def _build_reference() -> None:
    REFBIN_DIR.mkdir(parents=True, exist_ok=True)
    if not (REFBIN_DIR / "smallz4").exists():
        subprocess.run(
            ["g++", "-O2", "-s", str(REFERENCE_DIR / "smallz4.cpp"), "-o", str(REFBIN_DIR / "smallz4")],
            check=True, capture_output=True,
        )
    if not (REFBIN_DIR / "smallz4cat").exists():
        subprocess.run(
            ["gcc", "-O2", "-std=c99", "-s", str(REFERENCE_DIR / "smallz4cat.c"), "-o", str(REFBIN_DIR / "smallz4cat")],
            check=True, capture_output=True,
        )


class Reference:
    """Drive the reference binaries as compression/decompression oracles."""

    def __init__(self):
        _build_reference()

    def compress(self, data: bytes, level: int = 9, legacy: bool = False) -> bytes:
        args = [str(REFBIN_DIR / "smallz4"), f"-{level}"] + (["-l"] if legacy else [])
        res = subprocess.run(args, input=data, capture_output=True)
        assert res.returncode == 0, res.stderr
        return res.stdout

    def decompress(self, data: bytes, dict_path: str | None = None) -> bytes:
        # NB: the reference CLI requires -D *after* the filename (argv bug,
        # smallz4cat.c:408); piping via stdin avoids the filename entirely.
        args = [str(REFBIN_DIR / "smallz4cat"), "-"]
        if dict_path:
            args += ["-D", dict_path]
        res = subprocess.run(args, input=data, capture_output=True)
        assert res.returncode == 0, res.stderr
        return res.stdout


@pytest.fixture(scope="session")
def reference() -> Reference:
    if not REFERENCE_DIR.exists():
        pytest.skip("reference sources not available")
    return Reference()


@pytest.fixture(scope="session")
def corpora() -> dict[str, bytes]:
    """Small differential-test corpus: compressible, incompressible, runs,
    structured, boundary sizes (SURVEY.md §4)."""
    rng = np.random.default_rng(1234)
    text = (REFERENCE_DIR / "smallz4.h").read_bytes() if REFERENCE_DIR.exists() else b"lorem ipsum " * 4000
    return {
        "empty": b"",
        "one": b"x",
        "tiny": b"abc",
        "just12": b"abcdabcdabcd",
        "hello": b"hello hello hello hello world",
        "text": text[:24000],
        "random": rng.integers(0, 256, 4096, dtype=np.uint8).tobytes(),
        "run": b"a" * 12000,
        "run_mid": b"x" * 6000 + b"abcx" * 64 + b"y" * 2000,
        "struct": b"the quick brown fox jumps over the lazy dog. " * 200,
        "mixed": b"".join(
            rng.integers(0, 256, 80, dtype=np.uint8).tobytes() + b"needle" * 10
            for _ in range(40)
        ),
    }
