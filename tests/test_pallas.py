"""Pallas kernel correctness (interpreter mode on CPU; the same Mosaic
programs run compiled on TPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from smallz4_tpu import oracle
from smallz4_tpu.ops import pallas_kernels as pk
from smallz4_tpu.ops import match_finder


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    parts = [
        b"abcabcabc run starts here: ", b"x" * 500,
        rng.integers(0, 256, n, dtype=np.uint8).tobytes(),
    ]
    return np.frombuffer(b"".join(parts)[:n], np.uint8)


@pytest.mark.parametrize("n", [1024, 4096, 5000])
def test_gram_hash_matches_oracle(n):
    data = _data(n)
    g, h = pk.gram_hash(jnp.asarray(data))
    g, h = np.asarray(g), np.asarray(h)
    go = oracle.grams4(data)
    ho = oracle.hash32(go)
    m = len(go)
    assert (g[:m].astype(np.uint32) == go).all()
    assert (h[:m].astype(np.uint32) == ho).all()


@pytest.mark.parametrize("n", [1024, 2048, 4096, 6000])
def test_run_lengths_matches_reference_impl(n):
    data = _data(n, seed=3)
    got = np.asarray(pk.run_lengths(jnp.asarray(data)))
    want = np.asarray(match_finder._run_lengths(jnp.asarray(data).astype(jnp.int32)))
    assert (got == want).all()


def test_run_lengths_pure_run():
    data = np.full(3072, 65, np.uint8)
    got = np.asarray(pk.run_lengths(jnp.asarray(data)))
    assert (got == np.arange(3072, 0, -1)).all()
