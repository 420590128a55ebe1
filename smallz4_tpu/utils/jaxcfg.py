"""Process-wide JAX configuration for the framework.

Importing this module enables the persistent compilation cache so the
big fixed-shape codec kernels (match finder at 4 MB + halo, decoder
expansion) compile once per machine, not once per process."""
from __future__ import annotations

import os

import jax


def setup() -> None:
    # one cache per platform: remote-compile plugins (axon) produce host
    # artifacts for a different machine profile than the local CPU backend
    tag = (os.environ.get("JAX_PLATFORMS") or "default").replace(",", "-")
    cache_dir = os.environ.get(
        "SMALLZ4_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "smallz4_tpu",
                     f"jax-{tag}"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only


setup()
