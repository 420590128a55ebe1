"""True multi-process validation of the distributed backend.

Spawns two Python processes with jax.distributed.initialize over a
localhost coordinator (CPU backend, 2 virtual devices per process: a
4-device global mesh across 2 "hosts").  Process 0's frame must round-trip
and be bit-identical to the single-process sharded result — proving the
global-array construction, the ppermute halo ring across the process
boundary, and the allgather/assembly path (SURVEY.md §2 'Collective comms
backend', §5 'distributed communication backend').
"""
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
import jax
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC"]),
)
import numpy as np
from smallz4_tpu.parallel import multihost
rng = np.random.default_rng(11)
words = [b"lz4", b"block", b"halo", b"mesh", b"frame", b"chip"]
data = b" ".join(words[i] for i in rng.integers(0, len(words), 120_000))
data = data[:400_000]
frame = multihost.compress_distributed(data, block_size=100_000,
                                       max_candidates=8)
if jax.process_index() == 0:
    out = sys.argv[2]
    open(out, "wb").write(frame)
else:
    assert frame is None
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    out = tmp_path / "mh.lz4"
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update(
            COORD=f"127.0.0.1:{port}",
            PROC=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(REPO), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        assert p.returncode == 0, err.decode()[-2000:]

    # oracle: the same compression single-process
    from smallz4_tpu import native
    from smallz4_tpu.parallel import sharding

    rng = np.random.default_rng(11)
    words = [b"lz4", b"block", b"halo", b"mesh", b"frame", b"chip"]
    data = b" ".join(words[i] for i in rng.integers(0, len(words), 120_000))
    data = data[:400_000]
    frame = out.read_bytes()
    assert native.decompress(frame) == data
    single = sharding.compress_sharded(
        data, sharding.make_mesh(), block_size=100_000, max_candidates=8)
    assert frame == single
