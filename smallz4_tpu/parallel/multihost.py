"""Multi-host scale-out scaffold (SURVEY.md §2 'Collective comms backend').

Topology: hosts × local chips form one jax Mesh over the ``blocks`` axis.
Each host feeds its own byte range (plus the 64 KB halo read from the
neighbor range — file reads, no network), the sharded match step runs with
ICI/DCN collectives, and host 0 assembles the frame from the gathered
ragged payloads in block order.

This module is runnable single-host today (initialize() is a no-op when
no coordinator is configured) and is exercised by the same
``sharded_match_step`` the tests run on the virtual mesh; true multi-host
runs only need the standard jax.distributed environment
(COORDINATOR_ADDRESS, process ids) provisioned by the launcher.
"""
from __future__ import annotations

import os

import jax
import numpy as np

from .. import format as fmt
from . import sharding


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """jax.distributed.initialize from args or environment; returns True
    if a multi-process runtime was set up."""
    coordinator = coordinator or os.environ.get("SMALLZ4_TPU_COORDINATOR")
    if not coordinator:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ["SMALLZ4_TPU_NPROC"]),
        process_id=process_id if process_id is not None
        else int(os.environ["SMALLZ4_TPU_PROC_ID"]),
    )
    return True


def global_mesh(axis: str = "blocks") -> "jax.sharding.Mesh":
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def compress_distributed(
    data: bytes,
    block_size: int = fmt.MAX_BLOCK_SIZE,
    max_candidates: int = 16,
    parity: bool = True,
) -> bytes | None:
    """All-hosts collective compression; returns the frame on process 0,
    None elsewhere.  Single-process: plain sharded compression."""
    mesh = global_mesh()
    frame = sharding.compress_sharded(
        data, mesh, block_size=block_size,
        max_candidates=max_candidates, parity=parity,
    )
    return frame if jax.process_index() == 0 else None
