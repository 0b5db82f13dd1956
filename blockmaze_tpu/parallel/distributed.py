"""Multi-host process-group initialization (jax.distributed over DCN).

The reference has no distributed proving at all — its only parallelism is
OpenMP threads inside one process (SURVEY.md §2.3, §5.8). The TPU-native
framework scales across hosts with jax.distributed: every host starts the
same program, initialize() wires the process group, and jax.devices() then
spans the whole pod slice; Mesh/shard_map collectives compiled by XLA ride
ICI within a slice and DCN across hosts. No custom transport exists here by
design — the deliverable is sharding layouts (parallel.mesh / parallel.sqap),
not a wire protocol.

Typical use (same flags on every host):

    python scripts/e2e.py deposit --coordinator host0:1234 \
        --num-processes 2 --process-id $RANK

Single-process callers skip initialization entirely.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize the multi-host process group. Returns True when a
    multi-process group was joined, False for the single-process no-op.

    Arguments default from the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) so
    launchers can configure purely through the environment."""
    global _initialized
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator is None:
        return False
    if _initialized:
        return True
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def global_mesh(axis: str = "pts"):
    """Mesh over every device in the (possibly multi-host) process group.
    After initialize(), jax.devices() enumerates all hosts' chips; the
    resulting mesh shards the MSM/NTT axes across ICI+DCN."""
    from .mesh import make_mesh
    return make_mesh(len(jax.devices()), axis=axis)
