"""Multi-host runtime initialization (NEW — SURVEY.md §2.15).

The reference is a single TF1 process; scale-out here is
``jax.distributed.initialize`` for multi-host pods.  Collectives compiled by
XLA ride ICI within a slice and DCN across slices — nothing in user code
talks to a network library directly.
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process.

    No-op when single-process (the common dev path): detection is via the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES) or
    explicit arguments.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nprocs = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    if addr is None and nprocs <= 1:
        return  # single process
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = addr
    if nprocs:
        kwargs["num_processes"] = nprocs
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif os.environ.get("JAX_PROCESS_ID") is not None:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def is_primary_host() -> bool:
    return jax.process_index() == 0


def shard_rows_for_host(rows: list) -> list:
    """Deterministically shard metadata rows across hosts for DP input
    (each host feeds only its slice of the global batch)."""
    n, i = jax.process_count(), jax.process_index()
    if n <= 1:
        return rows
    return rows[i::n]
