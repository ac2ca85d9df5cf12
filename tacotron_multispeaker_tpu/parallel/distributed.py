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


def make_global_batch(batch, mesh, data_axis: str = "data"):
    """Assemble per-host feeder slices into global ``jax.Array``s.

    On a multi-process run a jit compiled over the global mesh cannot take
    host-local numpy — each host holds ``batch_size // process_count`` rows
    of the global batch (data/feeder.py host slicing), and this builds the
    global arrays via ``jax.make_array_from_process_local_data`` with the
    batch sharded on ``data_axis``.  Single-process: returns the batch
    untouched (jit's in_shardings handles the transfer).
    """
    if jax.process_count() <= 1:
        return batch
    import dataclasses
    from jax.sharding import NamedSharding, PartitionSpec as P

    def to_global(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return dataclasses.replace(
        batch, **{f.name: to_global(getattr(batch, f.name))
                  for f in dataclasses.fields(batch)})
