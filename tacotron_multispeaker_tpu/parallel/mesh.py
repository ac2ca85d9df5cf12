"""Device mesh + sharding layout (NEW — reference is single-device;
SURVEY.md §2.14-2.15).

Axes: ``data`` (DP over utterance batches) × ``model`` (TP-style sharding of
the speaker-embedding table and the widest projections when they exceed one
chip).  XLA inserts the collectives (psum for grads over ``data``,
all-gather for sharded-table lookups over ``model``) and lays them on ICI
within a slice / DCN across slices.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg_parallel=None, devices=None, data: int | None = None,
              model: int | None = None) -> Mesh:
    """Build a (data, model) mesh over all devices (or an explicit list).

    When an EXPLICIT ``data``/``model`` factorization asks for more devices
    than the default backend has, fall back to the host CPU platform (the
    ``xla_force_host_platform_device_count`` virtual-device rig) — this lets
    sharding tests that need an 8-way mesh run unchanged when the default
    backend is the single real TPU chip (``RUN_TPU_TESTS=1``)."""
    if devices is None:
        devices = list(jax.devices())
        # a missing factor counts as 1 when the other is explicit, so e.g.
        # make_mesh(data=8) on a single-chip backend still falls back to
        # the virtual-CPU platform (ADVICE r3: (data or 0)*(model or 0)
        # was 0 whenever only one factor was passed)
        want = ((data or 1) * (model or 1)
                if (data is not None or model is not None) else 0)
        if want > len(devices):
            try:
                cpu = list(jax.devices("cpu"))
            except RuntimeError:
                cpu = []
            if len(cpu) >= want:
                devices = cpu
    else:
        devices = list(devices)
    n = len(devices)
    if model is None:
        model = cfg_parallel.model_parallel_size if cfg_parallel else 1
    model = min(model, n)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"{n} devices cannot form mesh ({data}, {model})")
    arr = np.asarray(devices).reshape(data, model)
    axis_names = ((cfg_parallel.data_axis, cfg_parallel.model_axis)
                  if cfg_parallel else ("data", "model"))
    return Mesh(arr, axis_names)


def batch_spec() -> P:
    """Utterance batches are data-parallel on their leading axis."""
    return P("data")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_specs(params, cfg) -> dict:
    """PartitionSpec tree for the parameter pytree.

    Everything is replicated except, when the mesh has a nontrivial
    ``model`` axis and the speaker table is big enough
    (``shard_speaker_table_min``), the speaker-embedding table rows are
    sharded over ``model`` (SNIPPETS.md:94-100 pattern).
    """
    shard_table = (
        cfg.parallel.model_parallel_size > 1
        and cfg.model.num_speakers >= cfg.parallel.shard_speaker_table_min)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}

    def assign(path):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if shard_table and "speaker_table" in names:
            return P("model", None)
        return P()

    treedef = jax.tree_util.tree_structure(params)
    leaves = [assign(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
