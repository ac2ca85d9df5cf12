"""grain-backed input pipeline (BASELINE.json: "tf-free grain pipeline").

An alternative to :class:`..data.feeder.Feeder` built on google/grain.  Two
modes:

* :func:`grain_global_batches` — **multi-host-correct** (round 3): the
  Feeder's metadata-only global batch plan (seeded shuffle → group sort →
  batch slice → bucket choice, identical on every host —
  feeder.py:epoch_plan) becomes the grain record stream, and grain workers
  materialize each host's contiguous slice of every planned batch.  Batch
  shapes agree across hosts by construction, so the stream feeds a
  global-mesh jit exactly like the Feeder (train_loop assembles the slices
  via make_global_batch).  This is the feeder replacement the north star
  names; grain contributes deterministic multiprocess prefetching.
* :func:`grain_batches` — the round-1 per-host-independent stream
  (``ShardByJaxProcess``): each host buckets its OWN index stream, so
  per-step shapes can differ across hosts — fine for single-host or
  host-independent pipelines, incompatible with a global-mesh jit.
"""

from __future__ import annotations

import os
import random
from typing import Iterator

import grain.python as grain
import numpy as np

from .feeder import Batch, pad_axis, pick_bucket
from .preprocess import load_metadata
from ..text import text_to_sequence


class _MaterializeBatch(grain.MapTransform):
    """Picklable grain MapTransform: plan entry → this host's Batch slice.

    Module-level class (grain pickles operations to its worker processes);
    holds a Feeder, whose materialize() touches only numpy/file IO — no JAX
    — so workers never initialize a backend."""

    def __init__(self, feeder):
        self.feeder = feeder

    def map(self, entry):
        return self.feeder.materialize(entry)


def grain_global_batches(data_dir: str, cfg, *, num_epochs: int | None = None,
                         worker_count: int = 0,
                         cmudict_path: str | None = None,
                         process_index: int | None = None,
                         process_count: int | None = None) -> Iterator[Batch]:
    """Multi-host-correct grain stream over the Feeder's global batch plan.

    Every host iterates the SAME plan (so per-step static shapes agree and a
    global-mesh jit never recompiles out of skew) but loads only its
    contiguous ``batch_size // process_count`` slice of each batch.  With
    ``worker_count > 0`` grain materializes batches in worker processes
    (deterministic: the plan entry fully determines the batch)."""
    from .feeder import Feeder

    feeder = Feeder(data_dir, cfg, cmudict_path=cmudict_path,
                    process_index=process_index, process_count=process_count)
    transform = _MaterializeBatch(feeder)

    # ONE DataLoader spanning every epoch (ADVICE r3: a loader per epoch
    # respawned the whole worker pool — and re-pickled the Feeder to every
    # worker — at each epoch boundary, stalling the input stream).  The
    # flat record index decomposes as epoch*plan_len + i; workers derive
    # each epoch's metadata-only plan themselves (seeded, identical
    # everywhere) and cache the current epoch's plan.
    plan_len = len(feeder.epoch_plan(0))
    if plan_len == 0:
        return iter(())
    # grain needs a finite random-access range; "endless" = a bound no
    # real run exhausts (plans repeat deterministically per epoch anyway)
    eff_epochs = num_epochs if num_epochs is not None else 100_000
    source = grain.RangeDataSource(start=0, stop=plan_len * eff_epochs,
                                   step=1)
    sampler = grain.IndexSampler(
        num_records=plan_len * eff_epochs, shard_options=grain.NoSharding(),
        shuffle=False, num_epochs=1, seed=cfg.train.seed)
    loader = grain.DataLoader(
        data_source=source, sampler=sampler,
        operations=[_PlanLookup(feeder, plan_len), transform],
        worker_count=worker_count)
    if num_epochs is not None:
        return iter(loader)

    def endless():
        # "endless" is really plan_len * eff_epochs records; for a tiny
        # corpus a long soak can exhaust it.  Raise a diagnostic instead of
        # silently ending the iterator mid-train (ADVICE r4) — the old
        # per-epoch loop was genuinely endless.
        n = 0
        for batch in loader:
            yield batch
            n += 1
        raise RuntimeError(
            f"grain epoch bound exhausted after {n} batches "
            f"({plan_len} batches/epoch x {eff_epochs} epochs): the corpus "
            f"is small enough that this run outlived the endless-stream "
            f"bound — pass num_epochs explicitly or derive it from "
            f"max_steps")

    return endless()


class _PlanLookup(grain.MapTransform):
    """Picklable flat-index → plan-entry map for worker_count > 0.

    Derives (epoch, index) from the flat record index and caches the
    current epoch's plan per worker — epoch_plan is metadata-only and
    seeded, so every worker/host computes the identical plan."""

    def __init__(self, feeder, plan_len: int):
        self.feeder = feeder
        self.plan_len = plan_len
        self._cached_epoch = -1
        self._plan = None

    def map(self, idx):
        epoch, i = divmod(idx, self.plan_len)
        if epoch != self._cached_epoch:
            self._plan = self.feeder.epoch_plan(epoch)
            self._cached_epoch = epoch
        return self._plan[i]


def _load_example(data_dir: str, cleaners: str, row: dict):
    ids = np.asarray(text_to_sequence(row["text"], cleaners), np.int32)
    mel = np.load(os.path.join(data_dir, row["mel_file"]), allow_pickle=False)
    lin = np.load(os.path.join(data_dir, row["linear_file"]),
                  allow_pickle=False)
    return ids, mel, lin, row["speaker_id"]


def grain_batches(data_dir: str, cfg, *, num_epochs: int | None = None,
                  shard_by_process: bool = True,
                  worker_count: int = 0) -> Iterator[Batch]:
    """Endless (or ``num_epochs``-bounded) stream of static-shape batches."""
    meta = load_metadata(os.path.join(data_dir, "train.txt"))
    if not meta:
        raise ValueError(f"no metadata rows in {data_dir}/train.txt")

    r = cfg.model.outputs_per_step
    boundaries = tuple(-(-b // r) * r for b in cfg.train.bucket_boundaries)
    bs = cfg.train.batch_size
    group = bs * cfg.train.batches_per_group
    L = cfg.train.max_input_length

    # RangeDataSource of indices; rows resolved in the map stage (grain's
    # shared-memory source only accepts flat array-like records)
    source = grain.RangeDataSource(start=0, stop=len(meta), step=1)
    sharding = (grain.ShardByJaxProcess(drop_remainder=True)
                if shard_by_process else grain.NoSharding())
    sampler = grain.IndexSampler(
        num_records=len(source), shard_options=sharding,
        shuffle=True, num_epochs=num_epochs, seed=cfg.train.seed)

    class _Load(grain.MapTransform):
        def map(self, idx):
            return _load_example(data_dir, cfg.cleaners, meta[idx])

    loader = grain.DataLoader(
        data_source=source, sampler=sampler, operations=[_Load()],
        worker_count=worker_count)

    def batches():
        rng = random.Random(cfg.train.seed)
        pending: list = []
        for ex in loader:
            pending.append(ex)
            if len(pending) < group:
                continue
            yield from _emit_group(pending, rng)
            pending = []
        # final partial group (when num_epochs bounded)
        if pending:
            yield from _emit_group(pending, rng)

    def _emit_group(pending, rng):
        pending.sort(key=lambda e: e[1].shape[0])
        batches_ = [pending[i: i + bs] for i in range(0, len(pending), bs)]
        if batches_ and len(batches_[-1]) < bs:
            batches_.pop()
        rng.shuffle(batches_)
        for group_examples in batches_:
            n_frames = max(e[1].shape[0] for e in group_examples)
            T = pick_bucket(n_frames, boundaries)
            yield Batch(
                inputs=np.stack([pad_axis(e[0], L)
                                 for e in group_examples]).astype(np.int32),
                input_lengths=np.asarray(
                    [min(len(e[0]), L) for e in group_examples], np.int32),
                mel_targets=np.stack([pad_axis(e[1], T)
                                      for e in group_examples]).astype(
                                          np.float32),
                linear_targets=np.stack([pad_axis(e[2], T)
                                         for e in group_examples]).astype(
                                             np.float32),
                target_lengths=np.asarray(
                    [min(e[1].shape[0], T) for e in group_examples],
                    np.int32),
                speaker_ids=np.asarray([e[3] for e in group_examples],
                                       np.int32),
            )

    return batches()
