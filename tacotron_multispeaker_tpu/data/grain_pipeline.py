"""grain-backed input pipeline (BASELINE.json: "tf-free grain pipeline").

An alternative to :class:`..data.feeder.Feeder` built on google/grain:
deterministic shuffling + per-host sharding (``ShardByJaxProcess``) +
multiprocess prefetching come from grain; the group-sort bucketing and
static-shape padding (the jit-cache-stability policy — see feeder.py) are
applied as a generator stage over grain's per-example stream.

Use when input IO becomes the bottleneck; the custom Feeder remains the
zero-dependency default.  NOTE: with ``shard_by_process`` each host buckets
its OWN index stream, so per-step batch shapes can differ across hosts —
incompatible with a global-mesh jit.  Multi-host training uses the Feeder's
global-plan host slicing (data/feeder.py) instead; grain's sharding fits
per-host-independent pipelines only.
"""

from __future__ import annotations

import os
import random
from typing import Iterator

import numpy as np

from .feeder import Batch, pad_axis, pick_bucket
from .preprocess import load_metadata
from ..text import text_to_sequence


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
    import grain.python as grain

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
