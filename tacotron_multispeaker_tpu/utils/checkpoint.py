"""Orbax checkpointing: save/auto-resume of the full train state.

Replaces the reference's ``tf.train.Saver`` every-1000-steps checkpoints +
``--restore_step`` manual restarts (SURVEY.md §5): sharded pytree state
{params, batch_stats, opt_state, step, rng} with automatic latest-step
resume; the same artifact serves train-resume and inference load.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None) -> Any:
        """Restore into the structure/shardings of ``template``."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_partial(self, template: Any, step: int | None = None) -> Any:
        """Restore ONLY the subtrees present in ``template`` (leaves may be
        ShapeDtypeStructs).  Keys absent from the template are skipped
        entirely — inference loads params/batch_stats without ever
        materializing the Adam moments (3x parameter memory otherwise)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        path = os.path.join(str(self._mgr.directory), str(step), "default")
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(
                item=template, partial_restore=True))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
