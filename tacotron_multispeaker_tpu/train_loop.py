"""The training loop (reference: train.py — SURVEY.md §2.11/§3.2).

Per step: one pjit-compiled update with device-resident state.  Every
``checkpoint_interval`` steps: save an orbax checkpoint, run inference on a
training example, and write Griffin-Lim wav + alignment PNG artifacts —
exactly the reference's artifact-driven verification workflow.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from .audio import AudioProcessor
from .config import Config
from .data.feeder import Feeder, PrefetchIterator
from .models import create_model
from .parallel import make_mesh
from .parallel.distributed import is_primary_host, make_global_batch
from .training import create_train_state, make_sharded_train_step
from .utils import infolog, plot
from .utils.checkpoint import CheckpointManager

log = infolog.log


def time_string() -> str:
    return time.strftime("%Y-%m-%d %H:%M")


def train(log_dir: str, data_dir: str, cfg: Config, *,
          max_steps: int | None = None, restore: bool = True,
          mesh=None, profile_steps: tuple[int, int] | None = None,
          cmudict_path: str | None = None,
          pipeline: str = "feeder", pipeline_workers: int = 0) -> dict:
    """Run training; returns final metrics dict (for tests/benchmarks)."""
    os.makedirs(log_dir, exist_ok=True)
    checkpoint_dir = os.path.join(log_dir, "checkpoints")
    infolog.init(os.path.join(log_dir, "train.log"), cfg.name,
                 enabled=is_primary_host())
    log(cfg.debug_string())

    mesh = mesh or make_mesh(cfg.parallel)
    log(f"mesh: {mesh.shape}; devices: {len(jax.devices())} "
        f"({jax.devices()[0].platform})")
    # NOTE: no kernel veto here any more — make_sharded_train_step routes
    # pure-DP meshes through the shard_map step (kernels enabled per shard)
    # and only disables them on model-axis-sharded meshes (round 4).
    n_data = mesh.shape[cfg.parallel.data_axis]
    if cfg.train.batch_size % n_data != 0:
        raise ValueError(
            f"train.batch_size={cfg.train.batch_size} must be divisible by "
            f"the data-parallel axis size {n_data}")

    model, state = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log(f"initialized model: {n_params:,} params")

    ckpt = CheckpointManager(checkpoint_dir)
    if restore and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log(f"resumed from checkpoint at step {int(state.step)}")

    compile_step = make_sharded_train_step(cfg, model, mesh)
    step_fn, state_sh = compile_step(state)
    state = jax.device_put(state, state_sh)

    if pipeline == "grain":
        # multi-host-correct grain stream over the Feeder's global batch
        # plan (data/grain_pipeline.py); grain does its own worker-process
        # prefetching when pipeline_workers > 0
        from .data.grain_pipeline import grain_global_batches
        batches = PrefetchIterator(
            grain_global_batches(data_dir, cfg, cmudict_path=cmudict_path,
                                 worker_count=pipeline_workers), prefetch=4)
    else:
        feeder = Feeder(data_dir, cfg, cmudict_path=cmudict_path)
        batches = PrefetchIterator(iter(feeder), prefetch=4)
    ap = AudioProcessor(cfg.audio)
    # checkpoint-interval eval goes through the Synthesizer's COMPILED
    # decode+vocode fn (one compile per input-bucket signature, cached across
    # intervals) — a bare model.apply(generate) would dispatch every decoder
    # primitive eagerly, minutes of stall per checkpoint under axon
    from .synthesizer import Synthesizer
    synth = Synthesizer(cfg) if is_primary_host() else None
    # JSONL always; TensorBoard only when TACOTRON_TB=1 (the TF import is
    # slow and TF is otherwise an oracle-only dependency)
    from .utils.metrics import MetricsWriter
    writer = MetricsWriter(log_dir,
                           use_tensorboard=os.environ.get("TACOTRON_TB") == "1",
                           enabled=is_primary_host())

    max_steps = max_steps if max_steps is not None else cfg.train.max_steps
    metrics = {}
    t_last = time.time()
    window = []
    profiling = False
    diverged = False
    # Host-side step counter: reading ``int(state.step)`` or
    # ``float(metrics[...])`` forces a host↔device round trip EVERY step
    # (under the axon tunnel that is ~25-400 ms, dwarfing the step itself).
    # The loop now syncs only where a value is actually consumed — at
    # summary/checkpoint intervals — so dispatch pipelines ahead of the
    # device between logs (the "sustained rate" bench.py --train reports).
    # A bounded pipeline depth is still required: with NO syncs the host
    # dispatches thousands of steps ahead and every batch's host buffers
    # stay pinned (measured: 81 GB RSS after ~15 min on the tiny config).
    # One cheap scalar readback every ``sync_every`` steps caps in-flight
    # work at ~sync_every batches for ~1 ms/step amortized tunnel cost.
    step = int(state.step)
    sync_every = max(1, min(cfg.train.summary_interval, 32))
    try:
        while step < max_steps:
            # jax.profiler trace over [start, stop) steps → Perfetto dump
            if profile_steps is not None:
                if not profiling and step == profile_steps[0]:
                    jax.profiler.start_trace(os.path.join(log_dir, "profile"))
                    profiling = True
                    log(f"profiler trace started at step {step}")
                elif profiling and step >= profile_steps[1]:
                    jax.profiler.stop_trace()
                    profiling = False
                    log(f"profiler trace written to {log_dir}/profile")
            host_batch = next(batches)          # this host's rows (numpy)
            batch = make_global_batch(host_batch, mesh,
                                      cfg.parallel.data_axis)
            state, metrics = step_fn(
                state, batch.inputs, batch.input_lengths, batch.mel_targets,
                batch.linear_targets, batch.target_lengths, batch.speaker_ids)
            step += 1
            if step % sync_every == 0:
                # backpressure sync point — the loss value is already being
                # fetched, so the divergence check here is free (previously
                # it only ran at summary intervals, so a checkpoint written
                # between a blow-up and the next summary could contain
                # non-finite params)
                loss_now = float(metrics["loss"])
                if not np.isfinite(loss_now):
                    diverged = True
                    log(f"loss exploded by step {step}; aborting", slack=True)
                    raise FloatingPointError(
                        f"non-finite loss at step {step}")
            t_now = time.time()
            window.append(t_now - t_last)
            window = window[-100:]
            t_last = t_now
            if step % cfg.train.summary_interval == 0 or step <= 5:
                loss = float(metrics["loss"])   # true sync point
                if not np.isfinite(loss):
                    diverged = True
                    log(f"loss exploded by step {step}; aborting", slack=True)
                    raise FloatingPointError(f"non-finite loss at step {step}")
                if is_primary_host():
                    writer.scalars(step, {
                        "loss": loss,
                        "mel_loss": float(metrics["mel_loss"]),
                        "linear_loss": float(metrics["linear_loss"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "lr": float(metrics["lr"]),
                        "sec_per_step": float(np.mean(window)),
                    })
                log(f"step {step:7d}  loss={loss:.5f}  "
                    f"mel={float(metrics['mel_loss']):.5f}  "
                    f"lin={float(metrics['linear_loss']):.5f}  "
                    f"gnorm={float(metrics['grad_norm']):.3f}  "
                    f"lr={float(metrics['lr']):.6f}  "
                    f"sec/step={np.mean(window):.3f}")
            if step % cfg.train.checkpoint_interval == 0 and step > 0:
                # ckpt_interval need not divide sync_every — check the loss
                # HERE so a blow-up inside the last sync window can never be
                # persisted as a restorable checkpoint (ADVICE r4)
                if not np.isfinite(float(metrics["loss"])):
                    diverged = True
                    log(f"loss exploded by step {step}; aborting", slack=True)
                    raise FloatingPointError(f"non-finite loss at step {step}")
                # eval uses the HOST-LOCAL batch: slicing a global array's
                # first row is not host-addressable on multi-process runs
                _checkpoint_and_eval(ckpt, state, step, synth, host_batch,
                                     cfg, ap, log_dir, writer)
    finally:
        if profiling:
            jax.profiler.stop_trace()
        batches.close()
        writer.close()
        if diverged:
            # the abort exists to keep blown-up params OUT of the restore
            # chain — saving here would make the diverged state the NEWEST
            # checkpoint and restore=True would resume from it (ADVICE r4)
            log("divergence abort: final state NOT checkpointed; latest "
                "restorable checkpoint is the last finite one")
        else:
            # all hosts call save symmetrically (orbax coordinates
            # multi-host writes with barriers; an asymmetric call would
            # deadlock) — `diverged` is identical on every host since the
            # loss is replicated
            ckpt.save(int(state.step), jax.device_get(state), wait=True)
        ckpt.close()
    return {"step": int(state.step), **{k: float(v) for k, v in metrics.items()}}


def _checkpoint_and_eval(ckpt, state, step, synth, batch, cfg, ap, log_dir,
                         writer=None):
    """Reference workflow: save ckpt, synthesize one training example, write
    wav + alignment plot (SURVEY.md §3.2 every-1000-steps block).  The
    decode+Griffin-Lim runs through the Synthesizer's jit-compiled fn (its
    lru cache holds one executable per input-bucket signature, reused every
    interval)."""
    log(f"saving checkpoint at step {step}")
    ckpt.save(step, jax.device_get(state))   # symmetric on all hosts
    if synth is None:        # non-primary hosts only save
        return
    try:
        host_state = jax.device_get(state)
        synth.load_variables({"params": host_state.params,
                              "batch_stats": host_state.batch_stats})
        inputs = batch.inputs[:1]
        lengths = batch.input_lengths[:1]
        sid = np.asarray(batch.speaker_ids[:1], np.int32)
        fn = synth._compiled(1, inputs.shape[1], cfg.model.max_iters)
        wav, aligns, _ = fn(synth.variables, jax.numpy.asarray(inputs),
                            jax.numpy.asarray(lengths),
                            jax.numpy.asarray(sid), jax.random.PRNGKey(0))
        ap.save_wav(np.asarray(wav[0]),
                    os.path.join(log_dir, f"step-{step}-audio.wav"))
        align_path = os.path.join(log_dir, f"step-{step}-align.png")
        plot.plot_alignment(np.asarray(aligns[0]), align_path,
                            info=f"{cfg.name}, step={step}, {time_string()}")
        if writer is not None:
            writer.image(step, "alignment", align_path)
        log(f"wrote eval artifacts for step {step}")
    except Exception as e:  # eval artifacts must never kill training
        log(f"eval artifact generation failed: {e}")
