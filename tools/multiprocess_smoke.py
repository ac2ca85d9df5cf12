#!/usr/bin/env python
"""Two-process jax.distributed smoke test on localhost (SURVEY.md §4.5).

Validates the real multi-host code path — coordinator handshake, global
device view, cross-process collectives, the sharded train step over the
global mesh, AND the actual ``train()`` entry point fed by the host-sharded
Feeder (each process loads only its batch slice; global arrays assembled
via jax.make_array_from_process_local_data) — without a pod: each process
gets 4 virtual CPU devices, the global mesh sees 8.

Run directly: ``python tools/multiprocess_smoke.py``
(parent spawns 2 workers; exits nonzero on any failure, including the two
processes disagreeing on the trained loss).
"""

import os
import subprocess
import sys
import tempfile

PORT = 9911
N_PROC = 2
LOCAL_DEVICES = 4
TRAIN_STEPS = 10


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC, process_id=pid)
    import numpy as np
    import jax.numpy as jnp

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES, jax.devices()

    # cross-process psum over the global mesh
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(data=N_PROC * LOCAL_DEVICES, model=1)

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    # each process contributes its addressable shards of a global array
    global_shape = (N_PROC * LOCAL_DEVICES, 4)
    sharding = NamedSharding(mesh, P("data", None))
    local = np.ones((LOCAL_DEVICES, 4), np.float32) * (pid + 1)
    arr = jax.make_array_from_process_local_data(sharding, local, global_shape)
    total = global_sum(arr)
    expected = 4.0 * LOCAL_DEVICES * (1 + 2)  # procs contribute 1s and 2s
    assert float(total) == expected, (float(total), expected)

    # full sharded train step over the global mesh
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.training import (
        create_train_state, make_sharded_train_step)
    cfg = get_config("tiny", f"train.batch_size={N_PROC * LOCAL_DEVICES}")
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn, state_sh = make_sharded_train_step(cfg, model, mesh)(state)
    state = jax.device_put(state, state_sh)
    B, L, T = N_PROC * LOCAL_DEVICES, 12, 4 * cfg.model.outputs_per_step
    rng = np.random.RandomState(0)
    b_local = B // N_PROC

    def shard(x, spec=P("data")):
        sh = NamedSharding(mesh, spec if x.ndim == 1 else
                           P("data", *([None] * (x.ndim - 1))))
        lo = pid * b_local
        return jax.make_array_from_process_local_data(
            sh, x[lo: lo + b_local], x.shape)

    inputs = shard(rng.randint(0, 100, (B, L)).astype(np.int32))
    lengths = shard(np.full((B,), L, np.int32))
    mels = shard(rng.rand(B, T, cfg.audio.num_mels).astype(np.float32))
    linears = shard(rng.rand(B, T, cfg.audio.num_freq).astype(np.float32))
    tlens = shard(np.full((B,), T, np.int32))
    sids = shard(np.zeros((B,), np.int32))
    state, metrics = step_fn(state, inputs, lengths, mels, linears, tlens,
                             sids)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"[proc {pid}] OK: global devices={len(jax.devices())} "
          f"loss={loss:.4f}", flush=True)

    # ---- the REAL train() entry point over the host-sharded feeder --------
    # (parent preprocessed a shared synthetic corpus into SMOKE_DATA_DIR)
    data_dir = os.environ["SMOKE_DATA_DIR"]
    work_dir = os.environ["SMOKE_WORK_DIR"]
    from tacotron_multispeaker_tpu.train_loop import train
    cfg2 = get_config(
        "tiny", f"train.batch_size={N_PROC * LOCAL_DEVICES},"
                f"train.checkpoint_interval={TRAIN_STEPS}")
    result = train(os.path.join(work_dir, "logs"), data_dir, cfg2,
                   max_steps=TRAIN_STEPS, restore=False, mesh=mesh)
    assert result["step"] == TRAIN_STEPS, result
    assert np.isfinite(result["loss"]), result
    # both processes must agree on the (replicated) loss — write for parent
    with open(os.path.join(work_dir, f"loss_{pid}.txt"), "w") as f:
        f.write(repr(result["loss"]))
    print(f"[proc {pid}] train() OK: step={result['step']} "
          f"loss={result['loss']:.5f}", flush=True)
    jax.distributed.shutdown()


def _prepare_corpus(work_dir: str) -> str:
    """Synthesize + preprocess a tiny shared corpus (parent, CPU-only)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.data.preprocess import build_generic
    from tacotron_multispeaker_tpu.data.preprocess import write_metadata
    from tacotron_multispeaker_tpu.data.synthetic import make_corpus
    cfg = get_config("tiny")
    corpus = make_corpus(os.path.join(work_dir, "corpus"), n_utts=24,
                         sample_rate=cfg.audio.sample_rate)
    data_dir = os.path.join(work_dir, "training")
    meta = build_generic(corpus, data_dir, cfg.audio, num_workers=2)
    write_metadata(meta, data_dir)
    return data_dir


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work_dir = tempfile.mkdtemp(prefix="mp_smoke_")
    data_dir = _prepare_corpus(work_dir)
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env["SMOKE_PROCESS_ID"] = str(pid)
        env["SMOKE_DATA_DIR"] = data_dir
        env["SMOKE_WORK_DIR"] = work_dir
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env, cwd=root))
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=600)
    if rc == 0:
        losses = []
        for pid in range(N_PROC):
            with open(os.path.join(work_dir, f"loss_{pid}.txt")) as f:
                losses.append(float(f.read()))
        if losses[0] != losses[1]:
            print(f"FAIL: processes disagree on loss: {losses}")
            rc = 1
        else:
            print(f"train() loss agrees across processes: {losses[0]:.6f}")
    print("multiprocess smoke:", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    if "SMOKE_PROCESS_ID" in os.environ:
        worker(int(os.environ["SMOKE_PROCESS_ID"]))
    else:
        sys.exit(main())
