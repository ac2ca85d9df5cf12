#!/usr/bin/env python
"""Flagship-config alignment emergence (VERDICT r3 Missing #2).

Round 3 proved alignment emergence only for the TINY config; nothing showed
the full ``single_speaker`` model (256-d embed/decoder, r=5, K=16 CBHG,
80 mel / 1025 linear) ever develops monotonic attention.  This probe trains
the FULL flagship dims on the unmemorizable micro copy-task (random letters
→ r fixed frames per letter, FRESH batch every step — teacher-forced loss
can only drop by reading the text through attention; corpus probes are
decoder-memorizable, see tools/align_probe.py) and prints the alignment
diagnostics every --probe_every steps:

  meanprog  mean argmax letter-progress per decoder step (diagonal ≈ 1)
  backfrac  fraction of steps where the argmax jumps backwards
  span      covered fraction of the input
  diagdev   mean |argmax − diagonal| in letter positions

Run on the chip (default platform): ~ms steps, so 20k steps ≈ minutes.
The Pallas training kernels stay at their defaults (GRU scan + teacher
decoder ON), so this also long-soaks the differentiable kernels.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--probe_every", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--letters", type=int, default=32)
    p.add_argument("--platform", default=None, choices=["cpu", "axon"])
    p.add_argument("--hparams", default="")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import numpy as np
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from tacotron_multispeaker_tpu.training import (create_train_state,
                                                    make_sharded_train_step)

    # FULL flagship model dims (the preset's defaults); only the schedule
    # and the copy-task geometry are overridden
    over = ",".join(x for x in [
        "train.warmup_steps=400",
        f"train.batch_size={args.batch}",
        f"train.max_input_length={args.letters}",
        f"train.input_bucket_boundaries=({args.letters},)",
        "model.prenet_dropout=0.0",      # determinism of the gate
        args.hparams] if x)
    cfg = get_config("single_speaker", over)
    r = cfg.model.outputs_per_step
    B, L = args.batch, args.letters
    T = r * L                            # one letter per decoder step
    M, F = cfg.audio.num_mels, cfg.audio.num_freq

    rng = np.random.RandomState(0)
    proto_m = rng.rand(26, M).astype(np.float32)
    proto_l = rng.rand(26, F).astype(np.float32)

    def make_batch(seed):
        rs = np.random.RandomState(seed)
        letters = rs.randint(0, 26, (B, L))
        rep = np.repeat(letters, r, axis=1)            # [B, T]
        return (jnp.asarray(letters + 2, jnp.int32),
                jnp.full((B,), L, jnp.int32),
                jnp.asarray(proto_m[rep]), jnp.asarray(proto_l[rep]),
                jnp.full((B,), T, jnp.int32), jnp.zeros((B,), jnp.int32))

    mesh = make_mesh(devices=jax.devices()[:1], data=1, model=1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"flagship dims: {n_params:,} params, B={B} L={L} T={T} r={r}, "
          f"kernels gru={cfg.parallel.use_pallas_gru} "
          f"teacher={cfg.parallel.use_pallas_teacher}", flush=True)
    step_fn, state_sh = make_sharded_train_step(cfg, model, mesh)(state)
    state = jax.device_put(state, state_sh)

    @jax.jit
    def tf_alignments(variables, inputs, input_lengths, mel_targets):
        out = model.apply(variables, inputs, input_lengths, mel_targets,
                          train=False, rngs={"dropout": jax.random.PRNGKey(0)})
        return out.alignments

    probe_batch = make_batch(10 ** 6)

    def probe(step, mel_loss):
        al = np.asarray(tf_alignments(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)},
            probe_batch[0], probe_batch[1], probe_batch[2]))  # [B, L, L]
        path = al.argmax(-1)
        prog = np.diff(path, axis=1)
        out = {
            "step": step, "mel_loss": round(mel_loss, 4),
            "meanprog": round(float(prog.mean()), 3),
            "backfrac": round(float((prog < 0).mean()), 3),
            "span": round(float((path.max(1) - path.min(1)).mean())
                          / (L - 1), 3),
            "diagdev": round(float(
                np.abs(path - np.arange(L)[None, :]).mean()), 3),
        }
        print(json.dumps(out), flush=True)
        return out

    t0 = time.time()
    last = None
    for step in range(1, args.steps + 1):
        state, metrics = step_fn(state, *make_batch(step))
        if step % args.probe_every == 0 or step == args.steps:
            mel = float(metrics["mel_loss"])
            print(f"[{time.time() - t0:7.1f}s] step {step}", flush=True)
            last = probe(step, mel)
    print(json.dumps({"final": last,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
