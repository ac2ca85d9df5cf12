#!/usr/bin/env python
"""Attention-alignment emergence probe (VERDICT r2 Missing #5a).

Trains the tiny config on a synthetic RANDOM-LETTER corpus — maximum text
entropy, so teacher-forced prediction REQUIRES reading the text through
attention (word corpora are memorizable by the decoder alone; measured: 3000
CPU steps leave attention uniform, relative entropy 0.99) — and prints
alignment diagnostics every --probe_every steps:

  meanprog   mean argmax step-to-step progress (diagonal ≈ L/steps)
  backfrac   fraction of steps where the argmax jumps backwards > 2
  span       fraction of the input covered between min/max argmax
  relent     mean alignment entropy / ln(L)  (1.0 = uniform, → 0 = peaked)

Run on the chip (default platform) where steps are ~ms so tens of thousands
of steps fit in minutes; --platform cpu works for small probes.
"""

import argparse
import csv
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(tmp, cfg, n_utts, seed=0):
    import numpy as np
    from scipy.io import wavfile
    from tacotron_multispeaker_tpu.data.synthetic import synth_utterance

    rng = np.random.RandomState(seed)
    raw = os.path.join(tmp, "raw")
    wav_dir = os.path.join(raw, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rows = []
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for i in range(n_utts):
        n = rng.randint(8, 15)
        chars = letters[rng.randint(0, 26, n)]
        text = "".join(c + (" " if (j % 4 == 3 and j < n - 1) else "")
                       for j, c in enumerate(chars)).strip()
        wav = synth_utterance(text, 0, cfg.audio.sample_rate)
        wavfile.write(os.path.join(wav_dir, f"u{i:04d}.wav"),
                      cfg.audio.sample_rate, (wav * 32767).astype("int16"))
        rows.append((f"wavs/u{i:04d}.wav", 0, text))
    with open(os.path.join(raw, "metadata.csv"), "w", newline="") as f:
        w = csv.writer(f, delimiter="|")
        for r in rows:
            w.writerow(r)
    return raw


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--probe_every", type=int, default=2000)
    p.add_argument("--n_utts", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--platform", default=None, choices=["cpu", "axon"])
    p.add_argument("--hparams", default="")
    p.add_argument("--workdir", default=None)
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
    from tacotron_multispeaker_tpu.data.preprocess import CORPORA, write_metadata
    from tacotron_multispeaker_tpu.data.feeder import Feeder
    from tacotron_multispeaker_tpu.train_loop import train
    from tacotron_multispeaker_tpu.training import create_train_state
    from tacotron_multispeaker_tpu.utils.checkpoint import CheckpointManager

    over = ",".join(x for x in [
        f"train.batch_size={args.batch}", "train.batches_per_group=4",
        "train.checkpoint_interval=1000000", "train.summary_interval=1000",
        "model.max_iters=10", args.hparams] if x)
    cfg = get_config("tiny", over)
    tmp = args.workdir or tempfile.mkdtemp(prefix="align_probe_")
    print(f"workdir: {tmp}", flush=True)
    raw = build_corpus(tmp, cfg, args.n_utts)
    out = os.path.join(tmp, "training")
    if not os.path.exists(os.path.join(out, "train.txt")):
        md = CORPORA["generic"](raw, out, cfg.audio, num_workers=1)
        write_metadata(md, out, cfg.audio)

    model, template = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = next(iter(Feeder(out, cfg).epoch_batches(0)))

    @jax.jit
    def tf_alignments(variables, inputs, input_lengths, mel_targets):
        # one compiled executable reused across probes (un-jitted apply
        # would dispatch every primitive over the axon tunnel)
        out_m = model.apply(variables, inputs, input_lengths, mel_targets,
                            train=False,
                            rngs={"dropout": jax.random.PRNGKey(0)})
        return out_m.alignments

    def probe(step):
        ckpt = CheckpointManager(os.path.join(tmp, "logs", "checkpoints"))
        state = ckpt.restore(jax.device_get(template))
        ckpt.close()
        al = np.asarray(tf_alignments(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(batch.inputs), jnp.asarray(batch.input_lengths),
            jnp.asarray(batch.mel_targets)))
        r = cfg.model.outputs_per_step
        rows = []
        for b in range(al.shape[0]):
            n_steps = int(batch.target_lengths[b]) // r
            L = int(batch.input_lengths[b])
            a = al[b, :n_steps, :L]
            path = a.argmax(-1)
            prog = np.diff(path) if n_steps > 1 else np.array([0.0])
            ent = -np.sum(a * np.log(a + 1e-9), -1).mean()
            rows.append((prog.mean(), (prog < -2).mean(),
                         (path.max() - path.min()) / max(L - 1, 1),
                         ent / np.log(L)))
        rows = np.array(rows)
        print(json.dumps({
            "step": step,
            "meanprog": round(float(rows[:, 0].mean()), 3),
            "backfrac": round(float(rows[:, 1].mean()), 3),
            "span": round(float(rows[:, 2].mean()), 3),
            "relent": round(float(rows[:, 3].mean()), 3)}), flush=True)

    done = 0
    while done < args.steps:
        done = min(done + args.probe_every, args.steps)
        res = train(os.path.join(tmp, "logs"), out, cfg, max_steps=done,
                    restore=True)
        print(json.dumps({"step": done, "loss": round(res["loss"], 4),
                          "mel": round(res["mel_loss"], 4)}), flush=True)
        probe(done)


if __name__ == "__main__":
    main()
