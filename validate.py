#!/usr/bin/env python
"""Validation: teacher-forced losses per speaker over a preprocessed corpus.

The per-speaker mel L1 is the quality metric BASELINE.json names ("mel L1
... per speaker"): run a trained checkpoint teacher-forced over held-out
utterances and report mel/linear L1 per speaker and overall.

Usage:
  python validate.py --checkpoint_dir runs/logs-tiny/checkpoints \
      --data_dir runs/training --preset tiny [--limit 64]
"""

import argparse
import collections
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--preset", default="single_speaker")
    p.add_argument("--hparams", default="")
    p.add_argument("--limit", type=int, default=None,
                   help="max utterances (default: all)")
    p.add_argument("--json_out", default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "axon"],
                   help="force the JAX platform (e.g. cpu for fast tiny-"
                        "preset debug runs; this jaxlib ignores the "
                        "JAX_PLATFORMS env var)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)


    import jax
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.data.feeder import Feeder
    from tacotron_multispeaker_tpu.models import create_model, tacotron_loss
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer

    cfg = get_config(args.preset, args.hparams)
    syn = Synthesizer(cfg).load(args.checkpoint_dir)
    model = syn.model
    feeder = Feeder(args.data_dir, cfg, shuffle=False, drop_remainder=False)

    @jax.jit
    def forward(variables, inputs, input_lengths, mels, speaker_ids, key):
        sid = speaker_ids if cfg.model.num_speakers > 1 else None
        out, _ = model.apply(variables, inputs, input_lengths, mels,
                             speaker_ids=sid, train=False,
                             rngs={"dropout": key}, mutable=["batch_stats"])
        return out.mel_outputs, out.linear_outputs

    per_speaker = collections.defaultdict(lambda: {"mel": 0.0, "lin": 0.0,
                                                   "frames": 0})
    n_done = 0
    for batch in feeder.epoch_batches(0):
        if args.limit is not None and n_done >= args.limit:
            break
        mel_o, lin_o = forward(syn.variables, jnp.asarray(batch.inputs),
                               jnp.asarray(batch.input_lengths),
                               jnp.asarray(batch.mel_targets),
                               jnp.asarray(batch.speaker_ids),
                               jax.random.PRNGKey(0))
        mel_o, lin_o = np.asarray(mel_o), np.asarray(lin_o)
        for i in range(batch.batch_size):
            n = int(batch.target_lengths[i])
            sid = int(batch.speaker_ids[i])
            mel_l1 = float(np.abs(
                mel_o[i, :n] - batch.mel_targets[i, :n]).mean())
            lin_l1 = float(np.abs(
                lin_o[i, :n] - batch.linear_targets[i, :n]).mean())
            acc = per_speaker[sid]
            acc["mel"] += mel_l1 * n
            acc["lin"] += lin_l1 * n
            acc["frames"] += n
            n_done += 1

    report = {"per_speaker": {}, "n_utterances": n_done}
    tot_mel = tot_lin = tot_frames = 0.0
    for sid in sorted(per_speaker):
        acc = per_speaker[sid]
        report["per_speaker"][str(sid)] = {
            "mel_l1": acc["mel"] / max(acc["frames"], 1),
            "linear_l1": acc["lin"] / max(acc["frames"], 1),
            "frames": acc["frames"],
        }
        tot_mel += acc["mel"]
        tot_lin += acc["lin"]
        tot_frames += acc["frames"]
    report["overall"] = {"mel_l1": tot_mel / max(tot_frames, 1),
                         "linear_l1": tot_lin / max(tot_frames, 1)}
    out = json.dumps(report, indent=2)
    print(out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
