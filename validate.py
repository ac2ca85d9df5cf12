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
    p.add_argument("--oracle", type=int, default=0, metavar="N",
                   help="ALSO run the first N utterances through the "
                        "in-repo TF oracle (tacotron_multispeaker_tpu/"
                        "oracle_tf.py — the 'allclose vs reference' "
                        "stand-in while the reference mount is empty, "
                        "SURVEY.md §0): reports per-speaker mel/linear L1 "
                        "between the framework forward and the oracle "
                        "forward, plus a Griffin-Lim waveform comparison "
                        "(exact reference GL formulation, 60 f32 iters, "
                        "momentum 0, shared phase init) of the two linear "
                        "outputs.  Needs tensorflow; slow (python decoder "
                        "loop) — keep N small")
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
    oracle_acc = collections.defaultdict(lambda: {"mel": 0.0, "lin": 0.0,
                                                  "frames": 0})
    gl_rows = []
    n_done = 0
    n_oracle = 0
    for batch in feeder.epoch_batches(0):
        if args.limit is not None and n_done >= args.limit:
            break
        mel_o, lin_o = forward(syn.variables, jnp.asarray(batch.inputs),
                               jnp.asarray(batch.input_lengths),
                               jnp.asarray(batch.mel_targets),
                               jnp.asarray(batch.speaker_ids),
                               jax.random.PRNGKey(0))
        mel_o, lin_o = np.asarray(mel_o), np.asarray(lin_o)
        if n_oracle < args.oracle:
            n_oracle += _oracle_compare(
                cfg, syn.variables, batch,
                args.oracle - n_oracle, oracle_acc, gl_rows)
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
    if n_oracle:
        per = {}
        for sid in sorted(oracle_acc):
            a = oracle_acc[sid]
            per[str(sid)] = {
                "mel_l1_vs_oracle": a["mel"] / max(a["frames"], 1),
                "linear_l1_vs_oracle": a["lin"] / max(a["frames"], 1),
                "frames": a["frames"]}
        report["oracle"] = {
            "n_utterances": n_oracle,
            "per_speaker": per,
            "griffin_lim_waveform": gl_rows,
            "note": "in-repo TF oracle (reference mount empty, SURVEY.md "
                    "§0); GL rows invert the framework vs oracle linear "
                    "outputs through the exact reference GL formulation "
                    "(60 f32 iters, momentum 0) with a shared phase init",
        }
    out = json.dumps(report, indent=2)
    print(out)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(out)


def _oracle_compare(cfg, variables, batch, budget, oracle_acc, gl_rows):
    """Run up to ``budget`` utterances of this batch through the TF oracle;
    accumulate per-speaker framework-vs-oracle L1 and (for the first few)
    the Griffin-Lim waveform comparison.  Returns utterances consumed."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu import oracle_tf
    from tacotron_multispeaker_tpu.audio import dsp
    from tacotron_multispeaker_tpu.models import create_model

    take = min(budget, batch.batch_size)
    mel_or, lin_or = oracle_tf.oracle_teacher_forward(
        cfg, variables["params"], variables["batch_stats"],
        batch.inputs[:take], batch.input_lengths[:take],
        np.asarray(batch.mel_targets[:take], np.float32),
        speaker_ids=batch.speaker_ids[:take]
        if cfg.model.num_speakers > 1 else None)
    # the comparison must be deterministic: the reference prenet dropout is
    # always-on (even at inference), so the ORACLE comparison re-runs the
    # framework forward with dropout 0 on both sides (the corpus-target
    # report above keeps reference semantics)
    cfg0 = dc.replace(cfg, model=dc.replace(cfg.model, prenet_dropout=0.0))
    model0 = create_model("tacotron", cfg0)
    sid = (jnp.asarray(batch.speaker_ids[:take])
           if cfg.model.num_speakers > 1 else None)
    out0 = model0.apply(
        variables, jnp.asarray(batch.inputs[:take]),
        jnp.asarray(batch.input_lengths[:take]),
        jnp.asarray(np.asarray(batch.mel_targets[:take], np.float32)),
        speaker_ids=sid, train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    mel_fw = np.asarray(out0.mel_outputs)
    lin_fw = np.asarray(out0.linear_outputs)
    params = dsp.STFTParams.from_config(cfg.audio)

    def ref_gl(spec_tf):                       # [T, bins] frame-major
        # exact reference GL formulation (util/audio.py _griffin_lim
        # semantics): 60 f32 iterations, no momentum, direct DFT
        return np.asarray(dsp.inv_linear_spectrogram(
            jnp.asarray(spec_tf.T, jnp.float32), params,
            preemph=cfg.audio.preemphasis,
            ref_level_db=cfg.audio.ref_level_db,
            min_level_db=cfg.audio.min_level_db, power=cfg.audio.power,
            gl_iters=60, key=jax.random.PRNGKey(0), gl_method="dft_f32",
            gl_momentum=0.0))

    for i in range(take):
        n = int(batch.target_lengths[i])
        sid = int(batch.speaker_ids[i])
        acc = oracle_acc[sid]
        acc["mel"] += float(np.abs(mel_or[i, :n] - mel_fw[i, :n]).mean()) * n
        acc["lin"] += float(np.abs(lin_or[i, :n] - lin_fw[i, :n]).mean()) * n
        acc["frames"] += n
        if len(gl_rows) < 4:                   # waveform rows are expensive
            w_fw = ref_gl(lin_fw[i, :n])
            w_or = ref_gl(lin_or[i, :n])
            denom = float(np.abs(w_or).max()) or 1.0
            corr = float(np.corrcoef(w_fw, w_or)[0, 1]) \
                if w_fw.std() > 0 and w_or.std() > 0 else 1.0
            gl_rows.append({
                "speaker": sid, "n_frames": n,
                "wav_l1": float(np.abs(w_fw - w_or).mean()),
                "wav_max_abs_diff": float(np.abs(w_fw - w_or).max()),
                "wav_rel_max_diff": float(np.abs(w_fw - w_or).max() / denom),
                "wav_corr": corr})
    return take


if __name__ == "__main__":
    main()
