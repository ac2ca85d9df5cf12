#!/usr/bin/env python
"""Corpus-readiness drill (VERDICT r4 Missing #1): the real CLI chain over
a realistically-sized on-disk LJSpeech-layout corpus.

Generates ~N synthetic utterances in the exact LJSpeech-1.1 directory
layout, then runs — as SUBPROCESSES, the same commands a user types —

  1. ``preprocess.py --dataset ljspeech``  (records utt/s and utt/s/worker)
  2. bucket-histogram sanity over the resulting train.txt + feeder plan
  3. ``train.py`` for --train_steps steps   (records wall, s/step, loss)
  4. ``eval.py`` on 3 sentences
  5. ``validate.py --oracle 2 --json_out``  (per-speaker mel L1 + the
     Griffin-Lim waveform comparison vs the in-repo TF oracle)

and writes one ``drill_report.json``.  The moment a real corpus is
mounted, step 1's command with ``--in_dir <corpus>`` is the only change.

Usage (CPU rehearsal):   python tools/corpus_drill.py --preset tiny \
    --n_utts 60 --train_steps 10 --platform cpu --base_dir /tmp/drill
On-chip (the recorded drill): python tools/corpus_drill.py \
    --n_utts 500 --train_steps 200 --base_dir /tmp/drill_chip
"""

import argparse
import collections
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, log_path):
    t0 = time.time()
    with open(log_path, "w") as f:
        rc = subprocess.call(cmd, stdout=f, stderr=subprocess.STDOUT,
                             cwd=REPO)
    wall = time.time() - t0
    if rc != 0:
        tail = open(log_path).read()[-2000:]
        raise RuntimeError(f"{' '.join(cmd)} failed rc={rc}:\n{tail}")
    return wall


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", default="/tmp/corpus_drill")
    p.add_argument("--preset", default="single_speaker")
    p.add_argument("--n_utts", type=int, default=500)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--train_steps", type=int, default=200)
    p.add_argument("--train_hparams", default="train.targets_dtype=bfloat16")
    p.add_argument("--platform", default=None, choices=["cpu", "axon"])
    p.add_argument("--keep_wavs", action="store_true",
                   help="preprocess with --keep_wavs (targets_from_wav)")
    args = p.parse_args()

    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.data.synthetic import make_ljspeech_corpus

    cfg = get_config(args.preset)
    base = os.path.abspath(args.base_dir)
    os.makedirs(base, exist_ok=True)
    report = {"preset": args.preset, "n_utts": args.n_utts,
              "num_workers": args.num_workers}
    py = sys.executable
    plat = ["--platform", args.platform] if args.platform else []

    # 1. corpus on disk (LJSpeech-1.1 layout) + real preprocess CLI
    corpus = os.path.join(base, "LJSpeech-1.1")
    if not os.path.exists(os.path.join(corpus, "metadata.csv")):
        make_ljspeech_corpus(corpus, n_utts=args.n_utts,
                             sample_rate=cfg.audio.sample_rate)
    cmd = [py, "preprocess.py", "--dataset", "ljspeech", "--in_dir", corpus,
           "--base_dir", base, "--preset", args.preset,
           "--num_workers", str(args.num_workers)]
    if args.keep_wavs:
        cmd.append("--keep_wavs")
    wall = run(cmd, os.path.join(base, "preprocess.log"))
    report["preprocess"] = {
        "wall_s": round(wall, 1),
        "utt_per_s": round(args.n_utts / wall, 2),
        "utt_per_s_per_worker": round(
            args.n_utts / wall / args.num_workers, 2)}

    # 2. bucket histogram + feeder plan sanity
    from tacotron_multispeaker_tpu.data.feeder import Feeder, pick_bucket
    data_dir = os.path.join(base, "training")
    feeder = Feeder(data_dir, cfg)
    hist = collections.Counter()
    for row in feeder.meta:
        hist[pick_bucket(row["n_frames"], feeder.boundaries)] += 1
    plan = feeder.epoch_plan(0)
    shapes = collections.Counter((e[3], e[4]) for e in plan)
    report["buckets"] = {
        "frame_histogram": {str(k): v for k, v in sorted(hist.items())},
        "utterances": len(feeder.meta),
        "batches_per_epoch": len(plan),
        "planned_shapes_LxT": {f"{L}x{T}": n
                               for (L, T), n in sorted(shapes.items())},
    }
    assert len(shapes) <= (len(cfg.train.input_bucket_boundaries) + 1) * \
        len(cfg.train.bucket_boundaries), "jit-signature blowup"

    # 3. real train CLI
    hp = f"train.checkpoint_interval={max(args.train_steps // 2, 1)}"
    if args.train_hparams:
        hp += "," + args.train_hparams
    t0 = time.time()
    run([py, "train.py", "--base_dir", base, "--preset", args.preset,
         "--max_steps", str(args.train_steps), "--hparams", hp, *plat],
        os.path.join(base, "train_cli.log"))
    train_wall = time.time() - t0
    # pull the last logged s/step from the run's metrics stream
    sec_per_step = last_loss = None
    metrics_path = os.path.join(base, f"logs-{cfg.name}", "metrics.jsonl")
    if os.path.exists(metrics_path):
        for line in open(metrics_path):
            row = json.loads(line)
            sec_per_step = row.get("sec_per_step", sec_per_step)
            last_loss = row.get("loss")
    report["train"] = {"steps": args.train_steps,
                       "wall_s": round(train_wall, 1),
                       "sec_per_step_logged": sec_per_step,
                       "last_loss": last_loss}

    # 4. batch eval CLI (bucketed)
    ckpt = os.path.join(base, f"logs-{cfg.name}", "checkpoints")
    run([py, "eval.py", "--checkpoint_dir", ckpt, "--preset", args.preset,
         "--out_dir", os.path.join(base, "eval_out"),
         "--text", "the quick brown fox jumps over the lazy dog.",
         "--text", "pack my box with five dozen liquor jugs.",
         "--text", "how vexingly daft zebras jump.", *plat],
        os.path.join(base, "eval_cli.log"))
    report["eval"] = {"wavs": sorted(os.listdir(
        os.path.join(base, "eval_out")))}

    # 5. validate CLI with the oracle + GL-waveform report
    vjson = os.path.join(base, "validate_report.json")
    run([py, "validate.py", "--checkpoint_dir", ckpt, "--data_dir", data_dir,
         "--preset", args.preset, "--limit", "32", "--oracle", "2",
         "--json_out", vjson, *plat],
        os.path.join(base, "validate_cli.log"))
    report["validate"] = json.load(open(vjson))

    out = os.path.join(base, "drill_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"\ndrill report -> {out}")


if __name__ == "__main__":
    main()
