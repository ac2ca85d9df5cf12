#!/usr/bin/env python
"""Preprocess driver (reference: preprocess.py — SURVEY.md §2.5).

Usage:
  python preprocess.py --dataset ljspeech --in_dir ~/LJSpeech-1.1 \
      --base_dir ./runs --preset single_speaker [--num_workers 4]
  python preprocess.py --dataset synthetic --base_dir ./runs --preset tiny
"""

import argparse
import os

from tacotron_multispeaker_tpu.config import get_config
from tacotron_multispeaker_tpu.data.preprocess import CORPORA, write_metadata


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", default=os.path.expanduser("./runs"))
    p.add_argument("--output", default="training")
    p.add_argument("--dataset", required=True,
                   choices=sorted(CORPORA) + ["synthetic"])
    p.add_argument("--in_dir", default=None,
                   help="corpus root (not needed for synthetic)")
    p.add_argument("--preset", default="single_speaker")
    p.add_argument("--hparams", default="",
                   help="comma-separated dotted overrides")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--keep_wavs", action="store_true",
                   help="also write <utt>-wav.npy int16 PCM next to the "
                        "feature files (enables train.targets_from_wav: "
                        "the train step derives spectrogram targets "
                        "in-graph, ~9-18x less ingest bandwidth)")
    # synthetic corpus knobs
    p.add_argument("--n_utts", type=int, default=64)
    p.add_argument("--n_speakers", type=int, default=1)
    args = p.parse_args()

    cfg = get_config(args.preset, args.hparams)
    out_dir = os.path.join(args.base_dir, args.output)
    os.makedirs(out_dir, exist_ok=True)

    if args.dataset == "synthetic":
        from tacotron_multispeaker_tpu.data.synthetic import make_corpus
        in_dir = os.path.join(args.base_dir, "synthetic_corpus")
        make_corpus(in_dir, n_utts=args.n_utts, n_speakers=args.n_speakers,
                    sample_rate=cfg.audio.sample_rate)
        build = CORPORA["generic"]
    else:
        in_dir = args.in_dir
        if in_dir is None:
            p.error(f"--in_dir required for dataset {args.dataset}")
        build = CORPORA[args.dataset]

    metadata = build(in_dir, out_dir, cfg.audio,
                     num_workers=args.num_workers, limit=args.limit,
                     keep_wavs=args.keep_wavs)
    write_metadata(metadata, out_dir, cfg.audio)


if __name__ == "__main__":
    main()
