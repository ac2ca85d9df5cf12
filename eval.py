#!/usr/bin/env python
"""Batch synthesis CLI (reference: eval.py — SURVEY.md §2.12/§3.4).

Synthesizes a list of sentences (the reference's hardcoded eval set, or a
--text/--text_file override) from a trained checkpoint into wav files.
"""

import argparse
import os

from tacotron_multispeaker_tpu.config import get_config
from tacotron_multispeaker_tpu.synthesizer import Synthesizer

# Reference lineage eval sentences (keithito eval.py style harvard/custom set)
SENTENCES = [
    "Scientists at the CERN laboratory say they have discovered a new particle.",
    "There's a way to measure the acute emotional intelligence that has never gone out of style.",
    "President Trump met with other leaders at the Group of Twenty conference.",
    "Generative adversarial network or variational auto-encoder.",
    "The buses aren't the problem, they actually provide a solution.",
    "Does the quick brown fox jump over the lazy dog?",
    "Talib Kweli confirmed to All Hip Hop that he will be releasing an album in the next year.",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True,
                   help=".../logs-<run>/checkpoints")
    p.add_argument("--preset", default="single_speaker")
    p.add_argument("--hparams", default="")
    p.add_argument("--out_dir", default="eval_out")
    p.add_argument("--speaker_id", type=int, default=0)
    p.add_argument("--text", action="append", default=None)
    p.add_argument("--text_file", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--platform", default=None, choices=["cpu", "axon"],
                   help="force the JAX platform (e.g. cpu for fast tiny-"
                        "preset debug runs; this jaxlib ignores the "
                        "JAX_PLATFORMS env var)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)


    cfg = get_config(args.preset, args.hparams)
    texts = args.text
    if args.text_file:
        with open(args.text_file) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
    if not texts:
        texts = SENTENCES

    os.makedirs(args.out_dir, exist_ok=True)
    syn = Synthesizer(cfg).load(args.checkpoint_dir)
    for i0 in range(0, len(texts), args.batch_size):
        chunk = texts[i0: i0 + args.batch_size]
        wavs, _ = syn.synthesize_batch(
            chunk, [args.speaker_id] * len(chunk),
            pad_to=cfg.train.max_input_length)
        for j, wav in enumerate(wavs):
            path = os.path.join(args.out_dir, f"eval-{i0 + j}.wav")
            syn.ap.save_wav(wav, path)
            print(f"{path}: {chunk[j][:60]!r}")


if __name__ == "__main__":
    main()
