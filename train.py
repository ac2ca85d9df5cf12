#!/usr/bin/env python
"""Training entry point (reference: train.py — SURVEY.md §2.11).

Usage:
  python train.py --base_dir ./runs --input training --preset tiny \
      [--hparams train.batch_size=8] [--max_steps 1000] [--name myrun]

Resumes automatically from the latest checkpoint in the run's log dir
(the analogue of the reference's --restore_step, without the manual step).
"""

import argparse
import os

from tacotron_multispeaker_tpu.config import get_config
from tacotron_multispeaker_tpu.parallel.distributed import initialize_distributed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", default="./runs")
    p.add_argument("--input", default="training")
    p.add_argument("--preset", default="single_speaker")
    p.add_argument("--name", default=None, help="run name (default: preset)")
    p.add_argument("--hparams", default="")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--no_restore", action="store_true")
    p.add_argument("--profile", default=None, metavar="START:STOP",
                   help="trace steps [START, STOP) with jax.profiler")
    p.add_argument("--cmudict_path", default=None,
                   help="cmudict-0.7b file for pronunciation augmentation "
                        "(enable with train.cmudict_prob>0)")
    p.add_argument("--pipeline", default="feeder",
                   choices=["feeder", "grain"],
                   help="input pipeline: the zero-dependency Feeder or the "
                        "grain loader over the same global batch plan "
                        "(multi-host-correct either way)")
    p.add_argument("--pipeline_workers", type=int, default=0,
                   help="grain worker processes (0 = in-process)")
    p.add_argument("--platform", default=None, choices=["cpu", "axon"],
                   help="force the JAX platform (e.g. cpu for fast tiny-"
                        "preset debug runs; this jaxlib ignores the "
                        "JAX_PLATFORMS env var)")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    initialize_distributed()

    cfg = get_config(args.preset, args.hparams)
    run_name = args.name or cfg.name
    log_dir = os.path.join(args.base_dir, f"logs-{run_name}")
    data_dir = os.path.join(args.base_dir, args.input)

    profile_steps = None
    if args.profile:
        a, _, b = args.profile.partition(":")
        profile_steps = (int(a), int(b))

    from tacotron_multispeaker_tpu.train_loop import train
    train(log_dir, data_dir, cfg, max_steps=args.max_steps,
          restore=not args.no_restore, profile_steps=profile_steps,
          cmudict_path=args.cmudict_path, pipeline=args.pipeline,
          pipeline_workers=args.pipeline_workers)


if __name__ == "__main__":
    main()
