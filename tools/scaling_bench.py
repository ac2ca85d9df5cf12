#!/usr/bin/env python
"""Sharding-overhead proxy bench on virtual CPU devices (SURVEY.md §6).

Real 1→N-host scaling needs a pod; this environment exposes one chip.
What CAN be measured without a pod is the *overhead the parallel code
path adds*: the same global-batch train step is run (a) unsharded on one
virtual device and (b) dp-sharded over an N-device mesh on the SAME host
— identical total FLOPs, identical cores, so any slowdown in (b) is the
cost of the partitioner + XLA collectives our sharding layout inserts.
Low overhead here is the controllable prerequisite for the ≥0.9 linear
scaling target (`BASELINE.json` north star); the ICI side is XLA's.

Prints one JSON line:
  {"metric": "dp_sharding_overhead", "value": <fraction>, ...}

Measured on this host (8 virtual CPU devices): 0.075 at the default
global batch 64 (8 per device).  At toy per-device batches (global 16)
the per-program dispatch overhead of 8 tiny CPU executables dominates
and the number is meaningless — keep per-device work realistic.

Run: python tools/scaling_bench.py [--devices 8] [--batch 16] [--repeats 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch", type=int, default=64, help="global batch")
    p.add_argument("--length", type=int, default=32)
    p.add_argument("--frames", type=int, default=80)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax
    try:  # this jaxlib pins jax_platforms=axon,cpu; force host CPU
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import numpy as np
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from tacotron_multispeaker_tpu.training import (
        create_train_state, make_sharded_train_step)

    cfg = get_config("tiny", f"train.batch_size={args.batch}")
    B, L, T = args.batch, args.length, args.frames
    rng = np.random.RandomState(0)
    batch = (
        jnp.asarray(rng.randint(0, 100, (B, L)), jnp.int32),
        jnp.full((B,), L, jnp.int32),
        jnp.asarray(rng.rand(B, T, cfg.audio.num_mels), jnp.float32),
        jnp.asarray(rng.rand(B, T, cfg.audio.num_freq), jnp.float32),
        jnp.full((B,), T, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )

    def timed_step(n_dev: int) -> float:
        mesh = make_mesh(devices=jax.devices()[:n_dev], data=n_dev, model=1)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        step_fn, state_sh = make_sharded_train_step(cfg, model, mesh)(state)
        state = jax.device_put(state, state_sh)
        state, metrics = step_fn(state, *batch)  # compile + warm
        float(metrics["loss"])
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state, metrics = step_fn(state, *batch)
            jax.block_until_ready(metrics["loss"])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed_step(1)
    tn = timed_step(args.devices)
    overhead = tn / t1 - 1.0
    print(json.dumps({
        "metric": "dp_sharding_overhead",
        "value": round(overhead, 4),
        "unit": f"fraction vs 1-device, global batch {B}",
        "detail": {
            "devices": args.devices, "batch": B,
            "t_1dev_s": round(t1, 4), f"t_{args.devices}dev_s": round(tn, 4),
            "note": "same host, same total FLOPs; measures partitioner + "
                    "collective overhead of the dp layout, not ICI",
        },
    }))


if __name__ == "__main__":
    main()
