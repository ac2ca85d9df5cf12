#!/usr/bin/env python
"""Round-4 on-chip measurement session — ALL rows in ONE process.

Per-process TPU attach under axon costs 2-8 min and the chip serializes
across processes, so this script runs the whole round-4 measurement matrix
in a single attach:

  train:  B=128 L=96 (regression vs r3's 4336 ex/s), B=128 L=192 and
          B=256 L=96 (the teacher-kernel VMEM-cliff shapes the round-4
          backward split is supposed to unlock), each ON vs OFF-kernels,
          all with the fused BiGRU kernel (round 4) in the ON rows
  synth:  fused decode+vocode at B=128 and B=256 (the decoder-loop kernel
          now requests a 110 MB VMEM limit so B=256 engages)
  mel:    mel-only decode at B=256, kernel vs scan
  serve:  B=1 ms/utterance per input bucket

Sustained timing: N chained steps, one scalar host readback (axon's
block_until_ready does not sync — CLAUDE.md).  Emits one JSON line per row
plus a final summary.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "axon"])
    p.add_argument("--skip", default="",
                   help="comma list of phases to skip: train,synth,mel,serve")
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()
    skip = set(args.skip.split(","))

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

    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---------------- train matrix ----------------
    if "train" not in skip:
        peak = 197e12
        for B, L, kernels in [(128, 96, True), (128, 96, False),
                              (128, 192, True), (256, 96, True),
                              (256, 96, False), (256, 192, True)]:
            over = [f"train.batch_size={B}"]
            if not kernels:
                over += ["parallel.use_pallas_gru=false",
                         "parallel.use_pallas_teacher=false"]
            cfg = get_config("single_speaker", ",".join(over))
            T = 500
            mesh = make_mesh(devices=jax.devices()[:1], data=1, model=1)
            model, state = create_train_state(cfg, jax.random.PRNGKey(0))
            step_fn, state_sh = make_sharded_train_step(cfg, model, mesh)(
                state)
            state = jax.device_put(state, state_sh)
            rng = np.random.RandomState(0)
            batch = (
                jnp.asarray(rng.randint(2, 80, (B, L)), jnp.int32),
                jnp.full((B,), L, jnp.int32),
                jnp.asarray(rng.rand(B, T, cfg.audio.num_mels), jnp.float32),
                jnp.asarray(rng.rand(B, T, cfg.audio.num_freq), jnp.float32),
                jnp.full((B,), T, jnp.int32),
                jnp.zeros((B,), jnp.int32))
            flops = None
            try:
                cost = step_fn.lower(state, *batch).compile().cost_analysis()
                if cost and "flops" in cost:
                    flops = float(cost["flops"])
            except Exception as e:
                print(f"cost analysis failed: {e}", flush=True)
            t_compile0 = time.time()
            try:
                state, metrics = step_fn(state, *batch)
                loss0 = float(metrics["loss"])
            except Exception as e:
                emit({"row": "train", "batch": B, "L": L,
                      "kernels": kernels, "error": str(e)[:500]})
                continue
            compile_s = time.time() - t_compile0
            N = args.steps
            t0 = time.perf_counter()
            for _ in range(N):
                state, metrics = step_fn(state, *batch)
            float(metrics["loss"])
            dt = (time.perf_counter() - t0) / N
            emit({"row": "train", "batch": B, "L": L, "kernels": kernels,
                  "sec_per_step": round(dt, 4),
                  "examples_per_s": round(B / dt, 1),
                  "mfu": round(flops / dt / peak, 4) if flops else None,
                  "loss0": round(loss0, 4),
                  "first_call_s": round(compile_s, 1)})
            del state, step_fn, model

    # ---------------- synthesis ----------------
    from tacotron_multispeaker_tpu.models import create_model
    from tacotron_multispeaker_tpu.audio import dsp
    if "synth" not in skip:
        for B in (128, 256):
            cfg = get_config("single_speaker", "model.max_iters=120")
            model = create_model("tacotron", cfg)
            rng = jax.random.PRNGKey(0)
            L = 96
            inputs = jax.random.randint(rng, (B, L), 2, 80)
            lengths = jnp.full((B,), L, jnp.int32)
            variables = model.init(
                {"params": rng, "dropout": rng}, inputs, lengths,
                jnp.zeros((B, 2 * cfg.model.outputs_per_step,
                           cfg.audio.num_mels)), train=True)
            variables = {"params": variables["params"],
                         "batch_stats": variables.get("batch_stats", {})}
            params = dsp.STFTParams.from_config(cfg.audio)

            @jax.jit
            def decode_vocode(variables, inputs, input_lengths, key):
                out = model.apply(variables, inputs, input_lengths,
                                  train=False, rngs={"dropout": key},
                                  method=model.generate)
                spec = jnp.swapaxes(out.linear_outputs, 1, 2)
                wav = dsp.inv_linear_spectrogram(
                    spec, params, preemph=cfg.audio.preemphasis,
                    ref_level_db=cfg.audio.ref_level_db,
                    min_level_db=cfg.audio.min_level_db,
                    power=cfg.audio.power,
                    gl_iters=cfg.audio.griffin_lim_iters, key=key,
                    use_pallas=False, gl_method=cfg.audio.gl_method,
                    gl_momentum=cfg.audio.gl_momentum)
                return wav, jnp.sum(wav[0, :64])

            try:
                _, cks = decode_vocode(variables, inputs, lengths,
                                       jax.random.PRNGKey(1))
                float(cks)
            except Exception as e:
                emit({"row": "synth", "batch": B, "error": str(e)[:500]})
                continue
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                _, cks = decode_vocode(variables, inputs, lengths,
                                       jax.random.PRNGKey(i))
                float(cks)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            n_frames = 120 * cfg.model.outputs_per_step
            audio_sec = B * n_frames * cfg.audio.hop_length / cfg.audio.sample_rate
            emit({"row": "synth", "batch": B, "wall_s": round(dt, 4),
                  "audio_sec_per_s_chip": round(audio_sec / dt, 1)})

    # ---------------- mel-only decode (kernel race at B=256) -------------
    if "mel" not in skip:
        for B, use_kernel in [(256, True), (256, False)]:
            over = "model.max_iters=120" + (
                "" if use_kernel else ",parallel.use_pallas_decode=false")
            cfg = get_config("single_speaker", over)
            model = create_model("tacotron", cfg)
            rng = jax.random.PRNGKey(0)
            L = 96
            inputs = jax.random.randint(rng, (B, L), 2, 80)
            lengths = jnp.full((B,), L, jnp.int32)
            variables = model.init(
                {"params": rng, "dropout": rng}, inputs, lengths,
                jnp.zeros((B, 2 * cfg.model.outputs_per_step,
                           cfg.audio.num_mels)), train=True)
            variables = {"params": variables["params"],
                         "batch_stats": variables.get("batch_stats", {})}

            @jax.jit
            def decode_mel(variables, inputs, input_lengths, key):
                out = model.apply(variables, inputs, input_lengths,
                                  train=False, rngs={"dropout": key},
                                  method=model.generate)
                return jnp.sum(out.mel_outputs[0, :, :8])

            try:
                float(decode_mel(variables, inputs, lengths,
                                 jax.random.PRNGKey(1)))
            except Exception as e:
                emit({"row": "mel_only", "batch": B, "kernel": use_kernel,
                      "error": str(e)[:500]})
                continue
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                float(decode_mel(variables, inputs, lengths,
                                 jax.random.PRNGKey(i)))
                times.append(time.perf_counter() - t0)
            emit({"row": "mel_only", "batch": B, "kernel": use_kernel,
                  "decode_s": round(min(times), 4)})

    # ---------------- serve latency ----------------
    if "serve" not in skip:
        from tacotron_multispeaker_tpu.synthesizer import Synthesizer
        cfg = get_config("single_speaker")
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        synth = Synthesizer(cfg).load_variables(
            {"params": state.params, "batch_stats": state.batch_stats})
        for b in sorted(set(
                synth._serve_bucket(x)
                for x in (*cfg.train.input_bucket_boundaries,
                          cfg.train.max_input_length))):
            words = max(1, (b - 10) // 6)
            text = ("testing " * words)[: max(b - 8, 4)].strip() + "."
            try:
                synth.synthesize(text, 0)
            except Exception as e:
                emit({"row": "serve", "bucket": b, "error": str(e)[:500]})
                continue
            times = []
            for i in range(5):
                t0 = time.perf_counter()
                synth.synthesize(text, 0, seed=i)
                times.append(time.perf_counter() - t0)
            emit({"row": "serve", "bucket": b,
                  "ms_per_utt": round(min(times) * 1000, 1)})

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
