#!/usr/bin/env python
"""Benchmark: audio-seconds synthesized per second per chip (BASELINE.md).

Measures the fused inference path — autoregressive decode scan + post-net +
Griffin-Lim — end-to-end on the default device (the real TPU chip under
axon; CPU under tests).  The reference publishes no numbers
(BASELINE.json "published": {}), so ``vs_baseline`` reports the ratio to
1× real-time synthesis, the natural floor for a usable TTS system.

Prints ONE JSON line:
  {"metric": "audio_seconds_synthesized_per_s_per_chip", "value": N,
   "unit": "audio_sec/s/chip", "vs_baseline": N}
"""

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="single_speaker")
    # decode is latency-bound (wall ~constant in batch: 0.027 s at B=32 vs
    # 0.032 s at B=128 for 120 steps), so larger batches raise
    # audio-sec/s/chip until Griffin-Lim's compute dominates; measured
    # ladder (BASELINE.md): B=128 → 5136, B=256 → 5254, B=512 → 5229
    # audio-sec/s/chip (round 4) — 256 is the sweet spot and the default
    # (the fused decoder kernel engages there since the round-4 VMEM-limit
    # fix); round 3's driver capture under-reported by defaulting to 128.
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--max_iters", type=int, default=120)
    p.add_argument("--input_length", type=int, default=96)
    p.add_argument("--gl_iters", type=int, default=None,
                   help="override Griffin-Lim iterations (default: config 60)")
    p.add_argument("--gl_method", default=None,
                   help="override Griffin-Lim transform (fft|dft_*|ct_*)")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--pallas", action="store_true",
                   help="enable model-path Pallas kernels (fused decoder "
                        "loop, conv bank, attention step)")
    p.add_argument("--pallas_gl", action="store_true",
                   help="enable the Pallas overlap-add in Griffin-Lim "
                        "(separate from --pallas so the two hot paths race "
                        "independently)")
    p.add_argument("--split", action="store_true",
                   help="time decode and vocode as TWO separately-synced "
                        "executables (reports the decode_s/vocode_s split); "
                        "the default runs them as ONE jit — measured 0.185 s "
                        "vs 0.211 s at B=128 (the phase boundary costs a "
                        "tunnel sync + dispatch), 4544 → 5200 audio-sec/s")
    p.add_argument("--mel_only", action="store_true",
                   help="time ONLY encoder+decoder to mel (postnet/vocoder "
                        "DCE'd away) — isolates the autoregressive decoder "
                        "loop for kernel racing")
    p.add_argument("--serve_latency", action="store_true",
                   help="measure the single-utterance serving path "
                        "(Synthesizer.synthesize, B=1, warm executables): "
                        "ms/utterance per input bucket, end-to-end incl. "
                        "host transfer + endpoint trim — the demo-server "
                        "request path")
    p.add_argument("--train", action="store_true",
                   help="benchmark the training step instead of synthesis: "
                        "sec/step, examples/s, frames/s and an MFU estimate "
                        "for the preset at --batch")
    p.add_argument("--train_matrix", default=None, const="default",
                   nargs="?",
                   help="run the BASELINE.md training matrix in ONE process "
                        "(per-process TPU attach costs minutes): rows "
                        "BxLxkernels, default '128x96x1,128x96x0,128x192x1,"
                        "256x96x1,256x96x0,256x192x1', one JSON line per "
                        "row + summary.  Replaces tools/r4_chip_session.py")
    p.add_argument("--wav_ingest", action="store_true",
                   help="with --train/--train_matrix: feed int16 PCM "
                        "batches and derive spectrogram targets IN-GRAPH "
                        "(train.targets_from_wav) — measures the device-"
                        "side cost of the wav-ingest path")
    p.add_argument("--shard_map", action="store_true",
                   help="with --train/--train_matrix: route through the "
                        "shard_map DP step on a data=1 mesh (the "
                        "kernels-inside-shard_map composition) instead of "
                        "plain jit")
    p.add_argument("--train_frames", type=int, default=500,
                   help="target frames per example for --train (a bucket "
                        "boundary)")
    p.add_argument("--platform", default=None, choices=["cpu", "axon"],
                   help="force a jax platform (this jaxlib ignores the "
                        "JAX_PLATFORMS env var); default: axon TPU")
    p.add_argument("--hparams", default="",
                   help="extra dotted config overrides, e.g. "
                        "parallel.use_pallas_gru=true")
    args = p.parse_args()

    import os
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache: axon remote compiles are slow (minutes);
    # repeat bench invocations with the same shapes become instant
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.models import create_model
    from tacotron_multispeaker_tpu.audio import dsp

    overrides = [f"model.max_iters={args.max_iters}"]
    if args.gl_iters is not None:
        overrides.append(f"audio.griffin_lim_iters={args.gl_iters}")
    if args.gl_method is not None:
        overrides.append(f"audio.gl_method={args.gl_method}")
    if args.pallas:
        overrides.append("parallel.use_pallas=true")
    if args.hparams:
        overrides.append(args.hparams)
    cfg = get_config(args.preset, ",".join(overrides))

    if args.train_matrix:
        _bench_train_matrix(args, jax, jnp, np)
        return
    if args.train:
        _bench_train(args, cfg, jax, jnp, np)
        return
    if args.serve_latency:
        _bench_serve(args, cfg, jax, jnp, np)
        return

    model = create_model("tacotron", cfg)
    rng = jax.random.PRNGKey(0)
    B, L = args.batch, args.input_length
    inputs = jax.random.randint(rng, (B, L), 2, 80)
    input_lengths = jnp.full((B,), L, jnp.int32)
    T_init = 2 * cfg.model.outputs_per_step
    sid = (jnp.zeros((B,), jnp.int32)
           if cfg.model.num_speakers > 1 else None)
    variables = model.init(
        {"params": rng, "dropout": rng}, inputs, input_lengths,
        jnp.zeros((B, T_init, cfg.audio.num_mels)), speaker_ids=sid,
        train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    params = dsp.STFTParams.from_config(cfg.audio)

    # Two separately-cached executables (decode scan / Griffin-Lim): the
    # remote TPU compile is minutes per executable, and splitting keeps each
    # under the cache + time budget.  Data stays on device between the two
    # calls — still no host round-trips.
    # NOTE: under the axon tunnel ``block_until_ready`` returns before the
    # remote execution finishes — each phase returns an in-graph scalar
    # checksum whose host readback forces a true sync.
    @jax.jit
    def decode(variables, inputs, input_lengths, key):
        out = model.apply(variables, inputs, input_lengths,
                          speaker_ids=sid, train=False,
                          rngs={"dropout": key}, method=model.generate)
        spec = jnp.swapaxes(out.linear_outputs, 1, 2)
        return spec, jnp.sum(spec[0, 0, :8])

    @jax.jit
    def vocode(spec, key):
        wav = dsp.inv_linear_spectrogram(
            spec, params, preemph=cfg.audio.preemphasis,
            ref_level_db=cfg.audio.ref_level_db,
            min_level_db=cfg.audio.min_level_db, power=cfg.audio.power,
            gl_iters=cfg.audio.griffin_lim_iters, key=key,
            use_pallas=args.pallas_gl,
            gl_method=cfg.audio.gl_method,
            gl_momentum=cfg.audio.gl_momentum)
        return wav, jnp.isfinite(wav).all()

    @jax.jit
    def decode_mel(variables, inputs, input_lengths, key):
        out = model.apply(variables, inputs, input_lengths,
                          speaker_ids=sid, train=False,
                          rngs={"dropout": key}, method=model.generate)
        # returning only a mel checksum lets XLA DCE the postnet + linear
        # projection: this times encoder + autoregressive decoder alone
        return jnp.sum(out.mel_outputs[0, :, :8])

    @jax.jit
    def decode_vocode(variables, inputs, input_lengths, key):
        spec, _ = decode(variables, inputs, input_lengths, key)
        wav, _ = vocode(spec, key)
        return wav, jnp.sum(wav[0, :64])

    if not args.split and not args.mel_only:
        wav, cks = decode_vocode(variables, inputs, input_lengths,
                                 jax.random.PRNGKey(1))
        float(cks)
        times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            wav, cks = decode_vocode(variables, inputs, input_lengths,
                                     jax.random.PRNGKey(i))
            float(cks)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        n_frames = args.max_iters * cfg.model.outputs_per_step
        audio_seconds = (B * n_frames * cfg.audio.hop_length
                         / cfg.audio.sample_rate)
        print(json.dumps({
            "metric": "audio_seconds_synthesized_per_s_per_chip",
            "value": round(audio_seconds / dt, 3),
            "unit": "audio_sec/s/chip",
            "vs_baseline": round(audio_seconds / dt, 3),
            "detail": {"batch": B, "decoder_steps": args.max_iters,
                       "gl_iters": cfg.audio.griffin_lim_iters,
                       "wall_s": round(dt, 4), "fused": True,
                       "device": str(jax.devices()[0]), "preset": cfg.name},
        }))
        return

    if args.mel_only:
        float(decode_mel(variables, inputs, input_lengths,
                         jax.random.PRNGKey(1)))
        times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            float(decode_mel(variables, inputs, input_lengths,
                             jax.random.PRNGKey(i)))
            times.append(time.perf_counter() - t0)
        n_frames = args.max_iters * cfg.model.outputs_per_step
        audio_seconds = B * n_frames * cfg.audio.hop_length / cfg.audio.sample_rate
        print(json.dumps({
            "metric": "mel_only_decode_s",
            "value": round(min(times), 4), "unit": "s",
            "vs_baseline": round(audio_seconds / min(times), 3),
            "detail": {"batch": B, "decoder_steps": args.max_iters,
                       "pallas": args.pallas,
                       "device": str(jax.devices()[0])},
        }))
        return

    # warmup / compile
    spec, cks = decode(variables, inputs, input_lengths, jax.random.PRNGKey(1))
    float(cks)
    wav, finite = vocode(spec, jax.random.PRNGKey(1))
    assert bool(finite), "non-finite audio"

    times, t_decode, t_vocode = [], [], []
    for i in range(args.repeats):
        key = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        spec, cks = decode(variables, inputs, input_lengths, key)
        float(cks)
        t1 = time.perf_counter()
        wav, finite = vocode(spec, key)
        bool(finite)
        t2 = time.perf_counter()
        t_decode.append(t1 - t0)
        t_vocode.append(t2 - t1)
        times.append(t2 - t0)

    dt = min(times)
    n_frames = args.max_iters * cfg.model.outputs_per_step
    audio_seconds = B * n_frames * cfg.audio.hop_length / cfg.audio.sample_rate
    value = audio_seconds / dt
    result = {
        "metric": "audio_seconds_synthesized_per_s_per_chip",
        "value": round(value, 3),
        "unit": "audio_sec/s/chip",
        "vs_baseline": round(value, 3),  # baseline = 1x real-time (none published)
        "detail": {
            "batch": B, "decoder_steps": args.max_iters,
            "frames": n_frames, "gl_iters": cfg.audio.griffin_lim_iters,
            "audio_seconds": round(audio_seconds, 2),
            "wall_s": round(dt, 4),
            "decode_s": round(min(t_decode), 4),
            "vocode_s": round(min(t_vocode), 4),
            "device": str(jax.devices()[0]),
            "preset": cfg.name,
        },
    }
    print(json.dumps(result))


def _bench_serve(args, cfg, jax, jnp, np):
    """Single-utterance serve latency (VERDICT r3 weak #5): warm
    ms/utterance through the PUBLIC Synthesizer.synthesize path — text →
    bucketed pad → fused decode+GL jit → host transfer → endpoint trim →
    WAV bytes — one row per input bucket."""
    import time
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer
    from tacotron_multispeaker_tpu.training import create_train_state

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    synth = Synthesizer(cfg).load_variables(
        {"params": state.params, "batch_stats": state.batch_stats})
    # one text per bucket: short (first bucket) and near-max (last bucket)
    buckets = sorted(set(
        synth._serve_bucket(b)
        for b in (*cfg.train.input_bucket_boundaries,
                  cfg.train.max_input_length)))
    texts = {}
    for b in buckets:
        words = max(1, (b - 10) // 6)
        texts[b] = ("testing " * words)[: max(b - 8, 4)].strip() + "."
    synth.warmup()
    rows = {}
    for b in buckets:
        t = texts[b]
        synth.synthesize(t, 0)          # shape-specific warm
        times = []
        for i in range(max(args.repeats, 5)):
            t0 = time.perf_counter()
            wav = synth.synthesize(t, 0, seed=i)
            times.append(time.perf_counter() - t0)
        rows[f"bucket_{b}"] = {
            "ms_per_utt": round(min(times) * 1000.0, 1),
            "wav_bytes": len(wav),
        }
    # fixed SHORT text (<50 chars): the row model.serve_frames_per_char
    # targets — with it set, the decode/postnet/GL all shrink to the text
    short = "Hello there, how are you doing today?"
    synth.synthesize(short, 0)
    times = []
    for i in range(max(args.repeats, 5)):
        t0 = time.perf_counter()
        synth.synthesize(short, 0, seed=i)
        times.append(time.perf_counter() - t0)
    rows["short_text_37ch"] = {"ms_per_utt": round(min(times) * 1000.0, 1)}
    first = rows[f"bucket_{buckets[0]}"]["ms_per_utt"]
    print(json.dumps({
        "metric": "serve_latency_ms_per_utterance",
        "value": first, "unit": "ms",
        "vs_baseline": first,
        "detail": {**rows, "max_iters": cfg.model.max_iters,
                   "serve_frames_per_char": cfg.model.serve_frames_per_char,
                   "gl_iters": cfg.audio.griffin_lim_iters,
                   "device": str(jax.devices()[0]), "preset": cfg.name},
    }))


def _make_train_bench_step(cfg, jax, shard_map_data1: bool):
    """(step_fn, state_on_device) for a throughput row — plain donated jit
    by default, or the shard_map DP step forced onto a data=1 mesh
    (``--shard_map``: times the kernels-INSIDE-shard_map composition the
    round-5 on-chip proof covers)."""
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from tacotron_multispeaker_tpu.training import (
        create_train_state, make_shard_map_train_step,
        make_sharded_train_step)

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    if shard_map_data1:
        mesh = make_mesh(cfg.parallel, devices=jax.devices()[:1],
                         data=1, model=1)
        step_fn, state_sh = make_shard_map_train_step(cfg, model, mesh)(state)
    else:
        mesh = make_mesh(cfg.parallel, devices=jax.devices()[:1],
                         data=1, model=1)
        step_fn, state_sh = make_sharded_train_step(cfg, model, mesh)(state)
    return step_fn, jax.device_put(state, state_sh)


def _bench_train_matrix(args, jax, jnp, np):
    """The BASELINE.md training table (BxLxkernels) in one TPU attach —
    consolidates tools/r4_chip_session.py (VERDICT r4 weak #6)."""
    import json as _json
    import time as _time
    from tacotron_multispeaker_tpu.config import get_config

    spec = args.train_matrix
    if spec in (None, "default"):
        spec = "128x96x1,128x96x0,128x192x1,256x96x1,256x96x0,256x192x1"
    rows = []
    for part in spec.split(","):
        b, l, k = part.lower().split("x")
        rows.append((int(b), int(l), bool(int(k))))

    peak = 197e12  # TPU v5e bf16 peak FLOP/s
    results = []
    for B, L, kernels in rows:
        over = [f"train.batch_size={B}"]
        if not kernels:
            over += ["parallel.use_pallas_gru=false",
                     "parallel.use_pallas_teacher=false"]
        if args.wav_ingest:
            over.append("train.targets_from_wav=true")
        if args.hparams:
            over.append(args.hparams)
        cfg = get_config(args.preset, ",".join(over))
        T = -(-args.train_frames // cfg.model.outputs_per_step) * \
            cfg.model.outputs_per_step
        step_fn, state = _make_train_bench_step(cfg, jax, args.shard_map)
        rng = np.random.RandomState(0)
        if args.wav_ingest:
            targets = (
                jnp.asarray(rng.randint(-2000, 2000,
                                        (B, T * cfg.audio.hop_length)),
                            jnp.int16),
                jnp.zeros((B, 0, 0), jnp.float32))
        else:
            targets = (
                jnp.asarray(rng.rand(B, T, cfg.audio.num_mels), jnp.float32),
                jnp.asarray(rng.rand(B, T, cfg.audio.num_freq), jnp.float32))
        batch = (
            jnp.asarray(rng.randint(2, 80, (B, L)), jnp.int32),
            jnp.full((B,), L, jnp.int32),
            *targets,
            jnp.full((B,), T, jnp.int32),
            jnp.zeros((B,), jnp.int32))
        flops = None
        try:
            cost = step_fn.lower(state, *batch).compile().cost_analysis()
            if cost and "flops" in cost:
                flops = float(cost["flops"])
        except Exception:
            pass
        try:
            t0 = _time.time()
            state, metrics = step_fn(state, *batch)
            loss0 = float(metrics["loss"])
            compile_s = _time.time() - t0
        except Exception as e:
            row = {"row": "train", "batch": B, "L": L, "kernels": kernels,
                   "shard_map": args.shard_map, "error": str(e)[:500]}
            results.append(row)
            print(_json.dumps(row), flush=True)
            continue
        N = max(args.repeats, 10)
        t0 = _time.perf_counter()
        for _ in range(N):
            state, metrics = step_fn(state, *batch)
        float(metrics["loss"])            # one true sync for N chained steps
        dt = (_time.perf_counter() - t0) / N
        row = {"row": "train", "batch": B, "L": L, "kernels": kernels,
               "shard_map": args.shard_map, "wav_ingest": args.wav_ingest,
               "sec_per_step": round(dt, 4),
               "examples_per_s": round(B / dt, 1),
               "mfu": round(flops / dt / peak, 4) if flops else None,
               "loss0": round(loss0, 4), "first_call_s": round(compile_s, 1)}
        results.append(row)
        print(_json.dumps(row), flush=True)
        del state, step_fn
    best = max((r.get("examples_per_s", 0) for r in results), default=0)
    print(_json.dumps({
        "metric": "train_matrix_best_examples_per_s_per_chip",
        "value": best, "unit": "examples/s/chip", "vs_baseline": best,
        "detail": {"rows": results, "preset": args.preset,
                   "shard_map": args.shard_map,
                   "device": str(jax.devices()[0])}}))


def _bench_train(args, cfg, jax, jnp, np):
    """Training-step throughput: sec/step, examples/s, frames/s, MFU.

    One donated pjit step over the default mesh with random static-shape
    batches (L=--input_length text, T=--train_frames target frames — a
    bucket boundary, so the shape matches what the Feeder emits).  MFU uses
    XLA's own cost analysis for the step FLOPs over the v5e bf16 peak.
    """
    import time
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from tacotron_multispeaker_tpu.training import (create_train_state,
                                                    make_sharded_train_step)

    r = cfg.model.outputs_per_step
    B, L = args.batch, args.input_length
    T = -(-args.train_frames // r) * r
    if args.shard_map:
        step_fn, state = _make_train_bench_step(cfg, jax, True)
    else:
        mesh = make_mesh(cfg.parallel)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        step_fn, state_sh = make_sharded_train_step(cfg, model, mesh)(state)
        state = jax.device_put(state, state_sh)

    rng = np.random.RandomState(0)
    batch = (
        jnp.asarray(rng.randint(2, 80, (B, L)), jnp.int32),
        jnp.full((B,), L, jnp.int32),
        jnp.asarray(rng.rand(B, T, cfg.audio.num_mels), jnp.float32),
        jnp.asarray(rng.rand(B, T, cfg.audio.num_freq), jnp.float32),
        jnp.full((B,), T, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )

    # XLA-reported FLOPs for one step (device-independent analysis)
    flops = None
    try:
        cost = step_fn.lower(state, *batch).compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])
    except Exception:
        pass

    state, metrics = step_fn(state, *batch)   # warmup/compile
    float(metrics["loss"])                    # host readback = true sync
    times = []
    for _ in range(max(args.repeats, 3)):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, *batch)
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt_synced = min(times)
    # SUSTAINED rate — what the real training loop runs at: N chained steps,
    # one final sync.  A per-step loss readback pays a host<->device tunnel
    # round trip under axon that the loop doesn't (it only syncs when
    # logging); round 2's "765 ex/s, 3.6% MFU" mismeasured this.
    N = 10
    t0 = time.perf_counter()
    for _ in range(N):
        state, metrics = step_fn(state, *batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / N
    peak = 197e12  # TPU v5e bf16 peak FLOP/s
    mfu = round(flops / dt / peak, 4) if flops else None
    result = {
        "metric": "train_examples_per_s_per_chip",
        "value": round(B / dt, 3),
        "unit": "examples/s/chip",
        "vs_baseline": round(B / dt, 3),  # no published reference numbers
        "detail": {
            "sec_per_step_sustained": round(dt, 4),
            "sec_per_step_synced": round(dt_synced, 4),
            "chained_steps": N, "batch": B,
            "frames_per_s": round(B * T / dt, 1),
            "audio_sec_per_s": round(
                B * T * cfg.audio.hop_length / cfg.audio.sample_rate / dt, 2),
            "step_tflops": round(flops / 1e12, 3) if flops else None,
            "mfu_vs_bf16_peak": mfu,
            "input_length": L, "target_frames": T,
            "device": str(jax.devices()[0]), "preset": cfg.name,
        },
    }
    import json
    print(json.dumps(result))


if __name__ == "__main__":
    main()
