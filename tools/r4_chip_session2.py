#!/usr/bin/env python
"""Round-4 on-chip session, phase 2: after the bigru scoped-vmem fix —
B=256 kernel-ON train rows, and the B=512 synthesis point (GL-bound
throughput asymptote probe)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from tacotron_multispeaker_tpu.config import get_config
from tacotron_multispeaker_tpu.parallel import make_mesh
from tacotron_multispeaker_tpu.training import (create_train_state,
                                                make_sharded_train_step)
from tacotron_multispeaker_tpu.models import create_model
from tacotron_multispeaker_tpu.audio import dsp

peak = 197e12
print(f"device: {jax.devices()[0]}", flush=True)

for B, L in [(256, 96), (256, 192)]:
    cfg = get_config("single_speaker", f"train.batch_size={B}")
    T = 500
    mesh = make_mesh(devices=jax.devices()[:1], data=1, model=1)
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
        jnp.zeros((B,), jnp.int32))
    flops = None
    try:
        cost = step_fn.lower(state, *batch).compile().cost_analysis()
        if cost and "flops" in cost:
            flops = float(cost["flops"])
    except Exception as e:
        print(json.dumps({"row": "train", "batch": B, "L": L,
                          "kernels": True, "error": str(e)[:1500]}),
              flush=True)
        continue
    state, metrics = step_fn(state, *batch)
    float(metrics["loss"])
    N = 10
    t0 = time.perf_counter()
    for _ in range(N):
        state, metrics = step_fn(state, *batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / N
    print(json.dumps({"row": "train", "batch": B, "L": L, "kernels": True,
                      "sec_per_step": round(dt, 4),
                      "examples_per_s": round(B / dt, 1),
                      "mfu": round(flops / dt / peak, 4) if flops else None}),
          flush=True)
    del state, step_fn, model

for B in (512,):
    cfg = get_config("single_speaker", "model.max_iters=120")
    model = create_model("tacotron", cfg)
    rng = jax.random.PRNGKey(0)
    L = 96
    inputs = jax.random.randint(rng, (B, L), 2, 80)
    lengths = jnp.full((B,), L, jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, inputs, lengths,
        jnp.zeros((B, 2 * cfg.model.outputs_per_step, cfg.audio.num_mels)),
        train=True)
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
            min_level_db=cfg.audio.min_level_db, power=cfg.audio.power,
            gl_iters=cfg.audio.griffin_lim_iters, key=key,
            use_pallas=False, gl_method=cfg.audio.gl_method,
            gl_momentum=cfg.audio.gl_momentum)
        return wav, jnp.sum(wav[0, :64])

    try:
        _, cks = decode_vocode(variables, inputs, lengths,
                               jax.random.PRNGKey(1))
        float(cks)
    except Exception as e:
        print(json.dumps({"row": "synth", "batch": B,
                          "error": str(e)[:1500]}), flush=True)
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
    print(json.dumps({"row": "synth", "batch": B, "wall_s": round(dt, 4),
                      "audio_sec_per_s_chip": round(audio_sec / dt, 1)}),
          flush=True)
