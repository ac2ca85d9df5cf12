#!/usr/bin/env python
"""Isolate the B=256 kernel compile failure: compile each training kernel
standalone at the failing shapes, full stderr, one process."""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np


def run(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"== {name}: OK {time.time()-t0:.1f}s "
              f"{float(out):.4f}", flush=True)
    except Exception:
        print(f"== {name}: FAIL {time.time()-t0:.1f}s", flush=True)
        tb = traceback.format_exc()
        print(tb[:4000], flush=True)
        print("...TAIL...", flush=True)
        print(tb[-2000:], flush=True)


B, T, F = 256, 500, 128        # postnet BiGRU shape at B=256
rs = np.random.RandomState(0)
bf = jnp.bfloat16


def bigru_fwd_bwd():
    from tacotron_multispeaker_tpu.ops.gru_scan import bigru_scan
    xg = jnp.asarray(rs.randn(T, 2, B, 2 * F) * 0.3, bf)
    xc = jnp.asarray(rs.randn(T, 2, B, F) * 0.3, bf)
    whg = jnp.asarray(rs.randn(2, F, 2 * F) * 0.1, bf)
    whc = jnp.asarray(rs.randn(2, F, F) * 0.1, bf)
    h0 = jnp.zeros((2, B, F), bf)

    def loss(a):
        return jnp.sum(bigru_scan(*a, False).astype(jnp.float32))

    g = jax.jit(jax.grad(loss))((xg, xc, whg, whc, h0))
    return jnp.sum(g[2].astype(jnp.float32)[0, :8])


def gru_fwd_bwd():
    from tacotron_multispeaker_tpu.ops.gru_scan import gru_scan
    xg = jnp.asarray(rs.randn(T, B, 2 * F) * 0.3, bf)
    xc = jnp.asarray(rs.randn(T, B, F) * 0.3, bf)
    whg = jnp.asarray(rs.randn(F, 2 * F) * 0.1, bf)
    whc = jnp.asarray(rs.randn(F, F) * 0.1, bf)
    h0 = jnp.zeros((B, F), bf)

    def loss(a):
        return jnp.sum(gru_scan(*a, False).astype(jnp.float32))

    g = jax.jit(jax.grad(loss))((xg, xc, whg, whc, h0))
    return jnp.sum(g[2].astype(jnp.float32)[0, :8])


def teacher_fwd_bwd():
    from tacotron_multispeaker_tpu.ops.teacher_decoder import (
        TeacherDecoderWeights, teacher_decoder)
    S, H, A, D, L, n = 100, 256, 256, 256, 96, 2
    f = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.1)
    w = TeacherDecoderWeights(
        a_hg=f(H, 2 * H), a_hc=f(H, H), wq=f(H, A), v=f(A),
        w_ctx=f(D, 4 * H), wd_h=f(H, H), d_b=f(H),
        w_r=(f(H, 3 * H),) * n, b_r=(f(3 * H),) * n,
        hg=(f(H, 2 * H),) * n, hc=(f(H, H),) * n)
    png = f(S, B, 2 * H)
    pnc = f(S, B, H)
    h0a = f(B, H)
    h0d = f(n, B, H)
    keys = jnp.asarray(rs.randn(B, L, A) * 0.1, bf)
    memory = jnp.asarray(rs.randn(B, L, D) * 0.1, bf)
    maskf = jnp.ones((B, L), jnp.float32)

    def loss(a):
        xs, al = teacher_decoder(a[0], a[1], h0a, h0d, a[2], keys, memory,
                                 maskf, False)
        return jnp.sum(xs) + jnp.sum(al)

    g = jax.jit(jax.grad(loss))((png, pnc, w))
    return jnp.sum(g[0][0, 0, :8])


print(f"device: {jax.devices()[0]}", flush=True)
run("gru_fwd_bwd_B256", gru_fwd_bwd)
run("bigru_fwd_bwd_B256", bigru_fwd_bwd)
run("teacher_fwd_bwd_B256", teacher_fwd_bwd)
