"""Fused Griffin-Lim iteration Pallas kernel (SURVEY.md §2.13c).

**Measured negative result (round 2, TPU v5 lite, B=32 × 600 frames × 30
iters): vocode 0.271 s with this kernel vs 0.188 s for the XLA dft_mix
path — the XLA formulation stays the default.**  The kernel eliminates all
HBM round-trips (everything VMEM-resident), but the banded OLA∘reframe
operator works on full-frame lanes: 2m-1 = 17 ``pltpu.roll`` copies of the
[F, n_fft] f32 frame block per iteration per batch row ≈ 170 MB of VPU
data movement per row-iteration, 8× more than the XLA static-shift OLA
which shifts output-sized [Q, hop] tiles.  The roll traffic exceeds the
HBM traffic it saves.  Kept as a tested alternate (griffin_lim
use_pallas routes dft/bf16 schedules here) and as the honest record of
why whole-loop GL fusion does not pay on this hardware.

One ``pallas_call`` runs ALL fast (bf16) Griffin-Lim iterations for one
batch row with everything VMEM-resident: the four DFT matrices, the target
magnitude, the windowed frames, and the momentum state never touch HBM
between iterations.

The overlap-add → signal → re-framing round trip is algebraically collapsed
into a banded frames→frames operator (no signal, no scatter, no gather):

    sig[s]      = Σ_f win[j]·fr[f, j]|_{j=s-f·hop} / norm[s]
    out[g, i]   = win[i]·sig[g·hop+i]
                = N[g,i] · Σ_d S_d[i] · fr[g-d, i+d·hop]

with N[g,i] = win[i]/norm[g·hop+i] and S_d[i] = win[i+d·hop] (zero out of
range), d ∈ [-(m-1), m-1], m = ceil(n_fft/hop).  Each shift term is one
``pltpu.roll`` (sublane roll by d, lane roll by d·hop) + multiply-add on the
VPU.  Frames are padded with m-1 zero rows so rolled wrap-around lands in
zeros and no row masking is needed.

Per iteration per row: 4 MXU matmuls ([F, n_fft]×[n_fft, bins] ×2 forward,
[F, bins]×[bins, n_fft] ×2 inverse, identical FLOPs to the XLA path) and
~2m VPU passes over [F, n_fft] — and ZERO HBM traffic.

Semantics match audio/dsp.py:griffin_lim's bf16 fast iterations exactly
(same _dft_matrices, same momentum extrapolation, same 1e-8 floor); the
HIGH-precision polish iterations stay on the XLA path afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(wf0_ref, mag_ref, n_ref, s_ref, dcre, dcim, icre, icim,
            sre_ref, sim_ref, pre_out, pim_out,
            wf_scr, pre_scr, pim_scr, *,
            n_iters: int, mom: float, hop: int, n_fft: int, m: int):
    cdt = wf0_ref.dtype
    Fp = wf_scr.shape[0]

    wf_scr[:, :] = wf0_ref[0]
    pre_scr[:, :] = jnp.zeros_like(pre_scr)
    pim_scr[:, :] = jnp.zeros_like(pim_scr)

    def body(_, carry):
        # ---- forward DFT of the windowed frames (MXU) -------------------
        wf = wf_scr[:, :]
        re = jnp.dot(wf, dcre[:, :], preferred_element_type=jnp.float32)
        im = jnp.dot(wf, dcim[:, :], preferred_element_type=jnp.float32)
        # ---- fast-GL momentum extrapolation + magnitude projection ------
        are = re - mom * pre_scr[:, :]
        aim = im - mom * pim_scr[:, :]
        pre_scr[:, :] = re
        pim_scr[:, :] = im
        scale = mag_ref[0] / jnp.maximum(
            jnp.sqrt(are * are + aim * aim), 1e-8)
        sre = are * scale
        sim = aim * scale
        sre_ref[0] = sre                     # last iteration's survive
        sim_ref[0] = sim
        # ---- inverse DFT (MXU); fr stays f32 — pltpu.roll rejects bf16
        # ("Rotate with non-32-bit data")
        fr = (jnp.dot(sre.astype(cdt), icre[:, :],
                      preferred_element_type=jnp.float32)
              + jnp.dot(sim.astype(cdt), icim[:, :],
                        preferred_element_type=jnp.float32))

        # ---- banded OLA ∘ reframe: out[g,i] = N·Σ_d S_d[i]·fr[g-d, i+d·hop]
        # A dynamic fori_loop over the 2m-1 shifts (NOT a python unroll):
        # unrolled, Mosaic's stack allocator keeps every rolled temp live
        # and blows the scoped-vmem budget (measured 125 MiB at
        # single_speaker dims); the dynamic loop reuses one temp set.
        def ola_body(di, acc):
            d = di - (m - 1)
            rolled = pltpu.roll(fr, d % Fp, axis=0)
            rolled = pltpu.roll(rolled, (-d * hop) % n_fft, axis=1)
            return acc + rolled * s_ref[di, :]      # f32 accumulate
        acc = jax.lax.fori_loop(0, 2 * m - 1, ola_body,
                                jnp.zeros(fr.shape, jnp.float32))
        wf_scr[:, :] = (acc * n_ref[0]).astype(cdt)
        return carry

    jax.lax.fori_loop(0, n_iters, body, 0)
    pre_out[0] = pre_scr[:, :]
    pim_out[0] = pim_scr[:, :]


@functools.partial(jax.jit, static_argnames=(
    "hop", "n_iters", "mom", "interpret"))
def gl_fast_iterations_pallas(wf0: jnp.ndarray, magT: jnp.ndarray,
                              window: jnp.ndarray, hop: int, n_iters: int,
                              mom: float, interpret: bool = False):
    """Run ``n_iters`` bf16 Griffin-Lim iterations fully in VMEM.

    wf0  [B, F, n_fft]  initial windowed frames (= dsp ``frame(sig0)``), bf16
    magT [B, F, bins]   target magnitude (f32)
    window [n_fft]      synthesis/analysis window (f32)
    mom                 converted momentum (momentum/(1+momentum)); 0 = plain

    Returns (sre, sim, pre, pim), each [B, F, bins] f32: the projected
    spectrum after the last iteration (→ ``ola`` gives the signal) and the
    last raw spectrum estimates (momentum state for polish continuation).
    """
    from .overlap_add import _wsq_norm

    B, F, n_fft = wf0.shape
    bins = magT.shape[-1]
    m = -(-n_fft // hop)
    # m-1 extra zero rows: rolled wrap-around lands in zeros (no row masks)
    F_pad = _round_up(F + m - 1, 8)
    bins_pad = _round_up(bins, 128)
    cdt = wf0.dtype

    # DFT matrices (identical to audio/dsp._dft_matrices; local copy keeps
    # this module import-cycle-free), zero-padded to the lane-aligned bins
    n = np.arange(n_fft)[:, None]
    k = np.arange(bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    C = np.cos(ang)
    S = -np.sin(ang)
    w = np.full((bins,), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    pad_k = ((0, 0), (0, bins_pad - bins))
    dcre = jnp.asarray(np.pad(C, pad_k), cdt)
    dcim = jnp.asarray(np.pad(S, pad_k), cdt)
    icre = jnp.asarray(np.pad((w[:, None] * C.T) / n_fft,
                              ((0, bins_pad - bins), (0, 0))), cdt)
    icim = jnp.asarray(np.pad((w[:, None] * S.T) / n_fft,
                              ((0, bins_pad - bins), (0, 0))), cdt)

    # N[g,i] = win[i]/norm[g·hop+i]; S_d[i] = win[i+d·hop] (0 out of range).
    # window may be a traced jit argument, so these are jnp gathers (tiny:
    # [F, n_fft] and [2m-1, n_fft] one-time setup, not per-iteration work)
    win = window.astype(jnp.float32)
    norm = _wsq_norm(win, F, hop)
    g = np.arange(F)[:, None]
    i = np.arange(n_fft)[None, :]
    N = win[None, :] / norm[g * hop + i]                     # [F, n_fft]
    N = jnp.pad(N, ((0, F_pad - F), (0, 0)))
    rows = []
    for di in range(2 * m - 1):
        d = di - (m - 1)
        idx = i[0] + d * hop
        valid = (idx >= 0) & (idx < n_fft)
        rows.append(jnp.where(jnp.asarray(valid),
                              win[np.clip(idx, 0, n_fft - 1)], 0.0))
    n_shift_pad = _round_up(2 * m - 1, 8)
    shifts = jnp.pad(jnp.stack(rows),
                     ((0, n_shift_pad - (2 * m - 1)), (0, 0)))

    wf0 = jnp.pad(wf0, ((0, 0), (0, F_pad - F), (0, 0)))
    magT = jnp.pad(magT.astype(jnp.float32),
                   ((0, 0), (0, F_pad - F), (0, bins_pad - bins)))

    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    row = lambda shape: pl.BlockSpec((1,) + shape, lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)

    sre, sim, pre, pim = pl.pallas_call(
        functools.partial(_kernel, n_iters=n_iters, mom=mom, hop=hop,
                          n_fft=n_fft, m=m),
        grid=(B,),
        out_shape=[jax.ShapeDtypeStruct((B, F_pad, bins_pad), jnp.float32)
                   for _ in range(4)],
        in_specs=[
            row((F_pad, n_fft)),                       # wf0
            row((F_pad, bins_pad)),                    # magT
            const((1, F_pad, n_fft)),                  # N
            const((n_shift_pad, n_fft)),               # shifts
            const((n_fft, bins_pad)),                  # dcre
            const((n_fft, bins_pad)),                  # dcim
            const((bins_pad, n_fft)),                  # icre
            const((bins_pad, n_fft)),                  # icim
        ],
        out_specs=[row((F_pad, bins_pad))] * 4,
        scratch_shapes=[
            pltpu.VMEM((F_pad, n_fft), cdt),           # windowed frames
            pltpu.VMEM((F_pad, bins_pad), jnp.float32),  # prev re
            pltpu.VMEM((F_pad, bins_pad), jnp.float32),  # prev im
        ],
        # the loop body's live temporaries ([F, n_fft] accumulators,
        # spectrum intermediates) exceed the default 16 MiB scoped-vmem
        # stack at single_speaker dims — raise it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret,
    )(wf0, magT, N[None], shifts,
      dcre, dcim, icre, icim)
    return (sre[:, :F, :bins], sim[:, :F, :bins],
            pre[:, :F, :bins], pim[:, :F, :bins])


def gl_fast_iterations_reference(wf0, magT, window, hop, n_iters, mom,
                                 dtype=jnp.bfloat16):
    """Plain-XLA mirror of the kernel (for equivalence tests): identical
    banded-operator math with the SAME rounding points (wf carried in
    ``dtype``, matmul operands cast to ``dtype``, f32 accumulation) — GL
    phase estimation is chaotic where |spectrum| ≈ 0, so only a
    rounding-point-exact reference can be compared elementwise."""
    B, F, n_fft = wf0.shape
    from .overlap_add import _wsq_norm
    m = -(-n_fft // hop)
    win = jnp.asarray(window, jnp.float32)
    norm = _wsq_norm(win, F, hop)
    g = jnp.arange(F)[:, None]
    i = jnp.arange(n_fft)[None, :]
    N = win[None, :] / norm[g * hop + i]

    nn = np.arange(n_fft)[:, None]
    kk = np.arange(magT.shape[-1])[None, :]
    ang = 2.0 * np.pi * nn * kk / n_fft
    C = jnp.asarray(np.cos(ang), dtype)
    S = jnp.asarray(-np.sin(ang), dtype)
    w = np.full((magT.shape[-1],), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    iC = jnp.asarray((w[:, None] * np.cos(ang).T) / n_fft, dtype)
    iS = jnp.asarray((w[:, None] * -np.sin(ang).T) / n_fft, dtype)
    mm = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)

    wf = wf0.astype(dtype)
    pre = jnp.zeros_like(magT, jnp.float32)
    pim = jnp.zeros_like(pre)
    sre = sim = None
    for _ in range(n_iters):
        re = mm(wf, C)
        im = mm(wf, S)
        are = re - mom * pre
        aim = im - mom * pim
        pre, pim = re, im
        scale = magT / jnp.maximum(jnp.sqrt(are * are + aim * aim), 1e-8)
        sre, sim = are * scale, aim * scale
        fr = mm(sre.astype(dtype), iC) + mm(sim.astype(dtype), iS)
        acc = jnp.zeros(fr.shape, jnp.float32)
        for d in range(-(m - 1), m):
            idx = np.arange(n_fft) + d * hop
            lane_ok = (idx >= 0) & (idx < n_fft)
            sd = jnp.where(jnp.asarray(lane_ok),
                           win[np.clip(idx, 0, n_fft - 1)], 0.0)
            shifted = jnp.roll(jnp.roll(fr, d, axis=1), -d * hop, axis=2)
            row_ok = ((np.arange(F) >= d) &
                      (np.arange(F) < F + d))[None, :, None]
            acc = acc + shifted * sd * row_ok
        wf = (acc * N[None]).astype(dtype)
    return sre, sim, pre, pim
