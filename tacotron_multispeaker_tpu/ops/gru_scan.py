"""Pallas TPU kernel: full-sequence GRU scan with VMEM-resident weights.

The XLA ``lax.scan`` GRU (models/modules.GRU) already precomputes all input
projections in one big matmul, but its per-step recurrent matmuls
([B,F]x[F,2F] and [B,F]x[F,F]) are emitted as separate HLO loop iterations:
every step re-reads the recurrent weights and round-trips the hidden state
through HBM.  For the CBHG BiGRUs (encoder L~100 steps, post-net T~600+
steps) that makes the *sequential* part of the model memory-latency bound.

This kernel runs the whole scan inside ONE ``pallas_call``: the recurrent
weights stay resident in VMEM across all timesteps, the hidden state lives
in a VMEM scratch carry, and the precomputed input projections are streamed
in time-major chunks by the Pallas pipeline (grid over time chunks, which
Mosaic double-buffers automatically).  Per step only the two small MXU
matmuls + VPU gate math execute — no HBM traffic for weights or state.

Reference semantics: legacy-TF GRUCell split exactly as
models/modules.GRUCellParams (gates bias folded into ``xg``, reset applied
to ``h`` before the candidate matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(xg_ref, xc_ref, whg_ref, whc_ref, h0_ref, ys_ref, h_scr,
            *, chunk: int, features: int):
    F = features

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:, :] = h0_ref[:, :].astype(jnp.float32)

    whg = whg_ref[:, :]
    whc = whc_ref[:, :]
    cdt = whg.dtype

    def body(t, h):
        # h: [B, F] float32 carry; per-step inputs are [B, ...] slices of the
        # time-major chunk (t indexes the leading, untiled dimension).
        gates = jax.nn.sigmoid(
            xg_ref[t].astype(jnp.float32)
            + jnp.dot(h.astype(cdt), whg, preferred_element_type=jnp.float32))
        r, u = gates[:, :F], gates[:, F:]
        c = jnp.tanh(
            xc_ref[t].astype(jnp.float32)
            + jnp.dot((r * h).astype(cdt), whc,
                      preferred_element_type=jnp.float32))
        h = u * h + (1.0 - u) * c
        ys_ref[t] = h.astype(ys_ref.dtype)
        return h

    h_scr[:, :] = jax.lax.fori_loop(0, chunk, body, h_scr[:, :])


@functools.partial(jax.jit, static_argnames=("interpret", "time_chunk"))
def gru_scan_pallas(xg: jnp.ndarray, xc: jnp.ndarray, whg: jnp.ndarray,
                    whc: jnp.ndarray, h0: jnp.ndarray,
                    interpret: bool = False,
                    time_chunk: int = 128) -> jnp.ndarray:
    """Sequential GRU over precomputed input projections.

    xg: [T, B, 2F] gate input projections (bias included)
    xc: [T, B, F] candidate input projections (bias included)
    whg: [F, 2F], whc: [F, F] recurrent weights (no bias — TF legacy GRU)
    h0: [B, F] initial hidden state
    → ys [T, B, F] (dtype of xg), ys[t] = h_{t+1}

    Requires F % 128 == 0 (gate split is a lane-dim slice); callers fall
    back to the XLA scan otherwise.
    """
    T, B, F2 = xg.shape
    F = F2 // 2
    assert F % 128 == 0, f"features {F} must be a multiple of 128"
    assert xc.shape == (T, B, F) and h0.shape == (B, F)

    chunk = min(time_chunk, _round_up(T, 8))
    T_pad = _round_up(T, chunk)
    B_pad = _round_up(B, 8)
    if T_pad != T or B_pad != B:
        xg = jnp.pad(xg, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
        xc = jnp.pad(xc, ((0, T_pad - T), (0, B_pad - B), (0, 0)))
        h0 = jnp.pad(h0, ((0, B_pad - B), (0, 0)))

    ys = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, features=F),
        out_shape=jax.ShapeDtypeStruct((T_pad, B_pad, F), xg.dtype),
        grid=(T_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, B_pad, 2 * F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B_pad, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 2 * F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_pad, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B_pad, F), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B_pad, F), jnp.float32)],
        interpret=interpret,
    )(xg, xc, whg, whc, h0)
    return ys[:T, :B, :]


def gru_scan_reference(xg: jnp.ndarray, xc: jnp.ndarray, whg: jnp.ndarray,
                       whc: jnp.ndarray, h0: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA scan with identical math (float32 gate/candidate sums)."""
    F = xc.shape[-1]
    cdt = whg.dtype

    def step(h, inp):
        xg_t, xc_t = inp
        gates = jax.nn.sigmoid(
            xg_t.astype(jnp.float32)
            + jnp.dot(h.astype(cdt), whg,
                      preferred_element_type=jnp.float32))
        r, u = gates[:, :F], gates[:, F:]
        c = jnp.tanh(
            xc_t.astype(jnp.float32)
            + jnp.dot((r * h).astype(cdt), whc,
                      preferred_element_type=jnp.float32))
        h = u * h + (1.0 - u) * c
        return h, h.astype(xg_t.dtype)

    _, ys = jax.lax.scan(step, h0.astype(jnp.float32), (xg, xc))
    return ys
