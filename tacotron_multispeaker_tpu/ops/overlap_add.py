"""Pallas TPU kernel: windowed overlap-add for iSTFT (SURVEY.md §2.13c).

The Griffin-Lim loop is 60 rounds of iSTFT→STFT; the FFTs map to XLA's TPU
FFT, but the overlap-add in iSTFT is a scatter-add in pure XLA — slow on
TPU.  This kernel replaces it: grid over output tiles; each program
accumulates the ≤ ceil((S_TILE+n_fft)/hop)+1 frames overlapping its output
range with masked gathers in VMEM, then divides by the precomputed
window-square normalization.  No scatter.

VMEM note: the whole [B, F, n_fft] frame block is held in VMEM per program,
bounding B·F·n_fft·4 ≲ 12 MB; callers batch-split longer signals.
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


def _kernel(frames_ref, win_ref, norm_ref, out_ref, pad_ref, *,
            hop: int, n_fft: int, S_TILE: int, n_frames: int):
    # Mosaic has no general gather; instead each frame is written into the
    # middle of a zero-edged scratch buffer and the tile's S_TILE-sample
    # contribution is a dynamic slice of it (zeros outside the frame).
    B = out_ref.shape[0]
    tile = pl.program_id(0)
    s0 = tile * S_TILE
    # frames f with f*hop < s0+S_TILE and f*hop + n_fft > s0
    f_lo = jnp.maximum((s0 - n_fft) // hop + 1, 0)
    n_overlap = (S_TILE + n_fft - 1) // hop + 1

    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    acc = jnp.zeros((B, S_TILE), jnp.float32)

    def body(i, acc):
        f = f_lo + i
        valid = (f < n_frames).astype(jnp.float32)
        f_safe = jnp.minimum(f, n_frames - 1)
        frame = frames_ref[:, f_safe, :] * win_ref[0, :]       # [B, n_fft]
        pad_ref[:, pl.ds(S_TILE, n_fft)] = frame * valid
        # tile sample j (global s0+j) reads frame position s0+j - f*hop;
        # padded coords: start = s0 - f*hop + S_TILE.  Out-of-overlap starts
        # clamp into the zero edges, contributing exactly zero.
        start = jnp.clip(s0 - f_safe * hop + S_TILE, 0, n_fft + S_TILE)
        contrib = pad_ref[:, pl.ds(start, S_TILE)]
        return acc + contrib

    acc = jax.lax.fori_loop(0, n_overlap, body, acc)
    out_ref[:, :] = (acc / norm_ref[0, pl.ds(s0, S_TILE)]).astype(
        out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hop", "interpret",))
def overlap_add_pallas(frames: jnp.ndarray, window: jnp.ndarray, hop: int,
                       interpret: bool = False) -> jnp.ndarray:
    """frames [B, F, n_fft] (already irfft'd), window [n_fft] →
    normalized OLA signal [B, n_fft + hop*(F-1)]."""
    B, F, n_fft = frames.shape
    out_len = n_fft + hop * (F - 1)
    S_TILE = 512
    out_pad = _round_up(out_len, S_TILE)

    # window-square normalization, precomputed (static per shape)
    norm = jnp.zeros((out_pad,), jnp.float32)
    pos = (np.arange(F) * hop)[:, None] + np.arange(n_fft)[None, :]
    norm = norm.at[pos.reshape(-1)].add(
        jnp.broadcast_to(window ** 2, (F, n_fft)).reshape(-1))
    norm = jnp.maximum(norm, 1e-10)[None, :]

    # pad frame count to a multiple of 8 (TPU sublane tiling); padded frames
    # are masked off by ``n_frames`` inside the kernel
    F_pad = _round_up(F, 8)
    if F_pad != F:
        frames = jnp.pad(frames, ((0, 0), (0, F_pad - F), (0, 0)))

    grid = (out_pad // S_TILE,)
    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop, n_fft=n_fft, S_TILE=S_TILE,
                          n_frames=F),
        out_shape=jax.ShapeDtypeStruct((B, out_pad), frames.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, F_pad, n_fft), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, S_TILE), lambda s: (0, s),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, n_fft + 2 * S_TILE), jnp.float32)],
        interpret=interpret,
    )(frames, window[None, :], norm)
    return out[:, :out_len]


def overlap_add_reference(frames: jnp.ndarray, window: jnp.ndarray,
                          hop: int) -> jnp.ndarray:
    """Scatter-add fallback (identical math, XLA path)."""
    B, F, n_fft = frames.shape
    out_len = n_fft + hop * (F - 1)
    starts = np.arange(F) * hop
    idx = (starts[:, None] + np.arange(n_fft)[None, :]).reshape(-1)
    wf = frames * window
    sig = jnp.zeros((B, out_len), frames.dtype).at[:, idx].add(
        wf.reshape(B, -1))
    wsq = jnp.zeros((out_len,), jnp.float32).at[idx].add(
        jnp.broadcast_to(window ** 2, (F, n_fft)).reshape(-1))
    return sig / jnp.maximum(wsq, 1e-10)
