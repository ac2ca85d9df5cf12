"""Windowed overlap-add for iSTFT — Pallas TPU kernel + scatter-free XLA path
(SURVEY.md §2.13c).

The Griffin-Lim loop is 60 rounds of iSTFT→STFT.  A naive iSTFT overlap-add
is a scatter-add — slow on TPU.  Two fast formulations here:

* :func:`overlap_add_reference` (XLA, default fallback): the **static
  hop-shift decomposition**.  Pad ``n_fft`` to ``m*hop``; then frame f's
  chunk i (length ``hop``) lands at output row ``f+i`` of an
  ``[F+m-1, hop]`` grid — the whole OLA is ``m`` statically-shifted adds,
  no scatter anywhere.
* :func:`overlap_add_pallas`: the same accumulation in one VMEM pass per
  (batch, tile) with the window multiply and normalization fused.  Mosaic
  requires lane-dimension offsets to be multiples of 128, so the kernel
  loads a 128-aligned block (``pl.multiple_of`` hint) and corrects the
  sub-128 remainder with a dynamic lane roll (``pltpu.roll``).
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


# ----------------------------------------------------------------------------
# XLA path: static hop-shift decomposition (scatter-free)
# ----------------------------------------------------------------------------

def overlap_add_reference(frames: jnp.ndarray, window: jnp.ndarray,
                          hop: int, prewindowed: bool = False) -> jnp.ndarray:
    """frames [B, F, n_fft], window [n_fft] → normalized OLA [B, out_len].

    ``prewindowed``: the synthesis window is already baked into ``frames``
    (folded into the inverse-DFT matrices — dsp._dft_win_matrices); skip
    the multiply but keep the window-square normalization.
    """
    B, F, n_fft = frames.shape
    out_len = n_fft + hop * (F - 1)
    m = -(-n_fft // hop)
    n_pad = m * hop
    wf = frames if prewindowed else frames * window
    wf = jnp.pad(wf, ((0, 0), (0, 0), (0, n_pad - n_fft)))
    fr = wf.reshape(B, F, m, hop)
    Q = F + m - 1
    # chunk i of frame f lands at output row f+i: m shifted adds
    out = jnp.zeros((B, Q, hop), frames.dtype)
    for i in range(m):
        out = out + jnp.pad(fr[:, :, i, :], ((0, 0), (i, m - 1 - i), (0, 0)))
    sig = out.reshape(B, Q * hop)[:, :out_len]
    return sig / _wsq_norm(window, F, hop)[None, :out_len]


def _wsq_norm(window: jnp.ndarray, F: int, hop: int) -> jnp.ndarray:
    """Window-square normalization via the same static-shift scheme."""
    n_fft = window.shape[0]
    m = -(-n_fft // hop)
    n_pad = m * hop
    w2 = jnp.pad(window ** 2, (0, n_pad - n_fft))
    w2 = jnp.broadcast_to(w2, (F, n_pad)).reshape(F, m, hop)
    Q = F + m - 1
    out = jnp.zeros((Q, hop), window.dtype)
    for i in range(m):
        out = out + jnp.pad(w2[:, i, :], ((i, m - 1 - i), (0, 0)))
    return jnp.maximum(out.reshape(Q * hop), 1e-10)


# ----------------------------------------------------------------------------
# Pallas kernel: fused window+OLA+normalize with aligned loads + lane roll
# ----------------------------------------------------------------------------

def _kernel(frames_ref, win_ref, norm_ref, out_ref, pad_ref, *,
            hop: int, n_fft: int, S_TILE: int, n_frames: int):
    B = out_ref.shape[0]
    tile = pl.program_id(1)
    s0 = tile * S_TILE
    f_lo = jnp.maximum((s0 - n_fft) // hop + 1, 0)
    n_overlap = (S_TILE + n_fft - 1) // hop + 1
    W = S_TILE + 128                     # aligned read window
    P = S_TILE + 128                     # left zero edge (covers whole tile)

    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    acc = jnp.zeros((B, S_TILE), jnp.float32)

    def body(i, acc):
        f = f_lo + i
        valid = (f < n_frames).astype(jnp.float32)
        f_safe = jnp.minimum(f, n_frames - 1)
        # frames may be bf16 (fast-GL iterations); window/accum stay f32
        frame = frames_ref[:, f_safe, :].astype(jnp.float32) * win_ref[0, :]
        pad_ref[:, pl.ds(P, n_fft)] = frame * valid
        # start in padded coords; overlapping frames give start ∈ (128, n_fft+P);
        # clamped/non-overlapping starts read only the zero edges
        start = jnp.clip(s0 - f_safe * hop + P, 0, n_fft + P)
        q = pl.multiple_of((start // 128) * 128, 128)
        r = start - q                                           # ∈ [0, 128)
        blk = pad_ref[:, pl.ds(q, W)]
        rolled = pltpu.roll(blk, W - r, axis=1)                 # left-shift r
        return acc + rolled[:, :S_TILE]

    acc = jax.lax.fori_loop(0, n_overlap, body, acc)
    out_ref[:, :] = (acc / norm_ref[0, pl.ds(s0, S_TILE)]).astype(
        out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hop", "interpret",))
def overlap_add_pallas(frames: jnp.ndarray, window: jnp.ndarray, hop: int,
                       interpret: bool = False) -> jnp.ndarray:
    """frames [B, F, n_fft] (already irfft'd, f32 or bf16), window [n_fft]
    → normalized OLA signal [B, n_fft + hop*(F-1)] in f32 (accumulation and
    the window-square-norm division are always f32 in-kernel).

    Grid is (batch tiles × signal tiles): each program holds one
    ``B_TILE``-row slab of frames in VMEM, so arbitrarily large batches
    stay under the VMEM budget (a whole [32, 600, 2048] f32 batch is
    157 MB — the single-block version of this kernel could not compile).
    """
    B, F, n_fft = frames.shape
    out_len = n_fft + hop * (F - 1)
    S_TILE = 512
    out_pad = _round_up(out_len, S_TILE)

    norm = jnp.pad(_wsq_norm(window.astype(jnp.float32), F, hop),
                   (0, out_pad - out_len), constant_values=1.0)[None, :]

    # pad frame count to a sublane multiple; masked off via ``n_frames``
    F_pad = _round_up(F, 8)
    if F_pad != F:
        frames = jnp.pad(frames, ((0, 0), (0, F_pad - F), (0, 0)))
    B_TILE = min(B, 8)
    B_pad = _round_up(B, B_TILE)
    if B_pad != B:
        frames = jnp.pad(frames, ((0, B_pad - B), (0, 0), (0, 0)))

    grid = (B_pad // B_TILE, out_pad // S_TILE)
    # pad buffer: [P zeros | frame (n_fft) | zero tail covering max read]
    P = S_TILE + 128
    pad_len = _round_up(n_fft + P + S_TILE + 128, 128)
    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop, n_fft=n_fft, S_TILE=S_TILE,
                          n_frames=F),
        out_shape=jax.ShapeDtypeStruct((B_pad, out_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, F_pad, n_fft), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_TILE, S_TILE), lambda b, s: (b, s),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B_TILE, pad_len), jnp.float32)],
        interpret=interpret,
    )(frames, window[None, :].astype(jnp.float32), norm)
    return out[:B, :out_len]
