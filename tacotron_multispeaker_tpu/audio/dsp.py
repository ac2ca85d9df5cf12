"""Jittable audio DSP: STFT / iSTFT, mel analysis, Griffin-Lim.

TPU-native replacement for the reference's ``util/audio.py`` (SURVEY.md §2.3),
which was numpy/librosa/scipy on the host.  Everything here is pure
``jax.numpy`` so analysis and Griffin-Lim synthesis jit onto the TPU: the
STFT is an unfold + rfft (batched matmul-sized FFTs that XLA maps well), the
iSTFT is overlap-add via a scatter, and Griffin-Lim is a
``lax.fori_loop`` of iSTFT→STFT phase-projection steps with no host
round-trips.

Conventions match librosa's (the reference's analysis library): centered
frames with reflect padding, periodic Hann window zero-padded to ``n_fft``,
Slaney-style mel filterbank with Slaney area normalization.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class STFTParams(NamedTuple):
    """Static STFT parameters (hashable → usable as jit static args)."""

    n_fft: int
    hop_length: int
    win_length: int

    @classmethod
    def from_config(cls, audio_cfg) -> "STFTParams":
        return cls(audio_cfg.n_fft, audio_cfg.hop_length, audio_cfg.win_length)


def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window of ``win_length``, centered in ``n_fft`` zeros."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    pad = n_fft - win_length
    lpad = pad // 2
    return np.pad(w, (lpad, pad - lpad)).astype(np.float32)


# ----------------------------------------------------------------------------
# Mel filterbank (librosa-compatible Slaney mel, Slaney norm)
# ----------------------------------------------------------------------------

def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_basis(sample_rate: int, n_fft: int, num_mels: int,
              fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """[num_mels, n_fft//2+1] Slaney-normalized triangular mel filterbank."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)),
                          num_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2: num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ----------------------------------------------------------------------------
# Preemphasis
# ----------------------------------------------------------------------------

def preemphasis(x: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[t] = x[t] - coef * x[t-1] (reference: lfilter([1, -coef], [1], x))."""
    return jnp.concatenate([x[..., :1], x[..., 1:] - coef * x[..., :-1]], axis=-1)


def inv_preemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """Inverse IIR x[t] = y[t] + coef * x[t-1], as an associative scan.

    The recurrence is linear, so it is a first-order linear recurrence
    solvable with ``jax.lax.associative_scan`` in O(log T) depth — far better
    on TPU than a sequential loop over samples.
    """
    if coef == 0.0:
        return y

    def combine(a, b):
        # pairs (m, v) represent x -> m * x + v
        m1, v1 = a
        m2, v2 = b
        return m2 * m1, m2 * v1 + v2

    T = y.shape[-1]
    m = jnp.full(y.shape, coef, dtype=y.dtype)
    ms, vs = jax.lax.associative_scan(combine, (m, y), axis=-1)
    del ms
    return vs


# ----------------------------------------------------------------------------
# STFT / iSTFT
# ----------------------------------------------------------------------------

def _frame_rows(z: jnp.ndarray, width: int, hop: int,
                n_frames: int) -> jnp.ndarray:
    """[..., S] -> [..., n_frames, width] where frame k = z[k·hop : k·hop+width].

    Gather-free hop-row decomposition: view z as hop-sized rows; each frame
    is the concat of m=⌈width/hop⌉ consecutive rows — m static slices, the
    exact mirror of the OLA hop-shift decomposition."""
    m = -(-width // hop)
    Q = n_frames + m  # rows needed to cover the last frame (incl. slack)
    tail = Q * hop - z.shape[-1]
    if tail > 0:
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, tail)])
    rows = z[..., : Q * hop].reshape(z.shape[:-1] + (Q, hop))
    frames = jnp.concatenate(
        [rows[..., i: i + n_frames, :] for i in range(m)], axis=-1)
    return frames[..., :width]


def frame_signal(y: jnp.ndarray, params: STFTParams) -> jnp.ndarray:
    """Centered framing with reflect padding: [..., T] -> [..., frames, n_fft]."""
    n_fft, hop = params.n_fft, params.hop_length
    pad = n_fft // 2
    pad_width = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    y = jnp.pad(y, pad_width, mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    return _frame_rows(y, n_fft, hop, n_frames)


def stft(y: jnp.ndarray, params: STFTParams) -> jnp.ndarray:
    """Complex STFT: [..., T] -> [..., n_fft//2+1, frames] (librosa layout)."""
    window = jnp.asarray(hann_window(params.win_length, params.n_fft))
    frames = frame_signal(y, params) * window
    spec = jnp.fft.rfft(frames, n=params.n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def istft(spec: jnp.ndarray, params: STFTParams, length: int | None = None,
          use_pallas: bool = False) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add: [..., bins, frames] -> [..., T].

    ``use_pallas`` routes the overlap-add through the Pallas OLA kernel
    (ops/overlap_add.py) instead of an XLA scatter-add — the scatter is the
    slowest op in the Griffin-Lim loop on TPU.
    """
    n_fft, hop = params.n_fft, params.hop_length
    window = jnp.asarray(hann_window(params.win_length, params.n_fft))
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    n_frames = frames.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)
    batch_shape = frames.shape[:-2]

    # Both paths are scatter-free: the XLA fallback uses the static
    # hop-shift decomposition, the Pallas kernel fuses it into one VMEM pass
    # (see ops/overlap_add.py).
    if use_pallas:
        from ..ops.overlap_add import overlap_add_pallas
        fb = frames.reshape((-1, n_frames, n_fft))
        sig = overlap_add_pallas(fb, window, hop,
                                 interpret=jax.default_backend() != "tpu")
    else:
        from ..ops.overlap_add import overlap_add_reference
        fb = frames.reshape((-1, n_frames, n_fft))
        sig = overlap_add_reference(fb, window, hop)
    sig = sig.reshape(batch_shape + (out_len,))

    pad = n_fft // 2
    sig = sig[..., pad:]
    if length is not None:
        sig = sig[..., :length]
    else:
        sig = sig[..., : out_len - 2 * pad]
    return sig


# ----------------------------------------------------------------------------
# dB / normalization helpers (reference conventions)
# ----------------------------------------------------------------------------

def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_db(s: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    return jnp.clip((s - min_level_db) / -min_level_db, 0.0, 1.0)


def denormalize_db(s: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    return (jnp.clip(s, 0.0, 1.0) * -min_level_db) + min_level_db


# ----------------------------------------------------------------------------
# Spectrograms (normalized dB features, reference pipeline order)
# ----------------------------------------------------------------------------

def linear_spectrogram(y: jnp.ndarray, params: STFTParams, *, preemph: float,
                       ref_level_db: float, min_level_db: float) -> jnp.ndarray:
    """Waveform -> normalized linear spectrogram [..., bins, frames]."""
    d = stft(preemphasis(y, preemph), params)
    s = amp_to_db(jnp.abs(d)) - ref_level_db
    return normalize_db(s, min_level_db)


def mel_spectrogram(y: jnp.ndarray, params: STFTParams, *, sample_rate: int,
                    num_mels: int, preemph: float, ref_level_db: float,
                    min_level_db: float) -> jnp.ndarray:
    """Waveform -> normalized mel spectrogram [..., num_mels, frames]."""
    d = stft(preemphasis(y, preemph), params)
    basis = jnp.asarray(mel_basis(sample_rate, params.n_fft, num_mels))
    mel = jnp.einsum("mf,...ft->...mt", basis, jnp.abs(d))
    s = amp_to_db(mel) - ref_level_db
    return normalize_db(s, min_level_db)


def spectrogram_targets(y: jnp.ndarray, params: STFTParams, *,
                        sample_rate: int, num_mels: int, preemph: float,
                        ref_level_db: float, min_level_db: float,
                        n_frames: int | None = None,
                        precision=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Waveform [..., S] -> (mel [..., F, num_mels], linear [..., F, bins])
    normalized training targets in ONE pass, frame-major (the [B, T, bins]
    layout the model trains on — preprocess computes the same features
    offline and transposes; data/preprocess.py process_utterance).

    Built for IN-GRAPH target derivation inside the train step
    (``train.targets_from_wav``): FFT-free — the forward transform is the
    window-support DFT matmul pair at ``Precision.HIGHEST`` (the axon
    client's complex-FFT executable is unimplemented AND poisons the
    process on failure; f32-at-bf16 MXU rounding would put ~1e-3 noise on
    dB targets) — so the magnitudes match the offline rfft to f32
    round-off.  The mel projection shares the |STFT| instead of paying a
    second analysis pass like the offline (spectrogram, melspectrogram)
    pair."""
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    yp = preemphasis(y, preemph)
    # frame ONLY the window support (win_length of n_fft samples — the
    # zero-windowed columns never reach the support-sliced DFT): frame k's
    # support starts at k·hop + lpad in the center-padded signal, so
    # framing the lpad-shifted padded signal at width win_length gives it
    # directly, materializing ~half the bytes of full-n_fft framing
    n_fft, hop, win = params.n_fft, params.hop_length, params.win_length
    pad = n_fft // 2
    lpad = (n_fft - win) // 2
    y_pad = jnp.pad(yp, [(0, 0)] * (yp.ndim - 1) + [(pad, pad)],
                    mode="reflect")
    total = 1 + (y_pad.shape[-1] - n_fft) // hop
    n_keep = total if n_frames is None else min(n_frames, total)
    sup = _frame_rows(y_pad[..., lpad:], win, hop, n_keep)
    re, im = _dft_win(sup, params.n_fft, jnp.float32, precision=precision,
                      win_length=params.win_length)
    mag = jnp.sqrt(re * re + im * im)            # [..., F, bins]
    linear = normalize_db(amp_to_db(mag) - ref_level_db, min_level_db)
    basis = jnp.asarray(mel_basis(sample_rate, params.n_fft, num_mels))
    melmag = jnp.einsum("...fb,mb->...fm", mag, basis, precision=precision)
    mel = normalize_db(amp_to_db(melmag) - ref_level_db, min_level_db)
    return mel, linear


# ----------------------------------------------------------------------------
# DFT-as-matmul transforms (MXU path for the Griffin-Lim loop)
#
# XLA's TPU FFT runs on the VPU and dominates Griffin-Lim wall time.  A
# 2048-point DFT expressed as [frames, n_fft] × [n_fft, bins] matmuls costs
# ~190× the FLOPs of an FFT but runs on the MXU at bf16 — measured ~5-10×
# faster end-to-end.  Griffin-Lim re-imposes the target magnitude every
# iteration, so per-iteration bf16 transform noise does not accumulate.
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _dft_matrices(n_fft: int):
    """(C [n_fft, bins], S [n_fft, bins], iC [bins, n_fft], iS [bins, n_fft])
    such that re = x@C, im = x@S and x = re@iC + im@iS (== rfft/irfft)."""
    bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    C = np.cos(ang)
    S = -np.sin(ang)
    w = np.full((bins,), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    iC = (w[:, None] * C.T) / n_fft
    iS = (w[:, None] * S.T) / n_fft
    return (C.astype(np.float32), S.astype(np.float32),
            iC.astype(np.float32), iS.astype(np.float32))


def _dft(frames: jnp.ndarray, n_fft: int, dtype,
         precision=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., F, n_fft] -> (re, im) each [..., F, bins], MXU matmuls."""
    C, S, _, _ = _dft_matrices(n_fft)
    f = frames.astype(dtype)
    mm = functools.partial(jnp.matmul, precision=precision,
                           preferred_element_type=jnp.float32)
    re = mm(f, jnp.asarray(C, dtype))
    im = mm(f, jnp.asarray(S, dtype))
    return re, im


def _idft(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, dtype,
          precision=None) -> jnp.ndarray:
    """(re, im) [..., F, bins] -> frames [..., F, n_fft]."""
    _, _, iC, iS = _dft_matrices(n_fft)
    mm = functools.partial(jnp.matmul, precision=precision,
                           preferred_element_type=jnp.float32)
    return (mm(re.astype(dtype), jnp.asarray(iC, dtype))
            + mm(im.astype(dtype), jnp.asarray(iS, dtype)))


# ----------------------------------------------------------------------------
# Window-support DFT matrices (the Griffin-Lim fast path)
#
# The Hann window is ``win_length`` samples zero-padded to ``n_fft``
# (reference util/audio.py: 50 ms window, 2048-point FFT → 1000 of 2048
# samples nonzero).  Every frame entering the forward DFT has been windowed
# and every frame leaving the inverse DFT gets windowed by the OLA, so the
# zero-pad columns of the DFT matrices are pure wasted MXU work — >2× of
# the Griffin-Lim matmul FLOPs at the reference geometry.  These matrices
# restrict both transforms to the support: the analysis window is folded
# into the forward matrix rows and the inverse matrix is sliced to the
# support columns.  Exact (not approximate): the dropped terms are
# multiplications by zero.
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _dft_win_matrices(n_fft: int, win_length: int):
    """(Cw [win, bins], Sw [win, bins], iCw [bins, win], iSw [bins, win])
    such that re = x_sup@Cw, im = x_sup@Sw equals the windowed full-frame
    rfft, and re@iCw + im@iSw is the irfft sliced to the window support
    and PRE-multiplied by the synthesis window — the OLA then only
    accumulates and normalizes, never re-reading the frames to window
    them (one fewer full pass over the dominant [.., F, win] tensor per
    Griffin-Lim iteration)."""
    C, S, iC, iS = _dft_matrices(n_fft)
    lpad = (n_fft - win_length) // 2
    sl = slice(lpad, lpad + win_length)
    w = hann_window(win_length, n_fft)[sl]
    return ((w[:, None] * C[sl]).astype(np.float32),
            (w[:, None] * S[sl]).astype(np.float32),
            (iC[:, sl] * w[None, :]).astype(np.float32),
            (iS[:, sl] * w[None, :]).astype(np.float32))


def _dft_win(frames: jnp.ndarray, n_fft: int, dtype, precision=None, *,
             win_length: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """UNwindowed support frames [..., F, win] -> (re, im) [..., F, bins].

    During bf16 fast iterations the matmul OUTPUT is bf16 too (MXU still
    accumulates f32 internally; this is the same rounding as an explicit
    downcast) so no [.., bins]-sized f32 intermediate ever hits HBM.
    """
    Cw, Sw, _, _ = _dft_win_matrices(n_fft, win_length)
    out_t = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    f = frames.astype(dtype)
    mm = functools.partial(jnp.matmul, precision=precision,
                           preferred_element_type=out_t)
    return mm(f, jnp.asarray(Cw, dtype)), mm(f, jnp.asarray(Sw, dtype))


def _idft_win(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, dtype,
              precision=None, *, win_length: int) -> jnp.ndarray:
    """(re, im) [..., F, bins] -> UNwindowed support frames [..., F, win]."""
    _, _, iCw, iSw = _dft_win_matrices(n_fft, win_length)
    out_t = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    mm = functools.partial(jnp.matmul, precision=precision,
                           preferred_element_type=out_t)
    return (mm(re.astype(dtype), jnp.asarray(iCw, dtype))
            + mm(im.astype(dtype), jnp.asarray(iSw, dtype)))


# ----------------------------------------------------------------------------
# Cooley-Tukey factorized DFT-as-matmul (n_fft = N1*N2, ~10× fewer FLOPs)
#
# The direct DFT matmul costs 2·n_fft·bins MACs per frame per direction.
# Factoring n_fft = N1·N2 (radix decomposition, still all-matmul → MXU)
# drops that to ~N1²·N2 + N1·N2² with two cheap relayouts and a pointwise
# twiddle: for n_fft=2048 (N1=64, N2=32) ≈ 10.5× fewer FLOPs per
# Griffin-Lim iteration at identical f32 accuracy.
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _ct_factors(n_fft: int) -> tuple[int, int]:
    """Split n_fft = N1 * N2 with N1 ≥ N2, both powers of two."""
    log2 = n_fft.bit_length() - 1
    assert 1 << log2 == n_fft, f"n_fft {n_fft} must be a power of two for CT"
    n1 = 1 << ((log2 + 1) // 2)
    return n1, n_fft // n1


@functools.lru_cache(maxsize=4)
def _ct_matrices(n_fft: int):
    """Constant matrices for the factorized rfft/irfft (see _dft_ct)."""
    N1, N2 = _ct_factors(n_fft)
    N2h = N2 // 2 + 1           # k2 range covering all rfft bins
    # forward stage 1: DFT_N1 over the a axis (x real)
    a = np.arange(N1)
    k1 = np.arange(N1)
    ang1 = 2.0 * np.pi * np.outer(a, k1) / N1
    C1, S1 = np.cos(ang1), -np.sin(ang1)                    # [N1(a), N1(k1)]
    # forward twiddle W[b, k1] = exp(-2πi b k1 / n_fft)
    b = np.arange(N2)
    angw = 2.0 * np.pi * np.outer(b, k1) / n_fft
    Wre, Wim = np.cos(angw), -np.sin(angw)                  # [N2(b), N1(k1)]
    # forward stage 2: DFT_N2 over b, outputs k2 ∈ [0, N2h)
    k2 = np.arange(N2h)
    ang2 = 2.0 * np.pi * np.outer(b, k2) / N2
    C2, S2 = np.cos(ang2), -np.sin(ang2)                    # [N2(b), N2h(k2)]

    # inverse: x[32q+s] = Re Σ_k X̃[k] e^{+2πi nk/N};  k = k1 + N1·k2
    bins = n_fft // 2 + 1
    kflat = (k2[:, None] * N1 + k1[None, :])                # [N2h, N1]
    w = np.where((kflat == 0) | (kflat == n_fft // 2), 1.0, 2.0)
    w = np.where(kflat > n_fft // 2, 0.0, w) / n_fft        # fold 1/N + sym
    s = np.arange(N2)
    angi2 = 2.0 * np.pi * np.outer(k2, s) / N2
    F2re, F2im = np.cos(angi2), np.sin(angi2)               # [N2h(k2), N2(s)]
    angit = 2.0 * np.pi * np.outer(k1, s) / n_fft
    Tre, Tim = np.cos(angit), np.sin(angit)                 # [N1(k1), N2(s)]
    q = np.arange(N1)
    angi1 = 2.0 * np.pi * np.outer(q, k1) / N1
    E1re, E1im = np.cos(angi1), np.sin(angi1)               # [N1(q), N1(k1)]
    f32 = lambda x: x.astype(np.float32)
    return (f32(C1), f32(S1), f32(Wre), f32(Wim), f32(C2), f32(S2),
            f32(w), f32(F2re), f32(F2im), f32(Tre), f32(Tim),
            f32(E1re), f32(E1im))


def _dft_ct(frames: jnp.ndarray, n_fft: int, dtype,
            precision=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Factorized rfft: [..., F, n_fft] -> (re, im) each [..., F, bins]."""
    N1, N2 = _ct_factors(n_fft)
    N2h = N2 // 2 + 1
    bins = n_fft // 2 + 1
    C1, S1, Wre, Wim, C2, S2 = [jnp.asarray(m, dtype)
                                for m in _ct_matrices(n_fft)[:6]]
    mm = functools.partial(jnp.matmul, precision=precision,
                           preferred_element_type=jnp.float32)
    # x[N2·a + b] -> [..., b, a]
    x = frames.astype(dtype).reshape(frames.shape[:-1] + (N1, N2))
    x = jnp.swapaxes(x, -1, -2)
    yre, yim = mm(x, C1), mm(x, S1)                       # [..., b, k1]
    wre, wim = jnp.asarray(Wre, jnp.float32), jnp.asarray(Wim, jnp.float32)
    zre = yre * wre - yim * wim
    zim = yre * wim + yim * wre
    zre = jnp.swapaxes(zre, -1, -2).astype(dtype)          # [..., k1, b]
    zim = jnp.swapaxes(zim, -1, -2).astype(dtype)
    xre = mm(zre, C2) - mm(zim, S2)                        # [..., k1, k2]
    xim = mm(zre, S2) + mm(zim, C2)
    # flat bin index k = k2·N1 + k1 → axes [k2, k1] then flatten
    xre = jnp.swapaxes(xre, -1, -2).reshape(frames.shape[:-1] + (N2h * N1,))
    xim = jnp.swapaxes(xim, -1, -2).reshape(frames.shape[:-1] + (N2h * N1,))
    return xre[..., :bins], xim[..., :bins]


def _idft_ct(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, dtype,
             precision=None) -> jnp.ndarray:
    """Factorized irfft: (re, im) [..., F, bins] -> frames [..., F, n_fft]."""
    N1, N2 = _ct_factors(n_fft)
    N2h = N2 // 2 + 1
    bins = n_fft // 2 + 1
    mats = _ct_matrices(n_fft)
    w = jnp.asarray(mats[6], jnp.float32)                  # [N2h, N1]
    F2re, F2im, Tre, Tim, E1re, E1im = [jnp.asarray(m, dtype)
                                        for m in mats[7:]]
    mm = functools.partial(jnp.matmul, precision=precision,
                           preferred_element_type=jnp.float32)
    pad = N2h * N1 - bins
    shape = re.shape[:-1] + (N2h, N1)
    xre = (jnp.pad(re, [(0, 0)] * (re.ndim - 1) + [(0, pad)]).reshape(shape)
           * w)
    xim = (jnp.pad(im, [(0, 0)] * (im.ndim - 1) + [(0, pad)]).reshape(shape)
           * w)
    xre = jnp.swapaxes(xre, -1, -2).astype(dtype)          # [..., k1, k2]
    xim = jnp.swapaxes(xim, -1, -2).astype(dtype)
    ure = mm(xre, F2re) - mm(xim, F2im)                    # [..., k1, s]
    uim = mm(xre, F2im) + mm(xim, F2re)
    tre = jnp.asarray(Tre, jnp.float32)
    tim = jnp.asarray(Tim, jnp.float32)
    vre = (ure * tre - uim * tim).astype(dtype)
    vim = (ure * tim + uim * tre).astype(dtype)
    # x[q, s] = Σ_k1 E1[q,k1]·V[k1,s], real part only
    out = mm(E1re, vre) - mm(E1im, vim)                    # [..., q, s]
    return out.reshape(re.shape[:-1] + (n_fft,))


# ----------------------------------------------------------------------------
# Griffin-Lim
# ----------------------------------------------------------------------------

def griffin_lim(magnitude: jnp.ndarray, params: STFTParams, n_iters: int,
                key: jax.Array | None = None, use_pallas: bool = False,
                method: str = "dft_f32", momentum: float = 0.0) -> jnp.ndarray:
    """Phase reconstruction: magnitude [..., bins, frames] -> waveform.

    Reference: ``util/audio.py:_griffin_lim`` — random phase init, then
    ``n_iters`` rounds of istft→stft phase re-estimation.  The whole loop is
    a ``lax.fori_loop``, fully on-device (SURVEY.md §3.3 rebuild note).

    Methods are ``"<algo>_<prec>"``:

    * algo ``dft`` — direct DFT matmuls on the MXU; ``ct`` — Cooley-Tukey
      factorized DFT (n_fft = N1·N2 two-stage matmuls, ~10× fewer FLOPs
      at the same accuracy; requires power-of-two n_fft).
    * prec ``f32`` — HIGHEST MXU precision (bf16x6 passes, f32-accurate);
      ``hi`` — HIGH (bf16x3, ~2× faster, ~1e-6 relative error);
      ``bf16`` — fastest, loses quiet spectral bins to bf16 rounding.

    ``"fft"`` uses XLA's FFT (classic formulation, slow on TPU).
    The default is set in config.AudioConfig.gl_method.

    ``momentum`` > 0 enables fast Griffin-Lim (Perraudin et al. 2013,
    PAPERS.md): the projected spectrum is extrapolated by
    ``t_n + momentum·(t_n − t_{n-1})`` before inversion, which reaches
    plain-GL quality in roughly half the iterations (0.99 is the usual
    value).  ``momentum=0`` is exactly the reference formulation
    (util/audio.py:_griffin_lim).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    mom = momentum / (1.0 + momentum) if momentum > 0.0 else 0.0
    if method == "fft":
        angles = jax.random.uniform(key, magnitude.shape, minval=-math.pi,
                                    maxval=math.pi)
        phase = jnp.exp(1j * angles.astype(jnp.float32))
        s_complex = magnitude.astype(jnp.complex64) * phase
        y = istft(s_complex, params, use_pallas=use_pallas)

        def body(_, carry):
            y, prev = carry
            est = stft(y, params)
            acc = est - mom * prev                    # fast-GL extrapolation
            phase = acc / jnp.maximum(jnp.abs(acc), 1e-8)
            y = istft(magnitude.astype(jnp.complex64) * phase, params,
                      use_pallas=use_pallas)
            return y, est

        y, _ = jax.lax.fori_loop(0, n_iters, body,
                                 (y, jnp.zeros_like(s_complex)))
        return y

    algo, _, prec = method.partition("_")
    n_is_pow2 = params.n_fft & (params.n_fft - 1) == 0
    if algo == "ct" and not n_is_pow2:
        algo = "dft"  # CT factorization needs power-of-two n_fft
    assert algo in ("dft", "ct") and prec in ("f32", "hi", "bf16", "mix"), \
        method
    # "mix": early iterations in raw bf16 (the phase estimate is far from
    # converged — extra mantissa bits are wasted there), final POLISH_ITERS
    # at HIGH (bf16x3) to converge the fine structure.  3 polish iterations
    # quality-match 6 on both the speech and harmonic gates (normalized-dB
    # L1 0.0232431 vs 0.0232435 / 0.0086485 vs 0.0086483) at 19% less
    # matmul work; each HIGH iteration costs ~3 bf16 ones.
    POLISH_ITERS = 3
    dtype = jnp.bfloat16 if prec in ("bf16", "mix") else jnp.float32
    precision = {"f32": jax.lax.Precision.HIGHEST,
                 "hi": jax.lax.Precision.HIGH,
                 "bf16": None, "mix": None}[prec]
    n_fft, hop = params.n_fft, params.hop_length
    # Window-support layout: when win_length < n_fft the frames carried
    # through the loop are only the window support (the analysis window is
    # folded into the forward DFT matrices, the inverse matrices are sliced
    # to the support — see _dft_win_matrices), cutting the dominant MXU
    # matmuls AND the OLA/framing HBM traffic by n_fft/win_length (>2× at
    # the reference 2048/1000 geometry).  The Pallas fused-GL / OLA kernels
    # and the ct factorization are built around full n_fft frames, so those
    # paths keep the legacy layout.
    windowed = (algo == "dft" and not use_pallas
                and params.win_length < n_fft)
    if windowed:
        fwd = functools.partial(_dft_win, win_length=params.win_length)
        inv = functools.partial(_idft_win, win_length=params.win_length)
        Wn = params.win_length
        lpad = (n_fft - Wn) // 2
        window = jnp.asarray(hann_window(params.win_length, Wn))
    else:
        fwd = _dft_ct if algo == "ct" else _dft
        inv = _idft_ct if algo == "ct" else _idft
        Wn, lpad = n_fft, 0
        window = jnp.asarray(hann_window(params.win_length, n_fft))
    rpad = n_fft - Wn - lpad
    magT = jnp.swapaxes(magnitude, -1, -2).astype(jnp.float32)  # [.., F, bins]
    batch_shape = magT.shape[:-2]
    F = magT.shape[-2]
    out_len = Wn + hop * (F - 1)
    from ..ops.overlap_add import overlap_add_pallas, overlap_add_reference

    # use_pallas routing: for dft/bf16 schedules the WHOLE fast-iteration
    # loop is one fused kernel (ops/gl_iteration.py) and the remaining OLAs
    # stay on the XLA static-shift path (measured faster than the
    # standalone Pallas OLA: vocode 0.188 s vs 0.193 s — BASELINE.md r2);
    # otherwise use_pallas falls back to the standalone Pallas OLA.
    fuse_fast = (use_pallas and algo == "dft" and prec in ("bf16", "mix"))
    ola_pallas = use_pallas and not fuse_fast

    def ola(re, im, dtype=dtype, precision=precision):
        # The [B̃, F, n_fft] frame tensors dominate HBM traffic; during
        # bf16 iterations the inverse-transform output stays bf16 into the
        # overlap-add.  XLA path: window is cast to the frame dtype, so the
        # windowed accumulation AND the window-square-norm division run in
        # that dtype (quality-gated by the GL regression tests); the result
        # upcasts to f32 after.  Pallas path: bf16 frames streamed into the
        # kernel, window/accumulation/norm always f32 in VMEM.
        frames = inv(re, im, n_fft, dtype, precision).astype(dtype)
        fb = frames.reshape((-1, F, Wn))
        if ola_pallas:
            sig = overlap_add_pallas(fb, window, hop,
                                     interpret=jax.default_backend() != "tpu")
        else:
            sig = overlap_add_reference(fb, window.astype(dtype), hop,
                                        prewindowed=windowed)
        return sig.astype(jnp.float32)  # [prod(batch), out_len] — padded

    def frame(sig, dtype=jnp.float32):
        """Un-centered framing of the padded signal: m static slices.

        Windowed layout: the analysis window is already folded into the
        forward DFT matrices, so the support frames leave here unwindowed.
        """
        m = -(-Wn // hop)
        Q = F + m
        tail = Q * hop - out_len
        s = jnp.pad(sig, ((0, 0), (0, tail))).astype(dtype)
        rows = s.reshape(s.shape[0], Q, hop)
        frames = jnp.concatenate(
            [rows[:, i: i + F, :] for i in range(m)], axis=-1)[..., :Wn]
        return frames if windowed else frames * window.astype(dtype)

    angles = jax.random.uniform(key, magT.shape, minval=-math.pi,
                                maxval=math.pi)
    magT_flat = magT.reshape((-1, F, magT.shape[-1]))
    a = angles.reshape(magT_flat.shape)
    sig = ola(magT_flat * jnp.cos(a), magT_flat * jnp.sin(a))

    def make_body(dtype, precision):
        # During bf16 fast iterations the whole spectral step — momentum
        # extrapolation, |a|, magnitude projection, and the carried
        # momentum state — runs in bf16 too: the [B̃, F, bins] spectra are
        # the dominant elementwise HBM traffic and GL reimposes the target
        # magnitude every iteration, so per-iteration phase rounding does
        # not accumulate (quality-gated vs the reference formulation on
        # the harmonic + speech signals).  Polish iterations stay f32.
        sdt = dtype if dtype == jnp.bfloat16 else jnp.float32
        magT_s = magT_flat.astype(sdt)

        def body(_, carry):
            sig, pre, pim = carry
            re, im = fwd(frame(sig, dtype), n_fft, dtype, precision)
            re = re.astype(sdt)
            im = im.astype(sdt)
            # fast-GL extrapolation (momentum=0 → plain reference GL)
            are = re - jnp.asarray(mom, sdt) * pre
            aim = im - jnp.asarray(mom, sdt) * pim
            scale = magT_s / jnp.maximum(
                jnp.sqrt(are * are + aim * aim), 1e-8)
            return ola(are * scale, aim * scale, dtype, precision), re, im
        return body

    z = jnp.zeros_like(magT_flat)
    carry = (sig, z, z)
    if prec == "mix":
        n_fast = max(n_iters - POLISH_ITERS, 0)
        if fuse_fast and n_fast > 0:
            from ..ops.gl_iteration import gl_fast_iterations_pallas
            sig0, _, _ = carry
            wf0 = frame(sig0, jnp.bfloat16)
            sre, sim, pre, pim = gl_fast_iterations_pallas(
                wf0, magT_flat, window.astype(jnp.float32), hop, n_fast,
                mom, interpret=jax.default_backend() != "tpu")
            carry = (ola(sre, sim, jnp.float32,
                         jax.lax.Precision.HIGH), pre, pim)
        elif n_fast > 0:
            carry = (carry[0], carry[1].astype(jnp.bfloat16),
                     carry[2].astype(jnp.bfloat16))
            carry = jax.lax.fori_loop(0, n_fast,
                                      make_body(jnp.bfloat16, None), carry)
            carry = (carry[0], carry[1].astype(jnp.float32),
                     carry[2].astype(jnp.float32))
        carry = jax.lax.fori_loop(
            0, n_iters - n_fast,
            make_body(jnp.float32, jax.lax.Precision.HIGH), carry)
    elif fuse_fast:
        from ..ops.gl_iteration import gl_fast_iterations_pallas
        sig0, _, _ = carry
        wf0 = frame(sig0, jnp.bfloat16)
        sre, sim, pre, pim = gl_fast_iterations_pallas(
            wf0, magT_flat, window.astype(jnp.float32), hop, n_iters,
            mom, interpret=jax.default_backend() != "tpu")
        carry = (ola(sre, sim), pre, pim)
    else:
        sdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
        carry = (carry[0], carry[1].astype(sdt), carry[2].astype(sdt))
        carry = jax.lax.fori_loop(0, n_iters, make_body(dtype, precision),
                                  carry)
    sig, _, _ = carry
    # crop the centered-analysis padding; in the windowed layout the OLA
    # signal starts lpad samples into the full-frame coordinate system
    y = sig[..., n_fft // 2 - lpad: out_len - (n_fft // 2 - rpad)]
    return y.reshape(batch_shape + (y.shape[-1],))


def inv_linear_spectrogram(spec: jnp.ndarray, params: STFTParams, *,
                           preemph: float, ref_level_db: float,
                           min_level_db: float, power: float,
                           gl_iters: int, key: jax.Array | None = None,
                           use_pallas: bool = False,
                           gl_method: str = "dft_f32",
                           gl_momentum: float = 0.0) -> jnp.ndarray:
    """Normalized linear spectrogram [..., bins, frames] -> waveform."""
    s = db_to_amp(denormalize_db(spec, min_level_db) + ref_level_db)
    y = griffin_lim(jnp.power(s, power), params, gl_iters, key,
                    use_pallas=use_pallas, method=gl_method,
                    momentum=gl_momentum)
    return inv_preemphasis(y, preemph)
