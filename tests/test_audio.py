"""Audio DSP tests: STFT round-trips, mel basis, Griffin-Lim SNR (SURVEY.md §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tacotron_multispeaker_tpu.audio import AudioProcessor, dsp
from tacotron_multispeaker_tpu.audio.dsp import STFTParams
from tacotron_multispeaker_tpu.config import AudioConfig


TINY = AudioConfig(num_freq=513, sample_rate=22050, griffin_lim_iters=30)
PARAMS = STFTParams.from_config(TINY)


def _tone(sr=22050, dur=0.5, f=440.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_stft_params():
    assert PARAMS.n_fft == 1024
    assert PARAMS.hop_length == int(0.0125 * 22050)
    # 50 ms at 22050 Hz is 1102 samples — clamped to n_fft=1024
    assert PARAMS.win_length == 1024


def test_stft_istft_roundtrip():
    y = _tone()
    spec = dsp.stft(jnp.asarray(y), PARAMS)
    assert spec.shape[0] == 513
    y2 = np.asarray(dsp.istft(spec, PARAMS, length=len(y)))
    err = np.abs(y2 - y)[PARAMS.n_fft: -PARAMS.n_fft]
    assert err.max() < 1e-3


def test_stft_matches_scipy():
    """Cross-check against scipy.signal.stft with equivalent settings."""
    from scipy import signal as sps
    y = np.random.RandomState(0).randn(8192).astype(np.float32)
    ours = np.asarray(jnp.abs(dsp.stft(jnp.asarray(y), PARAMS)))
    win = dsp.hann_window(PARAMS.win_length, PARAMS.n_fft)
    # replicate our centering (reflect pad by n_fft//2) so frames align 1:1
    ypad = np.pad(y, PARAMS.n_fft // 2, mode="reflect")
    _, _, Z = sps.stft(ypad, window=win, nperseg=PARAMS.n_fft,
                       noverlap=PARAMS.n_fft - PARAMS.hop_length,
                       boundary=None, padded=False)
    Z = np.abs(Z) * win.sum()  # undo scipy's 1/win.sum() scaling
    common = min(Z.shape[1], ours.shape[1])
    assert np.allclose(ours[:, :common], Z[:, :common],
                       atol=1e-3 * Z.max(), rtol=1e-3)


def test_preemphasis_roundtrip():
    y = jnp.asarray(_tone())
    pre = dsp.preemphasis(y, 0.97)
    back = np.asarray(dsp.inv_preemphasis(pre, 0.97))
    assert np.allclose(back, np.asarray(y), atol=1e-4)


def test_inv_preemphasis_matches_sequential():
    y = np.random.RandomState(1).randn(500).astype(np.float32)
    fast = np.asarray(dsp.inv_preemphasis(jnp.asarray(y), 0.97))
    slow = np.zeros_like(y)
    acc = 0.0
    for i in range(len(y)):
        acc = y[i] + 0.97 * acc
        slow[i] = acc
    assert np.allclose(fast, slow, atol=1e-3)


def test_mel_basis_properties():
    basis = dsp.mel_basis(22050, 1024, 80)
    assert basis.shape == (80, 513)
    assert (basis >= 0).all()
    # every mel filter has some support
    assert (basis.sum(axis=1) > 0).all()
    # filters peak in increasing frequency order
    peaks = basis.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # Slaney mel: linear region below 1 kHz → equal spacing of first peaks
    assert peaks[0] < 10


def test_mel_hz_roundtrip():
    f = np.linspace(0, 11025, 100)
    back = dsp._mel_to_hz(dsp._hz_to_mel(f))
    assert np.allclose(back, f, rtol=1e-6, atol=1e-3)


def test_spectrogram_shapes_and_range():
    ap = AudioProcessor(TINY)
    y = _tone()
    lin = ap.spectrogram(y)
    mel = ap.melspectrogram(y)
    assert lin.shape[0] == 513
    assert mel.shape[0] == 80
    assert lin.shape[1] == mel.shape[1]
    assert lin.min() >= 0.0 and lin.max() <= 1.0
    assert mel.min() >= 0.0 and mel.max() <= 1.0
    # a 440 Hz tone has energy at bin 440/22050*1024 ≈ 20
    assert abs(int(np.argmax(lin.mean(axis=1))) - 20) <= 2


def test_griffin_lim_reconstruction_snr():
    """Analysis→Griffin-Lim→analysis preserves the magnitude spectrogram."""
    ap = AudioProcessor(TINY)
    y = _tone(dur=0.6)
    lin = ap.spectrogram(y)
    wav = ap.inv_spectrogram(lin)
    assert np.isfinite(wav).all()
    lin2 = ap.spectrogram(wav[: len(y)])
    frames = min(lin.shape[1], lin2.shape[1]) - 8
    a, b = lin[:, 4:frames], lin2[:, 4:frames]
    # normalized-dB-domain L1 below 0.05 ≈ good reconstruction
    assert np.abs(a - b).mean() < 0.05


def test_griffin_lim_batched():
    mag = jnp.ones((2, 513, 20)) * 0.01
    wav = dsp.griffin_lim(mag, PARAMS, 2)
    assert wav.shape[0] == 2
    assert np.isfinite(np.asarray(wav)).all()


def test_find_endpoint():
    ap = AudioProcessor(TINY)
    sr = TINY.sample_rate
    sig = np.concatenate([_tone(dur=0.5), np.zeros(2 * sr, np.float32)])
    ep = ap.find_endpoint(sig)
    assert 0.3 * sr < ep < 1.2 * sr


def test_wav_io_roundtrip(tmp_path):
    ap = AudioProcessor(TINY)
    y = _tone()
    p = str(tmp_path / "t.wav")
    ap.save_wav(y, p)
    y2 = ap.load_wav(p)
    assert y2.shape == y.shape
    assert np.allclose(y2 * np.abs(y).max() / np.abs(y2).max(), y, atol=1e-2)
    assert len(ap.wav_bytes(y)) > 44


def test_jit_dsp_no_host_roundtrip():
    """Full analysis chain jits as one function."""
    @jax.jit
    def chain(y):
        return dsp.mel_spectrogram(
            y, PARAMS, sample_rate=22050, num_mels=80, preemph=0.97,
            ref_level_db=20.0, min_level_db=-100.0)
    out = chain(jnp.asarray(_tone()))
    assert out.shape[0] == 80


def test_griffin_lim_dft_matches_fft_quality():
    """MXU DFT-matmul GL reconstructs as well as the FFT formulation."""
    if jax.default_backend() == "tpu":
        # the complex-FFT executable is unimplemented on the axon PJRT
        # client AND its failure poisons every later host<->device transfer
        # in the process (round-3 on-chip run: the 10 tests after this one
        # all died with UNIMPLEMENTED device_put).  The fft method is the
        # legacy non-TPU formulation; dft_* is the TPU path.
        pytest.skip("XLA FFT unimplemented on the axon PJRT client")
    ap = AudioProcessor(TINY)
    y = _tone(dur=0.6)
    lin = ap.spectrogram(y)
    s = dsp.db_to_amp(dsp.denormalize_db(jnp.asarray(lin), -100.0) + 20.0)
    mag = jnp.power(s, 1.5)
    key = jax.random.PRNGKey(0)
    results = {}
    for method in ["fft", "dft_f32"]:
        wav = dsp.inv_preemphasis(
            dsp.griffin_lim(mag, PARAMS, 30, key, method=method), 0.97)
        lin2 = ap.spectrogram(np.asarray(wav)[: len(y)])
        fr = min(lin.shape[1], lin2.shape[1]) - 8
        results[method] = np.abs(lin[:, 4:fr] - lin2[:, 4:fr]).mean()
    assert results["dft_f32"] < 0.02
    assert results["dft_f32"] < 3 * results["fft"] + 0.005


def test_ct_dft_matches_rfft():
    """Factorized Cooley-Tukey DFT == rfft/irfft (both directions)."""
    for n_fft in (128, 1024, 2048):
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(2, 3, n_fft).astype(np.float32))
        re, im = dsp._dft_ct(x, n_fft, jnp.float32,
                             jax.lax.Precision.HIGHEST)
        ref = jnp.fft.rfft(x, axis=-1)
        # keep the complex array on device: complex64 device->host transfer
        # is unimplemented in the axon PJRT client (round-3 on-chip run)
        scale = float(jnp.abs(ref).max())
        assert np.allclose(np.asarray(re), np.asarray(ref.real),
                           atol=1e-4 * scale)
        assert np.allclose(np.asarray(im), np.asarray(ref.imag),
                           atol=1e-4 * scale)
        back = dsp._idft_ct(re, im, n_fft, jnp.float32,
                            jax.lax.Precision.HIGHEST)
        assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_griffin_lim_ct_matches_dft_quality():
    """CT-factorized GL reconstructs as well as the direct DFT matmul GL."""
    ap = AudioProcessor(TINY)
    y = _tone(dur=0.6)
    lin = ap.spectrogram(y)
    s = dsp.db_to_amp(dsp.denormalize_db(jnp.asarray(lin), -100.0) + 20.0)
    mag = jnp.power(s, 1.5)
    key = jax.random.PRNGKey(0)
    results = {}
    for method in ["dft_f32", "ct_f32", "ct_hi"]:
        wav = dsp.inv_preemphasis(
            dsp.griffin_lim(mag, PARAMS, 30, key, method=method), 0.97)
        lin2 = ap.spectrogram(np.asarray(wav)[: len(y)])
        fr = min(lin.shape[1], lin2.shape[1]) - 8
        results[method] = np.abs(lin[:, 4:fr] - lin2[:, 4:fr]).mean()
    assert results["ct_f32"] < 0.02
    assert results["ct_hi"] < 0.02
    assert results["ct_f32"] < 1.5 * results["dft_f32"] + 0.005


def test_griffin_lim_momentum_accelerates():
    """Fast-GL (momentum) at 15 iters reconstructs at least as well as
    plain GL at 30 iters — the basis for halving the default budget."""
    ap = AudioProcessor(TINY)
    y = _tone(dur=0.6)
    lin = ap.spectrogram(y)
    s = dsp.db_to_amp(dsp.denormalize_db(jnp.asarray(lin), -100.0) + 20.0)
    mag = jnp.power(s, 1.5)
    key = jax.random.PRNGKey(0)

    def quality(n_iters, momentum):
        wav = dsp.inv_preemphasis(
            dsp.griffin_lim(mag, PARAMS, n_iters, key, method="dft_f32",
                            momentum=momentum), 0.97)
        lin2 = ap.spectrogram(np.asarray(wav)[: len(y)])
        fr = min(lin.shape[1], lin2.shape[1]) - 8
        return np.abs(lin[:, 4:fr] - lin2[:, 4:fr]).mean()

    plain30 = quality(30, 0.0)
    fast15 = quality(15, 0.99)
    assert fast15 < plain30 * 1.05 + 0.001, (fast15, plain30)
    assert fast15 < 0.02


def test_dft_matrices_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 128).astype(np.float32))
    re, im = dsp._dft(x, 128, jnp.float32)
    ref = jnp.fft.rfft(x, axis=-1)
    # on-chip, f32 MXU matmuls round at bf16 precision (CLAUDE.md)
    atol = 0.15 if jax.default_backend() == "tpu" else 1e-4
    assert np.allclose(np.asarray(re), np.asarray(ref.real), atol=atol)
    assert np.allclose(np.asarray(im), np.asarray(ref.imag), atol=atol)
    back = dsp._idft(re, im, 128, jnp.float32)
    atol_b = 5e-2 if jax.default_backend() == "tpu" else 1e-5
    assert np.allclose(np.asarray(back), np.asarray(x), atol=atol_b)


def test_griffin_lim_mix_matches_hi_quality():
    """Mixed-precision GL (bf16 iterations + HIGH polish) reconstructs as
    well as the all-HIGH schedule — the fast path used by default."""
    ap = AudioProcessor(TINY)
    y = _tone(dur=0.6)
    lin = ap.spectrogram(y)
    s = dsp.db_to_amp(dsp.denormalize_db(jnp.asarray(lin), -100.0) + 20.0)
    mag = jnp.power(s, 1.5)
    key = jax.random.PRNGKey(0)
    results = {}
    for method in ["dft_hi", "dft_mix"]:
        wav = dsp.inv_preemphasis(
            dsp.griffin_lim(mag, PARAMS, 30, key, method=method,
                            momentum=0.99), 0.97)
        lin2 = ap.spectrogram(np.asarray(wav)[: len(y)])
        fr = min(lin.shape[1], lin2.shape[1]) - 8
        results[method] = np.abs(lin[:, 4:fr] - lin2[:, 4:fr]).mean()
    assert results["dft_mix"] < 0.02
    assert results["dft_mix"] < 1.2 * results["dft_hi"] + 0.005


def _speech_like(sr=22050, text="the quick brown fox jumps over a lazy dog"):
    from tacotron_multispeaker_tpu.data.synthetic import synth_utterance
    return synth_utterance(text, speaker_id=1, sample_rate=sr)


def test_griffin_lim_defaults_match_reference_gl_on_speech():
    """Quality gate on SPEECH-LIKE audio (formant sequence, not a single
    harmonic): the default fast path (30 iters, dft_mix, momentum 0.99)
    reconstructs at least as well as the exact reference formulation
    (60 iters, plain GL, f32) on the same spectrogram."""
    ap = AudioProcessor(TINY)
    y = _speech_like()
    lin = ap.spectrogram(y)
    s = dsp.db_to_amp(dsp.denormalize_db(jnp.asarray(lin), -100.0) + 20.0)
    mag = jnp.power(s, 1.5)
    key = jax.random.PRNGKey(0)

    def recon_err(wav):
        lin2 = ap.spectrogram(np.asarray(wav)[: len(y)])
        fr = min(lin.shape[1], lin2.shape[1]) - 8
        return float(np.abs(lin[:, 4:fr] - lin2[:, 4:fr]).mean())

    from tacotron_multispeaker_tpu.config import AudioConfig
    default_iters = AudioConfig().griffin_lim_iters  # gate THE default
    fast = dsp.inv_preemphasis(
        dsp.griffin_lim(mag, PARAMS, default_iters, key, method="dft_mix",
                        momentum=0.99), 0.97)
    reference = dsp.inv_preemphasis(
        dsp.griffin_lim(mag, PARAMS, 60, key, method="dft_f32",
                        momentum=0.0), 0.97)
    err_fast, err_ref = recon_err(fast), recon_err(reference)
    assert np.isfinite(np.asarray(fast)).all()
    # the fast default must not lose quality vs the reference formulation
    assert err_fast <= err_ref + 0.002, (err_fast, err_ref)
    assert err_fast < 0.05, err_fast


def test_griffin_lim_pallas_ola_matches_xla_on_speech():
    """use_pallas OLA path (interpret on CPU) == XLA static-shift OLA for
    the full normalized-spectrogram inversion on speech-like input."""
    ap = AudioProcessor(TINY)
    y = _speech_like(text="pack my box with five dozen jugs")
    lin = jnp.asarray(ap.spectrogram(y))[None]  # [1, bins, frames]
    kw = dict(preemph=0.97, ref_level_db=20.0, min_level_db=-100.0,
              power=1.5, gl_iters=8, key=jax.random.PRNGKey(0),
              gl_method="dft_mix", gl_momentum=0.99)
    wav_x = dsp.inv_linear_spectrogram(lin, PARAMS, use_pallas=False, **kw)
    wav_p = dsp.inv_linear_spectrogram(lin, PARAMS, use_pallas=True, **kw)
    a, b = np.asarray(wav_x), np.asarray(wav_p)
    assert np.isfinite(b).all()
    # bf16 iterations dominate the tolerance; the two OLAs differ only in
    # where the f32 upcast happens
    assert np.abs(a - b).mean() < 5e-3 * max(np.abs(a).max(), 1e-6)


# ----------------------------------------------------------------------------
# Window-support DFT layout (win_length < n_fft, the default TPU geometry:
# n_fft=2048 / win=1000 at sr=20000 — reference util/audio.py 50 ms window)
# ----------------------------------------------------------------------------

WIN_PARAMS = STFTParams(n_fft=512, hop_length=80, win_length=320)


def test_windowed_istft_matches_full_frame():
    """The support-sliced inverse DFT + OLA equals the legacy full-frame
    formulation exactly (dropped columns are zeroed by the window)."""
    from tacotron_multispeaker_tpu.ops.overlap_add import overlap_add_reference
    n_fft, hop, win = WIN_PARAMS
    F, B = 40, 2
    lpad = (n_fft - win) // 2
    rpad = n_fft - win - lpad
    w_full = jnp.asarray(dsp.hann_window(win, n_fft))
    w_sup = jnp.asarray(dsp.hann_window(win, win))
    re = jax.random.normal(jax.random.PRNGKey(0), (B, F, n_fft // 2 + 1))
    im = jax.random.normal(jax.random.PRNGKey(1), (B, F, n_fft // 2 + 1))
    hi = jax.lax.Precision.HIGHEST

    fr_full = dsp._idft(re, im, n_fft, jnp.float32, hi)
    out_full = n_fft + hop * (F - 1)
    y_full = overlap_add_reference(fr_full, w_full, hop)[
        :, n_fft // 2: out_full - n_fft // 2]
    # _idft_win output is PRE-windowed (synthesis window folded into iCw)
    fr_w = dsp._idft_win(re, im, n_fft, jnp.float32, hi, win_length=win)
    out_w = win + hop * (F - 1)
    y_w = overlap_add_reference(fr_w, w_sup, hop, prewindowed=True)[
        :, n_fft // 2 - lpad: out_w - (n_fft // 2 - rpad)]
    assert y_full.shape == y_w.shape
    assert np.abs(np.asarray(y_full) - np.asarray(y_w)).max() < 1e-5


def test_windowed_forward_dft_matches_full_frame():
    """Folded-window forward DFT on support frames == window*frame rfft."""
    n_fft, hop, win = WIN_PARAMS
    lpad = (n_fft - win) // 2
    F, B = 30, 2
    sig = jax.random.normal(jax.random.PRNGKey(2),
                            (B, n_fft + hop * (F - 1)))
    w_full = jnp.asarray(dsp.hann_window(win, n_fft))
    hi = jax.lax.Precision.HIGHEST
    f_full = jnp.stack([sig[:, k * hop: k * hop + n_fft] for k in range(F)],
                       1) * w_full
    re1, im1 = dsp._dft(f_full, n_fft, jnp.float32, hi)
    f_sup = jnp.stack(
        [sig[:, lpad + k * hop: lpad + k * hop + win] for k in range(F)], 1)
    re2, im2 = dsp._dft_win(f_sup, n_fft, jnp.float32, hi, win_length=win)
    assert np.abs(np.asarray(re1 - re2)).max() < 1e-4
    assert np.abs(np.asarray(im1 - im2)).max() < 1e-4


def test_griffin_lim_windowed_quality():
    """End-to-end GL quality gate at win < n_fft (exercises the windowed
    layout, which TINY cannot — its win_length clamps to n_fft)."""
    cfg = AudioConfig(num_freq=257, sample_rate=8000, frame_length_ms=40.0,
                      frame_shift_ms=10.0)
    params = STFTParams.from_config(cfg)
    assert params.win_length < params.n_fft  # 320 < 512
    ap = AudioProcessor(cfg)
    y = _speech_like(sr=8000)
    lin = ap.spectrogram(y)
    s = dsp.db_to_amp(dsp.denormalize_db(jnp.asarray(lin), -100.0) + 20.0)
    mag = jnp.power(s, 1.5)
    wav = dsp.inv_preemphasis(
        dsp.griffin_lim(mag, params, 20, jax.random.PRNGKey(0),
                        method="dft_mix", momentum=0.99), 0.97)
    assert np.isfinite(np.asarray(wav)).all()
    lin2 = ap.spectrogram(np.asarray(wav)[: len(y)])
    fr = min(lin.shape[1], lin2.shape[1]) - 8
    err = float(np.abs(lin[:, 4:fr] - lin2[:, 4:fr]).mean())
    assert err < 0.05, err
