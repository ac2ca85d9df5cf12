"""Audio API bound to an :class:`AudioConfig`.

Presents the same surface as the reference's ``util/audio.py`` (SURVEY.md
§2.3) — ``load_wav / save_wav / spectrogram / melspectrogram /
inv_spectrogram / find_endpoint`` — but computation is the jittable jnp DSP
in :mod:`.dsp`; only wav file IO touches the host.
"""

from __future__ import annotations

import io

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

from . import dsp
from .dsp import STFTParams

__all__ = ["AudioProcessor", "dsp", "STFTParams"]


class AudioProcessor:
    """Config-bound audio frontend/backend."""

    def __init__(self, audio_cfg):
        self.cfg = audio_cfg
        self.params = STFTParams.from_config(audio_cfg)
        self._spectrogram = jax.jit(self._spectrogram_impl)
        self._melspectrogram = jax.jit(self._melspectrogram_impl)
        self._inv_spectrogram = jax.jit(self._inv_spectrogram_impl)

    # -- IO ------------------------------------------------------------------

    def load_wav(self, path: str) -> np.ndarray:
        sr, data = wavfile.read(path)
        if sr != self.cfg.sample_rate:
            raise ValueError(
                f"{path}: sample rate {sr} != configured {self.cfg.sample_rate}")
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim > 1:
            data = data.mean(axis=1)
        return data

    def save_wav(self, wav: np.ndarray, path_or_buf) -> None:
        wav = np.asarray(wav, dtype=np.float32)
        peak = max(0.01, float(np.abs(wav).max()))
        scaled = (wav * (32767 / peak)).astype(np.int16)
        wavfile.write(path_or_buf, self.cfg.sample_rate, scaled)

    def wav_bytes(self, wav: np.ndarray) -> bytes:
        buf = io.BytesIO()
        self.save_wav(wav, buf)
        return buf.getvalue()

    # -- analysis ------------------------------------------------------------

    def _spectrogram_impl(self, y):
        return dsp.linear_spectrogram(
            y, self.params, preemph=self.cfg.preemphasis,
            ref_level_db=self.cfg.ref_level_db, min_level_db=self.cfg.min_level_db)

    def _melspectrogram_impl(self, y):
        return dsp.mel_spectrogram(
            y, self.params, sample_rate=self.cfg.sample_rate,
            num_mels=self.cfg.num_mels, preemph=self.cfg.preemphasis,
            ref_level_db=self.cfg.ref_level_db, min_level_db=self.cfg.min_level_db)

    def spectrogram(self, y) -> np.ndarray:
        """Waveform [T] -> normalized linear spectrogram [num_freq, frames]."""
        return np.asarray(self._spectrogram(jnp.asarray(y)))

    def melspectrogram(self, y) -> np.ndarray:
        """Waveform [T] -> normalized mel spectrogram [num_mels, frames]."""
        return np.asarray(self._melspectrogram(jnp.asarray(y)))

    # -- synthesis -----------------------------------------------------------

    def _inv_spectrogram_impl(self, spec, key):
        return dsp.inv_linear_spectrogram(
            spec, self.params, preemph=self.cfg.preemphasis,
            ref_level_db=self.cfg.ref_level_db, min_level_db=self.cfg.min_level_db,
            power=self.cfg.power, gl_iters=self.cfg.griffin_lim_iters,
            key=key, gl_method=self.cfg.gl_method,
            gl_momentum=self.cfg.gl_momentum)

    def inv_spectrogram(self, spec, seed: int = 0) -> np.ndarray:
        """Normalized linear spectrogram [num_freq, frames] -> waveform."""
        key = jax.random.PRNGKey(seed)
        return np.asarray(self._inv_spectrogram(jnp.asarray(spec), key))

    # -- endpointing ---------------------------------------------------------

    def find_endpoint(self, wav: np.ndarray) -> int:
        """Index of the first long trailing silence (reference find_endpoint)."""
        window_length = int(self.cfg.sample_rate * self.cfg.min_silence_sec)
        hop = window_length // 4
        threshold = float(dsp.db_to_amp(
            jnp.asarray(self.cfg.silence_threshold_db)))
        wav = np.asarray(wav)
        for x in range(hop, len(wav) - window_length, hop):
            if np.max(np.abs(wav[x: x + window_length])) < threshold:
                return x + hop
        return len(wav)
