"""Loss functions (reference: models/tacotron.py add_loss — SURVEY.md §2.9).

Reference semantics: ``loss = L1(mel) + 0.5*mean(L1(linear)) +
0.5*mean(L1(linear)[:, :, :n_priority])`` where the priority band is
frequencies below ~3 kHz (i.e. low-frequency bins get double weight).  The
reference averages over padded frames too; here masking by true target
lengths is the default (config ``loss_masking``), with the unmasked mode
available for oracle parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def priority_bins(num_freq: int, sample_rate: int,
                  prioritize_hz: float = 3000.0) -> int:
    """Number of linear bins below the prioritized frequency."""
    return int(prioritize_hz / (sample_rate * 0.5) * num_freq)


def tacotron_loss(mel_out: jnp.ndarray, linear_out: jnp.ndarray,
                  mel_targets: jnp.ndarray, linear_targets: jnp.ndarray,
                  target_lengths: jnp.ndarray | None, *, num_freq: int,
                  sample_rate: int, prioritize_hz: float = 3000.0) -> dict:
    """Returns dict with mel_loss / linear_loss / loss (all scalar f32)."""
    mel_l1 = jnp.abs(mel_targets - mel_out)
    lin_l1 = jnp.abs(linear_targets - linear_out)
    n_prio = priority_bins(num_freq, sample_rate, prioritize_hz)

    if target_lengths is not None:
        T = mel_targets.shape[1]
        mask = (jnp.arange(T)[None, :] < target_lengths[:, None])[..., None]
        denom = jnp.maximum(jnp.sum(mask), 1)

        def masked_mean(x):
            return jnp.sum(jnp.where(mask, x, 0.0)) / (denom * x.shape[-1])

        mel_loss = masked_mean(mel_l1)
        linear_loss = 0.5 * masked_mean(lin_l1) + \
            0.5 * masked_mean(lin_l1[:, :, :n_prio])
    else:
        mel_loss = jnp.mean(mel_l1)
        linear_loss = 0.5 * jnp.mean(lin_l1) + \
            0.5 * jnp.mean(lin_l1[:, :, :n_prio])

    return {"mel_loss": mel_loss, "linear_loss": linear_loss,
            "loss": mel_loss + linear_loss}
