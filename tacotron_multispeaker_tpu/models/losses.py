"""Loss functions (reference: models/tacotron.py add_loss — SURVEY.md §2.9).

Reference semantics: ``loss = L1(mel) + 0.5*mean(L1(linear)) +
0.5*mean(L1(linear)[:, :, :n_priority])`` where the priority band is
frequencies below ~3 kHz (i.e. low-frequency bins get double weight).  The
reference averages over padded frames too; here masking by true target
lengths is the default (config ``loss_masking``), with the unmasked mode
available for oracle parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def priority_bins(num_freq: int, sample_rate: int,
                  prioritize_hz: float = 3000.0) -> int:
    """Number of linear bins below the prioritized frequency."""
    return int(prioritize_hz / (sample_rate * 0.5) * num_freq)


def tacotron_loss(mel_out: jnp.ndarray, linear_out: jnp.ndarray,
                  mel_targets: jnp.ndarray, linear_targets: jnp.ndarray,
                  target_lengths: jnp.ndarray | None, *, num_freq: int,
                  sample_rate: int, prioritize_hz: float = 3000.0,
                  axis_name: str | None = None,
                  fused_linear: bool = False) -> dict:
    """Returns dict with mel_loss / linear_loss / loss (all scalar f32).

    ``axis_name``: when set (inside ``shard_map`` over a data-parallel axis,
    training.py round 4) the returned values are this shard's CONTRIBUTION
    to the global-batch loss: local masked sums over the GLOBAL denominator
    (the denominator is psum'd but carries no parameter dependence, so
    gradients never flow through a collective — ``psum(grad(local))`` taken
    by the caller reconstructs the exact unsharded gradient even when
    shards hold different valid-frame counts).  Callers psum the scalars
    for logging.
    """
    mel_l1 = jnp.abs(mel_targets - mel_out)
    lin_l1 = jnp.abs(linear_targets - linear_out)
    n_prio = priority_bins(num_freq, sample_rate, prioritize_hz)

    # per-bin weights for the fused single-pass formulation: exactly
    # 0.5·mean(all bins) + 0.5·mean(priority bins) expressed as ONE
    # weighted reduce over [B, T, bins] — same math up to f32
    # reassociation, one fewer pass over the step's biggest tensor
    # (train.fused_linear_loss A/B, round 5)
    if fused_linear:
        w = jnp.full((num_freq,), 0.5 / num_freq, jnp.float32)
        w = w.at[:n_prio].add(0.5 / n_prio)

    if target_lengths is not None:
        T = mel_targets.shape[1]
        mask = (jnp.arange(T)[None, :] < target_lengths[:, None])[..., None]
        count = jnp.sum(mask)
        if axis_name is not None:
            count = jax.lax.psum(count, axis_name)
        denom = jnp.maximum(count, 1)

        def masked_mean(x):
            return jnp.sum(jnp.where(mask, x, 0.0)) / (denom * x.shape[-1])

        mel_loss = masked_mean(mel_l1)
        if fused_linear:
            linear_loss = jnp.sum(jnp.where(mask, lin_l1, 0.0) * w) / denom
        else:
            linear_loss = 0.5 * masked_mean(lin_l1) + \
                0.5 * masked_mean(lin_l1[:, :, :n_prio])
    else:
        # equal shard sizes: global mean = local mean / axis size
        scale = 1.0 if axis_name is None else 1.0 / jax.lax.axis_size(axis_name)
        mel_loss = scale * jnp.mean(mel_l1)
        if fused_linear:
            B_, T_ = lin_l1.shape[0], lin_l1.shape[1]
            linear_loss = scale * jnp.sum(lin_l1 * w) / (B_ * T_)
        else:
            linear_loss = scale * (0.5 * jnp.mean(lin_l1) +
                                   0.5 * jnp.mean(lin_l1[:, :, :n_prio]))

    return {"mel_loss": mel_loss, "linear_loss": linear_loss,
            "loss": mel_loss + linear_loss}
