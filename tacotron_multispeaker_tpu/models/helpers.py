"""Decoding helpers (reference: models/helpers.py — SURVEY.md §2.10).

The reference's ``TacoTrainingHelper`` fed the LAST frame of each r-frame
ground-truth group as the next decoder input (teacher forcing) and
``TacoTestHelper`` fed back the last predicted frame; both started from a
zero GO frame (``_go_frames``) and inference ran to a fixed ``max_iters``
(Tacotron-1 has no stop token — outputs are endpoint-trimmed afterwards).

Here those policies are data preparation for the decoder ``nn.scan``: the
teacher path precomputes the whole input sequence (enabling one batched
prenet matmul before the scan); the autoregressive path threads
``carry.prev_frame`` through the scan (models/tacotron.py generate).
"""

from __future__ import annotations

import jax.numpy as jnp


def go_frame(batch: int, num_mels: int, dtype=jnp.float32) -> jnp.ndarray:
    """The zero GO frame (reference: _go_frames)."""
    return jnp.zeros((batch, 1, num_mels), dtype)


def teacher_inputs(mel_targets: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, T, M] ground truth -> [B, T/r, M] decoder inputs: GO frame, then
    the last frame of each r-group (reference: TacoTrainingHelper)."""
    B, T, M = mel_targets.shape
    assert T % r == 0, f"target length {T} not a multiple of r={r}"
    go = go_frame(B, M, mel_targets.dtype)
    return jnp.concatenate([go, mel_targets[:, r - 1:: r, :][:, :-1]], axis=1)


def feedback_frame(frames: jnp.ndarray, r: int, num_mels: int) -> jnp.ndarray:
    """[B, r*M] predicted group -> [B, M] last frame, the next decoder input
    (reference: TacoTestHelper)."""
    return frames[:, (r - 1) * num_mels:]
