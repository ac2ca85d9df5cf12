"""The in-repo TF/numpy oracle of the full teacher-forced forward.

With the reference mount empty (SURVEY.md §0), "allclose vs the reference
TF implementation" degrades to allclose vs THIS oracle: a from-scratch
TF/keras/numpy recomposition of the model — per-width SAME conv1d bank,
eval BatchNorm, highway, keras legacy GRUCell (reset_after=False, the TF1
``tf.contrib.rnn.GRUCell`` recurrence), additive attention, sequential
python decoder loop — running transplanted checkpoint weights.  The tests
(tests/test_oracle_tf.py) pin each module and the composition; validate.py
``--oracle`` runs it over corpus batches for the per-speaker mel-L1 +
Griffin-Lim waveform report BASELINE.json names.

Requires tensorflow (oracle-only dependency); import lazily.
"""

from __future__ import annotations

import numpy as np


def _tf():
    import tensorflow as tf
    return tf


def _np(x):
    return np.asarray(x, np.float32)


def dense(x, p):
    y = x @ _np(p["kernel"])
    if "bias" in p:
        y = y + _np(p["bias"])
    return y


def bn_eval(x, p, s, eps=1e-3):
    """flax BatchNorm eval: running stats + learned scale/bias."""
    return ((x - _np(s["mean"])) / np.sqrt(_np(s["var"]) + eps)
            * _np(p["scale"]) + _np(p["bias"]))


def keras_gru(p, F):
    """Build a keras GRUCell from our split-weight GRU params (layout
    verified by tests/test_oracle_tf.py::
    test_gru_matches_keras_legacy_semantics)."""
    tf = _tf()
    Wxg, bg = _np(p["xg"]["kernel"]), _np(p["xg"]["bias"])
    Whg = _np(p["hg"]["kernel"])
    Wxc, bc = _np(p["xc"]["kernel"]), _np(p["xc"]["bias"])
    Whc = _np(p["hc"]["kernel"])
    cell = tf.keras.layers.GRUCell(F, reset_after=False)
    cell.build((1, Wxg.shape[0]))
    cell.set_weights([
        np.concatenate([Wxg[:, F:], Wxg[:, :F], Wxc], axis=1),
        np.concatenate([Whg[:, F:], Whg[:, :F], Whc], axis=1),
        np.concatenate([bg[F:], bg[:F], bc])])
    return cell


def reverse_seq(xs, lengths):
    B, T = xs.shape[:2]
    t = np.arange(T)[None, :]
    idx = np.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return np.take_along_axis(xs, idx[..., None], axis=1)


def run_gru(cell, xs, lengths, F, reverse=False):
    """Sequence GRU with our masking/length-aware-reversal semantics."""
    tf = _tf()
    B, T, _ = xs.shape
    if reverse:
        xs = reverse_seq(xs, lengths)
    h = tf.zeros((B, F))
    outs = []
    for t in range(T):
        o, [h] = cell(tf.constant(xs[:, t]), [h])
        outs.append(o.numpy())
    ys = np.stack(outs, axis=1)
    ys = ys * (np.arange(T)[None, :, None] < lengths[:, None, None])
    if reverse:
        ys = reverse_seq(ys, lengths)
    return ys


def conv_bank_tf(x, p, s, K, C):
    """Per-width SAME tf convs (the reference structure) on the masked
    fused kernel, + f32 bias/relu + eval BN."""
    tf = _tf()
    from .models.modules import _bank_mask
    kernel = _np(p["kernel"]) * _bank_mask(K, C)
    bias = _np(p["bias"])
    parts = []
    for k in range(1, K + 1):
        off = (K - 1) // 2 - (k - 1) // 2
        sub = kernel[off: off + k, :, (k - 1) * C: k * C]
        o = tf.nn.conv1d(tf.constant(x), tf.constant(sub), stride=1,
                         padding="SAME").numpy()
        parts.append(o + bias[(k - 1) * C: k * C])
    y = np.maximum(np.concatenate(parts, axis=-1), 0.0)
    return bn_eval(y, p["bn"], s["bn"])


def conv_bn_tf(x, p, s, relu):
    tf = _tf()
    y = tf.nn.conv1d(tf.constant(x), tf.constant(_np(p["conv"]["kernel"])),
                     stride=1, padding="SAME").numpy() + _np(p["conv"]["bias"])
    if relu:
        y = np.maximum(y, 0.0)
    return bn_eval(y, p["bn"], s["bn"])


def cbhg_tf(x, lengths, p, s, K, C, highway_layers, gru_units):
    """TF composition of our CBHG (mask → bank → maxpool → projs →
    residual → [highway_in] → highways → BiGRU)."""
    T = x.shape[1]
    tmask = (np.arange(T)[None, :, None] < lengths[:, None, None])
    x = x * tmask
    residual = x
    y = conv_bank_tf(x, p["bank"], s["bank"], K, C) * tmask
    pad = np.pad(y, ((0, 0), (0, 1), (0, 0)),
                 constant_values=-np.inf)[:, 1:, :]
    y = np.maximum(y, pad)
    y = conv_bn_tf(y, p["proj_0"], s["proj_0"], relu=True) * tmask
    y = conv_bn_tf(y, p["proj_1"], s["proj_1"], relu=False)
    y = (y + residual) * tmask
    if "highway_in" in p:
        y = dense(y, p["highway_in"])
    for i in range(highway_layers):
        h = np.maximum(dense(y, p[f"highway_{i}"]["H"]), 0.0)
        t = 1.0 / (1.0 + np.exp(-dense(y, p[f"highway_{i}"]["T"])))
        y = h * t + y * (1.0 - t)
    fwd = run_gru(keras_gru(p["bigru"]["fwd"]["cell"], gru_units),
                  y.astype(np.float32), lengths, gru_units)
    bwd = run_gru(keras_gru(p["bigru"]["bwd"]["cell"], gru_units),
                  y.astype(np.float32), lengths, gru_units, reverse=True)
    return np.concatenate([fwd, bwd], axis=-1)


def oracle_teacher_forward(cfg, params, batch_stats, inputs, lengths, mels,
                           speaker_ids=None):
    """Full teacher-forced forward in TF/numpy from transplanted weights:
    (mel_oracle [B,T,M], linear_oracle [B,T,bins]).  Prenet dropout is 0
    (the only stochastic op); eval-mode BN; f32 throughout.  Speaker
    conditioning follows the same three config-gated injection points as
    the model (models/tacotron.py)."""
    tf = _tf()
    m = cfg.model
    p, bs = params, batch_stats
    inputs = np.asarray(inputs)
    lengths = np.asarray(lengths)
    mels = np.asarray(mels, np.float32)
    B, L = inputs.shape
    T = mels.shape[1]
    r = m.outputs_per_step

    spk = None
    if m.num_speakers > 1 and speaker_ids is not None:
        spk = _np(p["speaker_table"]["embedding"])[np.asarray(speaker_ids)]

    # ---- encoder ----------------------------------------------------------
    enc_p, enc_s = p["encoder"], bs["encoder"]
    x = _np(enc_p["embedding"]["embedding"])[inputs]          # [B, L, E]
    if spk is not None and "encoder_prenet" in m.speaker_condition:
        x = np.concatenate(
            [x, np.broadcast_to(spk[:, None, :], (B, L, spk.shape[-1]))],
            axis=-1)
    for i in range(len(m.prenet_depths)):
        x = np.maximum(dense(x, enc_p["prenet"][f"dense_{i}"]), 0.0)
    half = m.encoder_depth // 2
    memory = cbhg_tf(x.astype(np.float32), lengths, enc_p["cbhg"],
                     enc_s["cbhg"], m.encoder_bank_k,
                     m.encoder_bank_channels, m.encoder_highway_layers,
                     half)                                    # [B, L, 2*half]
    if spk is not None and "memory" in m.speaker_condition:
        memory = np.concatenate(
            [memory,
             np.broadcast_to(spk[:, None, :], (B, L, spk.shape[-1]))],
            axis=-1)

    # ---- attention decoder (teacher forced) -------------------------------
    att_p = p["attention"]
    keys = memory @ _np(att_p["memory"]["kernel"])             # [B, L, A]
    vvec = _np(att_p["v"])[:, 0]
    mask = np.arange(L)[None, :] < lengths[:, None]

    dec_in_seq = np.concatenate(
        [np.zeros((B, 1, cfg.audio.num_mels), np.float32),
         mels[:, r - 1:: r, :][:, :-1]], axis=1)               # teacher inputs
    pn = dec_in_seq
    for i in range(len(m.prenet_depths)):
        pn = np.maximum(dense(pn, p["dec_prenet"][f"dense_{i}"]), 0.0)

    cell_p = p["decoder_cell"]
    attn_cell = keras_gru(cell_p["attn_rnn"], m.decoder_depth)
    dec_cells = [keras_gru(cell_p[f"dec_rnn_{i}"], m.decoder_depth)
                 for i in range(m.decoder_layers)]
    if spk is not None and "decoder_init" in m.speaker_condition:
        init = np.tanh(dense(spk, p["state_init_proj"]))
        parts = np.split(init, m.decoder_layers + 1, axis=-1)
        attn_h, dec_hs = parts[0], [np.ascontiguousarray(h)
                                    for h in parts[1:]]
    else:
        attn_h = np.zeros((B, m.decoder_depth), np.float32)
        dec_hs = [np.zeros((B, m.decoder_depth), np.float32)
                  for _ in range(m.decoder_layers)]
    ctx = np.zeros((B, memory.shape[-1]), np.float32)
    frames_out = []
    for t in range(T // r):
        cell_in = np.concatenate([pn[:, t], ctx], axis=-1)
        _, [h] = attn_cell(tf.constant(cell_in.astype(np.float32)),
                           [tf.constant(attn_h.astype(np.float32))])
        attn_h = h.numpy()
        q = attn_h @ _np(att_p["query"]["kernel"])
        e = np.tanh(q[:, None, :] + keys) @ vvec
        e = np.where(mask, e, -1e9)
        ex = np.exp(e - e.max(axis=-1, keepdims=True)) * mask
        al = ex / np.maximum(ex.sum(axis=-1, keepdims=True), 1e-9)
        ctx = np.einsum("bl,bld->bd", al, memory).astype(np.float32)
        x = dense(np.concatenate([attn_h, ctx], axis=-1), cell_p["dec_in"])
        for i, cell in enumerate(dec_cells):
            _, [h] = cell(tf.constant(x.astype(np.float32)),
                          [tf.constant(dec_hs[i].astype(np.float32))])
            dec_hs[i] = h.numpy()
            x = x + dec_hs[i]
        frames_out.append(dense(x, cell_p["frame_proj"]))
    mel_oracle = np.stack(frames_out, axis=1).reshape(
        B, T, cfg.audio.num_mels)

    # ---- postnet + linear projection --------------------------------------
    post = cbhg_tf(mel_oracle.astype(np.float32),
                   np.full((B,), T, np.int32), p["post_cbhg"],
                   bs["post_cbhg"], m.postnet_bank_k,
                   m.postnet_bank_channels, m.postnet_highway_layers,
                   m.postnet_gru_units)
    linear_oracle = dense(post, p["linear_proj"])
    return mel_oracle, linear_oracle
