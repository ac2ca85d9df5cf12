"""TF-oracle equivalence tests (SURVEY.md §4.3).

The reference implementation is TF; with the reference mount empty
(SURVEY.md §0) these oracles stand in for "allclose vs reference":
identical weights are loaded into TensorFlow reimplementations of the core
cells/ops and outputs are compared elementwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

tf = pytest.importorskip("tensorflow")

from tacotron_multispeaker_tpu.models.modules import GRU, GRUCellParams


def _init(mod, *args, **kw):
    return mod.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, *args, **kw)


def test_gru_matches_keras_legacy_semantics():
    """Our GRU == keras GRUCell(reset_after=False), which implements the
    TF1 legacy GRUCell recurrence (reset gate applied before the matmul)."""
    F, B, T, D = 5, 3, 6, 4
    gru = GRU(F)
    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    v = _init(gru, xs, lengths)
    ours = np.asarray(gru.apply(v, xs, lengths))

    p = v["params"]["cell"]
    Wxg = np.asarray(p["xg"]["kernel"])   # [D, 2F] (r, u)
    bg = np.asarray(p["xg"]["bias"])
    Whg = np.asarray(p["hg"]["kernel"])   # [F, 2F]
    Wxc = np.asarray(p["xc"]["kernel"])   # [D, F]
    bc = np.asarray(p["xc"]["bias"])
    Whc = np.asarray(p["hc"]["kernel"])   # [F, F]

    cell = tf.keras.layers.GRUCell(F, reset_after=False)
    cell.build((B, D))
    # keras layout: [z | r | h]; ours: gates [r | u], z==u
    kernel = np.concatenate([Wxg[:, F:], Wxg[:, :F], Wxc], axis=1)
    recurrent = np.concatenate([Whg[:, F:], Whg[:, :F], Whc], axis=1)
    bias = np.concatenate([bg[F:], bg[:F], bc])
    cell.set_weights([kernel, recurrent, bias])

    h = tf.zeros((B, F))
    outs = []
    for t in range(T):
        o, [h] = cell(tf.constant(np.asarray(xs[:, t])), [h])
        outs.append(o.numpy())
    ref = np.stack(outs, axis=1)
    # on-chip, f32 MXU matmuls run at bf16 precision (CLAUDE.md); the
    # exact 1e-5 oracle bound is the CPU gate
    atol = 3e-2 if jax.default_backend() == "tpu" else 1e-5
    assert np.allclose(ours, ref, atol=atol)


def test_conv_bank_matches_tf_conv1d():
    """Fused masked bank == per-width tf.nn.conv1d SAME convs."""
    from tacotron_multispeaker_tpu.models.modules import ConvBank, _bank_mask
    K, C, B, T, D = 8, 4, 2, 21, 6
    bank = ConvBank(K, C)
    rs = np.random.RandomState(1)
    xs = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    v = _init(bank, xs, train=False)
    kernel = np.asarray(v["params"]["kernel"]) * np.asarray(_bank_mask(K, C))
    bias = np.asarray(v["params"]["bias"])
    y = np.asarray(bank.apply(v, xs, train=False))   # includes eval-mode BN

    parts = []
    for k in range(1, K + 1):
        off = (K - 1) // 2 - (k - 1) // 2
        sub = kernel[off: off + k, :, (k - 1) * C: k * C]
        o = tf.nn.conv1d(tf.constant(np.asarray(xs)), tf.constant(sub),
                         stride=1, padding="SAME").numpy()
        parts.append(o + bias[(k - 1) * C: k * C])
    ref = np.maximum(np.concatenate(parts, axis=-1), 0.0)
    ref = ref / np.sqrt(1.0 + 1e-3)  # eval BN with fresh stats (0 mean, 1 var)
    atol = 3e-2 if jax.default_backend() == "tpu" else 1e-4
    assert np.allclose(y, ref, atol=atol)


def test_stft_matches_tf_signal():
    from tacotron_multispeaker_tpu.audio import dsp
    params = dsp.STFTParams(512, 128, 400)
    rs = np.random.RandomState(2)
    y = rs.randn(4096).astype(np.float32)
    ours = np.asarray(jnp.abs(dsp.stft(jnp.asarray(y), params)))

    win = dsp.hann_window(params.win_length, params.n_fft)
    ypad = np.pad(y, params.n_fft // 2, mode="reflect")
    Z = tf.signal.stft(tf.constant(ypad), frame_length=params.n_fft,
                       frame_step=params.hop_length, fft_length=params.n_fft,
                       window_fn=lambda n, dtype: tf.constant(win, dtype))
    Z = np.abs(Z.numpy()).T
    common = min(Z.shape[1], ours.shape[1])
    assert np.allclose(ours[:, :common], Z[:, :common],
                       atol=1e-3 * Z.max(), rtol=1e-3)


def _np(x):
    return np.asarray(x, np.float32)


def _dense(x, p):
    y = x @ _np(p["kernel"])
    if "bias" in p:
        y = y + _np(p["bias"])
    return y


def _bn_eval(x, p, s, eps=1e-3):
    """flax BatchNorm eval: running stats + learned scale/bias."""
    return ((x - _np(s["mean"])) / np.sqrt(_np(s["var"]) + eps)
            * _np(p["scale"]) + _np(p["bias"]))


def _keras_gru(p, F):
    """Build a keras GRUCell from our split-weight GRU params (layout
    verified by test_gru_matches_keras_legacy_semantics)."""
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


def _run_gru(cell, xs, lengths, F, reverse=False):
    """Sequence GRU with our masking/length-aware-reversal semantics."""
    B, T, _ = xs.shape
    if reverse:
        xs = _reverse_seq(xs, lengths)
    h = tf.zeros((B, F))
    outs = []
    for t in range(T):
        o, [h] = cell(tf.constant(xs[:, t]), [h])
        outs.append(o.numpy())
    ys = np.stack(outs, axis=1)
    ys = ys * (np.arange(T)[None, :, None] < lengths[:, None, None])
    if reverse:
        ys = _reverse_seq(ys, lengths)
    return ys


def _reverse_seq(xs, lengths):
    B, T = xs.shape[:2]
    t = np.arange(T)[None, :]
    idx = np.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return np.take_along_axis(xs, idx[..., None], axis=1)


def _conv_bank_tf(x, p, s, K, C):
    """Per-width SAME tf convs (the reference structure) on the masked
    fused kernel, + f32 bias/relu + eval BN."""
    from tacotron_multispeaker_tpu.models.modules import _bank_mask
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
    return _bn_eval(y, p["bn"], s["bn"])


def _conv_bn_tf(x, p, s, relu):
    y = tf.nn.conv1d(tf.constant(x), tf.constant(_np(p["conv"]["kernel"])),
                     stride=1, padding="SAME").numpy() + _np(p["conv"]["bias"])
    if relu:
        y = np.maximum(y, 0.0)
    return _bn_eval(y, p["bn"], s["bn"])


def _cbhg_tf(x, lengths, p, s, K, C, highway_layers, gru_units):
    """TF composition of our CBHG (mask → bank → maxpool → projs →
    residual → [highway_in] → highways → BiGRU)."""
    T = x.shape[1]
    tmask = (np.arange(T)[None, :, None] < lengths[:, None, None])
    x = x * tmask
    residual = x
    y = _conv_bank_tf(x, p["bank"], s["bank"], K, C) * tmask
    pad = np.pad(y, ((0, 0), (0, 1), (0, 0)),
                 constant_values=-np.inf)[:, 1:, :]
    y = np.maximum(y, pad)
    y = _conv_bn_tf(y, p["proj_0"], s["proj_0"], relu=True) * tmask
    y = _conv_bn_tf(y, p["proj_1"], s["proj_1"], relu=False)
    y = (y + residual) * tmask
    if "highway_in" in p:
        y = _dense(y, p["highway_in"])
    for i in range(highway_layers):
        h = np.maximum(_dense(y, p[f"highway_{i}"]["H"]), 0.0)
        t = 1.0 / (1.0 + np.exp(-_dense(y, p[f"highway_{i}"]["T"])))
        y = h * t + y * (1.0 - t)
    fwd = _run_gru(_keras_gru(p["bigru"]["fwd"]["cell"], gru_units),
                   y.astype(np.float32), lengths, gru_units)
    bwd = _run_gru(_keras_gru(p["bigru"]["bwd"]["cell"], gru_units),
                   y.astype(np.float32), lengths, gru_units, reverse=True)
    return np.concatenate([fwd, bwd], axis=-1)


def test_full_model_teacher_forced_matches_tf_oracle():
    """END-TO-END equivalence (SURVEY.md §4.3 'allclose vs reference'):
    the whole teacher-forced forward — embedding → prenet → encoder CBHG →
    attention GRU decoder → post CBHG → linear projection — recomposed in
    TF/keras/numpy from transplanted weights, mel AND linear L1 ≈ 0.

    Prenet dropout is pinned to 0 for determinism (the only stochastic op);
    eval-mode BN; f32 everywhere."""
    from tacotron_multispeaker_tpu.config import tiny, parse_overrides
    from tacotron_multispeaker_tpu.models import create_model

    cfg = parse_overrides(tiny(), "model.prenet_dropout=0.0")
    m = cfg.model
    model = create_model("tacotron", cfg)
    rng = jax.random.PRNGKey(0)
    B, L = 2, 12
    r = m.outputs_per_step
    T = 4 * r
    rs = np.random.RandomState(0)
    inputs = rs.randint(2, 60, (B, L)).astype(np.int32)
    lengths = np.array([L, L - 3], np.int32)
    mels = rs.rand(B, T, cfg.audio.num_mels).astype(np.float32)
    v = model.init({"params": rng, "dropout": rng}, jnp.asarray(inputs),
                   jnp.asarray(lengths), jnp.asarray(mels), train=True)
    out = model.apply({"params": v["params"],
                       "batch_stats": v["batch_stats"]},
                      jnp.asarray(inputs), jnp.asarray(lengths),
                      jnp.asarray(mels), train=False,
                      rngs={"dropout": rng})
    p, bs = v["params"], v["batch_stats"]

    # ---- encoder ----------------------------------------------------------
    enc_p, enc_s = p["encoder"], bs["encoder"]
    x = _np(enc_p["embedding"]["embedding"])[inputs]          # [B, L, E]
    for i in range(len(m.prenet_depths)):
        x = np.maximum(_dense(x, enc_p["prenet"][f"dense_{i}"]), 0.0)
    half = m.encoder_depth // 2
    memory = _cbhg_tf(x.astype(np.float32), lengths, enc_p["cbhg"],
                      enc_s["cbhg"], m.encoder_bank_k,
                      m.encoder_bank_channels, m.encoder_highway_layers,
                      half)                                    # [B, L, 2*half]

    # ---- attention decoder (teacher forced) --------------------------------
    att_p = p["attention"]
    keys = memory @ _np(att_p["memory"]["kernel"])             # [B, L, A]
    vvec = _np(att_p["v"])[:, 0]
    mask = np.arange(L)[None, :] < lengths[:, None]

    dec_in_seq = np.concatenate(
        [np.zeros((B, 1, cfg.audio.num_mels), np.float32),
         mels[:, r - 1:: r, :][:, :-1]], axis=1)               # teacher inputs
    pn = dec_in_seq
    for i in range(len(m.prenet_depths)):
        pn = np.maximum(_dense(pn, p["dec_prenet"][f"dense_{i}"]), 0.0)

    cell_p = p["decoder_cell"]
    attn_cell = _keras_gru(cell_p["attn_rnn"], m.decoder_depth)
    dec_cells = [_keras_gru(cell_p[f"dec_rnn_{i}"], m.decoder_depth)
                 for i in range(m.decoder_layers)]
    attn_h = np.zeros((B, m.decoder_depth), np.float32)
    dec_hs = [np.zeros((B, m.decoder_depth), np.float32)
              for _ in range(m.decoder_layers)]
    ctx = np.zeros((B, memory.shape[-1]), np.float32)
    frames_out = []
    for t in range(T // r):
        cell_in = np.concatenate([pn[:, t], ctx], axis=-1)
        _, [h] = attn_cell(tf.constant(cell_in.astype(np.float32)),
                           [tf.constant(attn_h)])
        attn_h = h.numpy()
        q = attn_h @ _np(att_p["query"]["kernel"])
        e = np.tanh(q[:, None, :] + keys) @ vvec
        e = np.where(mask, e, -1e9)
        ex = np.exp(e - e.max(axis=-1, keepdims=True)) * mask
        al = ex / np.maximum(ex.sum(axis=-1, keepdims=True), 1e-9)
        ctx = np.einsum("bl,bld->bd", al, memory).astype(np.float32)
        x = _dense(np.concatenate([attn_h, ctx], axis=-1), cell_p["dec_in"])
        for i, cell in enumerate(dec_cells):
            _, [h] = cell(tf.constant(x.astype(np.float32)),
                          [tf.constant(dec_hs[i])])
            dec_hs[i] = h.numpy()
            x = x + dec_hs[i]
        frames_out.append(_dense(x, cell_p["frame_proj"]))
    mel_oracle = np.stack(frames_out, axis=1).reshape(
        B, T, cfg.audio.num_mels)

    mel_l1 = np.abs(mel_oracle - np.asarray(out.mel_outputs)).mean()
    # bf16-precision f32 MXU on the chip: measured mel L1 1.9e-4 there
    tol = 1e-3 if jax.default_backend() == "tpu" else 1e-5
    assert mel_l1 < tol, mel_l1

    # ---- postnet + linear projection ---------------------------------------
    post = _cbhg_tf(mel_oracle.astype(np.float32),
                    np.full((B,), T, np.int32), p["post_cbhg"],
                    bs["post_cbhg"], m.postnet_bank_k,
                    m.postnet_bank_channels, m.postnet_highway_layers,
                    m.postnet_gru_units)
    linear_oracle = _dense(post, p["linear_proj"])
    lin_l1 = np.abs(linear_oracle - np.asarray(out.linear_outputs)).mean()
    assert lin_l1 < (1e-3 if jax.default_backend() == "tpu" else 1e-5), lin_l1


def test_teacher_forced_forward_finite_and_bounded():
    """End-to-end teacher-forced forward sanity under shared init (the
    cross-framework full-model oracle is bounded by module equivalences
    above; this asserts global composition stays tame)."""
    from tacotron_multispeaker_tpu.config import tiny
    from tacotron_multispeaker_tpu.models import create_model
    cfg = tiny()
    model = create_model("tacotron", cfg)
    rng = jax.random.PRNGKey(0)
    B, L, T = 2, 10, 20
    inputs = jax.random.randint(rng, (B, L), 0, 100)
    lengths = jnp.array([10, 10])
    mels = jax.random.uniform(rng, (B, T, 80))
    v = model.init({"params": rng, "dropout": rng}, inputs, lengths, mels,
                   train=True)
    out, _ = model.apply(v, inputs, lengths, mels, train=False,
                         rngs={"dropout": rng}, mutable=["batch_stats"])
    for arr in [out.mel_outputs, out.linear_outputs, out.alignments]:
        a = np.asarray(arr)
        assert np.isfinite(a).all()
        assert np.abs(a).max() < 100.0
