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


# Oracle helpers now live in the package (round 5: validate.py --oracle
# reuses them for the per-speaker corpus report); aliased here so the
# module tests keep their original names.
from tacotron_multispeaker_tpu import oracle_tf as O

_np, _dense, _bn_eval = O._np, O.dense, O.bn_eval
_keras_gru, _run_gru, _reverse_seq = O.keras_gru, O.run_gru, O.reverse_seq
_conv_bank_tf, _conv_bn_tf, _cbhg_tf = O.conv_bank_tf, O.conv_bn_tf, O.cbhg_tf


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

    mel_oracle, linear_oracle = O.oracle_teacher_forward(
        cfg, p, bs, inputs, lengths, mels)

    mel_l1 = np.abs(mel_oracle - np.asarray(out.mel_outputs)).mean()
    # bf16-precision f32 MXU on the chip: measured mel L1 1.9e-4 there
    tol = 1e-3 if jax.default_backend() == "tpu" else 1e-5
    assert mel_l1 < tol, mel_l1
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


def test_multispeaker_oracle_matches_model():
    """The oracle's speaker-conditioning path (all three injection points:
    encoder-prenet concat, memory concat, decoder-init tanh projection)
    matches the framework forward with transplanted weights — exercised
    for validate.py --oracle on multispeaker checkpoints (round 5)."""
    from tacotron_multispeaker_tpu.config import tiny, parse_overrides
    from tacotron_multispeaker_tpu.models import create_model

    cfg = parse_overrides(tiny(), ",".join([
        "model.prenet_dropout=0.0", "model.num_speakers=4",
        "model.speaker_embed_depth=8"]))
    model = create_model("tacotron", cfg)
    rng = jax.random.PRNGKey(0)
    B, L = 2, 12
    T = 4 * cfg.model.outputs_per_step
    rs = np.random.RandomState(0)
    inputs = rs.randint(2, 60, (B, L)).astype(np.int32)
    lengths = np.array([L, L - 3], np.int32)
    mels = rs.rand(B, T, cfg.audio.num_mels).astype(np.float32)
    sids = np.array([1, 3], np.int32)
    v = model.init({"params": rng, "dropout": rng}, jnp.asarray(inputs),
                   jnp.asarray(lengths), jnp.asarray(mels),
                   speaker_ids=jnp.asarray(sids), train=True)
    out = model.apply({"params": v["params"], "batch_stats": v["batch_stats"]},
                      jnp.asarray(inputs), jnp.asarray(lengths),
                      jnp.asarray(mels), speaker_ids=jnp.asarray(sids),
                      train=False, rngs={"dropout": rng})
    mel_or, lin_or = O.oracle_teacher_forward(
        cfg, v["params"], v["batch_stats"], inputs, lengths, mels,
        speaker_ids=sids)
    # chip: f32 MXU matmuls round at bf16; the speaker-concat widths add a
    # little more accumulation than the single-speaker oracle's 1.9e-4
    # (measured 1.4e-3 here)
    tol = 3e-3 if jax.default_backend() == "tpu" else 1e-5
    assert np.abs(mel_or - np.asarray(out.mel_outputs)).mean() < tol
    assert np.abs(lin_or - np.asarray(out.linear_outputs)).mean() < tol
    # conditioning actually matters: swapping ids changes the oracle output
    mel_sw, _ = O.oracle_teacher_forward(
        cfg, v["params"], v["batch_stats"], inputs, lengths, mels,
        speaker_ids=sids[::-1].copy())
    assert np.abs(mel_sw - mel_or).max() > 1e-4
