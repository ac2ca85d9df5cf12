"""Kernel-equivalence tests (SURVEY.md §4.2): each Pallas kernel allclose
against its XLA reference, in interpret mode on CPU, across tile-edge shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tacotron_multispeaker_tpu.ops import (
    attention_step_pallas, attention_step_reference, conv_bank_pallas,
    conv_bank_reference, gru_scan_pallas, gru_scan_reference,
    overlap_add_pallas, overlap_add_reference)
from tacotron_multispeaker_tpu.models.modules import _bank_mask


@pytest.mark.parametrize("B,T,D,K,C", [
    (2, 32, 16, 4, 8),     # small aligned
    (1, 37, 16, 8, 16),    # T not multiple of 8
    (2, 64, 32, 16, 8),    # K=16 (encoder bank)
    (1, 100, 8, 5, 4),     # odd K
])
def test_conv_bank_matches_reference(B, T, D, K, C):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    w = jnp.asarray(rs.randn(K, D, K * C).astype(np.float32) *
                    np.asarray(_bank_mask(K, C)))
    b = jnp.asarray(rs.randn(K * C).astype(np.float32))
    ref = conv_bank_reference(x, w, b)
    out = conv_bank_pallas(x, w, b, interpret=True)
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("B,L,A,D", [
    (2, 16, 32, 24),
    (3, 130, 64, 48),      # L not multiple of 128
    (1, 128, 16, 16),
])
def test_attention_step_matches_reference(B, L, A, D):
    rs = np.random.RandomState(1)
    keys = jnp.asarray(rs.randn(B, L, A).astype(np.float32))
    q = jnp.asarray(rs.randn(B, A).astype(np.float32))
    v = jnp.asarray(rs.randn(A).astype(np.float32))
    mem = jnp.asarray(rs.randn(B, L, D).astype(np.float32))
    lengths = np.minimum(rs.randint(1, L + 1, B), L)
    mask = jnp.asarray(np.arange(L)[None, :] < lengths[:, None])
    ctx_r, al_r = attention_step_reference(keys, q, v, mem, mask)
    ctx_p, al_p = attention_step_pallas(keys, q, v, mem, mask,
                                        interpret=True)
    assert np.allclose(np.asarray(al_p), np.asarray(al_r), atol=1e-5)
    assert np.allclose(np.asarray(ctx_p), np.asarray(ctx_r), atol=1e-4)
    # alignment rows are valid distributions
    assert np.allclose(np.asarray(al_p).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(al_p)[~np.asarray(mask)] == 0).all()


def test_attention_step_with_location_term():
    rs = np.random.RandomState(2)
    B, L, A, D = 2, 20, 16, 8
    keys = jnp.asarray(rs.randn(B, L, A).astype(np.float32))
    q = jnp.asarray(rs.randn(B, A).astype(np.float32))
    v = jnp.asarray(rs.randn(A).astype(np.float32))
    mem = jnp.asarray(rs.randn(B, L, D).astype(np.float32))
    loc = jnp.asarray(rs.randn(B, L, A).astype(np.float32))
    mask = jnp.ones((B, L), bool)
    ctx_r, al_r = attention_step_reference(keys, q, v, mem, mask, loc)
    ctx_p, al_p = attention_step_pallas(keys, q, v, mem, mask, loc,
                                        interpret=True)
    assert np.allclose(np.asarray(al_p), np.asarray(al_r), atol=1e-5)
    assert np.allclose(np.asarray(ctx_p), np.asarray(ctx_r), atol=1e-4)


@pytest.mark.parametrize("B,F,n_fft,hop", [
    (1, 8, 64, 16),
    (2, 13, 128, 32),      # odd frame count
    (1, 5, 256, 100),      # hop not dividing n_fft
    (11, 9, 128, 32),      # batch > B_TILE and not a tile multiple
])
def test_overlap_add_matches_reference(B, F, n_fft, hop):
    rs = np.random.RandomState(3)
    frames = jnp.asarray(rs.randn(B, F, n_fft).astype(np.float32))
    win = jnp.asarray(np.hanning(n_fft).astype(np.float32) + 0.1)
    ref = overlap_add_reference(frames, win, hop)
    out = overlap_add_pallas(frames, win, hop, interpret=True)
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_overlap_add_pallas_bf16_frames():
    """bf16 frames stream into the kernel; accumulation/norm stay f32, so
    the result tracks the f32 reference within bf16 rounding."""
    rs = np.random.RandomState(5)
    frames = rs.randn(4, 12, 128).astype(np.float32)
    win = jnp.asarray(np.hanning(128).astype(np.float32) + 0.1)
    ref = overlap_add_reference(jnp.asarray(frames), win, 32)
    out = overlap_add_pallas(jnp.asarray(frames, jnp.bfloat16), win, 32,
                             interpret=True)
    assert out.dtype == jnp.float32
    scale = float(np.abs(np.asarray(ref)).max())
    assert np.allclose(np.asarray(out), np.asarray(ref),
                       atol=1.5e-2 * scale)


def test_overlap_add_reference_matches_istft():
    """The OLA reference reproduces dsp.istft's core (same scatter math)."""
    from tacotron_multispeaker_tpu.audio import dsp
    params = dsp.STFTParams(64, 16, 64)
    rs = np.random.RandomState(4)
    y = jnp.asarray(rs.randn(2, 400).astype(np.float32))
    spec = dsp.stft(y, params)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=64, axis=-1)
    win = jnp.asarray(dsp.hann_window(64, 64))
    ola = overlap_add_reference(frames.astype(jnp.float32), win, 16)
    full = dsp.istft(spec, params, length=400)
    pad = 32
    assert np.allclose(np.asarray(ola)[:, pad:pad + 400 - 64],
                       np.asarray(full)[:, :400 - 64], atol=1e-3)


@pytest.mark.parametrize("T,B,F,dtype", [
    (16, 2, 128, np.float32),
    (37, 3, 128, np.float32),      # T not multiple of the chunk, odd batch
    (300, 4, 128, np.float32),     # multiple time chunks
    (16, 2, 256, np.float32),      # wider state
])
def test_gru_scan_matches_reference(T, B, F, dtype):
    rs = np.random.RandomState(7)
    xg = jnp.asarray(rs.randn(T, B, 2 * F).astype(dtype) * 0.5)
    xc = jnp.asarray(rs.randn(T, B, F).astype(dtype) * 0.5)
    whg = jnp.asarray(rs.randn(F, 2 * F).astype(dtype) * 0.1)
    whc = jnp.asarray(rs.randn(F, F).astype(dtype) * 0.1)
    h0 = jnp.asarray(rs.randn(B, F).astype(dtype) * 0.1)
    ref = gru_scan_reference(xg, xc, whg, whc, h0)
    out = gru_scan_pallas(xg, xc, whg, whc, h0, interpret=True,
                          time_chunk=32)
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gru_module_pallas_matches_xla():
    """models.modules.GRU with use_pallas (interpret) allclose to the
    nn.scan path with identical params, including reverse + lengths."""
    from tacotron_multispeaker_tpu.models.modules import GRU
    rs = np.random.RandomState(8)
    B, T, D, F = 3, 25, 64, 128
    xs = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    lengths = jnp.asarray([25, 11, 17])
    m_x = GRU(F)
    m_p = GRU(F, use_pallas=True)
    v = m_x.init(jax.random.PRNGKey(0), xs, lengths)
    for reverse in (False, True):
        a = m_x.apply(v, xs, lengths, reverse=reverse)
        b = m_p.apply(v, xs, lengths, reverse=reverse)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4), reverse


@pytest.mark.parametrize("T,B,F", [
    (16, 2, 128),
    (37, 3, 128),                  # T not multiple of the chunk, odd batch
    (130, 4, 256),                 # multiple time chunks, wider state
])
def test_gru_scan_grad_matches_reference(T, B, F):
    """The custom-VJP Pallas GRU differentiates identically to the XLA scan
    (VERDICT r2 Missing #2: round-2 kernels were inference-only)."""
    from tacotron_multispeaker_tpu.ops.gru_scan import gru_scan
    rs = np.random.RandomState(11)
    xg = jnp.asarray(rs.randn(T, B, 2 * F).astype(np.float32) * 0.5)
    xc = jnp.asarray(rs.randn(T, B, F).astype(np.float32) * 0.5)
    whg = jnp.asarray(rs.randn(F, 2 * F).astype(np.float32) * 0.1)
    whc = jnp.asarray(rs.randn(F, F).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rs.randn(B, F).astype(np.float32) * 0.1)
    w = jnp.asarray(rs.randn(T, B, F).astype(np.float32))  # loss weighting

    def loss_p(args):
        return jnp.sum(gru_scan(*args, True, 32) * w)

    def loss_r(args):
        return jnp.sum(gru_scan_reference(*args) * w)

    args = (xg, xc, whg, whc, h0)
    # on the real chip f32 MXU matmuls run at bf16 precision (CLAUDE.md),
    # and kernel/XLA accumulate in different orders — loosen there; CPU
    # interpret pins near-exactness
    on_tpu = jax.default_backend() == "tpu"
    rtol, atol = (3e-2, 3e-2) if on_tpu else (1e-4, 1e-3)
    assert np.allclose(float(loss_p(args)), float(loss_r(args)),
                       rtol=1e-3 if on_tpu else 1e-5)
    g_p = jax.grad(loss_p)(args)
    g_r = jax.grad(loss_r)(args)
    for name, a, b in zip(("xg", "xc", "whg", "whc", "h0"), g_p, g_r):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol * scale,
                                   err_msg=name)


def test_gru_module_grad_with_pallas():
    """GRU module gradients with use_pallas (interpret) match the nn.scan
    path — covers the module plumbing (reverse, lengths mask, x-proj)."""
    from tacotron_multispeaker_tpu.models.modules import GRU
    rs = np.random.RandomState(12)
    B, T, D, F = 3, 25, 64, 128
    xs = jnp.asarray(rs.randn(B, T, D).astype(np.float32))
    lengths = jnp.asarray([25, 11, 17])
    w = jnp.asarray(rs.randn(B, T, F).astype(np.float32))
    m_x = GRU(F)
    m_p = GRU(F, use_pallas=True)
    v = m_x.init(jax.random.PRNGKey(0), xs, lengths)
    on_tpu = jax.default_backend() == "tpu"
    rtol, atol = (3e-2, 3e-2) if on_tpu else (1e-4, 1e-3)
    for reverse in (False, True):
        g_x = jax.grad(lambda p: jnp.sum(
            m_x.apply(p, xs, lengths, reverse=reverse) * w))(v)
        g_p = jax.grad(lambda p: jnp.sum(
            m_p.apply(p, xs, lengths, reverse=reverse) * w))(v)
        flat_x = jax.tree.leaves_with_path(g_x)
        flat_p = jax.tree.leaves_with_path(g_p)
        for (kx, ax), (kp, bx) in zip(flat_x, flat_p):
            assert kx == kp
            scale = max(float(np.abs(np.asarray(ax)).max()), 1.0)
            np.testing.assert_allclose(np.asarray(ax), np.asarray(bx),
                                       rtol=rtol, atol=atol * scale,
                                       err_msg=f"{kx} reverse={reverse}")


def test_bigru_fused_kernel_matches_two_scan_path(monkeypatch):
    """The fused two-direction BiGRU kernel (round 4 — one sequential grid
    for both directions instead of two serialized scans) matches the
    two-GRU path exactly in forward and gradient, including ragged
    lengths."""
    from tacotron_multispeaker_tpu.models import modules
    rs = np.random.RandomState(5)
    B, T, D, F = 4, 23, 48, 128
    xs = jnp.asarray(rs.randn(B, T, D).astype(np.float32) * 0.3)
    lengths = jnp.asarray([23, 9, 16, 1], jnp.int32)
    w = jnp.asarray(rs.randn(B, T, 2 * F).astype(np.float32))
    m = modules.BiGRU(F)
    v = m.init(jax.random.PRNGKey(0), xs, lengths)

    ref = m.apply(v, xs, lengths)
    g_ref = jax.grad(lambda p: jnp.sum(m.apply(p, xs, lengths) * w))(v)
    monkeypatch.setattr(modules, "FORCE_PALLAS_GRU", True)
    out = m.apply(v, xs, lengths)
    g_ker = jax.grad(lambda p: jnp.sum(m.apply(p, xs, lengths) * w))(v)

    on_tpu = jax.default_backend() == "tpu"
    rtol, atol = (3e-2, 3e-2) if on_tpu else (1e-4, 1e-3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=rtol, atol=atol)
    for (kx, a), (kp, b) in zip(jax.tree.leaves_with_path(g_ref),
                                jax.tree.leaves_with_path(g_ker)):
        assert kx == kp
        scale = max(float(np.abs(np.asarray(a)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=rtol, atol=atol * scale,
                                   err_msg=str(kx))


def test_train_step_with_pallas_gru(monkeypatch):
    """A full train step through the differentiable GRU kernel (forced in
    interpret mode — use_pallas_gru itself only engages on real TPU) runs
    and yields finite loss/grads in both CBHGs."""
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.models import create_model, modules
    from tacotron_multispeaker_tpu.training import (create_train_state,
                                                    make_train_step)
    monkeypatch.setattr(modules, "FORCE_PALLAS_GRU", True)
    cfg = get_config("single_speaker", "model.max_iters=4")
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model)
    rs = np.random.RandomState(13)
    B, L, T = 2, 16, 20
    batch = (jnp.asarray(rs.randint(2, 60, (B, L)), np.int32),
             jnp.full((B,), L, np.int32),
             jnp.asarray(rs.rand(B, T, cfg.audio.num_mels), np.float32),
             jnp.asarray(rs.rand(B, T, cfg.audio.num_freq), np.float32),
             jnp.full((B,), T, np.int32),
             jnp.zeros((B,), np.int32))
    new_state, metrics = step(state, *batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0.0


def _random_decoder_weights(rs, M=80, P1=64, P2=32, H=128, A=128, D=96,
                            r=2, n_layers=2, scale=0.3):
    from tacotron_multispeaker_tpu.ops.decoder_loop import DecoderWeights
    f = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * scale)
    return DecoderWeights(
        w1=f(M, P1), b1=f(P1), w2=f(P1, P2), b2=f(P2),
        a_xg_pn=f(P2, 2 * H), a_xg_ctx=f(D, 2 * H), a_bg=f(2 * H) + 1.0,
        a_xc_pn=f(P2, H), a_xc_ctx=f(D, H), a_bc=f(H),
        a_hg=f(H, 2 * H), a_hc=f(H, H),
        wq=f(H, A), v=f(A),
        d_h=f(H, H), d_ctx=f(D, H), d_b=f(H),
        l_xg=tuple(f(H, 2 * H) for _ in range(n_layers)),
        l_bg=tuple(f(2 * H) + 1.0 for _ in range(n_layers)),
        l_xc=tuple(f(H, H) for _ in range(n_layers)),
        l_bc=tuple(f(H) for _ in range(n_layers)),
        l_hg=tuple(f(H, 2 * H) for _ in range(n_layers)),
        l_hc=tuple(f(H, H) for _ in range(n_layers)),
        wf=f(H, r * M), bf=f(r * M))


@pytest.mark.parametrize("B,L,n_steps,dropout,scale", [
    (2, 24, 6, False, 0.3),
    # L not multiple of 128, dropout on; smaller weights keep the
    # autoregressive feedback contractive (ULP noise otherwise amplifies
    # ~30×/step through the tanh/sigmoid recurrences in BOTH impls)
    (3, 130, 4, True, 0.1),
])
def test_decoder_loop_matches_reference(B, L, n_steps, dropout, scale):
    from tacotron_multispeaker_tpu.ops.decoder_loop import (
        decoder_loop_pallas, decoder_loop_reference)
    rs = np.random.RandomState(11)
    M, P1, P2, H, A, D, r = 80, 64, 32, 128, 128, 96, 2
    if jax.default_backend() == "tpu":
        # keep the feedback recurrences contractive under the chip's
        # bf16-precision f32 MXU rounding (softmax amplifies energy noise
        # past any sane tolerance at scale 0.3)
        scale = min(scale, 0.12)
    w = _random_decoder_weights(rs, M, P1, P2, H, A, D, r, scale=scale)
    keys = jnp.asarray(rs.randn(B, L, A).astype(np.float32) * 0.3)
    memory = jnp.asarray(rs.randn(B, L, D).astype(np.float32))
    lengths = np.r_[L, rs.randint(1, L + 1, B - 1)]
    mask = jnp.asarray(np.arange(L)[None, :] < lengths[:, None])
    if dropout:
        dm1 = jnp.asarray(
            rs.binomial(1, 0.5, (n_steps, B, P1)).astype(np.float32) * 2.0)
        dm2 = jnp.asarray(
            rs.binomial(1, 0.5, (n_steps, B, P2)).astype(np.float32) * 2.0)
    else:
        dm1 = jnp.ones((n_steps, B, P1), jnp.float32)
        dm2 = jnp.ones((n_steps, B, P2), jnp.float32)
    attn_h0 = jnp.asarray(rs.randn(B, H).astype(np.float32) * 0.1)
    dec_h0 = jnp.asarray(rs.randn(2, B, H).astype(np.float32) * 0.1)
    f_ref, a_ref = decoder_loop_reference(w, keys, memory, mask, dm1, dm2,
                                          attn_h0, dec_h0, n_steps, M)
    f_p, a_p = decoder_loop_pallas(w, keys, memory, mask, dm1, dm2,
                                   attn_h0, dec_h0, n_steps, M,
                                   interpret=True)
    assert f_p.shape == f_ref.shape and a_p.shape == a_ref.shape
    # interpret mode still executes through the chip's bf16-precision f32
    # MXU when the default backend is the TPU; the feedback recurrences
    # amplify that rounding ~30x/step in BOTH impls -> loose on-chip bounds
    on_tpu = jax.default_backend() == "tpu"
    a_tol = 1e-2 if on_tpu else 1e-4
    f_tol = 5e-2 if on_tpu else 1e-3
    assert np.allclose(np.asarray(a_p), np.asarray(a_ref), atol=a_tol)
    assert np.allclose(np.asarray(f_p), np.asarray(f_ref),
                       atol=f_tol, rtol=f_tol)


def test_generate_fused_decoder_matches_xla():
    """model.generate with the fused decoder-loop kernel (interpret mode)
    allclose to the XLA scan path: same params, dropout off, multispeaker
    decoder_init carries exercised."""
    from tacotron_multispeaker_tpu.config import parse_overrides, tiny
    from tacotron_multispeaker_tpu.models import create_model

    ov = ("model.decoder_depth=128,model.attention_depth=128,"
          "model.prenet_dropout=0.0,model.num_speakers=3,"
          "model.max_iters=6")
    cfg_x = parse_overrides(tiny(), ov)
    cfg_p = parse_overrides(tiny(), ov + ",parallel.use_pallas=true")
    m_x = create_model("tacotron", cfg_x)
    m_p = create_model("tacotron", cfg_p)
    rng = jax.random.PRNGKey(0)
    B, L = 2, 12
    inputs = jax.random.randint(rng, (B, L), 0, 100)
    lengths = jnp.array([12, 8])
    sid = jnp.array([1, 2])
    mels = jax.random.uniform(rng, (B, 10, 80))
    v = m_x.init({"params": rng, "dropout": rng}, inputs, lengths, mels,
                 speaker_ids=sid, train=True)
    v = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    kw = dict(speaker_ids=sid, train=False,
              rngs={"dropout": jax.random.PRNGKey(1)})
    out_x = m_x.apply(v, inputs, lengths, method=m_x.generate, **kw)
    out_p = m_p.apply(v, inputs, lengths, method=m_p.generate, **kw)
    assert out_p.mel_outputs.shape == out_x.mel_outputs.shape
    assert out_p.alignments.shape == out_x.alignments.shape
    assert np.allclose(np.asarray(out_x.alignments),
                       np.asarray(out_p.alignments), atol=1e-3)
    assert np.allclose(np.asarray(out_x.mel_outputs),
                       np.asarray(out_p.mel_outputs), atol=5e-2, rtol=1e-2)


def test_full_model_pallas_matches_xla():
    """Whole forward pass with use_pallas (interpret mode on CPU) allclose
    to the XLA path with identical params."""
    import jax
    from tacotron_multispeaker_tpu.config import parse_overrides, tiny
    from tacotron_multispeaker_tpu.models import create_model

    cfg_x = tiny()
    cfg_p = parse_overrides(tiny(), "parallel.use_pallas=true")
    m_x = create_model("tacotron", cfg_x)
    m_p = create_model("tacotron", cfg_p)
    rng = jax.random.PRNGKey(0)
    B, L, T = 2, 12, 20
    inputs = jax.random.randint(rng, (B, L), 0, 100)
    lengths = jnp.array([12, 8])
    mels = jax.random.uniform(rng, (B, T, 80))
    v = m_x.init({"params": rng, "dropout": rng}, inputs, lengths, mels,
                 train=True)
    kw = dict(train=False, rngs={"dropout": jax.random.PRNGKey(1)},
              mutable=["batch_stats"])
    out_x, _ = m_x.apply(v, inputs, lengths, mels, **kw)
    out_p, _ = m_p.apply(v, inputs, lengths, mels, **kw)
    assert np.allclose(np.asarray(out_x.alignments),
                       np.asarray(out_p.alignments), atol=1e-4)
    assert np.allclose(np.asarray(out_x.mel_outputs),
                       np.asarray(out_p.mel_outputs), atol=1e-3)
    assert np.allclose(np.asarray(out_x.linear_outputs),
                       np.asarray(out_p.linear_outputs), atol=1e-2)


def test_istft_pallas_path_matches():
    from tacotron_multispeaker_tpu.audio import dsp
    params = dsp.STFTParams(128, 32, 128)
    rs = np.random.RandomState(5)
    y = jnp.asarray(rs.randn(2, 1000).astype(np.float32))
    spec = dsp.stft(y, params)
    a = dsp.istft(spec, params, length=1000)
    b = dsp.istft(spec, params, length=1000, use_pallas=True)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("F,n_fft,hop,n_iters,mom", [
    (6, 128, 32, 3, 0.0),
    (11, 128, 48, 2, 0.99 / 1.99),   # hop not dividing n_fft, odd frames
    (8, 256, 100, 4, 0.5),
])
def test_gl_iteration_kernel_matches_reference(F, n_fft, hop, n_iters, mom):
    """Fused GL-iteration kernel (interpret) == plain-XLA banded-operator
    reference: projected spectrum AND momentum state."""
    from tacotron_multispeaker_tpu.ops.gl_iteration import (
        gl_fast_iterations_pallas, gl_fast_iterations_reference)
    rs = np.random.RandomState(0)
    B, bins = 2, n_fft // 2 + 1
    win = jnp.asarray((np.hanning(n_fft) + 0.05).astype(np.float32))
    wf0 = jnp.asarray(rs.randn(B, F, n_fft).astype(np.float32))
    mag = jnp.asarray(np.abs(rs.randn(B, F, bins)).astype(np.float32))
    out_p = gl_fast_iterations_pallas(wf0.astype(jnp.bfloat16), mag, win,
                                      hop, n_iters, mom, interpret=True)
    out_r = gl_fast_iterations_reference(wf0, mag, win, hop, n_iters, mom)
    for a, b, name in zip(out_p, out_r, ["sre", "sim", "pre", "pim"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() < 3e-2 * scale, name


def test_gl_iteration_matches_xla_fast_loop():
    """griffin_lim(use_pallas) — which routes bf16 iterations through the
    fused kernel — tracks the plain XLA bf16 loop on a real spectrogram."""
    from tacotron_multispeaker_tpu.audio import dsp
    from tacotron_multispeaker_tpu.audio.dsp import STFTParams
    params = STFTParams(256, 64, 256)
    rs = np.random.RandomState(1)
    t = np.arange(4096) / 8000.0
    y = (0.5 * np.sin(2 * np.pi * 300 * t)
         + 0.2 * np.sin(2 * np.pi * 900 * t)).astype(np.float32)
    mag = jnp.abs(dsp.stft(jnp.asarray(y), params))[None]  # [1, bins, F]
    key = jax.random.PRNGKey(0)
    wav_x = dsp.griffin_lim(mag, params, 6, key, method="dft_bf16",
                            momentum=0.99, use_pallas=False)
    wav_p = dsp.griffin_lim(mag, params, 6, key, method="dft_bf16",
                            momentum=0.99, use_pallas=True)
    a, b = np.asarray(wav_x), np.asarray(wav_p)
    assert np.isfinite(b).all()
    assert np.abs(a - b).mean() < 2e-2 * max(np.abs(a).max(), 1e-6)


# ----------------------------------------------------------------------------
# teacher_decoder: differentiable fused teacher-forced decoder scan
# ----------------------------------------------------------------------------


def _random_teacher_weights(rs, H=128, A=128, D=256, n_layers=2, scale=0.3):
    from tacotron_multispeaker_tpu.ops.teacher_decoder import (
        TeacherDecoderWeights)
    f = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * scale)
    return TeacherDecoderWeights(
        a_hg=f(H, 2 * H), a_hc=f(H, H), wq=f(H, A), v=f(A),
        w_ctx=f(D, 4 * H), wd_h=f(H, H), d_b=f(H),
        w_r=tuple(f(H, 3 * H) for _ in range(n_layers)),
        b_r=tuple(f(3 * H) for _ in range(n_layers)),
        hg=tuple(f(H, 2 * H) for _ in range(n_layers)),
        hc=tuple(f(H, H) for _ in range(n_layers)))


def _teacher_inputs(rs, S=7, B=4, H=128, A=128, D=256, L=33, scale=0.3):
    f = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * scale)
    lengths = np.array([L, L - 5, 10, L - 1])[:B]
    maskf = jnp.asarray(
        (np.arange(L)[None] < lengths[:, None]).astype(np.float32))
    return (f(S, B, 2 * H), f(S, B, H), f(B, H), f(2, B, H),
            f(B, L, A), f(B, L, D), maskf)


def test_teacher_decoder_forward_matches_reference():
    from tacotron_multispeaker_tpu.ops.teacher_decoder import (
        teacher_decoder, teacher_decoder_reference)
    rs = np.random.RandomState(0)
    # smaller weights on the chip keep the recurrences contractive under
    # bf16-precision f32 MXU rounding (same reasoning as decoder_loop)
    on_tpu = jax.default_backend() == "tpu"
    scale = 0.12 if on_tpu else 0.3
    w = _random_teacher_weights(rs, scale=scale)
    png, pnc, h0a, h0d, keys, memory, maskf = _teacher_inputs(rs, scale=scale)
    xs_r, al_r = teacher_decoder_reference(png, pnc, h0a, h0d, w, keys,
                                           memory, maskf)
    xs_k, al_k = teacher_decoder(png, pnc, h0a, h0d, w, keys, memory,
                                 maskf, not on_tpu, 4)
    # on-chip: f32 MXU matmuls run at bf16 precision and the kernel's op
    # structure differs from the scan's -> loose tolerances (CLAUDE.md)
    tol_x, tol_a = (3e-2, 3e-3) if on_tpu else (1e-4, 1e-5)
    assert np.abs(np.asarray(xs_r - xs_k)).max() < tol_x
    assert np.abs(np.asarray(al_r - al_k)).max() < tol_a


def test_teacher_decoder_grads_match_reference():
    """The custom-VJP reverse-time kernel reproduces jax.grad of the XLA
    scan for EVERY input: prenet projections, initial states, all weights,
    attention keys and memory — including alignment cotangents."""
    from tacotron_multispeaker_tpu.ops.teacher_decoder import (
        teacher_decoder, teacher_decoder_reference)
    rs = np.random.RandomState(1)
    on_tpu = jax.default_backend() == "tpu"
    scale = 0.12 if on_tpu else 0.3
    w = _random_teacher_weights(rs, scale=scale)
    png, pnc, h0a, h0d, keys, memory, maskf = _teacher_inputs(rs, scale=scale)

    def loss(fn):
        def go(args):
            xs, al = fn(*args[:7], maskf)
            return jnp.sum(jnp.sin(xs)) + jnp.sum(al * al)
        return go

    args = (png, pnc, h0a, h0d, w, keys, memory)
    g_ref = jax.grad(loss(lambda *a: teacher_decoder_reference(*a)))(args)
    g_ker = jax.grad(loss(lambda *a: teacher_decoder(*a, not on_tpu, 4)))(
        args)
    flat_r = jax.tree.leaves(g_ref)
    flat_k = jax.tree.leaves(g_ker)
    assert len(flat_r) == len(flat_k)
    tol = 5e-2 if on_tpu else 5e-4   # bf16-precision f32 MXU on chip
    for a, b in zip(flat_r, flat_k):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) < tol * scale


def test_teacher_mel_with_fused_kernel_matches_scan(monkeypatch):
    """Model-level: teacher_mel through the fused kernel == the XLA scan
    path (same params), in float32."""
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.models import create_model
    from tacotron_multispeaker_tpu.ops import teacher_decoder as td_ops

    cfg = get_config("single_speaker",
                     "model.compute_dtype=float32,model.max_iters=4")
    model = create_model("tacotron", cfg)
    rs = np.random.RandomState(3)
    B, L, T = 2, 16, 20
    inputs = jnp.asarray(rs.randint(2, 60, (B, L)), np.int32)
    lengths = jnp.asarray([16, 11], np.int32)
    mels = jnp.asarray(rs.rand(B, T, cfg.audio.num_mels), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           inputs, lengths, mels, train=True)
    run = lambda: model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        inputs, lengths, mels, train=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
        method=model.teacher_mel)
    mel_scan, al_scan = run()
    monkeypatch.setattr(td_ops, "FORCE_PALLAS_TEACHER", True)
    mel_ker, al_ker = run()
    on_tpu = jax.default_backend() == "tpu"
    tol_m, tol_a = (3e-2, 3e-3) if on_tpu else (2e-4, 1e-4)
    assert np.abs(np.asarray(mel_scan - mel_ker)).max() < tol_m
    assert np.abs(np.asarray(al_scan - al_ker)).max() < tol_a


def test_train_step_with_pallas_teacher(monkeypatch):
    """A full train step through the fused teacher-decoder custom VJP
    (forced in interpret mode) yields grads equal to the XLA-scan step."""
    from tacotron_multispeaker_tpu.config import get_config
    from tacotron_multispeaker_tpu.models import create_model
    from tacotron_multispeaker_tpu.ops import teacher_decoder as td_ops
    from tacotron_multispeaker_tpu.training import (create_train_state,
                                                    make_train_step)
    cfg = get_config("single_speaker",
                     "model.compute_dtype=float32,model.max_iters=4")
    rs = np.random.RandomState(13)
    B, L, T = 2, 16, 20
    batch = (jnp.asarray(rs.randint(2, 60, (B, L)), np.int32),
             jnp.full((B,), L, np.int32),
             jnp.asarray(rs.rand(B, T, cfg.audio.num_mels), np.float32),
             jnp.asarray(rs.rand(B, T, cfg.audio.num_freq), np.float32),
             jnp.full((B,), T, np.int32),
             jnp.zeros((B,), np.int32))

    def one_step():
        model, state = create_train_state(cfg, jax.random.PRNGKey(0))
        new_state, metrics = make_train_step(cfg, model)(state, *batch)
        return metrics

    m_scan = one_step()
    monkeypatch.setattr(td_ops, "FORCE_PALLAS_TEACHER", True)
    m_ker = one_step()
    on_tpu = jax.default_backend() == "tpu"
    tol_l, tol_g = (1e-2, 1e-1) if on_tpu else (1e-4, 1e-2)
    assert np.isfinite(float(m_ker["loss"]))
    assert abs(float(m_ker["loss"]) - float(m_scan["loss"])) < tol_l
    assert abs(float(m_ker["grad_norm"]) - float(m_scan["grad_norm"])) \
        < tol_g * max(float(m_scan["grad_norm"]), 1.0)
