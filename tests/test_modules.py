"""Module-level tests: GRU semantics, fused conv bank, highway, prenet
(SURVEY.md §4.1/4.3 — numpy oracles; TF oracles live in test_oracle_tf.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tacotron_multispeaker_tpu.models.modules import (
    BiGRU, CBHG, ConvBank, GRU, GRUCellParams, HighwayNet, Prenet,
    _bank_mask, reverse_sequences)


def _init(mod, *args, **kw):
    return mod.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, *args, **kw)


def np_gru_step(h, x, Wxg, bg, Whg, Wxc, bc, Whc):
    """Legacy-TF GRUCell reference: r,u = sig(xWxg + hWhg + bg);
    c = tanh(xWxc + (r*h)Whc + bc); h' = u*h + (1-u)*c."""
    gates = 1 / (1 + np.exp(-(x @ Wxg + h @ Whg + bg)))
    r, u = np.split(gates, 2, axis=-1)
    c = np.tanh(x @ Wxc + (r * h) @ Whc + bc)
    return u * h + (1 - u) * c


def test_gru_cell_matches_numpy_reference():
    F, B, D = 8, 3, 5
    cell = GRUCellParams(F)
    x = jnp.asarray(np.random.RandomState(0).randn(B, D).astype(np.float32))
    h = jnp.asarray(np.random.RandomState(1).randn(B, F).astype(np.float32))
    v = _init(cell, h, x)
    out = cell.apply(v, h, x)
    p = v["params"]
    ref = np_gru_step(np.asarray(h), np.asarray(x),
                      np.asarray(p["xg"]["kernel"]), np.asarray(p["xg"]["bias"]),
                      np.asarray(p["hg"]["kernel"]),
                      np.asarray(p["xc"]["kernel"]), np.asarray(p["xc"]["bias"]),
                      np.asarray(p["hc"]["kernel"]))
    # on-chip, f32 MXU matmuls run at bf16 precision (CLAUDE.md)
    atol = 3e-2 if jax.default_backend() == "tpu" else 1e-5
    assert np.allclose(np.asarray(out), ref, atol=atol)


def test_gru_gate_bias_init_is_one():
    cell = GRUCellParams(4)
    v = _init(cell, jnp.zeros((1, 4)), jnp.zeros((1, 3)))
    assert np.allclose(np.asarray(v["params"]["xg"]["bias"]), 1.0)


def test_gru_sequence_matches_stepwise():
    F, B, T, D = 6, 2, 7, 4
    gru = GRU(F)
    xs = jnp.asarray(np.random.RandomState(0).randn(B, T, D).astype(np.float32))
    lengths = jnp.array([7, 5])
    v = _init(gru, xs, lengths)
    ys = gru.apply(v, xs, lengths)
    # manual stepwise scan through the cell with the same params
    cell = GRUCellParams(F)
    cv = {"params": v["params"]["cell"]}
    h = jnp.zeros((B, F))
    outs = []
    for t in range(T):
        h = cell.apply(cv, h, xs[:, t])
        outs.append(h)
    ref = jnp.stack(outs, axis=1)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
    ref = jnp.where(mask, ref, 0.0)
    assert np.allclose(np.asarray(ys), np.asarray(ref), atol=1e-5)


def test_reverse_sequences():
    xs = jnp.asarray(np.arange(2 * 5 * 1).reshape(2, 5, 1).astype(np.float32))
    lengths = jnp.array([5, 3])
    r = np.asarray(reverse_sequences(xs, lengths))
    assert list(r[0, :, 0]) == [4, 3, 2, 1, 0]
    # only first 3 reversed; padding (idx 3,4) stays in place
    assert list(r[1, :, 0]) == [7, 6, 5, 8, 9]


def test_bigru_backward_sees_only_valid_region():
    """Backward output at t=0 must be identical whether padding differs."""
    F, B, T, D = 4, 1, 6, 3
    bigru = BiGRU(F)
    rs = np.random.RandomState(0)
    base = rs.randn(B, T, D).astype(np.float32)
    x1 = base.copy()
    x2 = base.copy()
    x2[:, 4:, :] = 99.0  # garbage in padding
    lengths = jnp.array([4])
    v = _init(bigru, jnp.asarray(x1), lengths)
    y1 = np.asarray(bigru.apply(v, jnp.asarray(x1), lengths))
    y2 = np.asarray(bigru.apply(v, jnp.asarray(x2), lengths))
    assert np.allclose(y1[:, :4], y2[:, :4], atol=1e-6)


def test_bank_mask_alignment():
    K, C = 4, 2
    m = _bank_mask(K, C)
    assert m.shape == (K, 1, K * C)
    # width-1 group: exactly one tap at the center
    center = (K - 1) // 2
    g1 = m[:, 0, 0:C]
    assert g1.sum() == C and g1[center].all()
    # width-K group: all taps
    gK = m[:, 0, (K - 1) * C:]
    assert gK.all()


def test_conv_bank_matches_separate_convs():
    """Fused masked width-K conv == K separate SAME convs (pre-BN)."""
    K, C, B, T, D = 4, 3, 2, 9, 5
    bank = ConvBank(K, C)
    xs = jnp.asarray(np.random.RandomState(0).randn(B, T, D).astype(np.float32))
    v = _init(bank, xs, train=False)
    kernel = np.asarray(v["params"]["kernel"]) * np.asarray(_bank_mask(K, C))
    bias = np.asarray(v["params"]["bias"])
    # reference: per-width SAME conv with the corresponding kernel slice
    outs = []
    for k in range(1, K + 1):
        off = (K - 1) // 2 - (k - 1) // 2
        sub = kernel[off: off + k, :, (k - 1) * C: k * C]   # [k, D, C]
        pad_l, pad_r = (k - 1) // 2, k // 2
        xp = np.pad(np.asarray(xs), ((0, 0), (pad_l, pad_r), (0, 0)))
        o = np.zeros((B, T, C), np.float32)
        for t in range(T):
            win = xp[:, t: t + k, :]                        # [B, k, D]
            o[:, t] = np.einsum("bkd,kdc->bc", win, sub)
        outs.append(o + bias[(k - 1) * C: k * C])
    ref = np.maximum(np.concatenate(outs, axis=-1), 0.0)
    # compare pre-BN: apply with BN in eval mode and identity stats
    y = np.asarray(bank.apply(v, xs, train=False))
    # eval-mode BN with initialized (0 mean, 1 var) stats ≈ identity (eps>0)
    atol = 3e-2 if jax.default_backend() == "tpu" else 1e-4
    assert np.allclose(y, ref / np.sqrt(1 + 1e-3), atol=atol)


def test_highway_identity_when_gate_closed():
    hw = HighwayNet(6)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6).astype(np.float32))
    v = _init(hw, x)
    # zero the T-gate weights and push bias very negative → y == x
    p = jax.tree.map(lambda a: a, v["params"])
    p["T"]["kernel"] = jnp.zeros_like(p["T"]["kernel"])
    p["T"]["bias"] = jnp.full_like(p["T"]["bias"], -20.0)
    y = hw.apply({"params": p}, x)
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_prenet_dropout_always_on():
    pn = Prenet((16, 8), dropout_rate=0.5)
    x = jnp.ones((4, 10))
    v = _init(pn, x)
    y1 = pn.apply(v, x, rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = pn.apply(v, x, rngs={"dropout": jax.random.PRNGKey(2)})
    # different rngs → different outputs (dropout active)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # same rng → deterministic
    y3 = pn.apply(v, x, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.allclose(np.asarray(y1), np.asarray(y3))


def test_cbhg_shapes_and_batchstats():
    cbhg = CBHG(bank_k=4, bank_channels=8, proj_channels=(8, 6),
                highway_layers=2, highway_depth=10, gru_units=5)
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 12, 6).astype(np.float32))
    lengths = jnp.array([12, 9])
    v = _init(cbhg, xs, lengths, train=True)
    assert "batch_stats" in v
    y, updates = cbhg.apply(v, xs, lengths, train=True,
                            mutable=["batch_stats"])
    assert y.shape == (2, 12, 10)
    # train step must update running stats
    before = np.asarray(v["batch_stats"]["bank"]["bn"]["mean"])
    after = np.asarray(updates["batch_stats"]["bank"]["bn"]["mean"])
    assert not np.allclose(before, after)
