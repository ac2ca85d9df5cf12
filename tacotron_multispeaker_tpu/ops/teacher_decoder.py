"""Pallas TPU kernel: the teacher-forced decoder scan, fused AND differentiable.

The training twin of ops/decoder_loop.py (which fuses the autoregressive
inference decode, forward-only).  The teacher-forced scan is the largest
sequential block of the train step (BASELINE.md round-3 breakdown): as an
XLA scan every one of the T/r steps re-reads the recurrent/attention weights
from HBM in BOTH the forward and the backward pass.

Forward kernel: one ``pallas_call`` over time chunks — all decoder weights
and the attention keys/memory VMEM-resident across every step; carries
(attention-GRU state, residual-GRU states, context block) live in VMEM
scratch; the precomputed prenet projections stream in; the per-step pre-
frame-projection activations, alignments, and the recurrent states needed
for rematerialization stream out.

Backward kernel: reverse-time over the same chunks.  Gates and attention
activations are REMATERIALIZED from the streamed states (saving them would
multiply the forward's HBM traffic); every weight gradient and the
attention-key/memory gradients accumulate in float32 VMEM scratch across
the whole grid and flush once — the backward, like the forward, does zero
HBM weight traffic.

Semantics are identical to the restructured ``Tacotron.teacher_mel`` scan
body (models/tacotron.py): merged context projection ``w_ctx`` (dec_in
context half + attention-GRU xg/xc context halves), prenet halves of the
attention-GRU input projections precomputed outside, r-frame output
projection applied after the scan by the caller.  Bahdanau attention only.
Requires H % 128 == 0 and A % 128 == 0.

Reference parity: the fused math equals models/tacotron.DecoderCell +
models/attention.BahdanauAttention (SURVEY.md §2.8-2.9) step for step;
``teacher_decoder_reference`` is the XLA mirror used by the equivalence
tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Test hook: force the kernel (interpret mode) off-TPU so the full
# train-step-through-custom-VJP path is exercisable on CPU (mirrors
# models/modules.FORCE_PALLAS_GRU).
FORCE_PALLAS_TEACHER = False
# see models/modules.FORCE_PALLAS_INTERPRET — same role for this kernel
FORCE_PALLAS_INTERPRET = False


def vmem_eligible(B: int, L: int, A: int, D: int,
                  itemsize: int = 2) -> bool:
    """True when the fused kernels fit the per-core VMEM budget.

    Accounts the dims the kernels ACTUALLY use (ADVICE r3: the old gate
    used unpadded L, so L just past a 128 boundary under-estimated 2×):
    B rounds to 8, L to 128.  The dominant VMEM tenants after the round-4
    backward split (the [B,L,A]/[B,L,D] f32 accumulators moved out of the
    sequential kernel) are the resident keys+memory plus the per-step f32
    ``act``/``dpre`` temporaries — streamed blocks and weights ride in the
    remaining headroom of the 128 MB/core VMEM (kernels request a 120 MB
    limit)."""
    B_pad = _round_up(B, 8)
    L_pad = _round_up(L, 128)
    resident = B_pad * L_pad * (A + D) * itemsize     # keys + memory
    act_tmp = 2 * B_pad * L_pad * A * 4               # tanh act + dpre (f32)
    return resident + act_tmp <= 104 * 1024 * 1024


class TeacherDecoderWeights(NamedTuple):
    """Decoder-scan parameters (shapes: H=decoder_depth, A=attention_depth,
    D=memory depth, N=decoder_layers)."""

    a_hg: jnp.ndarray    # [H, 2H] attention-GRU recurrent gate weights
    a_hc: jnp.ndarray    # [H, H]  attention-GRU recurrent candidate weights
    wq: jnp.ndarray      # [H, A]  attention query projection
    v: jnp.ndarray       # [A]     attention energy vector
    w_ctx: jnp.ndarray   # [D, 4H] merged context projection
    wd_h: jnp.ndarray    # [H, H]  dec_in Dense (attn_h half)
    d_b: jnp.ndarray     # [H]
    w_r: tuple           # N × [H, 3H] residual-GRU merged input projections
    b_r: tuple           # N × [3H]
    hg: tuple            # N × [H, 2H] residual-GRU recurrent gate weights
    hc: tuple            # N × [H, H]  residual-GRU recurrent candidate


def _gru_fwd(h, xg, xc, whg_ref, whc_ref, H, cdt):
    gates = jax.nn.sigmoid(
        xg + jnp.dot(h.astype(cdt), whg_ref[:, :],
                     preferred_element_type=jnp.float32))
    r, u = gates[:, :H], gates[:, H:]
    c = jnp.tanh(
        xc + jnp.dot((r * h).astype(cdt), whc_ref[:, :],
                     preferred_element_type=jnp.float32))
    return u * h + (1.0 - u) * c


def _fwd_kernel(*refs, n_layers: int, H: int, chunk: int):
    (png_ref, pnc_ref, keys_ref, mem_ref, mask_ref, h0a_ref, h0d_ref,
     a_hg, a_hc, wq, v_ref, w_ctx, wd_h, d_b) = refs[:14]
    pos = 14
    w_r = refs[pos:pos + n_layers]; pos += n_layers
    b_r = refs[pos:pos + n_layers]; pos += n_layers
    hg = refs[pos:pos + n_layers]; pos += n_layers
    hc = refs[pos:pos + n_layers]; pos += n_layers
    xs_ref, align_ref, ha_ref = refs[pos:pos + 3]; pos += 3
    hd_refs = refs[pos:pos + n_layers]; pos += n_layers
    ha_scr = refs[pos]; pos += 1
    hd_scrs = refs[pos:pos + n_layers]; pos += n_layers
    cb_scr = refs[pos]

    cdt = keys_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        ha_scr[:, :] = h0a_ref[:, :].astype(jnp.float32)
        for i in range(n_layers):
            hd_scrs[i][:, :] = h0d_ref[i].astype(jnp.float32)
        cb_scr[:, :] = jnp.zeros_like(cb_scr)

    mask = mask_ref[:, :] > 0

    def body(t, carry):
        h_a, h_ds, cb = carry
        xg = png_ref[t].astype(jnp.float32) + cb[:, H: 3 * H]
        xc = pnc_ref[t].astype(jnp.float32) + cb[:, 3 * H:]
        h_a = _gru_fwd(h_a, xg, xc, a_hg, a_hc, H, cdt)
        ha_ref[t] = h_a.astype(ha_ref.dtype)
        q = jnp.dot(h_a.astype(cdt), wq[:, :],
                    preferred_element_type=jnp.float32)
        act = jnp.tanh(keys_ref[:, :, :].astype(jnp.float32) + q[:, None, :])
        e = jnp.sum(act * v_ref[:, :].astype(jnp.float32), axis=-1)
        e = jnp.where(mask, e, -1e9)
        p = jnp.exp(e - jnp.max(e, axis=-1, keepdims=True))
        p = p * mask.astype(jnp.float32)
        p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-9)
        align_ref[t] = p.astype(align_ref.dtype)
        ctx = jax.lax.dot_general(
            p[:, None, :].astype(cdt), mem_ref[:, :, :],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]          # [B, D]
        cb = jnp.dot(ctx.astype(cdt), w_ctx[:, :],
                     preferred_element_type=jnp.float32)          # [B, 4H]
        x = (jnp.dot(h_a.astype(cdt), wd_h[:, :],
                     preferred_element_type=jnp.float32)
             + cb[:, :H] + d_b[:, :])
        new_hds = []
        for i in range(n_layers):
            xgc = (jnp.dot(x.astype(cdt), w_r[i][:, :],
                           preferred_element_type=jnp.float32) + b_r[i][:, :])
            h_i = _gru_fwd(h_ds[i], xgc[:, : 2 * H], xgc[:, 2 * H:],
                           hg[i], hc[i], H, cdt)
            hd_refs[i][t] = h_i.astype(hd_refs[i].dtype)
            new_hds.append(h_i)
            x = x + h_i
        xs_ref[t] = x.astype(xs_ref.dtype)
        return h_a, tuple(new_hds), cb

    h_a, h_ds, cb = jax.lax.fori_loop(
        0, chunk, body,
        (ha_scr[:, :], tuple(s[:, :] for s in hd_scrs), cb_scr[:, :]))
    ha_scr[:, :] = h_a
    for i in range(n_layers):
        hd_scrs[i][:, :] = h_ds[i]
    cb_scr[:, :] = cb


# streamed per (step, batch-row): png 2H + pnc H in; xs H + align L + ha H +
# hd N*H out — sized against the same scoped-VMEM budget as ops/gru_scan.py
_VMEM_BLOCK_BUDGET = 8 * 1024 * 1024


def _auto_chunk(requested: int, S: int, B_pad: int, floats_per_step: int,
                itemsize: int = 4) -> int:
    per_t = B_pad * floats_per_step * itemsize
    max_chunk = max(_VMEM_BLOCK_BUDGET // (2 * per_t), 4)
    chunk = min(requested, max_chunk, _round_up(S, 4))
    return max((chunk // 4) * 4, 4)


@functools.partial(jax.jit, static_argnames=("interpret", "time_chunk"))
def _teacher_decoder_fwd_pallas(png, pnc, h0a, h0d, weights, keys, memory,
                                maskf, interpret=False, time_chunk=64):
    S, B, H2 = png.shape
    H = H2 // 2
    B0, L, A = keys.shape
    D = memory.shape[-1]
    n_layers = len(weights.w_r)
    assert H % 128 == 0 and A % 128 == 0

    L_pad = _round_up(L, 128)
    B_pad = _round_up(B, 8)
    chunk = _auto_chunk(time_chunk, S, B_pad,
                        3 * H + H + L_pad + H + n_layers * H)
    S_pad = _round_up(S, chunk)
    mask = maskf > 0.5
    if L_pad != L:
        keys = jnp.pad(keys, ((0, 0), (0, L_pad - L), (0, 0)))
        memory = jnp.pad(memory, ((0, 0), (0, L_pad - L), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, L_pad - L)))
    if B_pad != B:
        pad = ((0, B_pad - B), (0, 0))
        keys = jnp.pad(keys, ((0, B_pad - B), (0, 0), (0, 0)))
        memory = jnp.pad(memory, ((0, B_pad - B), (0, 0), (0, 0)))
        mask = jnp.pad(mask, pad)
        mask = mask.at[B:, 0].set(True)
        h0a = jnp.pad(h0a, pad)
        h0d = jnp.pad(h0d, ((0, 0),) + pad)
    if S_pad != S or B_pad != B:
        spad = ((0, S_pad - S), (0, B_pad - B), (0, 0))
        png = jnp.pad(png, spad)
        pnc = jnp.pad(pnc, spad)

    cdt = keys.dtype
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    w_inputs = [
        weights.a_hg.astype(cdt), weights.a_hc.astype(cdt),
        weights.wq.astype(cdt), weights.v.reshape(1, -1).astype(cdt),
        weights.w_ctx.astype(cdt), weights.wd_h.astype(cdt), row(weights.d_b),
        *[w.astype(cdt) for w in weights.w_r],
        *[row(b) for b in weights.b_r],
        *[w.astype(cdt) for w in weights.hg],
        *[w.astype(cdt) for w in weights.hc],
    ]
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    stream = lambda feat: pl.BlockSpec((chunk, B_pad, feat),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=n_layers, H=H, chunk=chunk),
        out_shape=(
            jax.ShapeDtypeStruct((S_pad, B_pad, H), jnp.float32),     # xs
            jax.ShapeDtypeStruct((S_pad, B_pad, L_pad), jnp.float32),  # align
            jax.ShapeDtypeStruct((S_pad, B_pad, H), jnp.float32),     # ha
            *[jax.ShapeDtypeStruct((S_pad, B_pad, H), jnp.float32)
              for _ in range(n_layers)],                              # hd_i
        ),
        grid=(S_pad // chunk,),
        in_specs=[
            stream(2 * H), stream(H),
            const((B_pad, L_pad, A)), const((B_pad, L_pad, D)),
            const((B_pad, L_pad)),
            const((B_pad, H)), const((n_layers, B_pad, H)),
            *[const(w.shape) for w in w_inputs],
        ],
        out_specs=(stream(H), stream(L_pad), stream(H),
                   *[stream(H) for _ in range(n_layers)]),
        scratch_shapes=[pltpu.VMEM((B_pad, H), jnp.float32),
                        *[pltpu.VMEM((B_pad, H), jnp.float32)
                          for _ in range(n_layers)],
                        pltpu.VMEM((B_pad, 4 * H), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(png, pnc, keys, memory, mask.astype(jnp.int32), h0a.astype(cdt),
      h0d.astype(cdt), *w_inputs)
    xs, align, ha = outs[0], outs[1], outs[2]
    hds = outs[3:]
    trim = lambda a: a[:S, :B]
    return (trim(xs), trim(align)[:, :, :L], trim(ha),
            tuple(trim(h) for h in hds))


def _dkeys_kernel(keys_ref, q_ref, de_ref, v_ref, dkeys_ref, *, chunk: int):
    """dkeys[b,l,a] = Σ_t de[t,b,l]·v[a]·(1 − tanh²(keys[b,l,a]+q[t,b,a])).

    Grid (L-blocks, S-chunks) with S innermost: each L-block's [B,Lblk,A]
    f32 accumulator stays resident in its output window across all time
    chunks (standard revisiting pattern), so peak VMEM is ONE L-block —
    this is the time-parallel half of the split backward; nothing here is
    sequential, every (l, s) cell is independent work."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        dkeys_ref[...] = jnp.zeros_like(dkeys_ref)

    def body(t, _):
        act = jnp.tanh(keys_ref[:, :, :].astype(jnp.float32)
                       + q_ref[t][:, None, :])
        dkeys_ref[...] += (de_ref[t][:, :, None]
                           * v_ref[:, :].astype(jnp.float32)[None]
                           * (1.0 - act * act))
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _dkeys_pallas(keys, q, de, v, chunk: int, interpret: bool = False):
    """keys [B,L,A] (padded, compute dtype), q [S,B,A] f32, de [S,B,L] f32,
    v [1,A] → dkeys [B,L,A] f32.  S must divide by ``chunk``, L by 128."""
    B_pad, L_pad, A = keys.shape
    S_pad = q.shape[0]
    Lblk = min(L_pad, 128)
    return pl.pallas_call(
        functools.partial(_dkeys_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((B_pad, L_pad, A), jnp.float32),
        grid=(L_pad // Lblk, S_pad // chunk),
        in_specs=[
            pl.BlockSpec((B_pad, Lblk, A), lambda l, s: (0, l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B_pad, A), lambda l, s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B_pad, Lblk), lambda l, s: (s, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda l, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_pad, Lblk, A), lambda l, s: (0, l, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(keys, q, de, v)


def _bwd_kernel(*refs, n_layers: int, H: int, chunk: int, n_chunks: int):
    (png_ref, pnc_ref, ha_ref, hap_ref, xs_ref, p_ref, pp_ref,
     dx_ref, dal_ref) = refs[:9]
    pos = 9
    hd_refs = refs[pos:pos + n_layers]; pos += n_layers
    hdp_refs = refs[pos:pos + n_layers]; pos += n_layers
    (keys_ref, mem_ref, mask_ref,
     a_hg, a_hc, wq, v_ref, w_ctx, wd_h) = refs[pos:pos + 9]
    pos += 9
    w_r = refs[pos:pos + n_layers]; pos += n_layers
    b_r = refs[pos:pos + n_layers]; pos += n_layers
    hg = refs[pos:pos + n_layers]; pos += n_layers
    hc = refs[pos:pos + n_layers]; pos += n_layers
    # outputs — round 4: the [B,L,A]/[B,L,D] f32 dkeys/dmemory accumulators
    # are GONE from this kernel (they were the VMEM cliff that excluded
    # L=192 and B=256 — VERDICT r3 Missing #3).  The sequential pass now
    # streams out the per-step softmax-energy grad ``de`` and context grad
    # ``dctx``; dmemory is one batched MXU contraction outside
    # (einsum sbl,sbd->bld) and dkeys is the L-parallel accumulation kernel
    # ``_dkeys_pallas`` below.  Weight grads (small) stay in-kernel.
    dpng_ref, dpnc_ref, de_out_ref, dctx_out_ref = refs[pos:pos + 4]
    pos += 4
    (dh0a_ref, dh0d_ref,
     d_a_hg_ref, d_a_hc_ref, dwq_ref, dv_ref, dw_ctx_ref, dwd_h_ref,
     d_db_ref) = refs[pos:pos + 9]
    pos += 9
    dw_r_refs = refs[pos:pos + n_layers]; pos += n_layers
    db_r_refs = refs[pos:pos + n_layers]; pos += n_layers
    dhg_refs = refs[pos:pos + n_layers]; pos += n_layers
    dhc_refs = refs[pos:pos + n_layers]; pos += n_layers
    # scratch: only the small reverse-time carries
    (dha_scr,) = refs[pos:pos + 1]; pos += 1
    dhd_scrs = refs[pos:pos + n_layers]; pos += n_layers
    dcbg_scr, dcbc_scr = refs[pos:pos + 2]

    cdt = keys_ref.dtype
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        for s in (dha_scr, *dhd_scrs, dcbg_scr, dcbc_scr,
                  d_a_hg_ref, d_a_hc_ref, dwq_ref, dv_ref,
                  dw_ctx_ref, dwd_h_ref, d_db_ref, *dw_r_refs, *db_r_refs,
                  *dhg_refs, *dhc_refs):
            s[...] = jnp.zeros_like(s)

    mask = mask_ref[:, :] > 0
    dot_nt = lambda x, w: jax.lax.dot_general(
        x.astype(cdt), w, (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dot_tn = lambda x, y: jax.lax.dot_general(
        x.astype(cdt), y.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32)

    def gru_bwd(d_h_total, xg, xc, h_prev, whg_ref, whc_ref):
        """Rematerialize a legacy-GRU step and back-prop through it.
        Returns (dg_pre [B,2H], da_c [B,H], dh_prev, dwhg, dwhc)."""
        gates = jax.nn.sigmoid(
            xg + jnp.dot(h_prev.astype(cdt), whg_ref[:, :],
                         preferred_element_type=f32))
        r, u = gates[:, :H], gates[:, H:]
        rh = r * h_prev
        c = jnp.tanh(xc + jnp.dot(rh.astype(cdt), whc_ref[:, :],
                                  preferred_element_type=f32))
        dc = d_h_total * (1.0 - u)
        du = d_h_total * (h_prev - c)
        da_c = dc * (1.0 - c * c)
        drh = dot_nt(da_c, whc_ref[:, :])
        dr = drh * h_prev
        dg_pre = jnp.concatenate([dr * r * (1.0 - r), du * u * (1.0 - u)],
                                 axis=-1)
        dh_prev = d_h_total * u + drh * r + dot_nt(dg_pre, whg_ref[:, :])
        dwhg = dot_tn(h_prev, dg_pre)
        dwhc = dot_tn(rh, da_c)
        return dg_pre, da_c, dh_prev, dwhg, dwhc

    def body(k, carry):
        t = chunk - 1 - k
        dha, dhds, dcbg, dcbc = carry

        dx = dx_ref[t].astype(f32)
        x_cur = xs_ref[t].astype(f32)
        new_dhds = list(dhds)
        for i in range(n_layers - 1, -1, -1):
            h_i = hd_refs[i][t].astype(f32)
            h_prev_i = hdp_refs[i][t].astype(f32)
            x_im1 = x_cur - h_i
            xgc = (jnp.dot(x_im1.astype(cdt), w_r[i][:, :],
                           preferred_element_type=f32) + b_r[i][:, :])
            d_h_total = dx + new_dhds[i]
            dg_pre, da_c, dh_prev, dwhg, dwhc = gru_bwd(
                d_h_total, xgc[:, : 2 * H], xgc[:, 2 * H:], h_prev_i,
                hg[i], hc[i])
            new_dhds[i] = dh_prev
            dhg_refs[i][...] += dwhg
            dhc_refs[i][...] += dwhc
            dw_r_refs[i][...] += jnp.concatenate(
                [dot_tn(x_im1, dg_pre), dot_tn(x_im1, da_c)], axis=1)
            db_r_refs[i][...] += jnp.concatenate(
                [jnp.sum(dg_pre, 0, keepdims=True),
                 jnp.sum(da_c, 0, keepdims=True)], axis=1)
            dx = (dx + dot_nt(dg_pre, w_r[i][:, : 2 * H])
                  + dot_nt(da_c, w_r[i][:, 2 * H:]))
            x_cur = x_im1
        # dx == grad wrt x0
        dha_loc = dot_nt(dx, wd_h[:, :])
        dwd_h_ref[...] += dot_tn(ha_ref[t].astype(f32), dx)
        d_db_ref[...] += jnp.sum(dx, 0, keepdims=True)

        # context-block grad: cols [0:H] from x0, [H:4H] carried from t+1
        p = p_ref[t].astype(f32)
        ctx = jax.lax.dot_general(
            p[:, None, :].astype(cdt), mem_ref[:, :, :],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)[:, 0, :]
        dcb = jnp.concatenate([dx, dcbg, dcbc], axis=-1)       # [B, 4H]
        dw_ctx_ref[...] += dot_tn(ctx, dcb)
        dctx = dot_nt(dcb, w_ctx[:, :])                        # [B, D]
        dctx_out_ref[t] = dctx                                 # → dmemory
        # attention backward
        dp = jax.lax.dot_general(
            dctx[:, None, :].astype(cdt), mem_ref[:, :, :],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)[:, 0, :] + dal_ref[t].astype(f32)
        de = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        de_out_ref[t] = de                                     # → dkeys
        h_a = ha_ref[t].astype(f32)
        q = jnp.dot(h_a.astype(cdt), wq[:, :], preferred_element_type=f32)
        act = jnp.tanh(keys_ref[:, :, :].astype(f32) + q[:, None, :])
        dv_ref[...] += jnp.sum(de[:, :, None] * act, axis=(0, 1))[None, :]
        dpre = (de[:, :, None] * v_ref[:, :].astype(f32)[None]
                * (1.0 - act * act))                           # [B, L, A]
        dq = jnp.sum(dpre, axis=1)                             # [B, A]
        dha_loc = dha_loc + dot_nt(dq, wq[:, :])
        dwq_ref[...] += dot_tn(h_a, dq)
        # attention-GRU backward (remat xg/xc from pn + prev context block)
        pp = pp_ref[t].astype(f32)
        ctx_prev = jax.lax.dot_general(
            pp[:, None, :].astype(cdt), mem_ref[:, :, :],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)[:, 0, :]
        cb_prev = jnp.dot(ctx_prev.astype(cdt), w_ctx[:, :],
                          preferred_element_type=f32)
        xg_t = png_ref[t].astype(f32) + cb_prev[:, H: 3 * H]
        xc_t = pnc_ref[t].astype(f32) + cb_prev[:, 3 * H:]
        h_prev_a = hap_ref[t].astype(f32)
        d_h_total = dha_loc + dha
        dg_pre_a, da_c_a, dh_prev_a, dwhg_a, dwhc_a = gru_bwd(
            d_h_total, xg_t, xc_t, h_prev_a, a_hg, a_hc)
        d_a_hg_ref[...] += dwhg_a
        d_a_hc_ref[...] += dwhc_a
        dpng_ref[t] = dg_pre_a.astype(dpng_ref.dtype)
        dpnc_ref[t] = da_c_a.astype(dpnc_ref.dtype)
        return dh_prev_a, tuple(new_dhds), dg_pre_a, da_c_a

    carry0 = (dha_scr[:, :], tuple(s[:, :] for s in dhd_scrs),
              dcbg_scr[:, :], dcbc_scr[:, :])
    dha, dhds, dcbg, dcbc = jax.lax.fori_loop(0, chunk, body, carry0)
    dha_scr[:, :] = dha
    for i in range(n_layers):
        dhd_scrs[i][:, :] = dhds[i]
    dcbg_scr[:, :] = dcbg
    dcbc_scr[:, :] = dcbc

    @pl.when(pl.program_id(0) == n_chunks - 1)
    def _():
        dh0a_ref[...] = dha
        for i in range(n_layers):
            dh0d_ref[i] = dhds[i]


@functools.partial(jax.jit, static_argnames=("interpret", "time_chunk"))
def _teacher_decoder_bwd_pallas(png, pnc, ha, hap, hds, hdps, xs, p, pp,
                                dxs, dalign, weights, keys, memory, maskf,
                                interpret=False, time_chunk=64):
    S, B, H2 = png.shape
    H = H2 // 2
    _, L, A = keys.shape
    D = memory.shape[-1]
    n_layers = len(weights.w_r)

    L_pad = _round_up(L, 128)
    B_pad = _round_up(B, 8)
    # streamed floats per (step, batch-row): in png 2H + pnc H + ha/hap/xs
    # 3H + p/pp/dal 3L + dxs H + hds/hdps 2N·H; out dpng 2H + dpnc H +
    # de L + dctx D
    chunk = _auto_chunk(time_chunk, S, B_pad,
                        (10 + 2 * n_layers) * H + 4 * L_pad + D)
    S_pad = _round_up(S, chunk)
    mask = maskf > 0.5
    if L_pad != L:
        keys = jnp.pad(keys, ((0, 0), (0, L_pad - L), (0, 0)))
        memory = jnp.pad(memory, ((0, 0), (0, L_pad - L), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, L_pad - L)))
    if B_pad != B:
        keys = jnp.pad(keys, ((0, B_pad - B), (0, 0), (0, 0)))
        memory = jnp.pad(memory, ((0, B_pad - B), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, B_pad - B), (0, 0)))
        mask = mask.at[B:, 0].set(True)
    spad3 = lambda a: jnp.pad(
        a, ((0, S_pad - S), (0, B_pad - B), (0, 0)))
    png, pnc, ha, hap, xs, dxs = map(spad3, (png, pnc, ha, hap, xs, dxs))
    hds = tuple(map(spad3, hds))
    hdps = tuple(map(spad3, hdps))
    p = spad3(p) if (S_pad != S or B_pad != B) else p
    pp = spad3(pp) if (S_pad != S or B_pad != B) else pp
    if L_pad != L:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, L_pad - L)))
        pp = jnp.pad(pp, ((0, 0), (0, 0), (0, L_pad - L)))
        dalign = jnp.pad(dalign, ((0, 0), (0, 0), (0, L_pad - L)))
    dalign = spad3(dalign)

    cdt = keys.dtype
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    w_inputs = [
        weights.a_hg.astype(cdt), weights.a_hc.astype(cdt),
        weights.wq.astype(cdt), weights.v.reshape(1, -1).astype(cdt),
        weights.w_ctx.astype(cdt), weights.wd_h.astype(cdt),
        *[w.astype(cdt) for w in weights.w_r],
        *[row(b) for b in weights.b_r],
        *[w.astype(cdt) for w in weights.hg],
        *[w.astype(cdt) for w in weights.hc],
    ]
    n_chunks = S_pad // chunk
    rev = lambda i: (n_chunks - 1 - i, 0, 0)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    stream = lambda feat: pl.BlockSpec((chunk, B_pad, feat), rev,
                                       memory_space=pltpu.VMEM)

    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((S_pad, B_pad, 2 * H), f32),   # dpng
        jax.ShapeDtypeStruct((S_pad, B_pad, H), f32),       # dpnc
        jax.ShapeDtypeStruct((S_pad, B_pad, L_pad), f32),   # de (→ dkeys)
        jax.ShapeDtypeStruct((S_pad, B_pad, D), f32),       # dctx (→ dmem)
        jax.ShapeDtypeStruct((B_pad, H), f32),              # dh0a
        jax.ShapeDtypeStruct((n_layers, B_pad, H), f32),    # dh0d
        jax.ShapeDtypeStruct((H, 2 * H), f32),              # d_a_hg
        jax.ShapeDtypeStruct((H, H), f32),                  # d_a_hc
        jax.ShapeDtypeStruct((H, A), f32),                  # dwq
        jax.ShapeDtypeStruct((1, A), f32),                  # dv
        jax.ShapeDtypeStruct((D, 4 * H), f32),              # dw_ctx
        jax.ShapeDtypeStruct((H, H), f32),                  # dwd_h
        jax.ShapeDtypeStruct((1, H), f32),                  # d_db
        *[jax.ShapeDtypeStruct((H, 3 * H), f32) for _ in range(n_layers)],
        *[jax.ShapeDtypeStruct((1, 3 * H), f32) for _ in range(n_layers)],
        *[jax.ShapeDtypeStruct((H, 2 * H), f32) for _ in range(n_layers)],
        *[jax.ShapeDtypeStruct((H, H), f32) for _ in range(n_layers)],
    )
    out_specs = (
        stream(2 * H), stream(H), stream(L_pad), stream(D),
        const((B_pad, H)), const((n_layers, B_pad, H)),
        const((H, 2 * H)), const((H, H)), const((H, A)), const((1, A)),
        const((D, 4 * H)), const((H, H)), const((1, H)),
        *[const((H, 3 * H)) for _ in range(n_layers)],
        *[const((1, 3 * H)) for _ in range(n_layers)],
        *[const((H, 2 * H)) for _ in range(n_layers)],
        *[const((H, H)) for _ in range(n_layers)],
    )
    scratch = [
        pltpu.VMEM((B_pad, H), f32),                       # dha
        *[pltpu.VMEM((B_pad, H), f32) for _ in range(n_layers)],
        pltpu.VMEM((B_pad, 2 * H), f32),                   # dcbg
        pltpu.VMEM((B_pad, H), f32),                       # dcbc
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=n_layers, H=H, chunk=chunk,
                          n_chunks=n_chunks),
        out_shape=out_shapes,
        grid=(n_chunks,),
        in_specs=[
            stream(2 * H), stream(H), stream(H), stream(H), stream(H),
            stream(L_pad), stream(L_pad), stream(H), stream(L_pad),
            *[stream(H) for _ in range(2 * n_layers)],
            const((B_pad, L_pad, A)), const((B_pad, L_pad, D)),
            const((B_pad, L_pad)),
            *[const(w.shape) for w in w_inputs],
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(png, pnc, ha, hap, xs, p, pp, dxs, dalign, *hds, *hdps,
      keys, memory, mask.astype(jnp.int32), *w_inputs)

    (dpng, dpnc, de, dctx, dh0a, dh0d, d_a_hg, d_a_hc, dwq, dv,
     dw_ctx, dwd_h, d_db) = outs[:13]
    pos = 13
    dw_r = outs[pos:pos + n_layers]; pos += n_layers
    db_r = outs[pos:pos + n_layers]; pos += n_layers
    dhg = outs[pos:pos + n_layers]; pos += n_layers
    dhc = outs[pos:pos + n_layers]

    # dmemory = Σ_t p_t ⊗ dctx_t: one batched MXU contraction (HIGHEST
    # precision to match the old in-kernel f32 accumulation) — moving it
    # (and dkeys below) out of the sequential kernel deleted that kernel's
    # [B,L,D]+[B,L,A] f32 VMEM accumulators, the cliff that excluded the
    # L=192 bucket and B=256 (VERDICT r3 Missing #3).
    # CANONICAL [B,L,S]@[B,S,D] batch-matmul form on purpose: contracting
    # the leading time dim directly (dot_general(p, dctx) with contracting
    # dim 0 / batch dim 1) made XLA:TPU rewrite the dot into a base-dilated
    # convolution (window={size=8 stride=7 pad=0_-28 lhs_dilate=8},
    # EmitOutputBatchInSublanes) that MISCOMPILES on v5e — dmem came back
    # ~63% wrong on chip while the identical expression outside this jit
    # was exact (round-4 debugging; CPU exact either way).
    dmem = jax.lax.dot_general(
        jnp.moveaxis(p, 0, 2),                            # [B, L_pad, S]
        jnp.swapaxes(dctx, 0, 1),                         # [B, S, D]
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=f32)                       # [B, L_pad, D]
    # dkeys = Σ_t de_t ⊗ v ⊙ (1 − tanh²(keys + q_t)): L-parallel
    # accumulation kernel (q rematerialized from the streamed ha)
    q = jax.lax.dot_general(
        ha.astype(cdt), w_inputs[2], (((2,), (0,)), ((), ())),
        preferred_element_type=f32)                       # [S_pad, B_pad, A]
    dkeys = _dkeys_pallas(keys, q, de, w_inputs[3], chunk,
                          interpret=interpret)

    dweights = TeacherDecoderWeights(
        a_hg=d_a_hg, a_hc=d_a_hc, wq=dwq, v=dv.reshape(-1),
        w_ctx=dw_ctx, wd_h=dwd_h, d_b=d_db.reshape(-1),
        w_r=tuple(dw_r), b_r=tuple(b.reshape(-1) for b in db_r),
        hg=tuple(dhg), hc=tuple(dhc))
    # de/dctx also returned UNTRIMMED (diagnostics; already materialized)
    return (dpng[:S, :B], dpnc[:S, :B], dh0a[:B], dh0d[:, :B], dweights,
            dkeys[:B, :L], dmem[:B, :L], de, dctx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def teacher_decoder(png, pnc, h0a, h0d, weights, keys, memory, maskf,
                    interpret: bool = False, time_chunk: int = 64):
    """Differentiable fused teacher-forced decoder scan.

    png [S,B,2H] / pnc [S,B,H]: prenet halves of the attention-GRU input
    projections (biases included), time-major.  h0a [B,H], h0d [N,B,H]:
    initial GRU states.  keys [B,L,A], memory [B,L,D], maskf [B,L] float
    (1.0 = valid).  Returns (xs [S,B,H] f32 pre-frame-projection
    activations, align [S,B,L] f32).
    """
    xs, align, _, _ = _teacher_decoder_fwd_pallas(
        png, pnc, h0a, h0d, weights, keys, memory, maskf,
        interpret=interpret, time_chunk=time_chunk)
    return xs, align


def _teacher_decoder_fwd(png, pnc, h0a, h0d, weights, keys, memory, maskf,
                         interpret, time_chunk):
    xs, align, ha, hds = _teacher_decoder_fwd_pallas(
        png, pnc, h0a, h0d, weights, keys, memory, maskf,
        interpret=interpret, time_chunk=time_chunk)
    res = (png, pnc, h0a, h0d, weights, keys, memory, maskf, xs, align,
           ha, hds)
    return (xs, align), res


def _teacher_decoder_bwd(interpret, time_chunk, res, cts):
    (png, pnc, h0a, h0d, weights, keys, memory, maskf, xs, align,
     ha, hds) = res
    dxs, dalign = cts
    # pre-shifted previous-state streams (chunk-boundary-free remat)
    shift = lambda a, a0: jnp.concatenate([a0[None].astype(a.dtype),
                                           a[:-1]], axis=0)
    hap = shift(ha, h0a)
    hdps = tuple(shift(hds[i], h0d[i]) for i in range(len(hds)))
    pp = jnp.concatenate([jnp.zeros_like(align[:1]), align[:-1]], axis=0)
    dpng, dpnc, dh0a, dh0d, dweights, dkeys, dmem, _, _ = \
        _teacher_decoder_bwd_pallas(
            png, pnc, ha, hap, hds, hdps, xs, align, pp,
            dxs.astype(jnp.float32), dalign.astype(jnp.float32),
            weights, keys, memory, maskf,
            interpret=interpret, time_chunk=time_chunk)
    cast = lambda g, x: g.astype(x.dtype)
    dweights = TeacherDecoderWeights(
        *[jax.tree.map(cast, g, x) for g, x in zip(dweights, weights)])
    return (cast(dpng, png), cast(dpnc, pnc), cast(dh0a, h0a),
            cast(dh0d, h0d), dweights, cast(dkeys, keys),
            cast(dmem, memory), jnp.zeros_like(maskf))


teacher_decoder.defvjp(_teacher_decoder_fwd, _teacher_decoder_bwd)


def teacher_decoder_reference(png, pnc, h0a, h0d, weights, keys, memory,
                              maskf):
    """Plain-XLA scan with identical math (equivalence/grad tests)."""
    S, B, H2 = png.shape
    H = H2 // 2
    n_layers = len(weights.w_r)
    cdt = keys.dtype
    f32 = jnp.float32
    mask = maskf > 0.5

    def gru(h, xg, xc, whg, whc):
        gates = jax.nn.sigmoid(
            xg + jnp.dot(h.astype(cdt), whg.astype(cdt),
                         preferred_element_type=f32))
        r, u = gates[:, :H], gates[:, H:]
        c = jnp.tanh(
            xc + jnp.dot((r * h).astype(cdt), whc.astype(cdt),
                         preferred_element_type=f32))
        return u * h + (1.0 - u) * c

    def step(carry, inp):
        h_a, h_ds, cb = carry
        png_t, pnc_t = inp
        xg = png_t.astype(f32) + cb[:, H: 3 * H]
        xc = pnc_t.astype(f32) + cb[:, 3 * H:]
        h_a = gru(h_a, xg, xc, weights.a_hg, weights.a_hc)
        q = jnp.dot(h_a.astype(cdt), weights.wq.astype(cdt),
                    preferred_element_type=f32)
        act = jnp.tanh(keys.astype(f32) + q[:, None, :])
        e = jnp.sum(act * weights.v.astype(f32), axis=-1)
        e = jnp.where(mask, e, -1e9)
        p = jnp.exp(e - jnp.max(e, axis=-1, keepdims=True))
        p = p * mask.astype(f32)
        p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-9)
        ctx = jax.lax.dot_general(
            p[:, None, :].astype(cdt), memory,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)[:, 0, :]
        cb = jnp.dot(ctx.astype(cdt), weights.w_ctx.astype(cdt),
                     preferred_element_type=f32)
        x = (jnp.dot(h_a.astype(cdt), weights.wd_h.astype(cdt),
                     preferred_element_type=f32)
             + cb[:, :H] + weights.d_b.astype(f32))
        new_hs = []
        for i in range(n_layers):
            xgc = (jnp.dot(x.astype(cdt), weights.w_r[i].astype(cdt),
                           preferred_element_type=f32)
                   + weights.b_r[i].astype(f32))
            h_i = gru(h_ds[i], xgc[:, : 2 * H], xgc[:, 2 * H:],
                      weights.hg[i], weights.hc[i])
            new_hs.append(h_i)
            x = x + h_i
        return (h_a, tuple(new_hs), cb), (x, p)

    carry0 = (h0a.astype(f32),
              tuple(h0d[i].astype(f32) for i in range(n_layers)),
              jnp.zeros((B, 4 * H), f32))
    _, (xs, align) = jax.lax.scan(
        step, carry0, (jnp.asarray(png), jnp.asarray(pnc)))
    return xs, align
