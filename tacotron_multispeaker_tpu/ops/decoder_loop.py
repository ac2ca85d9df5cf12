"""Pallas TPU kernel: the ENTIRE autoregressive decoder loop, fused.

The inference hot loop (SURVEY.md §3.3) is inherently sequential: each of
the ``max_iters`` decoder steps feeds its predicted frame back into the
next step's prenet.  As an XLA scan this is latency-bound — every step
re-reads ~2M parameters of decoder weights from HBM and bounces a dozen
small intermediates through HBM, so per-step wall time is dominated by
memory latency, not the (tiny) FLOPs.

This kernel runs ALL steps inside one ``pallas_call``:

* every decoder weight matrix (prenet, attention GRU, attention
  projections, residual GRU stack, frame projection) is loaded into VMEM
  ONCE (constant index_map) and stays resident for the whole decode;
* the recurrent carries (GRU hidden states, attention context, fed-back
  frame) live in VMEM scratch that persists across the sequential grid;
* the attention memory/keys are VMEM-resident; per step only the
  energies/softmax/context math executes (VPU + MXU, no HBM);
* per-step prenet dropout masks (dropout stays ON at inference —
  reference prenet semantics) are precomputed on host-free XLA and
  streamed in per-step blocks by the Pallas pipeline;
* the r-frame outputs and alignments stream OUT per step.

Per step the only HBM traffic is ~30 KB of streamed masks/outputs instead
of ~8 MB of weight re-reads: ~100× less memory traffic on the sequential
critical path.

Semantics match models/tacotron.DecoderCell with BahdanauAttention
exactly (same split-weight formulation; see decoder_loop_reference).
Requires decoder_depth % 128 == 0 and attention_depth % 128 == 0 (lane-dim
gate splits); models/tacotron.py falls back to the XLA scan otherwise.
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


class DecoderWeights(NamedTuple):
    """Decoder parameters, pre-split so the kernel never concatenates.

    Shapes: M = num_mels, P1/P2 = prenet widths, H = decoder_depth,
    A = attention_depth, D = memory depth, r = outputs_per_step,
    N = decoder_layers (static python list entries per layer).
    """
    w1: jnp.ndarray          # [M, P1] prenet dense 0
    b1: jnp.ndarray          # [P1]
    w2: jnp.ndarray          # [P1, P2] prenet dense 1
    b2: jnp.ndarray          # [P2]
    a_xg_pn: jnp.ndarray     # [P2, 2H] attn-GRU gate x-proj (prenet part)
    a_xg_ctx: jnp.ndarray    # [D, 2H]  attn-GRU gate x-proj (context part)
    a_bg: jnp.ndarray        # [2H]
    a_xc_pn: jnp.ndarray     # [P2, H]  attn-GRU candidate x-proj
    a_xc_ctx: jnp.ndarray    # [D, H]
    a_bc: jnp.ndarray        # [H]
    a_hg: jnp.ndarray        # [H, 2H]  attn-GRU recurrent
    a_hc: jnp.ndarray        # [H, H]
    wq: jnp.ndarray          # [H, A] attention query projection
    v: jnp.ndarray           # [1, A] attention energy vector
    d_h: jnp.ndarray         # [H, H] dec_in Dense (attn_h part)
    d_ctx: jnp.ndarray       # [D, H] dec_in Dense (context part)
    d_b: jnp.ndarray         # [H]
    l_xg: tuple              # N × [H, 2H] residual-GRU gate x-projs
    l_bg: tuple              # N × [2H]
    l_xc: tuple              # N × [H, H]
    l_bc: tuple              # N × [H]
    l_hg: tuple              # N × [H, 2H]
    l_hc: tuple              # N × [H, H]
    wf: jnp.ndarray          # [H, r*M] frame projection
    bf: jnp.ndarray          # [r*M]


def _gru_step(h, xsum_g, xsum_c, whg_ref, whc_ref, H, cdt):
    """Legacy-TF GRU step; h and x-side sums are float32."""
    gates = jax.nn.sigmoid(
        xsum_g + jnp.dot(h.astype(cdt), whg_ref[:, :],
                         preferred_element_type=jnp.float32))
    r, u = gates[:, :H], gates[:, H:]
    c = jnp.tanh(
        xsum_c + jnp.dot((r * h).astype(cdt), whc_ref[:, :],
                         preferred_element_type=jnp.float32))
    return u * h + (1.0 - u) * c


def _kernel(*refs, n_layers: int, H: int, M: int):
    (keys_ref, mem_ref, mask_ref, h0a_ref, h0d_ref,
     w1, b1, w2, b2,
     a_xg_pn, a_xg_ctx, a_bg, a_xc_pn, a_xc_ctx, a_bc, a_hg, a_hc,
     wq, v_ref, d_h, d_ctx, d_b) = refs[:22]
    pos = 22
    l_xg = refs[pos:pos + n_layers]; pos += n_layers
    l_bg = refs[pos:pos + n_layers]; pos += n_layers
    l_xc = refs[pos:pos + n_layers]; pos += n_layers
    l_bc = refs[pos:pos + n_layers]; pos += n_layers
    l_hg = refs[pos:pos + n_layers]; pos += n_layers
    l_hc = refs[pos:pos + n_layers]; pos += n_layers
    wf, bf, dm1_ref, dm2_ref = refs[pos:pos + 4]; pos += 4
    frames_ref, align_ref = refs[pos:pos + 2]; pos += 2
    attn_h_scr, dec_h_scr, ctx_scr, prev_scr = refs[pos:pos + 4]

    cdt = keys_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        attn_h_scr[:, :] = h0a_ref[:, :].astype(jnp.float32)
        dec_h_scr[:, :, :] = h0d_ref[:, :, :].astype(jnp.float32)
        ctx_scr[:, :] = jnp.zeros_like(ctx_scr)
        prev_scr[:, :] = jnp.zeros_like(prev_scr)

    # ---- prenet on the fed-back frame (dropout masks streamed in) --------
    x = prev_scr[:, :].astype(cdt)                                 # [B, M]
    x = jnp.maximum(jnp.dot(x, w1[:, :], preferred_element_type=jnp.float32)
                    + b1[:, :], 0.0)
    x = x * dm1_ref[0]                                             # [B, P1]
    x = jnp.maximum(jnp.dot(x.astype(cdt), w2[:, :],
                            preferred_element_type=jnp.float32)
                    + b2[:, :], 0.0)
    pn = (x * dm2_ref[0]).astype(cdt)                              # [B, P2]

    # ---- attention GRU (input = [prenet, context], weights pre-split) ----
    ctx = ctx_scr[:, :].astype(cdt)
    xg = (jnp.dot(pn, a_xg_pn[:, :], preferred_element_type=jnp.float32)
          + jnp.dot(ctx, a_xg_ctx[:, :], preferred_element_type=jnp.float32)
          + a_bg[:, :])
    xc = (jnp.dot(pn, a_xc_pn[:, :], preferred_element_type=jnp.float32)
          + jnp.dot(ctx, a_xc_ctx[:, :], preferred_element_type=jnp.float32)
          + a_bc[:, :])
    attn_h = _gru_step(attn_h_scr[:, :], xg, xc, a_hg, a_hc, H, cdt)
    attn_h_scr[:, :] = attn_h
    attn_h_c = attn_h.astype(cdt)

    # ---- additive attention: energies on VPU (f32), context on MXU -------
    q = jnp.dot(attn_h_c, wq[:, :],
                preferred_element_type=jnp.float32)                # [B, A]
    act = jnp.tanh(keys_ref[:, :, :].astype(jnp.float32) + q[:, None, :])
    e = jnp.sum(act * v_ref[:, :].astype(jnp.float32), axis=-1)    # [B, L]
    mask = mask_ref[:, :] > 0
    e = jnp.where(mask, e, -1e9)
    p = jnp.exp(e - jnp.max(e, axis=-1, keepdims=True))
    p = p * mask.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-9)
    align_ref[0] = p
    ctx_new = jax.lax.dot_general(
        p[:, None, :].astype(cdt), mem_ref[:, :, :],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]               # [B, D]
    ctx_scr[:, :] = ctx_new

    # ---- dec_in Dense + residual GRU stack --------------------------------
    x = (jnp.dot(attn_h_c, d_h[:, :], preferred_element_type=jnp.float32)
         + jnp.dot(ctx_new.astype(cdt), d_ctx[:, :],
                   preferred_element_type=jnp.float32)
         + d_b[:, :])                                              # [B, H] f32
    for i in range(n_layers):
        xi = x.astype(cdt)
        xg = jnp.dot(xi, l_xg[i][:, :],
                     preferred_element_type=jnp.float32) + l_bg[i][:, :]
        xc = jnp.dot(xi, l_xc[i][:, :],
                     preferred_element_type=jnp.float32) + l_bc[i][:, :]
        h_new = _gru_step(dec_h_scr[i], xg, xc, l_hg[i], l_hc[i], H, cdt)
        dec_h_scr[i] = h_new
        x = x + h_new                                              # residual

    # ---- frame projection + feedback --------------------------------------
    frames = (jnp.dot(x.astype(cdt), wf[:, :],
                      preferred_element_type=jnp.float32) + bf[:, :])
    frames_ref[0] = frames
    # last frame of the r-frame group feeds back (lane offset (r-1)*M is
    # not 128-aligned, so slice via the padded scratch write instead):
    prev_scr[:, :] = frames[:, frames.shape[-1] - M:]


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "num_mels", "interpret"))
def decoder_loop_pallas(weights: DecoderWeights, keys: jnp.ndarray,
                        memory: jnp.ndarray, mask: jnp.ndarray,
                        dropout1: jnp.ndarray, dropout2: jnp.ndarray,
                        attn_h0: jnp.ndarray, dec_h0: jnp.ndarray,
                        n_steps: int, num_mels: int,
                        interpret: bool = False):
    """Fused autoregressive decode.

    keys [B,L,A], memory [B,L,D], mask [B,L] bool,
    dropout1 [n_steps,B,P1] / dropout2 [n_steps,B,P2] (0 or 1/keep_prob),
    attn_h0 [B,H], dec_h0 [N,B,H]
    → (frames [n_steps, B, r*M] f32, alignments [n_steps, B, L] f32).
    """
    B, L, A = keys.shape
    D = memory.shape[-1]
    H = weights.a_hc.shape[0]
    M = num_mels
    n_layers = len(weights.l_xg)
    rM = weights.wf.shape[-1]
    assert H % 128 == 0 and A % 128 == 0

    L_pad = _round_up(L, 128)
    B_pad = _round_up(B, 8)
    if L_pad != L:
        keys = jnp.pad(keys, ((0, 0), (0, L_pad - L), (0, 0)))
        memory = jnp.pad(memory, ((0, 0), (0, L_pad - L), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, L_pad - L)))
    if B_pad != B:
        pad = ((0, B_pad - B), (0, 0))
        keys = jnp.pad(keys, ((0, B_pad - B), (0, 0), (0, 0)))
        memory = jnp.pad(memory, ((0, B_pad - B), (0, 0), (0, 0)))
        # padded rows get one valid position so softmax stays finite
        mask = jnp.pad(mask, pad)
        mask = mask.at[B:, 0].set(True)
        attn_h0 = jnp.pad(attn_h0, pad)
        dec_h0 = jnp.pad(dec_h0, ((0, 0),) + pad)
        dropout1 = jnp.pad(dropout1, ((0, 0),) + pad)
        dropout2 = jnp.pad(dropout2, ((0, 0),) + pad)

    cdt = keys.dtype
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)  # biases: [1, F] f32

    w_inputs = [
        weights.w1.astype(cdt), row(weights.b1),
        weights.w2.astype(cdt), row(weights.b2),
        weights.a_xg_pn.astype(cdt), weights.a_xg_ctx.astype(cdt),
        row(weights.a_bg),
        weights.a_xc_pn.astype(cdt), weights.a_xc_ctx.astype(cdt),
        row(weights.a_bc),
        weights.a_hg.astype(cdt), weights.a_hc.astype(cdt),
        weights.wq.astype(cdt), weights.v.reshape(1, -1).astype(cdt),
        weights.d_h.astype(cdt), weights.d_ctx.astype(cdt), row(weights.d_b),
        *[w.astype(cdt) for w in weights.l_xg],
        *[row(b) for b in weights.l_bg],
        *[w.astype(cdt) for w in weights.l_xc],
        *[row(b) for b in weights.l_bc],
        *[w.astype(cdt) for w in weights.l_hg],
        *[w.astype(cdt) for w in weights.l_hc],
        weights.wf.astype(cdt), row(weights.bf),
    ]

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    w_specs = [const(w.shape) for w in w_inputs]

    frames, align = pl.pallas_call(
        functools.partial(_kernel, n_layers=n_layers, H=H, M=M),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, B_pad, rM), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, B_pad, L_pad), jnp.float32),
        ),
        grid=(n_steps,),
        in_specs=[
            const((B_pad, L_pad, A)),                    # keys
            const((B_pad, L_pad, D)),                    # memory
            const((B_pad, L_pad)),                       # mask
            const((B_pad, H)),                           # attn_h0
            const((n_layers, B_pad, H)),                 # dec_h0
            *w_specs,
            pl.BlockSpec((1, B_pad, dropout1.shape[-1]),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_pad, dropout2.shape[-1]),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B_pad, rM), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_pad, L_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B_pad, H), jnp.float32),          # attn_h
            pltpu.VMEM((n_layers, B_pad, H), jnp.float32),  # dec hidden
            pltpu.VMEM((B_pad, D), jnp.float32),          # context
            pltpu.VMEM((B_pad, M), jnp.float32),          # fed-back frame
        ],
        interpret=interpret,
        # B=256 needs >16 MB of scoped VMEM for the per-step f32 attention
        # ``act`` temporary ([256,128,256]·4 ≈ 33.5 MB — round-3 failure
        # "Scoped allocation 18.12M, limit 16M"); raise the limit so the
        # best-throughput synthesis batch runs the fused kernel (round 4)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(keys, memory, mask.astype(jnp.int32), attn_h0.astype(cdt),
      dec_h0.astype(cdt), *w_inputs,
      dropout1.astype(jnp.float32), dropout2.astype(jnp.float32))
    return frames[:, :B, :], align[:, :B, :L]


def decoder_loop_reference(weights: DecoderWeights, keys, memory, mask,
                           dropout1, dropout2, attn_h0, dec_h0,
                           n_steps: int, num_mels: int):
    """Plain-XLA scan with identical math (for kernel-equivalence tests)."""
    B = keys.shape[0]
    H = weights.a_hc.shape[0]
    M = num_mels
    cdt = keys.dtype
    n_layers = len(weights.l_xg)
    f32 = jnp.float32

    def gru(h, xg, xc, whg, whc):
        gates = jax.nn.sigmoid(xg + (h.astype(cdt) @ whg).astype(f32))
        r, u = gates[:, :H], gates[:, H:]
        c = jnp.tanh(xc + ((r * h).astype(cdt) @ whc).astype(f32))
        return u * h + (1.0 - u) * c

    def step(carry, inp):
        attn_h, dec_hs, ctx, prev = carry
        dm1, dm2 = inp
        x = prev.astype(cdt)
        x = jnp.maximum((x @ weights.w1.astype(cdt)).astype(f32)
                        + weights.b1, 0.0) * dm1
        x = jnp.maximum((x.astype(cdt) @ weights.w2.astype(cdt)).astype(f32)
                        + weights.b2, 0.0) * dm2
        pn = x.astype(cdt)
        ctx_c = ctx.astype(cdt)
        xg = ((pn @ weights.a_xg_pn.astype(cdt)).astype(f32)
              + (ctx_c @ weights.a_xg_ctx.astype(cdt)).astype(f32)
              + weights.a_bg)
        xc = ((pn @ weights.a_xc_pn.astype(cdt)).astype(f32)
              + (ctx_c @ weights.a_xc_ctx.astype(cdt)).astype(f32)
              + weights.a_bc)
        attn_h = gru(attn_h, xg, xc, weights.a_hg.astype(cdt),
                     weights.a_hc.astype(cdt))
        q = (attn_h.astype(cdt) @ weights.wq.astype(cdt)).astype(f32)
        act = jnp.tanh(keys.astype(f32) + q[:, None, :])
        e = jnp.sum(act * weights.v.reshape(-1).astype(f32), axis=-1)
        e = jnp.where(mask, e, -1e9)
        p = jnp.exp(e - jnp.max(e, axis=-1, keepdims=True))
        p = p * mask.astype(f32)
        p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-9)
        ctx = jnp.einsum("bl,bld->bd", p.astype(cdt), memory).astype(f32)
        x = ((attn_h.astype(cdt) @ weights.d_h.astype(cdt)).astype(f32)
             + (ctx.astype(cdt) @ weights.d_ctx.astype(cdt)).astype(f32)
             + weights.d_b)
        new_hs = []
        for i in range(n_layers):
            xi = x.astype(cdt)
            xg = (xi @ weights.l_xg[i].astype(cdt)).astype(f32) + weights.l_bg[i]
            xc = (xi @ weights.l_xc[i].astype(cdt)).astype(f32) + weights.l_bc[i]
            h_new = gru(dec_hs[i], xg, xc, weights.l_hg[i].astype(cdt),
                        weights.l_hc[i].astype(cdt))
            new_hs.append(h_new)
            x = x + h_new
        frames = ((x.astype(cdt) @ weights.wf.astype(cdt)).astype(f32)
                  + weights.bf)
        prev = frames[:, -M:]
        return (attn_h, tuple(new_hs), ctx, prev), (frames, p)

    carry0 = (attn_h0.astype(f32),
              tuple(dec_h0[i].astype(f32) for i in range(n_layers)),
              jnp.zeros((B, memory.shape[-1]), f32),
              jnp.zeros((B, M), f32))
    _, (frames, align) = jax.lax.scan(step, carry0, (dropout1, dropout2),
                                      length=n_steps)
    return frames, align
