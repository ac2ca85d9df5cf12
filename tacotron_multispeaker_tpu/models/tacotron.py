"""TPU-native multispeaker Tacotron-1.

Re-design of the reference's ``models/tacotron.py`` graph assembly
(SURVEY.md §2.9-2.10): char embedding → [speaker conditioning] → prenet →
encoder CBHG → attention GRU decoder emitting r mel frames per step →
post-CBHG → linear spectrogram projection.

TPU-first structure instead of tf.contrib.seq2seq wrappers:

* Teacher-forced decoding is ONE ``nn.scan`` over T/r steps whose body is
  the fused decoder cell; all prenet input projections are precomputed for
  the whole utterance in one batched matmul before the scan.
* Autoregressive decoding is the SAME cell scanned with the predicted frame
  fed back — the whole decode compiles to a single XLA loop with no host
  round-trips (SURVEY.md §3.3 rebuild note).
* Attention memory keys are precomputed once per utterance; the per-step
  work is only query/energy/context contractions.
* Speaker conditioning (multispeaker fork): speaker embedding concatenated
  to the encoder prenet input and to the encoder memory, and used to
  initialize decoder GRU states — each injection point config-gated
  (SURVEY.md §2.9 notes the exact fork points need re-verification; all
  three standard points are provided).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..text import vocab_size
from .attention import AttentionState, make_attention
from .helpers import feedback_frame, teacher_inputs
from .modules import CBHG, GRUCellParams, Prenet

Dtype = Any


class TacotronOutput(NamedTuple):
    mel_outputs: jnp.ndarray      # [B, T, num_mels] float32
    linear_outputs: jnp.ndarray   # [B, T, num_freq] float32
    alignments: jnp.ndarray       # [B, T/r, L] float32


class DecoderCarry(NamedTuple):
    attn_h: jnp.ndarray                  # [B, decoder_depth]
    dec_hs: tuple                        # per-layer [B, decoder_depth]
    context: jnp.ndarray                 # [B, memory_depth]
    attn_state: AttentionState
    prev_frame: jnp.ndarray              # [B, num_mels] (autoregressive input)


class Encoder(nn.Module):
    """Char embedding (+speaker concat) → prenet → CBHG memory."""

    cfg: Config
    dtype: Dtype = jnp.float32
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                 speaker_embed: jnp.ndarray | None, train: bool) -> jnp.ndarray:
        m = self.cfg.model
        x = nn.Embed(vocab_size(), m.embed_depth, dtype=self.dtype,
                     name="embedding")(inputs)                    # [B, L, E]
        if speaker_embed is not None and "encoder_prenet" in m.speaker_condition:
            s = jnp.broadcast_to(speaker_embed[:, None, :],
                                 (x.shape[0], x.shape[1],
                                  speaker_embed.shape[-1])).astype(x.dtype)
            x = jnp.concatenate([x, s], axis=-1)
        x = Prenet(m.prenet_depths, m.prenet_dropout, self.dtype,
                   name="prenet")(x)
        half = m.encoder_depth // 2
        memory = CBHG(m.encoder_bank_k, m.encoder_bank_channels,
                      m.encoder_proj_channels, m.encoder_highway_layers,
                      highway_depth=half, gru_units=half, dtype=self.dtype,
                      use_pallas=self.cfg.parallel.use_pallas,
                      use_pallas_gru=self.cfg.parallel.use_pallas_gru,
                      bn_axis=self.bn_axis,
                      name="cbhg")(x, input_lengths, train)       # [B, L, 2*half]
        if speaker_embed is not None and "memory" in m.speaker_condition:
            s = jnp.broadcast_to(speaker_embed[:, None, :],
                                 (memory.shape[0], memory.shape[1],
                                  speaker_embed.shape[-1])).astype(memory.dtype)
            memory = jnp.concatenate([memory, s], axis=-1)
        return memory


class DecoderCell(nn.Module):
    """One decoder step == the reference's wrapped cell stack (SURVEY.md
    §2.8): prenet → attention GRU (input [prenet, prev context]) → new
    context → concat → Dense → residual GRU stack → r×num_mels projection."""

    cfg: Config
    prenet: nn.Module
    attention: nn.Module
    dtype: Dtype = jnp.float32

    def setup(self):
        m = self.cfg.model
        self.attn_rnn = GRUCellParams(m.decoder_depth, self.dtype,
                                      name="attn_rnn")
        self.dec_in = nn.Dense(m.decoder_depth, dtype=self.dtype,
                               name="dec_in")
        self.dec_rnns = [GRUCellParams(m.decoder_depth, self.dtype,
                                       name=f"dec_rnn_{i}")
                         for i in range(m.decoder_layers)]
        self.frame_proj = nn.Dense(
            m.outputs_per_step * self.cfg.audio.num_mels,
                                   dtype=self.dtype, name="frame_proj")

    def __call__(self, carry: DecoderCarry, prenet_out: jnp.ndarray,
                 keys: jnp.ndarray, memory: jnp.ndarray,
                 mask: jnp.ndarray) -> tuple[DecoderCarry, tuple]:
        m = self.cfg.model
        cell_in = jnp.concatenate(
            [prenet_out, carry.context.astype(prenet_out.dtype)], axis=-1)
        attn_h = self.attn_rnn(carry.attn_h, cell_in)
        context, align, attn_state = self.attention(
            attn_h, keys, memory, mask, carry.attn_state)
        x = self.dec_in(jnp.concatenate(
            [attn_h, context.astype(attn_h.dtype)], axis=-1))
        new_hs = []
        for cell, h in zip(self.dec_rnns, carry.dec_hs):
            h_new = cell(h, x)
            x = x + h_new                                  # residual stack
            new_hs.append(h_new)
        frames = self.frame_proj(x)                        # [B, r*M]
        last_frame = feedback_frame(frames, m.outputs_per_step,
                                    self.cfg.audio.num_mels)
        new_carry = DecoderCarry(attn_h, tuple(new_hs), context, attn_state,
                                 last_frame.astype(jnp.float32))
        return new_carry, (frames.astype(jnp.float32), align)


class Tacotron(nn.Module):
    """Full model; ``__call__`` is the teacher-forced training path,
    ``generate`` the fused autoregressive inference path.

    ``seq_mesh``: optional jax Mesh for sequence-sharded decode — encoder
    memory/keys/mask shard along L over the mesh's ``model`` axis and the
    attention step runs a distributed softmax (SURVEY.md §2.14 SP analogue).
    Parameter structure is identical either way."""

    cfg: Config
    seq_mesh: Any = None
    # mapped-axis name for cross-replica BatchNorm statistics — set only
    # when the model runs inside shard_map with parallel.bn_cross_replica
    # (training.py round 4); None = per-shard (reference-per-replica) stats
    bn_axis: str | None = None

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.model.compute_dtype == "bfloat16" \
            else jnp.float32

    def setup(self):
        c, m = self.cfg, self.cfg.model
        self.encoder = Encoder(c, self.dtype, bn_axis=self.bn_axis,
                               name="encoder")
        self.dec_prenet = Prenet(m.prenet_depths, m.prenet_dropout,
                                 self.dtype, name="dec_prenet")
        self.attention = make_attention(
            m, self.dtype, use_pallas=c.parallel.use_pallas,
            seq_mesh=self.seq_mesh, seq_axis=c.parallel.model_axis,
            seq_kernel=c.parallel.use_pallas_seq_attention)
        self.cell = DecoderCell(c, self.dec_prenet, self.attention,
                                self.dtype, name="decoder_cell")
        half = m.postnet_depth // 2
        self.post_cbhg = CBHG(m.postnet_bank_k, m.postnet_bank_channels,
                              m.postnet_proj_channels, m.postnet_highway_layers,
                              highway_depth=half, gru_units=m.postnet_gru_units,
                              dtype=self.dtype,
                              use_pallas=c.parallel.use_pallas,
                              use_pallas_gru=c.parallel.use_pallas_gru,
                              bn_axis=self.bn_axis,
                              name="post_cbhg")
        self.linear_proj = nn.Dense(self.cfg.audio.num_freq, dtype=self.dtype,
                                    name="linear_proj")
        if m.num_speakers > 1:
            self.speaker_table = nn.Embed(m.num_speakers, m.speaker_embed_depth,
                                          dtype=self.dtype,
                                          name="speaker_table")
        if "decoder_init" in m.speaker_condition and m.num_speakers > 1:
            self.state_init_proj = nn.Dense(
                (m.decoder_layers + 1) * m.decoder_depth, dtype=self.dtype,
                name="state_init_proj")

    # -- shared pieces -------------------------------------------------------

    def _speaker_embed(self, speaker_ids):
        if self.cfg.model.num_speakers <= 1 or speaker_ids is None:
            return None
        return self.speaker_table(speaker_ids)

    def _init_carry(self, batch: int, length: int, memory_depth: int,
                    speaker_embed) -> DecoderCarry:
        m = self.cfg.model
        D = m.decoder_depth
        if speaker_embed is not None and "decoder_init" in m.speaker_condition:
            init = jnp.tanh(self.state_init_proj(speaker_embed))
            parts = jnp.split(init, m.decoder_layers + 1, axis=-1)
            attn_h, dec_hs = parts[0], tuple(parts[1:])
        else:
            attn_h = jnp.zeros((batch, D), self.dtype)
            dec_hs = tuple(jnp.zeros((batch, D), self.dtype)
                           for _ in range(m.decoder_layers))
        return DecoderCarry(
            attn_h=attn_h, dec_hs=dec_hs,
            context=jnp.zeros((batch, memory_depth), self.dtype),
            attn_state=self.attention.init_state(batch, length),
            prev_frame=jnp.zeros((batch, self.cfg.audio.num_mels), jnp.float32))

    def _postnet(self, mel: jnp.ndarray, target_lengths: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        post = self.post_cbhg(mel.astype(self.dtype), target_lengths, train)
        return self.linear_proj(post).astype(jnp.float32)

    # -- teacher-forced training path ---------------------------------------

    def teacher_mel(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                    mel_targets: jnp.ndarray, speaker_ids=None,
                    train: bool = True,
                    speaker_embed=None) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Encoder + teacher-forced decoder to mel (no postnet).

        Exposed separately so profiling/eval can time or inspect the
        sequential-scan half of training without the postnet.

        ``speaker_embed``: precomputed [B, speaker_embed_depth] speaker
        vectors that BYPASS the in-model table lookup — the hybrid
        model-axis step (training.py round 5) gathers them from the
        sharded table via an explicit psum inside shard_map, where the
        nn.Embed lookup cannot run (each shard holds only its rows)."""
        m = self.cfg.model
        B, L = inputs.shape
        T = mel_targets.shape[1]
        r = m.outputs_per_step
        assert T % r == 0, f"target length {T} not a multiple of r={r}"

        spk = (speaker_embed if speaker_embed is not None
               else self._speaker_embed(speaker_ids))
        memory = self.encoder(inputs, input_lengths, spk, train)
        keys = self.attention.precompute_keys(memory)
        mask = jnp.arange(L)[None, :] < input_lengths[:, None]

        # Decoder inputs per TacoTrainingHelper (models/helpers.py); prenet
        # over the whole sequence in one batched matmul before the scan.
        dec_in = teacher_inputs(mel_targets, r)              # [B, T/r, M]
        prenet_out = self.dec_prenet(dec_in.astype(self.dtype))

        carry0 = self._init_carry(B, L, memory.shape[-1], spk)

        # Sequential-hot-loop restructure (teacher forcing only): the scan
        # body is the training wall (BASELINE.md r3: decoder scan ≈ 30% of
        # the step).  Everything that CAN leave the per-step critical path
        # does:
        #   * the prenet part of the attention-GRU input projections is one
        #     batched [B,S,P2]x[P2,3H] matmul BEFORE the scan (teacher
        #     inputs are known up front),
        #   * all three context-consuming projections (dec_in's context
        #     half + next step's attention-GRU xg/xc context halves) merge
        #     into ONE [B,Dctx]x[Dctx,4H] matmul per step, carried forward,
        #   * the r-frame output projection runs as one batched matmul
        #     AFTER the scan.
        # Math is identical to DecoderCell.__call__ up to f32 reassociation
        # (sums split at the concat boundaries); the full-model TF oracle
        # (tests/test_oracle_tf.py) pins the equivalence.
        cell = self.cell
        H = m.decoder_depth
        Dctx = memory.shape[-1]
        P2 = prenet_out.shape[-1]
        dt = self.dtype

        # materialize the lazily-created Dense params at canonical shapes
        zc = jnp.zeros((1, P2 + Dctx), dt)
        _ = cell.attn_rnn.xg(zc)
        _ = cell.attn_rnn.xc(zc)
        _ = cell.dec_in(jnp.zeros((1, H + Dctx), dt))
        pvars = lambda mod: mod.variables["params"]
        wxg = pvars(cell.attn_rnn.xg)["kernel"].astype(dt)   # [P2+Dctx, 2H]
        bxg = pvars(cell.attn_rnn.xg)["bias"].astype(dt)
        wxc = pvars(cell.attn_rnn.xc)["kernel"].astype(dt)   # [P2+Dctx, H]
        bxc = pvars(cell.attn_rnn.xc)["bias"].astype(dt)
        wd = pvars(cell.dec_in)["kernel"].astype(dt)         # [H+Dctx, H]
        bd = pvars(cell.dec_in)["bias"].astype(dt)

        w_pn = jnp.concatenate([wxg[:P2], wxc[:P2]], axis=1)    # [P2, 3H]
        b_pn = jnp.concatenate([bxg, bxc])                      # [3H]
        pn_proj = prenet_out @ w_pn + b_pn                      # [B, S, 3H]
        # per-step context block: [dec_in ctx | attn xg ctx | attn xc ctx]
        w_ctx = jnp.concatenate([wd[H:], wxg[P2:], wxc[P2:]], axis=1)

        # merge each residual-GRU's two input projections into one matmul
        zh = jnp.zeros((1, H), dt)
        rnn_w, rnn_b = [], []
        for rnn in cell.dec_rnns:
            _ = rnn.xg(zh)
            _ = rnn.xc(zh)
            rnn_w.append(jnp.concatenate(
                [pvars(rnn.xg)["kernel"].astype(dt),
                 pvars(rnn.xc)["kernel"].astype(dt)], axis=1))   # [H, 3H]
            rnn_b.append(jnp.concatenate(
                [pvars(rnn.xg)["bias"].astype(dt),
                 pvars(rnn.xc)["bias"].astype(dt)]))

        ctx_blk0 = carry0.context.astype(dt) @ w_ctx            # [B, 4H]

        # Fused differentiable teacher-decoder kernel (ops/teacher_decoder):
        # the whole scan — attention GRU, Bahdanau attention, residual GRU
        # stack — runs inside one pallas_call per pass with weights/keys/
        # memory VMEM-resident; custom VJP so it trains.  TPU backend only
        # (FORCE_PALLAS_TEACHER exercises interpret mode in tests); the XLA
        # scan below is the always-available identical-math fallback.
        from ..ops import teacher_decoder as td_ops
        dims_ok = (m.attention_type == "bahdanau"
                   and H % 128 == 0 and m.attention_depth % 128 == 0)
        # VMEM eligibility with the PADDED dims the kernel actually uses
        # (ADVICE r3 medium).  Round 4 split the backward's [B,L,A]/[B,L,D]
        # f32 accumulators out of the sequential kernel, so L=192 (the
        # second input bucket) and B=256 are now eligible; under the
        # shard_map data-parallel step B here is already the per-shard
        # batch, so big global batches stay eligible too.
        fits_vmem = td_ops.vmem_eligible(
            B, L, m.attention_depth, memory.shape[-1],
            itemsize=2 if self.dtype == jnp.bfloat16 else 4)
        use_fused_teacher = (
            self.seq_mesh is None
            and self.cfg.parallel.use_pallas_teacher
            and dims_ok and fits_vmem
            and (jax.default_backend() == "tpu"
                 or td_ops.FORCE_PALLAS_TEACHER))
        if (self.cfg.parallel.use_pallas_teacher and self.seq_mesh is None
                and dims_ok and not fits_vmem):
            # trace-time (one line per compiled shape, not per step), routed
            # through infolog so it lands in train.log next to the step
            # lines instead of bare stdout (VERDICT r4 weak #5)
            from ..utils import infolog
            infolog.log(f"[tacotron] teacher-decoder kernel DISENGAGED for "
                        f"shape B={B} L={L} (padded VMEM estimate exceeds "
                        f"budget) — using the XLA scan for this bucket")
        if use_fused_teacher:
            zh1 = jnp.zeros((1, H), dt)
            _ = cell.attn_rnn.hg(zh1)
            _ = cell.attn_rnn.hc(zh1)
            _ = self.attention.query_layer(zh1)
            for rnn in cell.dec_rnns:
                _ = rnn.hg(zh1)
                _ = rnn.hc(zh1)
            weights = td_ops.TeacherDecoderWeights(
                a_hg=pvars(cell.attn_rnn.hg)["kernel"],
                a_hc=pvars(cell.attn_rnn.hc)["kernel"],
                wq=pvars(self.attention.query_layer)["kernel"],
                v=self.attention.v.reshape(-1),
                w_ctx=w_ctx, wd_h=wd[:H], d_b=bd,
                w_r=tuple(rnn_w), b_r=tuple(rnn_b),
                hg=tuple(pvars(r.hg)["kernel"] for r in cell.dec_rnns),
                hc=tuple(pvars(r.hc)["kernel"] for r in cell.dec_rnns))
            png = jnp.swapaxes(pn_proj[..., : 2 * H], 0, 1)
            pnc = jnp.swapaxes(pn_proj[..., 2 * H:], 0, 1)
            h0d = jnp.stack([h.astype(jnp.float32) for h in carry0.dec_hs])
            xs_t, al_t = td_ops.teacher_decoder(
                png, pnc, carry0.attn_h.astype(jnp.float32), h0d, weights,
                keys, memory, mask.astype(jnp.float32),
                jax.default_backend() != "tpu"
                or td_ops.FORCE_PALLAS_INTERPRET)
            xs = jnp.swapaxes(xs_t, 0, 1)
            aligns = jnp.swapaxes(al_t, 0, 1)
            frames = cell.frame_proj(xs).astype(jnp.float32)  # [B, S, r*M]
            mel_out = frames.reshape(B, T, self.cfg.audio.num_mels)
            return mel_out, aligns

        def step(cell, carry, pn_t):
            (attn_h, dec_hs, attn_state, ctx_blk) = carry
            xg_t = pn_t[:, : 2 * H] + ctx_blk[:, H: 3 * H]
            xc_t = pn_t[:, 2 * H:] + ctx_blk[:, 3 * H:]
            attn_h = cell.attn_rnn.step_from_proj(attn_h, xg_t, xc_t)
            context, align, attn_state = cell.attention(
                attn_h, keys, memory, mask, attn_state)
            new_ctx_blk = context.astype(dt) @ w_ctx
            x = attn_h @ wd[:H] + new_ctx_blk[:, :H] + bd
            new_hs = []
            for rnn, w_r, b_r, h in zip(cell.dec_rnns, rnn_w, rnn_b, dec_hs):
                xgc = x @ w_r + b_r
                h_new = rnn.step_from_proj(h, xgc[:, : 2 * H], xgc[:, 2 * H:])
                x = x + h_new                          # residual stack
                new_hs.append(h_new)
            return (attn_h, tuple(new_hs), attn_state, new_ctx_blk), (x, align)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        carry_in = (carry0.attn_h, carry0.dec_hs, carry0.attn_state, ctx_blk0)
        _, (xs, aligns) = scan(cell, carry_in, pn_proj)
        frames = cell.frame_proj(xs).astype(jnp.float32)   # [B, S, r*M]
        mel_out = frames.reshape(B, T, self.cfg.audio.num_mels)
        return mel_out, aligns

    def __call__(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                 mel_targets: jnp.ndarray, speaker_ids=None,
                 train: bool = True, speaker_embed=None) -> TacotronOutput:
        mel_out, aligns = self.teacher_mel(inputs, input_lengths, mel_targets,
                                           speaker_ids, train, speaker_embed)
        B, T = mel_out.shape[0], mel_out.shape[1]
        target_lengths = jnp.full((B,), T, jnp.int32)
        linear_out = self._postnet(mel_out, target_lengths, train)
        return TacotronOutput(mel_out, linear_out, aligns)

    # -- autoregressive inference path --------------------------------------

    def _fused_decoder_weights(self):
        """Collect the decoder params as ops.decoder_loop.DecoderWeights,
        pre-split at the concat boundaries (prenet|context, attn_h|context)
        so the kernel never concatenates along lanes."""
        from ..ops.decoder_loop import DecoderWeights
        m = self.cfg.model
        P2 = m.prenet_depths[-1]
        H = m.decoder_depth
        dense = lambda mod: (mod.variables["params"]["kernel"],
                             mod.variables["params"].get("bias"))
        pn = self.dec_prenet.variables["params"]
        cell = self.cell
        xg_k, xg_b = dense(cell.attn_rnn.xg)
        xc_k, xc_b = dense(cell.attn_rnn.xc)
        hg_k, _ = dense(cell.attn_rnn.hg)
        hc_k, _ = dense(cell.attn_rnn.hc)
        di_k, di_b = dense(cell.dec_in)
        wq_k, _ = dense(self.attention.query_layer)
        wf_k, wf_b = dense(cell.frame_proj)
        layers = [(dense(c.xg), dense(c.xc), dense(c.hg), dense(c.hc))
                  for c in cell.dec_rnns]
        return DecoderWeights(
            w1=pn["dense_0"]["kernel"], b1=pn["dense_0"]["bias"],
            w2=pn["dense_1"]["kernel"], b2=pn["dense_1"]["bias"],
            a_xg_pn=xg_k[:P2], a_xg_ctx=xg_k[P2:], a_bg=xg_b,
            a_xc_pn=xc_k[:P2], a_xc_ctx=xc_k[P2:], a_bc=xc_b,
            a_hg=hg_k, a_hc=hc_k,
            wq=wq_k, v=self.attention.v.reshape(-1),
            d_h=di_k[:H], d_ctx=di_k[H:], d_b=di_b,
            l_xg=tuple(l[0][0] for l in layers),
            l_bg=tuple(l[0][1] for l in layers),
            l_xc=tuple(l[1][0] for l in layers),
            l_bc=tuple(l[1][1] for l in layers),
            l_hg=tuple(l[2][0] for l in layers),
            l_hc=tuple(l[3][0] for l in layers),
            wf=wf_k, bf=wf_b)

    def generate(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                 speaker_ids=None, max_iters: int | None = None,
                 train: bool = False, speaker_embed=None) -> TacotronOutput:
        """Fused on-device decode: prenet runs inside the scanned cell on the
        fed-back frame (reference: TacoTestHelper), full ``max_iters`` steps
        (Tacotron-1 has no stop token — output trimmed by endpointing).

        With ``parallel.use_pallas`` and kernel-eligible dims (Bahdanau
        attention, depths multiples of 128) the WHOLE decode loop runs as
        ONE Pallas kernel with VMEM-resident weights (ops/decoder_loop.py);
        otherwise it is one XLA scan — either way no host round-trips.
        """
        m = self.cfg.model
        B, L = inputs.shape
        r = m.outputs_per_step
        n_steps = max_iters if max_iters is not None else m.max_iters

        spk = (speaker_embed if speaker_embed is not None
               else self._speaker_embed(speaker_ids))
        memory = self.encoder(inputs, input_lengths, spk, train)
        keys = self.attention.precompute_keys(memory)
        mask = jnp.arange(L)[None, :] < input_lengths[:, None]
        if self.seq_mesh is not None:
            # pin the encoder memory/keys/mask sharded along L so the whole
            # decode keeps them distributed (the shard_map attention step
            # consumes them in place; XLA never gathers the full memory)
            from jax.sharding import NamedSharding, PartitionSpec as P
            ax = self.cfg.parallel.model_axis
            cons = jax.lax.with_sharding_constraint
            memory = cons(memory, NamedSharding(self.seq_mesh,
                                                P(None, ax, None)))
            keys = cons(keys, NamedSharding(self.seq_mesh, P(None, ax, None)))
            mask = cons(mask, NamedSharding(self.seq_mesh, P(None, ax)))
        carry0 = self._init_carry(B, L, memory.shape[-1], spk)

        # use_pallas_decode (default) only engages on real TPU — in
        # interpret mode the kernel unrolls max_iters grid steps at trace
        # time, which would wreck CPU eval/demo runs; explicit use_pallas
        # forces the kernel anywhere (tests exercise interpret mode), and
        # use_pallas_decode=false vetoes it even then (so the per-step
        # attention kernel can be raced standalone in the scan path)
        decode_requested = (self.seq_mesh is None
                            and self.cfg.parallel.use_pallas_decode
                            and (self.cfg.parallel.use_pallas
                                 or jax.default_backend() == "tpu"))
        use_fused = (decode_requested
                     and m.attention_type == "bahdanau"
                     and m.decoder_depth % 128 == 0
                     and m.attention_depth % 128 == 0
                     and len(m.prenet_depths) == 2)
        if decode_requested and not use_fused:
            from ..utils import infolog
            infolog.log(f"[tacotron] fused decoder kernel DISENGAGED "
                        f"(attention_type={m.attention_type}, "
                        f"decoder_depth={m.decoder_depth}, "
                        f"attention_depth={m.attention_depth}: kernel needs "
                        f"bahdanau + 128-multiples) — using the XLA scan")
        if use_fused:
            from ..ops.decoder_loop import decoder_loop_pallas
            weights = self._fused_decoder_weights()
            P1, P2 = m.prenet_depths
            keep = 1.0 - m.prenet_dropout
            if keep < 1.0:
                k1, k2 = jax.random.split(self.make_rng("dropout"))
                dm1 = jax.random.bernoulli(
                    k1, keep, (n_steps, B, P1)).astype(jnp.float32) / keep
                dm2 = jax.random.bernoulli(
                    k2, keep, (n_steps, B, P2)).astype(jnp.float32) / keep
            else:
                dm1 = jnp.ones((n_steps, B, P1), jnp.float32)
                dm2 = jnp.ones((n_steps, B, P2), jnp.float32)
            frames, aligns = decoder_loop_pallas(
                weights, keys, memory, mask, dm1, dm2,
                carry0.attn_h.astype(jnp.float32),
                jnp.stack([h.astype(jnp.float32) for h in carry0.dec_hs]),
                n_steps, self.cfg.audio.num_mels,
                interpret=jax.default_backend() != "tpu")
            mel_out = jnp.swapaxes(frames, 0, 1).reshape(
                B, n_steps * r, self.cfg.audio.num_mels)
            aligns = jnp.swapaxes(aligns, 0, 1)
        else:
            def step(cell, carry, _):
                pn = cell.prenet(carry.prev_frame.astype(self.dtype))
                return cell(carry, pn, keys, memory, mask)

            scan = nn.scan(step, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True},
                           in_axes=1, out_axes=1, length=n_steps)
            _, (frames, aligns) = scan(self.cell, carry0, None)
            mel_out = frames.reshape(B, n_steps * r, self.cfg.audio.num_mels)

        target_lengths = jnp.full((B,), n_steps * r, jnp.int32)
        linear_out = self._postnet(mel_out, target_lengths, train)
        return TacotronOutput(mel_out, linear_out, aligns)
