"""Attention mechanisms: Bahdanau (content) and location-sensitive.

Reference: ``tf.contrib.seq2seq.BahdanauAttention`` used by
``models/tacotron.py`` via AttentionWrapper (SURVEY.md §2.8); the fork's
north star also names location attention, provided here as
:class:`LocationSensitiveAttention` (Chorowski et al., as in Tacotron-2).

TPU-first split: ``precompute_keys`` runs the [B,L,D]→[B,L,A] memory
projection ONCE per utterance (one large MXU matmul); the per-decoder-step
``__call__`` is only a [B,A] query projection, a VPU tanh+reduce for the
energies, and a [B,L]×[B,L,D] context contraction.  The per-step math is
exactly the contraction the Pallas attention-energy kernel (ops/) fuses.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class AttentionState(NamedTuple):
    alignments: jnp.ndarray       # [B, L] previous alignments
    accumulated: jnp.ndarray      # [B, L] cumulative alignments (location)


def masked_softmax(energies: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    energies = jnp.where(mask, energies, -1e9)
    m = jnp.max(energies, axis=-1, keepdims=True)
    e = jnp.exp(energies - m) * mask
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-9)


class BahdanauAttention(nn.Module):
    """Additive content attention: score = v·tanh(W_q q + W_k m).

    With ``seq_mesh`` set, the per-step energies/softmax/context run as the
    distributed-softmax shard_map of ops/sharded_attention.py: keys/memory/
    mask stay sharded along L over the mesh's model axis and the per-step
    ICI traffic is two scalar-per-row collectives plus one [B, D] psum —
    encoder length scales with chip count (SURVEY.md §2.14 SP analogue).
    """

    units: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    seq_mesh: Any = None
    seq_axis: str = "model"
    # opt-out for the per-shard kernel inside the sequence-sharded softmax
    # (parallel.use_pallas_seq_attention): with it True (default) a real-TPU
    # mesh engages the kernel even when ``use_pallas`` is off; False
    # restores the pure-jnp per-shard math everywhere (ADVICE r4: the
    # unconditional force left no escape hatch for a Mosaic regression)
    seq_kernel: bool = True

    def setup(self):
        self.query_layer = nn.Dense(self.units, use_bias=False,
                                    dtype=self.dtype, name="query")
        self.memory_layer = nn.Dense(self.units, use_bias=False,
                                     dtype=self.dtype, name="memory")
        self.v = self.param("v", nn.initializers.lecun_normal(),
                            (self.units, 1), jnp.float32)

    def precompute_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        """[B, L, D] -> [B, L, A], once per utterance."""
        return self.memory_layer(memory)

    def init_state(self, batch: int, length: int) -> AttentionState:
        z = jnp.zeros((batch, length), dtype=jnp.float32)
        return AttentionState(z, z)

    def __call__(self, query: jnp.ndarray, keys: jnp.ndarray,
                 memory: jnp.ndarray, mask: jnp.ndarray,
                 state: AttentionState) -> tuple[jnp.ndarray, jnp.ndarray,
                                                 AttentionState]:
        """One decoder step: query [B,Q] -> (context [B,D], alignments [B,L])."""
        q = self.query_layer(query)
        if self.seq_mesh is not None:
            from ..ops.sharded_attention import make_sharded_attention_step
            # per-shard half runs the fused attention kernel — the sharded
            # softmax and the kernel compose.  Platform comes from the
            # MESH's devices, not the default backend: under RUN_TPU_TESTS
            # the 8-device mesh is the virtual-CPU platform while the
            # default backend is the one real chip (interpret mode there)
            mesh_tpu = self.seq_mesh.devices.flat[0].platform == "tpu"
            step = make_sharded_attention_step(
                self.seq_mesh, self.seq_axis,
                use_pallas=(self.use_pallas or mesh_tpu) and self.seq_kernel,
                interpret=not mesh_tpu)
            context, align = step(
                keys.astype(jnp.float32), q.astype(jnp.float32),
                self.v[:, 0].astype(jnp.float32),
                memory.astype(jnp.float32), mask)
            context = context.astype(memory.dtype)
        elif self.use_pallas:
            from ..ops.attention_step import attention_step_pallas
            context, align = attention_step_pallas(
                keys, q, self.v[:, 0].astype(keys.dtype), memory, mask,
                interpret=jax.default_backend() != "tpu")
            context = context.astype(memory.dtype)
        else:
            e = jnp.tanh(q[:, None, :] + keys) @ self.v.astype(keys.dtype)
            align = masked_softmax(e[..., 0].astype(jnp.float32), mask)
            context = jnp.einsum("bl,bld->bd", align.astype(memory.dtype),
                                 memory)
        return context, align, AttentionState(align, state.accumulated + align)


class LocationSensitiveAttention(nn.Module):
    """Content + location attention: the energies also see conv features of
    the cumulative alignments, encouraging monotonic progression."""

    units: int
    location_filters: int = 32
    location_kernel: int = 31
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.query_layer = nn.Dense(self.units, use_bias=False,
                                    dtype=self.dtype, name="query")
        self.memory_layer = nn.Dense(self.units, use_bias=False,
                                     dtype=self.dtype, name="memory")
        self.location_conv = nn.Conv(self.location_filters,
                                     (self.location_kernel,), padding="SAME",
                                     use_bias=False, dtype=self.dtype,
                                     name="loc_conv")
        self.location_layer = nn.Dense(self.units, use_bias=False,
                                       dtype=self.dtype, name="loc_proj")
        self.v = self.param("v", nn.initializers.lecun_normal(),
                            (self.units, 1), jnp.float32)
        self.score_bias = self.param("b", nn.initializers.zeros, (),
                                     jnp.float32)

    def precompute_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.memory_layer(memory)

    def init_state(self, batch: int, length: int) -> AttentionState:
        z = jnp.zeros((batch, length), dtype=jnp.float32)
        return AttentionState(z, z)

    def __call__(self, query: jnp.ndarray, keys: jnp.ndarray,
                 memory: jnp.ndarray, mask: jnp.ndarray,
                 state: AttentionState) -> tuple[jnp.ndarray, jnp.ndarray,
                                                 AttentionState]:
        q = self.query_layer(query)
        loc = self.location_conv(
            state.accumulated[..., None].astype(self.dtype))   # [B, L, F]
        loc = self.location_layer(loc)                          # [B, L, A]
        if self.use_pallas:
            from ..ops.attention_step import attention_step_pallas
            # score_bias is a constant shift of every energy; softmax is
            # shift-invariant, so the kernel path can omit it.
            context, align = attention_step_pallas(
                keys, q, self.v[:, 0].astype(keys.dtype), memory, mask,
                location_term=loc,
                interpret=jax.default_backend() != "tpu")
            context = context.astype(memory.dtype)
        else:
            e = jnp.tanh(q[:, None, :] + keys + loc) @ self.v.astype(keys.dtype)
            e = e[..., 0].astype(jnp.float32) + self.score_bias
            align = masked_softmax(e, mask)
            context = jnp.einsum("bl,bld->bd", align.astype(memory.dtype),
                                 memory)
        return context, align, AttentionState(align, state.accumulated + align)


def make_attention(model_cfg, dtype, use_pallas: bool = False,
                   seq_mesh=None, seq_axis: str = "model",
                   seq_kernel: bool = True) -> nn.Module:
    if model_cfg.attention_type == "bahdanau":
        return BahdanauAttention(model_cfg.attention_depth, dtype,
                                 use_pallas, seq_mesh, seq_axis,
                                 seq_kernel, name="attention")
    if model_cfg.attention_type == "location":
        if seq_mesh is not None:
            raise NotImplementedError(
                "sequence-sharded decode supports bahdanau attention only "
                "(location conv over the cumulative alignments would need a "
                "halo exchange)")
        return LocationSensitiveAttention(
            model_cfg.attention_depth, model_cfg.attention_location_filters,
            model_cfg.attention_location_kernel, dtype, use_pallas,
            name="attention")
    raise ValueError(f"unknown attention_type {model_cfg.attention_type!r}")
