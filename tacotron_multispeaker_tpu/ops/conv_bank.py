"""Pallas TPU kernel: fused CBHG conv-bank (SURVEY.md §2.13a).

Computes ``y[b,t,o] = relu(sum_{j,d} xpad[b, t+j, d] * w[j,d,o] + bias[o])``
— the width-1..K conv bank folded into one width-K masked convolution (the
masking lives in the weights; see models/modules.ConvBank).

Mapping: grid over (batch, output-channel tiles).  Each program holds one
padded [T+K-1, D] input slab in VMEM and accumulates K shifted
[T, D]×[D, O_tile] matmuls on the MXU — the conv becomes K dense
contractions with no im2col materialization and a single fused bias+ReLU
epilogue on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, w_ref, b_ref, y_ref, *, K: int, T: int):
    acc = jnp.zeros(y_ref.shape[1:], jnp.float32)          # [T, O_TILE]
    for j in range(K):
        xj = x_ref[0, pl.ds(j, T), :]
        acc += jnp.dot(xj, w_ref[j], preferred_element_type=jnp.float32)
    y_ref[0, :, :] = jnp.maximum(acc + b_ref[:, :], 0.0).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_bank_pallas(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """x: [B, T, D]; w: [K, D, O] (pre-masked); bias: [O] → relu(conv) [B, T, O].

    SAME padding with left pad (K-1)//2 (matching
    ``lax.conv_general_dilated`` in models/modules.ConvBank).
    """
    B, T, D = x.shape
    K, Dw, O = w.shape
    assert D == Dw
    pad_l = (K - 1) // 2
    pad_r = K - 1 - pad_l

    # pad time (conv halo) and round T up so tiles stay aligned
    T_pad = _round_up(T, 8)
    x_p = jnp.pad(x, ((0, 0), (pad_l, pad_r + (T_pad - T)), (0, 0)))

    O_TILE = min(_round_up(O, 128), 512)
    O_pad = _round_up(O, O_TILE)
    if O_pad != O:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, O_pad - O)))
        bias = jnp.pad(bias, (0, O_pad - O))

    grid = (B, O_pad // O_TILE)
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, T=T_pad),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, O_pad), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_pad + K - 1, D), lambda b, o: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, O_TILE), lambda b, o: (0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O_TILE), lambda b, o: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_pad, O_TILE), lambda b, o: (b, 0, o),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_p, w, bias[None, :])
    return out[:, :T, :O]


def conv_bank_reference(x: jnp.ndarray, w: jnp.ndarray,
                        bias: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA fallback — identical math via conv_general_dilated."""
    K = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[((K - 1) // 2, K // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(y + bias, 0.0).astype(x.dtype)
