"""LSTM primitives designed for TPU throughput.

The reference leans on cuDNN LSTMs (SURVEY.md section 3.2 hot loops); the
TPU-native equivalent is a ``lax.scan`` whose per-step work is a single
fused-gate matmul. Two throughput decisions dominate (SURVEY.md section 7,
"Hard parts" #2):

1. The input projection ``x @ W_ih`` for ALL timesteps is hoisted out of the
   scan as one big (B*T, D) x (D, 4H) matmul - large, batched, MXU-friendly.
   Only the recurrent (B, H) x (H, 4H) matmul stays sequential.
2. Gate order is torch's (i, f, g, o) so reference checkpoints convert by
   simple transpose (BASELINE.json:5 "checkpoint-convertible weights").

Computation dtype is configurable: bf16 matmuls with f32 cell state by
default (cell-state accumulation in bf16 visibly drifts over hundreds of
frames).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LSTMParams(NamedTuple):
    """One LSTM layer. w_ih: (D, 4H), w_hh: (H, 4H), b: (4H,)."""

    w_ih: jax.Array
    w_hh: jax.Array
    b: jax.Array

    @property
    def hidden_size(self) -> int:
        return self.w_hh.shape[0]


def init_lstm_params(key: jax.Array, input_size: int, hidden_size: int,
                     dtype=jnp.float32) -> LSTMParams:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, matching torch.nn.LSTM."""
    k_ih, k_hh, k_b = jax.random.split(key, 3)
    bound = 1.0 / jnp.sqrt(hidden_size)
    return LSTMParams(
        w_ih=jax.random.uniform(k_ih, (input_size, 4 * hidden_size), dtype, -bound, bound),
        w_hh=jax.random.uniform(k_hh, (hidden_size, 4 * hidden_size), dtype, -bound, bound),
        b=jax.random.uniform(k_b, (4 * hidden_size,), dtype, -bound, bound),
    )


def lstm_cell_step(
    params: LSTMParams,
    gates_x: jax.Array,  # (B, 4H): precomputed x_t @ w_ih + b
    h: jax.Array,  # (B, H)
    c: jax.Array,  # (B, H) - kept in f32
    compute_dtype=jnp.float32,
    precision: jax.lax.Precision | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One LSTM step given the precomputed input gates. Returns (h, c).

    ``precision``: pass ``jax.lax.Precision.HIGHEST`` for full-f32 MXU passes
    (parity evaluation vs reference checkpoints); default TPU f32 matmuls use
    single-pass bf16 multiplies (~1e-3 output error, fine for training).
    """
    gates = gates_x + jnp.dot(
        h.astype(compute_dtype),
        params.w_hh.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    gates = gates.astype(jnp.float32)
    H = params.hidden_size
    i, f, g, o = (
        gates[..., :H],
        gates[..., H : 2 * H],
        gates[..., 2 * H : 3 * H],
        gates[..., 3 * H :],
    )
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def input_gates(params: LSTMParams, x: jax.Array, compute_dtype=jnp.float32,
                precision=None) -> jax.Array:
    """Hoisted input projection for all timesteps: (B, T, D) -> (B, T, 4H)."""
    gx = jnp.dot(
        x.astype(compute_dtype),
        params.w_ih.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return gx.astype(jnp.float32) + params.b.astype(jnp.float32)


def lstm(
    params: LSTMParams,
    x: jax.Array,  # (B, T, D)
    h0: jax.Array | None = None,
    c0: jax.Array | None = None,
    reverse: bool = False,
    compute_dtype=jnp.float32,
    precision: jax.lax.Precision | None = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Full-sequence LSTM: returns (outputs (B, T, H), (h_T, c_T))."""
    B = x.shape[0]
    H = params.hidden_size
    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((B, H), jnp.float32)

    gx = input_gates(params, x, compute_dtype, precision)  # (B, T, 4H)
    gx_t = jnp.swapaxes(gx, 0, 1)  # (T, B, 4H): scan over time

    def step(carry, g):
        h, c = carry
        h, c = lstm_cell_step(params, g, h, c, compute_dtype, precision)
        return (h, c), h

    (h_T, c_T), ys = jax.lax.scan(step, (h0, c0), gx_t, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), (h_T, c_T)


def bilstm(
    fwd: LSTMParams,
    bwd: LSTMParams,
    x: jax.Array,  # (B, T, D)
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Bidirectional LSTM: concatenated outputs (B, T, 2H)."""
    y_f, _ = lstm(fwd, x, compute_dtype=compute_dtype)
    y_b, _ = lstm(bwd, x, reverse=True, compute_dtype=compute_dtype)
    return jnp.concatenate([y_f, y_b], axis=-1)


def lstm_stack(
    layers: list[LSTMParams],
    x: jax.Array,
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Stacked unidirectional LSTMs (GE2E-style). Returns (all outputs of the
    last layer (B, T, H), final hidden state h_T (B, H))."""
    h_T = None
    for params in layers:
        x, (h_T, _) = lstm(params, x, compute_dtype=compute_dtype)
    return x, h_T
