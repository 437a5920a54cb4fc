"""GRU primitives for the CBHG linear head (SURVEY.md section 2
"Synthesizer": the reference's Taco1-style CBHG ends in a bidirectional
GRU).

Same TPU shape as ``ops.lstm``: the input projection for all timesteps is
hoisted out of the scan as one large MXU matmul; only the (B, H) x (H, 3H)
recurrent matmul stays sequential. Gate order is torch's (r, z, n) so
reference checkpoints convert by transpose. Unlike the LSTM, torch's two GRU
bias vectors canNOT be summed: b_hn sits inside the reset gate product
(n = tanh(W_in x + b_in + r * (W_hn h + b_hn))), so both are kept.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GRUParams(NamedTuple):
    """One GRU layer. w_ih: (D, 3H), w_hh: (H, 3H), b_ih/b_hh: (3H,)."""

    w_ih: jax.Array
    w_hh: jax.Array
    b_ih: jax.Array
    b_hh: jax.Array

    @property
    def hidden_size(self) -> int:
        return self.w_hh.shape[0]


def gru_cell_step(
    params: GRUParams,
    gates_x: jax.Array,  # (B, 3H): precomputed x_t @ w_ih + b_ih
    h: jax.Array,  # (B, H)
    compute_dtype=jnp.float32,
    precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """One GRU step given precomputed input gates. Returns new h."""
    gates_h = jnp.dot(
        h.astype(compute_dtype),
        params.w_hh.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) + params.b_hh.astype(jnp.float32)
    H = params.hidden_size
    r = jax.nn.sigmoid(gates_x[..., :H] + gates_h[..., :H])
    z = jax.nn.sigmoid(gates_x[..., H : 2 * H] + gates_h[..., H : 2 * H])
    n = jnp.tanh(gates_x[..., 2 * H :] + r * gates_h[..., 2 * H :])
    return (1.0 - z) * n + z * h


def gru(
    params: GRUParams,
    x: jax.Array,  # (B, T, D)
    h0: jax.Array | None = None,
    reverse: bool = False,
    compute_dtype=jnp.float32,
    precision: jax.lax.Precision | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full-sequence GRU: returns (outputs (B, T, H), h_T)."""
    B = x.shape[0]
    H = params.hidden_size
    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)

    gx = jnp.dot(
        x.astype(compute_dtype),
        params.w_ih.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(jnp.float32) + params.b_ih.astype(jnp.float32)
    gx_t = jnp.swapaxes(gx, 0, 1)  # (T, B, 3H)

    def step(h, g):
        h = gru_cell_step(params, g, h, compute_dtype, precision)
        return h, h

    h_T, ys = jax.lax.scan(step, h0, gx_t, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), h_T


def bigru_fused(
    fwd: GRUParams,
    bwd: GRUParams,
    x: jax.Array,  # (B, T, D)
    compute_dtype=jnp.float32,
    unroll: int = 1,
) -> jax.Array:
    """Bidirectional GRU as ONE scan of T steps (see ``lstm.bilstm_fused``:
    XLA serializes while-loops, so direction-batching the recurrent matmul
    halves the sequential depth at identical FLOPs and numerics)."""
    B, T, _ = x.shape
    H = fwd.hidden_size

    def in_proj(p: GRUParams) -> jax.Array:
        return jnp.dot(
            x.astype(compute_dtype),
            p.w_ih.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) + p.b_ih.astype(jnp.float32)

    g2 = jnp.stack(
        [jnp.swapaxes(in_proj(fwd), 0, 1),
         jnp.swapaxes(in_proj(bwd), 0, 1)[::-1]],
        axis=1,
    )  # (T, 2, B, 3H)
    w_hh = jnp.stack([fwd.w_hh, bwd.w_hh]).astype(compute_dtype)  # (2, H, 3H)
    b_hh = jnp.stack([fwd.b_hh, bwd.b_hh]).astype(jnp.float32)[:, None, :]  # (2, 1, 3H)

    def step(h, g):  # h (2, B, H), g (2, B, 3H)
        gates_h = jax.lax.dot_general(
            h.astype(compute_dtype),
            w_hh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + b_hh
        r = jax.nn.sigmoid(g[..., :H] + gates_h[..., :H])
        z = jax.nn.sigmoid(g[..., H : 2 * H] + gates_h[..., H : 2 * H])
        n = jnp.tanh(g[..., 2 * H :] + r * gates_h[..., 2 * H :])
        h = (1.0 - z) * n + z * h
        return h, h

    _, ys = jax.lax.scan(step, jnp.zeros((2, B, H), jnp.float32), g2,
                         unroll=unroll)  # (T, 2, B, H)
    y_f = jnp.swapaxes(ys[:, 0], 0, 1)
    y_b = jnp.swapaxes(ys[:, 1][::-1], 0, 1)
    return jnp.concatenate([y_f, y_b], axis=-1)
