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

import functools
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


def bilstm_fused(
    fwd: LSTMParams,
    bwd: LSTMParams,
    x: jax.Array,  # (B, T, D)
    compute_dtype=jnp.float32,
    unroll: int = 1,
) -> jax.Array:
    """Bidirectional LSTM as ONE scan of T steps.

    XLA runs HLO while-loops serially, so the two independent direction
    scans of :func:`bilstm` pay 2T sequential recurrent matmuls. Here step t
    advances the forward direction over ``x[t]`` AND the backward direction
    over ``x[T-1-t]`` with a single direction-batched dot_general
    (2, B, H) x (2, H, 4H) - same FLOPs, half the sequential depth.
    Numerics are identical to :func:`bilstm` (each direction's math is
    unchanged; the directions never mix).
    """
    B, T, _ = x.shape
    H = fwd.hidden_size
    gx_f = input_gates(fwd, x, compute_dtype)  # (B, T, 4H)
    gx_b = input_gates(bwd, x, compute_dtype)
    # Step t reads forward input t and backward input T-1-t.
    g2 = jnp.stack(
        [jnp.swapaxes(gx_f, 0, 1), jnp.swapaxes(gx_b, 0, 1)[::-1]], axis=1
    )  # (T, 2, B, 4H)
    w_hh = jnp.stack([fwd.w_hh, bwd.w_hh]).astype(compute_dtype)  # (2, H, 4H)

    def step(carry, g):
        h, c = carry  # (2, B, H) each
        gates = g + jax.lax.dot_general(
            h.astype(compute_dtype),
            w_hh,
            (((2,), (1,)), ((0,), (0,))),  # contract H, batch over direction
            preferred_element_type=jnp.float32,
        )
        i, f, gg, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    zeros = jnp.zeros((2, B, H), jnp.float32)
    _, ys = jax.lax.scan(step, (zeros, zeros), g2, unroll=unroll)  # (T, 2, B, H)
    y_f = jnp.swapaxes(ys[:, 0], 0, 1)  # (B, T, H)
    y_b = jnp.swapaxes(ys[:, 1][::-1], 0, 1)  # back to natural time order
    return jnp.concatenate([y_f, y_b], axis=-1)


def _wavefront_weights(layers, H: int, D: int, compute_dtype):
    """Layer-stacked ``[W_ih; W_hh]`` (L, 2H, 4H) + bias (L, 1, 4H)."""
    w_in = jnp.stack(
        [jnp.pad(layers[0].w_ih, ((0, H - D), (0, 0)))]
        + [p.w_ih for p in layers[1:]]
    )  # (L, H, 4H)
    w_hh = jnp.stack([p.w_hh for p in layers])  # (L, H, 4H)
    w = jnp.concatenate([w_in, w_hh], axis=1).astype(compute_dtype)
    b = jnp.stack([p.b for p in layers]).astype(jnp.float32)[:, None, :]
    return w, b


def _wavefront_step(w, b, layer_idx, T, compute_dtype, carry, inp):
    """One wavefront step; returns (carry', (h_out, gates))."""
    h, c = carry  # (L, B, H) each
    x_t, s = inp
    # Layer l's input this step: layer l-1's output from the previous
    # step (its time-(s-1) frame = this layer's time s - l).
    lhs = jnp.concatenate(
        [jnp.concatenate([x_t[None], h[:-1]], axis=0), h], axis=-1
    )  # (L, B, 2H)
    gates = jax.lax.dot_general(
        lhs.astype(compute_dtype),
        w,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    # Freeze layers outside their valid time range [l, l + T).
    valid = ((s >= layer_idx) & (s < layer_idx + T))[:, None, None]
    h = jnp.where(valid, h_new, h)
    c = jnp.where(valid, c_new, c)
    return (h, c), (h[-1], gates)


def _wavefront_setup(layers, x, compute_dtype):
    L = len(layers)
    B, T, D = x.shape
    H = layers[0].hidden_size
    assert all(p.hidden_size == H for p in layers), "wavefront needs equal H"
    assert D <= H, f"layer-0 input width {D} must be <= hidden size {H}"
    assert all(p.w_ih.shape[0] == H for p in layers[1:])
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (0, H - D)))  # (B, T, H)
    w, b = _wavefront_weights(layers, H, D, compute_dtype)
    S = T + L - 1
    xs = jnp.concatenate(
        [jnp.swapaxes(x_pad, 0, 1), jnp.zeros((L - 1, B, H), x_pad.dtype)]
    )  # (S, B, H): layer-0 input at wavefront step s is x[s] (zeros past T)
    return L, B, T, D, H, S, xs, w, b


def lstm_stack_wavefront_ref(
    layers, x: jax.Array, compute_dtype=jnp.float32, unroll: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Plain-scan wavefront (XLA autodiff); the custom-VJP test oracle."""
    L, B, T, D, H, S, xs, w, b = _wavefront_setup(layers, x, compute_dtype)
    layer_idx = jnp.arange(L)

    def step(carry, inp):
        carry, (h_out, _) = _wavefront_step(
            w, b, layer_idx, T, compute_dtype, carry, inp
        )
        return carry, h_out

    zeros = jnp.zeros((L, B, H), jnp.float32)
    (h, _), ys = jax.lax.scan(
        step, (zeros, zeros), (xs, jnp.arange(S)), unroll=unroll
    )
    # Last layer is valid from step L-1 on; ys[L-1 + t] = its time-t output.
    return jnp.swapaxes(ys[L - 1 :], 0, 1), h[-1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _wavefront_custom(layers, x, compute_dtype, unroll):
    return lstm_stack_wavefront_ref(layers, x, compute_dtype, unroll)


def _wavefront_fwd(layers, x, compute_dtype, unroll):
    L, B, T, D, H, S, xs, w, b = _wavefront_setup(layers, x, compute_dtype)
    layer_idx = jnp.arange(L)

    def step(carry, inp):
        new_carry, (h_out, gates) = _wavefront_step(
            w, b, layer_idx, T, compute_dtype, carry, inp
        )
        # Residuals stored in the compute dtype: the backward's dW
        # contraction consumes them in that dtype anyway, and f32 stacked
        # buffers would double the residual HBM traffic in bf16 mode. The
        # cell-vjp operands are upcast per step in the backward.
        cd = compute_dtype
        return new_carry, (
            h_out, gates.astype(cd),
            new_carry[0].astype(cd), new_carry[1].astype(cd),
        )

    zeros = jnp.zeros((L, B, H), jnp.float32)
    (h, _), (ys, g_seq, h_seq, c_seq) = jax.lax.scan(
        step, (zeros, zeros), (xs, jnp.arange(S)), unroll=unroll
    )
    out = (jnp.swapaxes(ys[L - 1 :], 0, 1), h[-1])
    res = (layers, x, xs, g_seq, h_seq, c_seq)
    return out, res


def _wavefront_bwd(compute_dtype, unroll, res, cts):
    """Reverse wavefront emitting per-step gate grads; every dW is ONE
    post-loop contraction instead of a per-step (L, 2H, 4H) accumulation
    (which costs ~100 MB of HBM read+write per step - measured 10x the
    forward time for the GE2E stack under XLA autodiff)."""
    layers, x, xs, g_seq, h_seq, c_seq = res
    d_ys, d_hT = cts
    cd = compute_dtype
    L = len(layers)
    B, T, D = x.shape
    H = layers[0].hidden_size
    S = T + L - 1
    layer_idx = jnp.arange(L)
    w, _ = _wavefront_weights(layers, H, D, cd)
    w_T = jnp.swapaxes(w, 1, 2)  # (L, 4H, 2H)

    # State the step READ (post-step state of s-1; zeros at s=0). Residual
    # sequences arrive in the compute dtype (see _wavefront_fwd).
    zeros = jnp.zeros((1, L, B, H), h_seq.dtype)
    h_prev_seq = jnp.concatenate([zeros, h_seq[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([zeros, c_seq[:-1]], axis=0)
    # Output cotangents per wavefront step: ys[L-1 + t] carries d_ys[:, t].
    d_ys_steps = jnp.concatenate(
        [jnp.zeros((L - 1, B, H), jnp.float32), jnp.swapaxes(d_ys, 0, 1)]
    )  # (S, B, H)

    def cell_from_gates(g, c_prev):
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    def bwd_step(carry, inp):
        dh, dc, db = carry  # (L, B, H) state grads; (L, 4H) f32 bias grad
        d_y, gates, c_prev, s = inp
        dh = dh.at[-1].add(d_y)
        valid = ((s >= layer_idx) & (s < layer_idx + T))[:, None, None]
        # where(valid, new, old): invalid lanes pass the grad straight
        # through to the previous step's state.
        dh_new = jnp.where(valid, dh, 0.0)
        dc_new = jnp.where(valid, dc, 0.0)
        dh_pass = jnp.where(valid, 0.0, dh)
        dc_pass = jnp.where(valid, 0.0, dc)
        _, cell_vjp = jax.vjp(
            cell_from_gates,
            gates.astype(jnp.float32), c_prev.astype(jnp.float32),
        )
        dgates, dc_prev = cell_vjp((dh_new, dc_new))
        dg_cd = dgates.astype(cd)
        dlhs = jax.lax.dot_general(
            dg_cd, w_T,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (L, B, 2H): [d input | d h_recurrent]
        d_in = dlhs[..., :H]  # layer 0: dx_t; layer l>0: d h_{l-1} (prev step)
        dh_prev = dlhs[..., H:]
        new_dh = dh_pass + dh_prev
        new_dh = new_dh.at[:-1].add(d_in[1:])
        new_dc = dc_pass + dc_prev
        # Bias grad accumulates in f32 in the (tiny) carry so the stacked
        # dG output can be emitted in the compute dtype - dW consumes it in
        # that dtype anyway, and the f32 buffer would dominate backward HBM
        # traffic (measured ~3 ms of pure materialize/cast at S=162, B=64).
        return (new_dh, new_dc, db + dgates.sum(axis=1)), (dg_cd, d_in[0])

    dh0 = jnp.zeros((L, B, H), jnp.float32).at[-1].set(d_hT)
    dc0 = jnp.zeros((L, B, H), jnp.float32)
    db0 = jnp.zeros((L, 4 * H), jnp.float32)
    inputs = (d_ys_steps, g_seq, c_prev_seq, jnp.arange(S))
    (_, _, db), (dG, dxs) = jax.lax.scan(
        bwd_step, (dh0, dc0, db0), inputs, reverse=True, unroll=unroll
    )

    # Deferred weight grads: lhs_s = [ [x_s | h_prev[:-1]] , h_prev ].
    first_half = jnp.concatenate(
        [xs[:, None].astype(h_prev_seq.dtype), h_prev_seq[:, :-1]], axis=1
    )  # (S, L, B, H)
    lhs_seq = jnp.concatenate([first_half, h_prev_seq], axis=-1)  # (S, L, B, 2H)
    dW = jax.lax.dot_general(
        jnp.swapaxes(lhs_seq, 0, 1).astype(cd),  # (L, S, B, 2H)
        jnp.swapaxes(dG, 0, 1),  # (L, S, B, 4H), already compute dtype
        (((1, 2), (1, 2)), ((0,), (0,))),  # contract S, B; batch L
        preferred_element_type=jnp.float32,
    )  # (L, 2H, 4H)

    dlayers = []
    for l in range(L):
        d_ih = dW[l, :H]
        if l == 0:
            d_ih = d_ih[: layers[0].w_ih.shape[0]]  # unpad to (D, 4H)
        dlayers.append(
            LSTMParams(w_ih=d_ih, w_hh=dW[l, H:], b=db[l])
        )
    dx = jnp.swapaxes(dxs[:T], 0, 1)[..., :D]  # (B, T, D)
    # Match the input pytree type (list or tuple of LSTMParams).
    dlayers = type(layers)(dlayers)
    return (dlayers, dx)


def lstm_stack_wavefront(
    layers,
    x: jax.Array,  # (B, T, D)
    compute_dtype=jnp.float32,
    unroll: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Stacked LSTMs as ONE wavefront scan of T + L - 1 steps.

    Running L layers back-to-back costs L*T sequential recurrent matmuls
    (layer l can't start until layer l-1 finishes the whole sequence). But
    layer l at time t only needs layer l-1's output at time t - so a
    diagonal wavefront (step s advances layer l over time t = s - l) runs
    every layer concurrently in one layer-batched (L, B, 2H) x (L, 2H, 4H)
    matmul per step: ~L x less sequential depth for the GE2E encoder
    (SURVEY.md section 7 "Hard parts" #2). The backward pass is hand-written
    (:func:`_wavefront_bwd`): the reverse scan carries only state grads and
    the weight gradients become one post-loop contraction.

    Requires every layer to share ``hidden_size`` H and layer 0's input
    width D <= H (input and weights are zero-padded to H, which adds no
    terms to the matmul). Returns (last-layer outputs (B, T, H), final
    hidden state of the last layer (B, H)) - matching ``lstm_stack``.
    """
    if len(layers) == 1:
        ys, (h_T, _) = lstm(layers[0], x, compute_dtype=compute_dtype)
        return ys, h_T
    return _wavefront_custom(tuple(layers), x, compute_dtype, unroll)


_wavefront_custom.defvjp(_wavefront_fwd, _wavefront_bwd)


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
