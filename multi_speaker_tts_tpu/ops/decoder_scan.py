"""Tacotron decoder frame scan with a hand-written backward pass.

The teacher-forced decoder is the training hot loop (SURVEY.md section 3.2).
Its forward scan is streaming-bound (the recurrent weights re-read from HBM
every frame), but XLA's autodiff of the scan is far worse: the backward loop
ACCUMULATES the big LSTM weight gradients inside the scan - read + write of
~80 MB of f32 dW buffers per frame, ~6x the forward cost (measured 85 ms
backward vs 12 ms forward at B=64, T=400 on v5e).

This module rebuilds the scan as a :func:`jax.custom_vjp`:

- The backward scan carries only small per-frame state and EMITS the
  pre-activation gate gradients ``dG_t`` (B, 4H) per layer.
- All large weight gradients are then computed OUTSIDE the loop as single
  (T*B, D) x (T*B, 4H) GEMMs - MXU-shaped, no per-step dW traffic.
- The attention sub-block (query/location-conv/energies/softmax) is
  differentiated per step with ``jax.vjp`` on a recomputed closure; its
  parameter gradients are tiny and accumulate in the carry.

Forward numerics are identical to the plain ``lax.scan`` reference
(:func:`decoder_tf_scan_ref`), which the tests also use as the autodiff
oracle for the backward pass.

The same pure cell (:func:`decoder_cell_step`) drives the AR inference
paths (fixed-length scan and stop-aware early-exit while_loop); those are
forward-only and need no custom gradients.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.ops.lstm import LSTMParams


class AttentionParams(NamedTuple):
    """Location-sensitive attention parameters (Taco2 arXiv:1712.05884
    section 2.2; content + cumulative-location conv features)."""

    wq: jax.Array  # (H, A) query projection, no bias
    conv_kernel: jax.Array  # (K, 2, C) location conv, no bias
    wloc: jax.Array  # (C, A) location projection, no bias
    v: jax.Array  # (A, 1) energy projection, no bias


class DecoderScanParams(NamedTuple):
    lstm: tuple  # tuple[LSTMParams, ...]; layer 0 is the attention RNN
    attention: AttentionParams


class DecoderScanCarry(NamedTuple):
    h: tuple  # per-layer hidden states (B, H), f32
    c: tuple  # per-layer cell states (B, H), f32
    weights: jax.Array  # (B, S) previous attention weights, f32
    cum_weights: jax.Array  # (B, S) cumulative attention weights, f32
    context: jax.Array  # (B, D_mem) previous context, f32


def initial_carry(batch: int, memory: jax.Array, n_layers: int,
                  hidden: int) -> DecoderScanCarry:
    """Zero states; attention pinned to the first memory position."""
    S = memory.shape[1]
    w0 = jnp.zeros((batch, S), jnp.float32).at[:, 0].set(1.0)
    zeros = lambda: jnp.zeros((batch, hidden), jnp.float32)  # noqa: E731
    return DecoderScanCarry(
        h=tuple(zeros() for _ in range(n_layers)),
        c=tuple(zeros() for _ in range(n_layers)),
        weights=w0,
        cum_weights=w0,
        context=jnp.zeros((batch, memory.shape[-1]), jnp.float32),
    )


def _fused_weights(p: DecoderScanParams, cd) -> tuple:
    """Per-layer ``[W_ih; W_hh]`` (D+H, 4H) pre-cast to the compute dtype.

    Built OUTSIDE the scans so the cast/concat is done once; inside the loop
    each layer is ONE ``[x, h] @ W`` matmul instead of two (same FLOPs,
    half the sequential MXU launches, and no per-step weight reshaping that
    XLA might fail to hoist out of the while-loop)."""
    return tuple(
        jnp.concatenate([q.w_ih, q.w_hh], axis=0).astype(cd) for q in p.lstm
    )


def quantize_fused(p: DecoderScanParams) -> tuple:
    """Per-layer ``[W_ih; W_hh]`` as (int8 weights, per-output-channel f32
    scale) for the weight-only-quantized serving path.

    The AR decode loop is weight-streaming bound (the ~40 MB of fused LSTM
    weights re-read from HBM all 200 steps); int8 halves that traffic and
    rides the MXU's native s8xs8->s32 path (measured 13.9 vs 17.3 us/step
    for one decode-shaped GEMM on v5e). Symmetric per-channel max scaling:
    column c of W maps to round(W[:, c] / s_c), s_c = max|W[:, c]| / 127.
    Runs inside the jitted program (one pass over the weights per call, and
    XLA hoists it out of the scan), so checkpoints stay f16/f32."""
    out = []
    for q in p.lstm:
        w = jnp.concatenate([q.w_ih, q.w_hh], axis=0).astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
        wq = jnp.clip(jnp.round(w / scale[None, :]), -127, 127)
        out.append((wq.astype(jnp.int8), scale))
    return tuple(out)


def _gates(w_cat, b: jax.Array, x: jax.Array, h: jax.Array,
           cd) -> jax.Array:
    """Pre-activation LSTM gates (B, 4H) in f32 via one fused matmul.

    ``w_cat`` is either the (D+H, 4H) compute-dtype matrix or a
    ``quantize_fused`` (int8, scale) pair; the quantized path quantizes the
    activation row dynamically (symmetric per-row max) and dequantizes the
    s32 accumulator with the product of the two scales."""
    if isinstance(w_cat, tuple):
        wq, wscale = w_cat
        xh = jnp.concatenate(
            [x.astype(jnp.float32), h.astype(jnp.float32)], axis=-1
        )
        amax = jnp.maximum(
            jnp.max(jnp.abs(xh), axis=-1, keepdims=True), 1e-8
        ) / 127.0
        xq = jnp.clip(jnp.round(xh / amax), -127, 127).astype(jnp.int8)
        g32 = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return g32.astype(jnp.float32) * (amax * wscale[None, :]) + b
    xh = jnp.concatenate([x.astype(cd), h.astype(cd)], axis=-1)
    g = jnp.dot(xh, w_cat, preferred_element_type=jnp.float32)
    return g.astype(jnp.float32) + b


def _cell_from_gates(g: jax.Array, c_prev: jax.Array):
    """(h, c) from pre-activation gates; torch gate order (i, f, g, o)."""
    i, f, gg, o = jnp.split(g, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(gg)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _location_conv(loc_in: jax.Array, kernel: jax.Array) -> jax.Array:
    """SAME 1-D convolution over (B, S, 2) -> (B, S, C), no bias."""
    return jax.lax.conv_general_dilated(
        loc_in, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _attention_block(
    h0: jax.Array,  # (B, H) attention-RNN output, f32
    w_prev: jax.Array,  # (B, S)
    cum_prev: jax.Array,  # (B, S)
    keys: jax.Array,  # (B, S, A)
    ap: AttentionParams,
    mask: jax.Array,  # (B, S) 1 = valid (closed over for vjp: no grad)
):
    """One attention step -> (weights, cum). The context matmul lives
    OUTSIDE (its memory gradient is deferred to a post-scan einsum)."""
    q = jnp.dot(h0.astype(jnp.float32), ap.wq)  # (B, A)
    loc_in = jnp.stack([w_prev, cum_prev], axis=-1)  # (B, S, 2)
    loc = jnp.dot(_location_conv(loc_in, ap.conv_kernel), ap.wloc)  # (B, S, A)
    energies = jnp.dot(jnp.tanh(q[:, None, :] + keys + loc), ap.v)[..., 0]
    energies = jnp.where(mask > 0, energies, -1e9)
    w = jax.nn.softmax(energies, axis=-1)
    return w, cum_prev + w


def decoder_cell_step(
    p: DecoderScanParams,
    carry: DecoderScanCarry,
    pre_t: jax.Array,  # (B, P) prenet output for this frame
    keys: jax.Array,  # (B, S, A)
    memory: jax.Array,  # (B, S, D_mem)
    mask: jax.Array,  # (B, S)
    compute_dtype=jnp.float32,
    with_residuals: bool = False,
    fused: tuple | None = None,  # hoisted _fused_weights(p, compute_dtype)
):
    """One decoder frame. Returns (carry', (x_t, w_t)[, residuals]).

    ``x_t = concat(h_last, context)`` feeds the hoisted frame/stop
    projections. Residuals (pre-activation gates per layer) are emitted for
    the custom backward pass.
    """
    n = len(p.lstm)
    if fused is None:
        fused = _fused_weights(p, compute_dtype)
    hs, cs = list(carry.h), list(carry.c)
    gates = []

    # Attention RNN (layer 0).
    attn_in = jnp.concatenate([pre_t, carry.context], axis=-1)
    g0 = _gates(fused[0], p.lstm[0].b, attn_in, hs[0], compute_dtype)
    hs[0], cs[0] = _cell_from_gates(g0, cs[0])
    gates.append(g0)

    w, cum = _attention_block(
        hs[0], carry.weights, carry.cum_weights, keys, p.attention, mask
    )
    context = jnp.einsum("bs,bsd->bd", w, memory.astype(jnp.float32))

    # Decoder RNN stack (layers 1..n-1).
    x = jnp.concatenate([hs[0], context], axis=-1)
    for i in range(1, n):
        gi = _gates(fused[i], p.lstm[i].b, x, hs[i], compute_dtype)
        hs[i], cs[i] = _cell_from_gates(gi, cs[i])
        gates.append(gi)
        x = jnp.concatenate([hs[i], context], axis=-1)

    new_carry = DecoderScanCarry(
        h=tuple(hs), c=tuple(cs), weights=w, cum_weights=cum, context=context
    )
    if with_residuals:
        return new_carry, (x, w), tuple(gates)
    return new_carry, (x, w)


def decoder_tf_scan_ref(
    p: DecoderScanParams,
    pre_seq: jax.Array,  # (T, B, P) prenet-ed teacher frames
    keys: jax.Array,  # (B, S, A)
    memory: jax.Array,  # (B, S, D_mem)
    mask: jax.Array,  # (B, S)
    compute_dtype=jnp.float32,
    unroll: int = 1,
):
    """Plain lax.scan teacher-forced decoder (XLA autodiff). The test oracle
    for :func:`decoder_tf_scan`; numerics are identical."""
    B = memory.shape[0]
    carry0 = initial_carry(B, memory, len(p.lstm), p.lstm[0].hidden_size)
    fused = _fused_weights(p, compute_dtype)

    def step(carry, pre_t):
        carry, out = decoder_cell_step(
            p, carry, pre_t, keys, memory, mask, compute_dtype, fused=fused
        )
        return carry, out

    _, (xs, ws) = jax.lax.scan(step, carry0, pre_seq, unroll=unroll)
    return xs, ws  # (T, B, H + D_mem), (T, B, S)


# ---------------------------------------------------------------------------
# custom-VJP teacher-forced scan
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def decoder_tf_scan(p, pre_seq, keys, memory, mask, compute_dtype=jnp.float32,
                    unroll: int = 1, bwd_unroll: int | None = None):
    """Teacher-forced decoder scan; forward identical to
    :func:`decoder_tf_scan_ref`, backward hand-written (see module doc).
    ``bwd_unroll`` tunes the backward scan independently (None = unroll)."""
    return decoder_tf_scan_ref(p, pre_seq, keys, memory, mask, compute_dtype,
                               unroll)


def _tf_scan_fwd(p, pre_seq, keys, memory, mask, compute_dtype, unroll,
                 bwd_unroll):
    B = memory.shape[0]
    n = len(p.lstm)
    carry0 = initial_carry(B, memory, n, p.lstm[0].hidden_size)
    fused = _fused_weights(p, compute_dtype)

    cd = compute_dtype

    def step(carry, pre_t):
        new_carry, out, gates = decoder_cell_step(
            p, carry, pre_t, keys, memory, mask, compute_dtype,
            with_residuals=True, fused=fused,
        )
        # Residuals: gates (per layer), h, c, context of this step — stored
        # in the COMPUTE dtype. In bf16 mode the stacked f32 buffers would
        # cost ~2.5 GB of HBM store+load per train step (T=400, B=64,
        # H=1024) plus an f32->bf16 cast pass before the deferred dW GEMMs,
        # which consume them in the compute dtype anyway. The (tiny,
        # per-step) values the backward needs at f32 — cell-vjp operands —
        # are upcast per step in the backward loop instead.
        return new_carry, (
            out,
            tuple(g.astype(cd) for g in gates),
            tuple(h.astype(cd) for h in new_carry.h),
            tuple(c.astype(cd) for c in new_carry.c),
            new_carry.context.astype(cd),
        )

    _, (out, g_seq, h_seq, c_seq, ctx_seq) = jax.lax.scan(
        step, carry0, pre_seq, unroll=unroll
    )
    xs, ws = out
    res = (p, pre_seq, keys, memory, mask, g_seq, h_seq, c_seq, ctx_seq, ws)
    return (xs, ws), res


def _shift_right(seq: jax.Array, init: jax.Array) -> jax.Array:
    """(T, ...) -> value at t-1 per step (init at t=0)."""
    return jnp.concatenate([init[None], seq[:-1]], axis=0)


def _tf_scan_bwd(compute_dtype, unroll, bwd_unroll, res, cts):
    if bwd_unroll is None:
        bwd_unroll = unroll
    p, pre_seq, keys, memory, mask, g_seq, h_seq, c_seq, ctx_seq, w_seq = res
    d_xs, d_ws = cts  # (T, B, H + D), (T, B, S)
    n = len(p.lstm)
    T, B, P = pre_seq.shape
    H = p.lstm[0].hidden_size
    S = memory.shape[1]
    D = memory.shape[2]
    cd = compute_dtype
    mem_f32 = memory.astype(jnp.float32)

    carry0 = initial_carry(B, memory, n, H)
    # Previous-step state sequences (value the step READ, not produced).
    # Residual sequences are stored in the compute dtype (see _tf_scan_fwd);
    # the zero-state inits are cast to match.
    h_prev_seq = tuple(
        _shift_right(h_seq[i], carry0.h[i].astype(cd)) for i in range(n)
    )
    c_prev_seq = tuple(
        _shift_right(c_seq[i], carry0.c[i].astype(cd)) for i in range(n)
    )
    ctx_prev_seq = _shift_right(ctx_seq, carry0.context.astype(cd))
    w_prev_seq = _shift_right(w_seq, carry0.weights)
    # cum_prev at step t = w_init + sum_{tau < t} w_tau.
    cum_prev_seq = carry0.cum_weights[None] + jnp.cumsum(w_seq, axis=0) - w_seq

    def attn_fn(h0, w_prev, cum_prev, keys_, ap):
        return _attention_block(h0, w_prev, cum_prev, keys_, ap, mask)

    zeros_ap = jax.tree.map(jnp.zeros_like, p.attention)
    # Transposed fused weights, pre-cast OUTSIDE the scan: per layer one
    # dG @ [W_ih; W_hh]^T matmul yields (dxin | dh_prev) in one launch.
    fused_T = tuple(w.T for w in _fused_weights(p, cd))

    def bwd_step(carry, inp):
        (dh, dc, dctx_c, dw_c, dcum_c, dkeys_acc, dap_acc, db_acc) = carry
        (d_x, d_w_out, gates, c_prev, h0_t, w_prev_t, cum_prev_t) = inp

        dh = list(dh)
        dc = list(dc)
        dh[n - 1] = dh[n - 1] + d_x[:, :H]
        dctx = d_x[:, H:] + dctx_c

        dgates = [None] * n
        # Decoder RNN stack, reverse order. Cell-vjp operands are upcast to
        # f32 per step (tiny, VMEM-local) so the nonlinearity derivatives
        # and the carried state-gradient chain stay full precision even
        # when the stored residuals are bf16.
        for i in range(n - 1, 0, -1):
            _, cell_vjp = jax.vjp(
                _cell_from_gates,
                gates[i].astype(jnp.float32),
                c_prev[i].astype(jnp.float32),
            )
            dg, dc_prev_i = cell_vjp((dh[i], dc[i]))
            dgates[i] = dg
            dcat = jnp.dot(
                dg.astype(cd), fused_T[i], preferred_element_type=jnp.float32
            )  # (B, H + D + H): [d h_{i-1} | d ctx | d h_i_prev]
            dh[i - 1] = dh[i - 1] + dcat[:, :H]
            dctx = dctx + dcat[:, H : H + D]
            dh[i] = dcat[:, H + D :]
            dc[i] = dc_prev_i

        # Context matmul: ctx = w @ memory.
        dw_total = d_w_out + dw_c + jnp.einsum("bd,bsd->bs", dctx, mem_f32)

        # Attention block (recomputed) via vjp; memory grad deferred. The
        # block's own vjp handles the cum chain (cum_t = cum_{t-1} + w_t):
        # dcum_c routes into both dw (w inside cum) and dcum_prev.
        _, attn_vjp = jax.vjp(
            attn_fn, h0_t, w_prev_t, cum_prev_t, keys, p.attention
        )
        dh0_attn, dw_prev, dcum_prev, dkeys_t, dap = attn_vjp(
            (dw_total, dcum_c)
        )
        dh[0] = dh[0] + dh0_attn
        dkeys_acc = dkeys_acc + dkeys_t
        dap_acc = jax.tree.map(jnp.add, dap_acc, dap)

        # Attention RNN (layer 0).
        _, cell0_vjp = jax.vjp(
            _cell_from_gates,
            gates[0].astype(jnp.float32),
            c_prev[0].astype(jnp.float32),
        )
        dg0, dc_prev_0 = cell0_vjp((dh[0], dc[0]))
        dgates[0] = dg0
        dcat0 = jnp.dot(
            dg0.astype(cd), fused_T[0], preferred_element_type=jnp.float32
        )  # (B, P + D + H): [d pre | d ctx_prev | d h0_prev]
        dpre_t = dcat0[:, :P]
        dctx_prev = dcat0[:, P : P + D]
        dh[0] = dcat0[:, P + D :]
        dc[0] = dc_prev_0

        # Bias grads accumulate in f32 in the (tiny) carry; the stacked dG
        # outputs are emitted in the compute dtype, which is what the
        # deferred dW GEMMs consume - an f32 dG buffer would add ~1.7 GB of
        # pure materialize/cast HBM traffic at T=400, B=64.
        db_acc = tuple(
            a + g.sum(axis=0) for a, g in zip(db_acc, dgates)
        )
        new_carry = (
            tuple(dh), tuple(dc), dctx_prev, dw_prev, dcum_prev,
            dkeys_acc, dap_acc, db_acc,
        )
        outs = (tuple(g.astype(cd) for g in dgates), dpre_t, dctx)
        return new_carry, outs

    zero_carry = (
        tuple(jnp.zeros((B, H), jnp.float32) for _ in range(n)),
        tuple(jnp.zeros((B, H), jnp.float32) for _ in range(n)),
        jnp.zeros((B, D), jnp.float32),
        jnp.zeros((B, S), jnp.float32),
        jnp.zeros((B, S), jnp.float32),
        jnp.zeros_like(keys, dtype=jnp.float32),
        zeros_ap,
        tuple(jnp.zeros((4 * H,), jnp.float32) for _ in range(n)),
    )
    inputs = (
        d_xs, d_ws, tuple(g_seq), tuple(c_prev_seq),
        h_seq[0], w_prev_seq, cum_prev_seq,
    )
    final, (dG, dpre_seq, dctx_seq) = jax.lax.scan(
        bwd_step, zero_carry, inputs, reverse=True, unroll=bwd_unroll
    )
    (_, _, _, _, _, dkeys, dap, db) = final

    # Deferred weight gradients: one big GEMM per matrix.
    def big_dot(a2d, b2d):
        return jnp.dot(
            a2d.T.astype(cd), b2d,
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)

    TB = T * B
    dlstm = []
    for i in range(n):
        dGi = dG[i].reshape(TB, 4 * H)  # already compute dtype
        if i == 0:
            xin = jnp.concatenate([pre_seq.astype(cd), ctx_prev_seq], axis=-1)
        else:
            xin = jnp.concatenate([h_seq[i - 1], ctx_seq], axis=-1)
        din = xin.shape[-1]
        xh = jnp.concatenate(
            [xin.reshape(TB, din), h_prev_seq[i].reshape(TB, H)], axis=-1
        )
        dcat = big_dot(xh, dGi)  # (din + H, 4H) = [dW_ih; dW_hh]
        dlstm.append(
            LSTMParams(w_ih=dcat[:din], w_hh=dcat[din:], b=db[i])
        )

    # Memory gradient: ctx_t = w_t @ memory  =>  dMem = sum_t w_t^T dctx_t.
    dmemory = jnp.einsum(
        "tbs,tbd->bsd", w_seq.astype(cd), dctx_seq.astype(cd),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)

    dp = DecoderScanParams(lstm=tuple(dlstm), attention=dap)
    return (dp, dpre_seq, dkeys, dmemory, jnp.zeros_like(mask))


decoder_tf_scan.defvjp(_tf_scan_fwd, _tf_scan_bwd)


# ---------------------------------------------------------------------------
# AR inference drivers (forward-only)
# ---------------------------------------------------------------------------


def decoder_ar_scan(
    p: DecoderScanParams,
    prenet_apply_fn,  # (frame (B, mel), rng) -> (B, P)
    project_fn,  # x (B, X) -> (frames (B, mel*r), stop_logit (B,))
    keys: jax.Array,
    memory: jax.Array,
    mask: jax.Array,
    n_steps: int,
    rng: jax.Array,
    mel_dim: int,
    compute_dtype=jnp.float32,
    unroll: int = 1,
    fused: tuple | None = None,  # e.g. quantize_fused(p) for int8 serving
):
    """Fixed-length AR decode (constant workload; stop masking happens in
    the caller). Returns (frames (T, B, mel*r), stops (T, B), aligns)."""
    B = memory.shape[0]
    carry0 = initial_carry(B, memory, len(p.lstm), p.lstm[0].hidden_size)
    prev0 = jnp.zeros((B, mel_dim), jnp.float32)

    def step(state, t):
        carry, prev = state
        pre_t = prenet_apply_fn(prev, jax.random.fold_in(rng, t))
        carry, (x, w) = decoder_cell_step(
            p, carry, pre_t, keys, memory, mask, compute_dtype, fused=fused
        )
        frames, stop = project_fn(x)
        return (carry, frames[..., -mel_dim:]), (frames, stop, w)

    _, (frames, stops, ws) = jax.lax.scan(
        step, (carry0, prev0), jnp.arange(n_steps), unroll=unroll
    )
    return frames, stops, ws


def decoder_ar_early_exit(
    p: DecoderScanParams,
    prenet_apply_fn,
    project_fn,
    keys: jax.Array,
    memory: jax.Array,
    mask: jax.Array,
    n_steps: int,
    stop_threshold: float,
    rng: jax.Array,
    mel_dim: int,
    compute_dtype=jnp.float32,
    stopped_init: jax.Array | None = None,
    chunk: int = 16,
    unroll: int = 1,
    fused: tuple | None = None,  # e.g. quantize_fused(p) for int8 serving
    segment_fn=None,  # custom K-step segment body (e.g. the Pallas kernel)
):
    """AR decode as a while_loop exiting once EVERY utterance stopped.

    ``segment_fn``, when given, replaces :func:`decoder_ar_segment` as the
    chunk body — signature ``(keys, memory, mask, carry, prev, t0, stopped,
    lengths, K, stop_threshold, rng) -> (carry, prev, stopped, lengths,
    frames, stops, aligns)`` (ops/decode_pallas.py provides one).

    Static shapes (buffers allocated at n_steps); only the trip count is
    dynamic, so serving latency tracks speech length. ``stopped_init``
    ((B,) bool) pre-stops rows that should not gate the exit - serving
    passes the batch-bucket PAD rows here, whose garbage inputs may never
    emit a stop token and would otherwise silently pin every padded batch
    to the full bucket length. Pre-stopped rows decode length 0. Returns
    (frames, stops, aligns, lengths_steps).

    Each while iteration runs a ``chunk``-step inner ``lax.scan`` (measured
    on v5e: a one-step-per-iteration while_loop costs ~8x the per-step
    price of the unrollable fixed scan - condition evaluation, no unroll,
    buffer carries - so chunking amortizes that overhead ``chunk``-fold at
    the price of decoding at most ``chunk - 1`` steps past the batch's
    last stop). Per-step ``lengths``/``stopped`` bookkeeping is inside the
    inner scan, so decoded lengths are EXACTLY the un-chunked values; only
    buffer contents past the exit differ (real frames instead of filler),
    and those are masked by ``lengths`` downstream."""
    B, S = mask.shape
    carry0 = initial_carry(B, memory, len(p.lstm), p.lstm[0].hidden_size)
    prev0 = jnp.zeros((B, mel_dim), jnp.float32)
    # Probe projection width statically (no compute: eval_shape).
    x_width = p.lstm[-1].hidden_size + memory.shape[-1]
    frame_shape = jax.eval_shape(
        project_fn, jax.ShapeDtypeStruct((B, x_width), jnp.float32)
    )[0].shape
    bufs = (
        jnp.zeros((n_steps, B, frame_shape[-1]), jnp.float32),
        # Filler stop logits at -1e4: sigmoid ~ 0 so steps the loop never
        # ran can't read as "stopped" downstream.
        jnp.full((n_steps, B), -1e4, jnp.float32),
        jnp.zeros((n_steps, B, S), jnp.float32),
    )
    stopped0 = (
        jnp.zeros((B,), bool) if stopped_init is None
        else stopped_init.astype(bool)
    )
    init = (
        carry0, prev0,
        jnp.zeros((), jnp.int32),  # t
        stopped0,  # stopped flags (pre-stopped rows never gate the exit)
        jnp.zeros((B,), jnp.int32),  # decoded steps per utterance
        bufs,
    )

    # Largest divisor of n_steps <= the requested chunk (decode buckets are
    # pow2-flavored, so this is almost always `chunk` itself; worst case —
    # including a misconfigured chunk <= 0 — falls back to 1 = the classic
    # one-step loop).
    K = max((k for k in range(1, min(chunk, n_steps) + 1)
             if n_steps % k == 0), default=1)

    def cond_fn(state):
        _, _, t, stopped, _, _ = state
        return (t < n_steps) & ~jnp.all(stopped)

    def body_fn(state):
        carry, prev, t, stopped, lengths, (mel_b, stop_b, align_b) = state
        if segment_fn is not None:
            carry, prev, stopped, lengths, f_k, s_k, w_k = segment_fn(
                keys, memory, mask, carry, prev, t, stopped, lengths, K,
                stop_threshold, rng,
            )
        else:
            carry, prev, stopped, lengths, f_k, s_k, w_k = decoder_ar_segment(
                p, prenet_apply_fn, project_fn, keys, memory, mask,
                carry, prev, t, stopped, lengths, K, stop_threshold, rng,
                mel_dim, compute_dtype, unroll, fused=fused,
            )
        mel_b = jax.lax.dynamic_update_slice(mel_b, f_k, (t, 0, 0))
        stop_b = jax.lax.dynamic_update_slice(stop_b, s_k, (t, 0))
        align_b = jax.lax.dynamic_update_slice(align_b, w_k, (t, 0, 0))
        return (carry, prev, t + K, stopped, lengths,
                (mel_b, stop_b, align_b))

    final = jax.lax.while_loop(cond_fn, body_fn, init)
    _, _, _, _, lengths_steps, (frames, stops, aligns) = final
    return frames, stops, aligns, lengths_steps


def decoder_ar_segment(
    p: DecoderScanParams,
    prenet_apply_fn,
    project_fn,
    keys: jax.Array,
    memory: jax.Array,
    mask: jax.Array,
    carry: DecoderScanCarry,
    prev: jax.Array,  # (B, mel) previous frame feedback
    t0: jax.Array,  # () int32 global step index of the first step
    stopped: jax.Array,  # (B,) bool
    lengths: jax.Array,  # (B,) int32 decoded steps so far
    n_steps_seg: int,
    stop_threshold: float,
    rng: jax.Array,
    mel_dim: int,
    compute_dtype=jnp.float32,
    unroll: int = 1,
    fused: tuple | None = None,  # e.g. quantize_fused(p) for int8 serving
):
    """Run ``n_steps_seg`` AR decode steps from EXPLICIT state.

    The shared per-step math of the early-exit loop (which calls this as
    its chunk body) and the streaming-synthesis API (which carries the
    returned state across separate jitted program invocations). The
    prenet rng is ``fold_in(rng, global_step)``, so a streamed decode
    reproduces the batched early-exit decode bit-for-bit given the same
    top-level rng. Returns
    ``(carry, prev, stopped, lengths, frames (K, B, mel*r),
    stop_logits (K, B), aligns (K, B, S))``."""

    def inner_step(s, i):
        carry, prev, t, stopped, lengths = s
        pre_t = prenet_apply_fn(prev, jax.random.fold_in(rng, t))
        carry, (x, w) = decoder_cell_step(
            p, carry, pre_t, keys, memory, mask, compute_dtype, fused=fused
        )
        frames, stop_logit = project_fn(x)
        lengths = lengths + (~stopped).astype(jnp.int32)
        stopped = stopped | (
            jax.nn.sigmoid(stop_logit.astype(jnp.float32)) > stop_threshold
        )
        return (
            (carry, frames[..., -mel_dim:], t + 1, stopped, lengths),
            (frames, stop_logit, w),
        )

    (carry, prev, _, stopped, lengths), (f_k, s_k, w_k) = jax.lax.scan(
        inner_step, (carry, prev, t0, stopped, lengths),
        jnp.arange(n_steps_seg),
        unroll=min(max(unroll, 1), n_steps_seg),
    )
    return carry, prev, stopped, lengths, f_k, s_k, w_k
