"""Resident-weight sequential LSTM stack as Pallas TPU kernels.

Why this exists (PROFILE.md "GE2E wavefront roofline"): under XLA the
stacked-LSTM train step spends 45% of its time on wavefront assembly glue
(concat/dynamic_update_slice/reshape around the layer-batched GEMM) and
runs that GEMM at ~31% of peak because the batch-of-3 layer grouping
prevents one large MXU tile — and every scan iteration re-streams all
three layers' weights from HBM, because XLA has no way to pin a
loop-invariant operand in VMEM across while-loop iterations.

The TPU-native fix is the classic resident-weight RNN kernel: process the
stack LAYER-SEQUENTIALLY, one ``pallas_call`` per layer, with that layer's
fused gate weights ``W_ih``/``W_hh`` (9.4 MB bf16 at H=768) held in VMEM
for the whole sequence. Each grid step then does two clean MXU dots
((B, D)x(D, 4H) + (B, H)x(H, 4H)) and the f32 cell state lives in VMEM
scratch — zero wavefront glue, zero weight re-streaming, zero gx
materialization (the input projection is fused into the same step instead
of hoisted to a (B, T, 4H) HBM scratch tensor).

Scope/precision contract:
- bf16 compute only (``compute_dtype=jnp.bfloat16``): f32 weights do not
  fit in VMEM at H=768 (2 x 18.9 MB). The stack-level dispatcher
  (`lstm_stack_seq`) falls back to the XLA wavefront for f32.
- Cell math in f32 from bf16-rounded gates; the carried ``h`` is rounded
  to bf16 only as a matmul operand — exactly the numerics of
  :func:`multi_speaker_tts_tpu.ops.lstm.lstm` with ``compute_dtype=bf16``
  (the parity oracle, tested).
- The backward mirrors :func:`ops.lstm._wavefront_bwd`'s precision
  choices: residuals (pre-activation gates, previous cell state) are
  stored bf16, the reverse kernel re-derives the cell VJP in f32 and
  emits bf16 ``dG``; all weight/input gradients are deferred big XLA
  GEMMs (dW = lhs^T dG, dx = dG W^T) outside the kernel.

Reference mapping: the reference's cuDNN LSTM stack (SURVEY.md section 2
"GE2E speaker encoder", section 3.4 hot loop) — cuDNN does the same trick
(persistent RNN kernels keep weights in shared memory/registers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_speaker_tts_tpu.ops.lstm import LSTMParams

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_b_tile(B: int) -> int:
    """Row block: whole batch when it fits the VMEM budget, else 128-row
    blocks (weights stay resident across blocks — constant index map)."""
    if B <= 256:
        return B
    assert B % 128 == 0, f"B={B} > 256 must be a multiple of 128"
    return 128


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, wi_ref, wh_ref, b_ref, ys_ref, hT_ref, cT_ref,
                *res_refs, h_s, c_s, T: int, save_residuals: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    c_prev = c_s[:]
    gates = (
        jnp.dot(x_ref[0], wi_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_s[:].astype(wh_ref.dtype), wh_ref[:],
                  preferred_element_type=jnp.float32)
        + b_ref[0]
    )
    if save_residuals:
        g_res_ref, c_res_ref = res_refs
        g_res_ref[0] = gates.astype(g_res_ref.dtype)
        c_res_ref[0] = c_prev.astype(c_res_ref.dtype)
    H = c_prev.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    h_s[:] = h_new
    c_s[:] = c_new
    ys_ref[0] = h_new.astype(ys_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_new
        cT_ref[:] = c_new


def lstm_seq_layer_fwd(
    params: LSTMParams,
    x_tm: jax.Array,  # (T, B, D) time-major input, D a lane multiple
    save_residuals: bool = False,
    interpret: bool | None = None,
):
    """One layer, weights VMEM-resident. Returns (ys (T, B, H) bf16,
    h_T (B, H) f32, c_T (B, H) f32[, gates (T, B, 4H) bf16,
    c_prev (T, B, H) bf16])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, B, D = x_tm.shape
    H = params.hidden_size
    assert D % _LANE == 0 and H % _LANE == 0, (D, H)
    assert B % 8 == 0, B
    bt = _pick_b_tile(B)
    nb = B // bt

    w_ih = params.w_ih
    if w_ih.shape[0] != D:  # caller lane-padded x; pad weights to match
        w_ih = jnp.pad(w_ih, ((0, D - w_ih.shape[0]), (0, 0)))
    w_ih = w_ih.astype(jnp.bfloat16)
    w_hh = params.w_hh.astype(jnp.bfloat16)
    b = params.b.astype(jnp.float32)[None, :]  # (1, 4H)

    out_shape = [
        jax.ShapeDtypeStruct((T, B, H), jnp.bfloat16),  # ys
        jax.ShapeDtypeStruct((B, H), jnp.float32),  # h_T
        jax.ShapeDtypeStruct((B, H), jnp.float32),  # c_T
    ]
    out_specs = [
        pl.BlockSpec((1, bt, H), lambda bi, t: (t, bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, H), lambda bi, t: (bi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, H), lambda bi, t: (bi, 0), memory_space=pltpu.VMEM),
    ]
    if save_residuals:
        out_shape += [
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.bfloat16),  # gates
            jax.ShapeDtypeStruct((T, B, H), jnp.bfloat16),  # c_prev
        ]
        out_specs += [
            pl.BlockSpec((1, bt, 4 * H), lambda bi, t: (t, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, H), lambda bi, t: (t, bi, 0),
                         memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(
        _fwd_kernel, T=T, save_residuals=save_residuals
    )
    outs = pl.pallas_call(
        lambda *refs: kernel(*refs[:-2], h_s=refs[-2], c_s=refs[-1]),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda bi, t: (t, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4 * H), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),  # h carry
            pltpu.VMEM((bt, H), jnp.float32),  # c carry
        ],
        interpret=interpret,
    )(x_tm, w_ih, w_hh, b)
    return outs


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(dhT_ref, g_ref, cp_ref, whT_ref, *rest, dh_s, dc_s,
                has_dys: bool):
    if has_dys:
        dys_ref, dG_ref = rest
    else:
        (dG_ref,) = rest
    ti = pl.program_id(1)  # 0 .. T-1, walking time BACKWARD via index maps

    @pl.when(ti == 0)
    def _():
        dh_s[:] = dhT_ref[:]
        dc_s[:] = jnp.zeros_like(dc_s)

    dh = dh_s[:]
    if has_dys:
        dh = dh + dys_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    c_prev = cp_ref[0].astype(jnp.float32)
    H = c_prev.shape[-1]
    i = jax.nn.sigmoid(g[:, :H])
    f = jax.nn.sigmoid(g[:, H:2 * H])
    gt = jnp.tanh(g[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(g[:, 3 * H:])
    c_new = f * c_prev + i * gt
    tc = jnp.tanh(c_new)
    do = dh * tc * o * (1.0 - o)
    dc = dc_s[:] + dh * o * (1.0 - tc * tc)
    di = dc * gt * i * (1.0 - i)
    df = dc * c_prev * f * (1.0 - f)
    dg = dc * i * (1.0 - gt * gt)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)
    dG_ref[0] = dgates.astype(dG_ref.dtype)
    dh_s[:] = jnp.dot(
        dgates.astype(whT_ref.dtype), whT_ref[:],
        preferred_element_type=jnp.float32,
    )
    dc_s[:] = dc * f


def lstm_seq_layer_bwd(
    w_hh: jax.Array,  # (H, 4H)
    gates: jax.Array,  # (T, B, 4H) bf16 residuals
    c_prev: jax.Array,  # (T, B, H) bf16 residuals
    d_hT: jax.Array,  # (B, H) f32
    d_ys: jax.Array | None,  # (T, B, H) per-step output cotangents, or None
    interpret: bool | None = None,
) -> jax.Array:
    """Reverse scan with W_hh^T resident. Returns dG (T, B, 4H) bf16; the
    caller turns it into dW/db/dx with deferred GEMMs."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, B, H4 = gates.shape
    H = H4 // 4
    bt = _pick_b_tile(B)
    nb = B // bt
    wh_T = jnp.swapaxes(w_hh, 0, 1).astype(jnp.bfloat16)  # (4H, H)

    rev = lambda bi, t: (T - 1 - t, bi, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((bt, H), lambda bi, t: (bi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, 4 * H), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, H), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * H, H), lambda bi, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [d_hT, gates, c_prev, wh_T]
    if d_ys is not None:
        in_specs.append(pl.BlockSpec((1, bt, H), rev, memory_space=pltpu.VMEM))
        args.append(d_ys)

    kernel = functools.partial(_bwd_kernel, has_dys=d_ys is not None)
    dG = pl.pallas_call(
        lambda *refs: kernel(*refs[:-2], dh_s=refs[-2], dc_s=refs[-1]),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt, 4 * H), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, 4 * H), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bt, H), jnp.float32),  # dh carry
            pltpu.VMEM((bt, H), jnp.float32),  # dc carry
        ],
        interpret=interpret,
    )(*args)
    return dG


# ---------------------------------------------------------------------------
# Stack-level API (drop-in for ops.lstm.lstm_stack_wavefront)
# ---------------------------------------------------------------------------


def _pad_lanes(x_tm: jax.Array) -> jax.Array:
    D = x_tm.shape[-1]
    Dp = _round_up(D, _LANE)
    if Dp != D:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, 0), (0, Dp - D)))
    return x_tm


def _pad_rows(x_tm: jax.Array) -> tuple[jax.Array, int]:
    B = x_tm.shape[1]
    Bp = _round_up(B, 8)
    if B > 256 and Bp % 128 != 0:
        Bp = _round_up(B, 128)
    if Bp != B:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, Bp - B), (0, 0)))
    return x_tm, B


def _stack_fwd_impl(layers, x, save_residuals: bool, interpret):
    x_tm = _pad_lanes(jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16))
    x_tm, B = _pad_rows(x_tm)
    inputs, residuals = [], []
    ys = x_tm
    h_T = None
    for p in layers:
        inputs.append(ys)
        outs = lstm_seq_layer_fwd(
            p, ys, save_residuals=save_residuals, interpret=interpret
        )
        ys, h_T = outs[0], outs[1]
        if save_residuals:
            residuals.append((outs[3], outs[4]))
    return ys, h_T, inputs, residuals, B


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stack_custom(layers, x, interpret):
    ys, h_T, _, _, B = _stack_fwd_impl(
        layers, x, save_residuals=False, interpret=interpret
    )
    return (
        jnp.swapaxes(ys, 0, 1).astype(jnp.float32)[:B],
        h_T[:B],
    )


def _stack_fwd(layers, x, interpret):
    ys, h_T, inputs, residuals, B = _stack_fwd_impl(
        layers, x, save_residuals=True, interpret=interpret
    )
    out = (
        jnp.swapaxes(ys, 0, 1).astype(jnp.float32)[:B],
        h_T[:B],
    )
    return out, (layers, x.shape, inputs, residuals)


def _stack_bwd(interpret, res, cts):
    layers, x_shape, inputs, residuals = res
    d_ys_out, d_hT = cts
    B_real, T, D = x_shape
    Bp = inputs[0].shape[1]

    def pad_rows(a, rows_axis):
        if a.shape[rows_axis] == Bp:
            return a
        pad = [(0, 0)] * a.ndim
        pad[rows_axis] = (0, Bp - a.shape[rows_axis])
        return jnp.pad(a, pad)

    # Cotangent streams arrive batch-major f32; go time-major once.
    d_ys = pad_rows(jnp.swapaxes(d_ys_out, 0, 1), 1)  # (T, Bp, H)
    d_hT = pad_rows(d_hT, 0)

    dlayers = []
    cd = jnp.bfloat16
    for li in range(len(layers) - 1, -1, -1):
        p = layers[li]
        gates, c_prev = residuals[li]
        last = li == len(layers) - 1
        dG = lstm_seq_layer_bwd(
            p.w_hh, gates, c_prev,
            # Non-final layers get a zero h_T cotangent sized by THEIR OWN
            # hidden width (w_hh is (H, 4H)) — zeros_like(d_hT) would only
            # be correct for stacks with a uniform hidden size.
            d_hT if last else jnp.zeros(
                (Bp, p.w_hh.shape[0]), d_hT.dtype
            ),
            d_ys,
            interpret=interpret,
        )  # (T, Bp, 4H) bf16
        lhs_x = inputs[li]  # (T, Bp, Dp) bf16
        # h_prev for dW_hh: this layer's own outputs shifted one step. The
        # layer's outputs are the NEXT layer's input (saved) — except for
        # the last layer, whose outputs we recover from c_prev/gates-free
        # storage: they were returned as `ys`, not kept. Recompute cheaply
        # from the saved next-input convention instead: keep outputs for
        # every layer by storing them as inputs[li + 1]; for the last
        # layer, rebuild h from gates/c_prev in one fused elementwise pass.
        if last:
            g32 = gates.astype(jnp.float32)
            H = c_prev.shape[-1]
            i = jax.nn.sigmoid(g32[..., :H])
            f = jax.nn.sigmoid(g32[..., H:2 * H])
            gt = jnp.tanh(g32[..., 2 * H:3 * H])
            o = jax.nn.sigmoid(g32[..., 3 * H:])
            h_seq = (o * jnp.tanh(f * c_prev.astype(jnp.float32) + i * gt)
                     ).astype(cd)
        else:
            h_seq = inputs[li + 1]
        h_prev = jnp.concatenate(
            [jnp.zeros_like(h_seq[:1]), h_seq[:-1]], axis=0
        )
        dW_ih = jax.lax.dot_general(
            lhs_x, dG, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Dp, 4H)
        dW_hh = jax.lax.dot_general(
            h_prev, dG, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = dG.astype(jnp.float32).sum(axis=(0, 1))
        dlayers.append(LSTMParams(
            w_ih=dW_ih[: p.w_ih.shape[0]], w_hh=dW_hh, b=db,
        ))
        # Propagate to the layer below: its per-step output cotangent.
        d_ys = jnp.dot(
            dG, jnp.swapaxes(p.w_ih.astype(cd), 0, 1),
            preferred_element_type=jnp.float32,
        )  # (T, Bp, Dp)
        if d_ys.shape[-1] != p.w_ih.shape[0]:
            d_ys = d_ys[..., : p.w_ih.shape[0]]
        if li > 0:
            d_ys = _pad_lanes(d_ys)
    dx = jnp.swapaxes(d_ys, 0, 1)[:B_real, :, :D]
    dlayers = type(layers)(reversed(dlayers))
    return (dlayers, dx)


_stack_custom.defvjp(_stack_fwd, _stack_bwd)


def supported(layers, compute_dtype=jnp.bfloat16) -> bool:
    """Kernel capability check: bf16 compute and every hidden size a lane
    multiple (the input dim is lane-padded by the wrapper, but a non-lane
    hidden size would change the carried-state tiling)."""
    return compute_dtype == jnp.bfloat16 and all(
        p.hidden_size % _LANE == 0 for p in layers
    )


def lstm_stack_seq_pallas(
    layers, x: jax.Array, compute_dtype=jnp.bfloat16, unroll: int = 1,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for :func:`ops.lstm.lstm_stack_wavefront` backed by the
    resident-weight Pallas kernels. bf16 + lane-multiple hidden sizes on a
    real TPU only — anything else falls back to the XLA wavefront, which
    is strictly faster than interpret-mode Pallas on CPU. ``interpret=True``
    forces the interpret-mode kernel anyway (parity tests); ``unroll`` is
    forwarded only on the fallback (the kernel has no scan to unroll)."""
    on_tpu = jax.default_backend() == "tpu"
    if not supported(layers, compute_dtype) or not (on_tpu or interpret):
        from multi_speaker_tts_tpu.ops.lstm import lstm_stack_wavefront

        return lstm_stack_wavefront(
            layers, x, compute_dtype=compute_dtype, unroll=unroll
        )
    return _stack_custom(tuple(layers), x, bool(interpret))
