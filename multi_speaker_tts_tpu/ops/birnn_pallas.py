"""Fused bidirectional RNN layers as resident-weight Pallas TPU kernels.

Companion to :mod:`multi_speaker_tts_tpu.ops.lstm_pallas` (the GE2E stack
kernel) for the synthesizer's two bidirectional layers: the text encoder's
BiLSTM and the CBHG linear head's BiGRU (SURVEY.md section 2 "Synthesizer
encoder" / "Linear head incl. CBHG"). The round-4 train trace shows these
scans cost almost nothing in matmul time but several ms/step in XLA
while-loop glue (per-step squeeze / dynamic_update_slice of the stacked
sequence, PROFILE.md "Round-4 closing trace"); a Pallas grid deletes that
glue the same way the GE2E kernel did.

Design (differs from the GE2E kernel in two ways):

- The input projections ``x @ W_ih + b`` for BOTH directions are hoisted
  OUT of the kernel as two large whole-sequence MXU GEMMs (they have no
  sequential dependence), exactly like the XLA baselines
  (:func:`ops.lstm.bilstm_fused`, :func:`ops.gru.bigru_fused`). The kernel
  runs only the recurrent part.
- Both directions advance in ONE grid step: step ``t`` processes natural
  time ``t`` for the forward direction and ``T-1-t`` for the backward
  direction via block index maps, so the sequential depth stays T (the
  direction-batched property of the XLA fused scans is preserved) while
  each direction's tiny ``(B, H) x (H, kH)`` recurrent weights stay
  VMEM-resident across the whole sequence.

Storage convention: every time-major tensor (inputs, outputs, residuals,
cotangents) is indexed by NATURAL time for both directions; only the
traversal order differs. The backward kernel walks the forward direction
reverse-natural and the backward direction forward-natural (each
direction's reverse-mode order), emitting per-step gate cotangents; all
weight/input gradients are deferred big XLA GEMMs outside the kernel
(dW_ih = x^T dG, dW_hh = h_prev^T dG, dx = dG W_ih^T), mirroring
``lstm_pallas``'s precision contract (bf16 residuals, f32 carries, f32
cell math from bf16-rounded operands).

bf16 + lane-multiple hidden sizes on a real TPU only; anything else falls
back to the XLA fused scans. Reference mapping: the reference's
``nn.LSTM(bidirectional=True)`` / ``nn.GRU(bidirectional=True)``
(SURVEY.md section 2, torch cuDNN kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_speaker_tts_tpu.ops.gru import GRUParams
from multi_speaker_tts_tpu.ops.lstm import LSTMParams

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_rows_tm(x_tm: jax.Array) -> tuple[jax.Array, int]:
    """Pad the batch (middle) axis of a (T, B, F) tensor to a sublane
    multiple. Padded rows run zeros through the cell — harmless."""
    B = x_tm.shape[1]
    Bp = _round_up(B, 8)
    if Bp != B:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, Bp - B), (0, 0)))
    return x_tm, B


def supported(hidden_size: int, compute_dtype) -> bool:
    """Kernel capability check (see ``lstm_pallas.supported``)."""
    return compute_dtype == jnp.bfloat16 and hidden_size % _LANE == 0


def _on_path(compute_dtype, interpret: bool | None) -> bool:
    return jax.default_backend() == "tpu" or bool(interpret)


# ---------------------------------------------------------------------------
# BiLSTM
# ---------------------------------------------------------------------------


def _bilstm_fwd_kernel(gxf_ref, gxb_ref, whf_ref, whb_ref,
                       ysf_ref, ysb_ref, *res_refs,
                       hf_s, cf_s, hb_s, cb_s, save_residuals: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for s in (hf_s, cf_s, hb_s, cb_s):
            s[:] = jnp.zeros_like(s)

    def step(gx_ref, wh_ref, ys_ref, h_s, c_s, g_res, c_res):
        c_prev = c_s[:]
        gates = gx_ref[0].astype(jnp.float32) + jnp.dot(
            h_s[:].astype(wh_ref.dtype), wh_ref[:],
            preferred_element_type=jnp.float32,
        )
        if save_residuals:
            g_res[0] = gates.astype(g_res.dtype)
            c_res[0] = c_prev.astype(c_res.dtype)
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

    if save_residuals:
        gf_res, cf_res, gb_res, cb_res = res_refs
    else:
        gf_res = cf_res = gb_res = cb_res = None
    step(gxf_ref, whf_ref, ysf_ref, hf_s, cf_s, gf_res, cf_res)
    step(gxb_ref, whb_ref, ysb_ref, hb_s, cb_s, gb_res, cb_res)


def _bilstm_bwd_kernel(gf_ref, cf_ref, gb_ref, cb_ref,
                       whfT_ref, whbT_ref, dyf_ref, dyb_ref,
                       dGf_ref, dGb_ref, *, dhf_s, dcf_s, dhb_s, dcb_s):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for s in (dhf_s, dcf_s, dhb_s, dcb_s):
            s[:] = jnp.zeros_like(s)

    def step(g_ref, cp_ref, whT_ref, dy_ref, dG_ref, dh_s, dc_s):
        dh = dh_s[:] + dy_ref[0].astype(jnp.float32)
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

    step(gf_ref, cf_ref, whfT_ref, dyf_ref, dGf_ref, dhf_s, dcf_s)
    step(gb_ref, cb_ref, whbT_ref, dyb_ref, dGb_ref, dhb_s, dcb_s)


def _bilstm_fwd_impl(fwd: LSTMParams, bwd: LSTMParams, gxf, gxb,
                     save_residuals: bool, interpret: bool):
    """gxf/gxb: (T, Bp, 4H) bf16 hoisted input gates (bias folded in).
    Returns ysf, ysb (T, Bp, H) bf16 [+ residuals]."""
    T, Bp, H4 = gxf.shape
    H = H4 // 4
    whf = fwd.w_hh.astype(jnp.bfloat16)
    whb = bwd.w_hh.astype(jnp.bfloat16)

    nat = lambda bi, t: (t, bi, 0)  # noqa: E731
    rev = lambda bi, t: (T - 1 - t, bi, 0)  # noqa: E731
    const = lambda bi, t: (0, 0)  # noqa: E731

    out_shape = [
        jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),  # ysf
        jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),  # ysb
    ]
    out_specs = [
        pl.BlockSpec((1, Bp, H), nat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp, H), rev, memory_space=pltpu.VMEM),
    ]
    if save_residuals:
        out_shape += [
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.bfloat16),  # gf
            jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),  # cf_prev
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.bfloat16),  # gb
            jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),  # cb_prev
        ]
        out_specs += [
            pl.BlockSpec((1, Bp, 4 * H), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), rev, memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(_bilstm_fwd_kernel, save_residuals=save_residuals)
    outs = pl.pallas_call(
        lambda *refs: kernel(
            *refs[:-4], hf_s=refs[-4], cf_s=refs[-3],
            hb_s=refs[-2], cb_s=refs[-1],
        ),
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, Bp, 4 * H), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32) for _ in range(4)],
        interpret=interpret,
    )(gxf, gxb, whf, whb)
    return outs


def _bilstm_hoist(fwd: LSTMParams, bwd: LSTMParams, x: jax.Array):
    """Input gates for both directions, one big GEMM each, time-major bf16."""
    cd = jnp.bfloat16
    gx = []
    for p in (fwd, bwd):
        g = jnp.dot(
            x.astype(cd), p.w_ih.astype(cd),
            preferred_element_type=jnp.float32,
        ) + p.b.astype(jnp.float32)
        gx.append(jnp.swapaxes(g, 0, 1).astype(cd))  # (T, B, 4H)
    return gx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bilstm_custom(params, x, _unused, interpret):
    fwd, bwd = params
    gxf, gxb = _bilstm_hoist(fwd, bwd, x)
    gxf, B = _pad_rows_tm(gxf)
    gxb, _ = _pad_rows_tm(gxb)
    ysf, ysb = _bilstm_fwd_impl(fwd, bwd, gxf, gxb, False, interpret)
    out = jnp.concatenate([ysf, ysb], axis=-1).astype(jnp.float32)
    return jnp.swapaxes(out, 0, 1)[:B]


def _bilstm_vjp_fwd(params, x, _unused, interpret):
    fwd, bwd = params
    gxf, gxb = _bilstm_hoist(fwd, bwd, x)
    gxf, B = _pad_rows_tm(gxf)
    gxb, _ = _pad_rows_tm(gxb)
    ysf, ysb, gf, cf, gb, cb = _bilstm_fwd_impl(
        fwd, bwd, gxf, gxb, True, interpret
    )
    out = jnp.concatenate([ysf, ysb], axis=-1).astype(jnp.float32)
    return jnp.swapaxes(out, 0, 1)[:B], (
        params, x, ysf, ysb, gf, cf, gb, cb, B
    )


def _bilstm_vjp_bwd(interpret, res, dy_out):
    (fwd, bwd), x, ysf, ysb, gf, cf, gb, cb, B = res
    T, Bp, H = ysf.shape
    dy = jnp.swapaxes(dy_out, 0, 1)  # (T, B, 2H) f32
    if Bp != B:
        dy = jnp.pad(dy, ((0, 0), (0, Bp - B), (0, 0)))
    dyf = dy[..., :H]
    dyb = dy[..., H:]

    nat = lambda bi, t: (t, bi, 0)  # noqa: E731
    rev = lambda bi, t: (T - 1 - t, bi, 0)  # noqa: E731
    const = lambda bi, t: (0, 0)  # noqa: E731
    whfT = jnp.swapaxes(fwd.w_hh, 0, 1).astype(jnp.bfloat16)
    whbT = jnp.swapaxes(bwd.w_hh, 0, 1).astype(jnp.bfloat16)

    kernel = _bilstm_bwd_kernel
    dGf, dGb = pl.pallas_call(
        lambda *refs: kernel(
            *refs[:-4], dhf_s=refs[-4], dcf_s=refs[-3],
            dhb_s=refs[-2], dcb_s=refs[-1],
        ),
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, Bp, 4 * H), rev, memory_space=pltpu.VMEM),  # gf
            pl.BlockSpec((1, Bp, H), rev, memory_space=pltpu.VMEM),  # cf
            pl.BlockSpec((1, Bp, 4 * H), nat, memory_space=pltpu.VMEM),  # gb
            pl.BlockSpec((1, Bp, H), nat, memory_space=pltpu.VMEM),  # cb
            pl.BlockSpec((4 * H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), rev, memory_space=pltpu.VMEM),  # dyf
            pl.BlockSpec((1, Bp, H), nat, memory_space=pltpu.VMEM),  # dyb
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 4 * H), nat, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32) for _ in range(4)],
        interpret=interpret,
    )(gf, cf, gb, cb, whfT, whbT, dyf, dyb)

    cd = jnp.bfloat16
    zeros = jnp.zeros_like(ysf[:1])
    # Previous hidden state per direction (natural-time convention): the
    # forward direction's h_prev at t is ys[t-1]; the backward direction
    # consumed natural time DESCENDING, so its h_prev at t is ys[t+1].
    hpf = jnp.concatenate([zeros, ysf[:-1]], axis=0)
    hpb = jnp.concatenate([ysb[1:], zeros], axis=0)
    x_tm = jnp.swapaxes(x, 0, 1).astype(cd)  # (T, B, D)
    if Bp != B:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, Bp - B), (0, 0)))

    def grads(p: LSTMParams, dG, h_prev):
        dW_ih = jax.lax.dot_general(
            x_tm, dG, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dW_hh = jax.lax.dot_general(
            h_prev, dG, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = dG.astype(jnp.float32).sum(axis=(0, 1))
        return LSTMParams(w_ih=dW_ih, w_hh=dW_hh, b=db)

    dfwd = grads(fwd, dGf, hpf)
    dbwd = grads(bwd, dGb, hpb)
    dx_tm = (
        jnp.dot(dGf, jnp.swapaxes(fwd.w_ih.astype(cd), 0, 1),
                preferred_element_type=jnp.float32)
        + jnp.dot(dGb, jnp.swapaxes(bwd.w_ih.astype(cd), 0, 1),
                  preferred_element_type=jnp.float32)
    )
    dx = jnp.swapaxes(dx_tm, 0, 1)[:B]
    return ((dfwd, dbwd), dx, None)


_bilstm_custom.defvjp(_bilstm_vjp_fwd, _bilstm_vjp_bwd)


def bilstm_pallas(
    fwd: LSTMParams, bwd: LSTMParams, x: jax.Array,
    compute_dtype=jnp.bfloat16, unroll: int = 4,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in for :func:`ops.lstm.bilstm_fused` backed by the fused
    bidirectional resident-weight kernel. Falls back to the XLA scan for
    f32 / non-lane hidden sizes / non-TPU backends."""
    if interpret is None:
        interpret = False
    if not supported(fwd.hidden_size, compute_dtype) \
            or not _on_path(compute_dtype, interpret):
        from multi_speaker_tts_tpu.ops.lstm import bilstm_fused

        return bilstm_fused(fwd, bwd, x, compute_dtype=compute_dtype,
                            unroll=unroll)
    return _bilstm_custom((fwd, bwd), x, None, bool(interpret))


# ---------------------------------------------------------------------------
# BiGRU
# ---------------------------------------------------------------------------


def _bigru_fwd_kernel(gxf_ref, gxb_ref, whf_ref, whb_ref, bhf_ref, bhb_ref,
                      ysf_ref, ysb_ref, *res_refs,
                      hf_s, hb_s, save_residuals: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hf_s[:] = jnp.zeros_like(hf_s)
        hb_s[:] = jnp.zeros_like(hb_s)

    def step(gx_ref, wh_ref, bh_ref, ys_ref, h_s, gh_res, hp_res):
        h_prev = h_s[:]
        gh = jnp.dot(
            h_prev.astype(wh_ref.dtype), wh_ref[:],
            preferred_element_type=jnp.float32,
        ) + bh_ref[0]
        if save_residuals:
            gh_res[0] = gh.astype(gh_res.dtype)
            hp_res[0] = h_prev.astype(hp_res.dtype)
        gx = gx_ref[0].astype(jnp.float32)
        H = h_prev.shape[-1]
        # torch gate order (r, z, n); b_hn lives inside the reset product.
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        h_new = (1.0 - z) * n + z * h_prev
        h_s[:] = h_new
        ys_ref[0] = h_new.astype(ys_ref.dtype)

    if save_residuals:
        ghf_res, hpf_res, ghb_res, hpb_res = res_refs
    else:
        ghf_res = hpf_res = ghb_res = hpb_res = None
    step(gxf_ref, whf_ref, bhf_ref, ysf_ref, hf_s, ghf_res, hpf_res)
    step(gxb_ref, whb_ref, bhb_ref, ysb_ref, hb_s, ghb_res, hpb_res)


def _bigru_bwd_kernel(gxf_ref, ghf_ref, hpf_ref, gxb_ref, ghb_ref, hpb_ref,
                      whfT_ref, whbT_ref, dyf_ref, dyb_ref,
                      dGxf_ref, dGhf_ref, dGxb_ref, dGhb_ref,
                      *, dhf_s, dhb_s):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dhf_s[:] = jnp.zeros_like(dhf_s)
        dhb_s[:] = jnp.zeros_like(dhb_s)

    def step(gx_ref, gh_ref, hp_ref, whT_ref, dy_ref, dGx_ref, dGh_ref, dh_s):
        dh = dh_s[:] + dy_ref[0].astype(jnp.float32)
        gx = gx_ref[0].astype(jnp.float32)
        gh = gh_ref[0].astype(jnp.float32)
        h_prev = hp_ref[0].astype(jnp.float32)
        H = h_prev.shape[-1]
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        dz = dh * (h_prev - n) * z * (1.0 - z)
        dn = dh * (1.0 - z) * (1.0 - n * n)  # d(pre-tanh a_n)
        dgx_n = dn
        dgh_n = dn * r
        dr = dn * gh[:, 2 * H:] * r * (1.0 - r)
        dgx = jnp.concatenate([dr, dz, dgx_n], axis=-1)
        dgh = jnp.concatenate([dr, dz, dgh_n], axis=-1)
        dGx_ref[0] = dgx.astype(dGx_ref.dtype)
        dGh_ref[0] = dgh.astype(dGh_ref.dtype)
        dh_s[:] = dh * z + jnp.dot(
            dgh.astype(whT_ref.dtype), whT_ref[:],
            preferred_element_type=jnp.float32,
        )

    step(gxf_ref, ghf_ref, hpf_ref, whfT_ref, dyf_ref, dGxf_ref, dGhf_ref,
         dhf_s)
    step(gxb_ref, ghb_ref, hpb_ref, whbT_ref, dyb_ref, dGxb_ref, dGhb_ref,
         dhb_s)


def _bigru_hoist(fwd: GRUParams, bwd: GRUParams, x: jax.Array):
    cd = jnp.bfloat16
    gx = []
    for p in (fwd, bwd):
        g = jnp.dot(
            x.astype(cd), p.w_ih.astype(cd),
            preferred_element_type=jnp.float32,
        ) + p.b_ih.astype(jnp.float32)
        gx.append(jnp.swapaxes(g, 0, 1).astype(cd))
    return gx


def _bigru_fwd_impl(fwd: GRUParams, bwd: GRUParams, gxf, gxb,
                    save_residuals: bool, interpret: bool):
    T, Bp, H3 = gxf.shape
    H = H3 // 3
    whf = fwd.w_hh.astype(jnp.bfloat16)
    whb = bwd.w_hh.astype(jnp.bfloat16)
    bhf = fwd.b_hh.astype(jnp.float32)[None, :]
    bhb = bwd.b_hh.astype(jnp.float32)[None, :]

    nat = lambda bi, t: (t, bi, 0)  # noqa: E731
    rev = lambda bi, t: (T - 1 - t, bi, 0)  # noqa: E731
    const = lambda bi, t: (0, 0)  # noqa: E731

    out_shape = [
        jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),
        jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),
    ]
    out_specs = [
        pl.BlockSpec((1, Bp, H), nat, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp, H), rev, memory_space=pltpu.VMEM),
    ]
    if save_residuals:
        out_shape += [
            jax.ShapeDtypeStruct((T, Bp, 3 * H), jnp.bfloat16),  # ghf
            jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),  # hpf
            jax.ShapeDtypeStruct((T, Bp, 3 * H), jnp.bfloat16),  # ghb
            jax.ShapeDtypeStruct((T, Bp, H), jnp.bfloat16),  # hpb
        ]
        out_specs += [
            pl.BlockSpec((1, Bp, 3 * H), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), rev, memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(_bigru_fwd_kernel, save_residuals=save_residuals)
    return pl.pallas_call(
        lambda *refs: kernel(*refs[:-2], hf_s=refs[-2], hb_s=refs[-1]),
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, Bp, 3 * H), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32) for _ in range(2)],
        interpret=interpret,
    )(gxf, gxb, whf, whb, bhf, bhb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bigru_custom(params, x, _unused, interpret):
    fwd, bwd = params
    gxf, gxb = _bigru_hoist(fwd, bwd, x)
    gxf, B = _pad_rows_tm(gxf)
    gxb, _ = _pad_rows_tm(gxb)
    ysf, ysb = _bigru_fwd_impl(fwd, bwd, gxf, gxb, False, interpret)
    out = jnp.concatenate([ysf, ysb], axis=-1).astype(jnp.float32)
    return jnp.swapaxes(out, 0, 1)[:B]


def _bigru_vjp_fwd(params, x, _unused, interpret):
    fwd, bwd = params
    gxf, gxb = _bigru_hoist(fwd, bwd, x)
    gxf, B = _pad_rows_tm(gxf)
    gxb, _ = _pad_rows_tm(gxb)
    ysf, ysb, ghf, hpf, ghb, hpb = _bigru_fwd_impl(
        fwd, bwd, gxf, gxb, True, interpret
    )
    out = jnp.concatenate([ysf, ysb], axis=-1).astype(jnp.float32)
    return jnp.swapaxes(out, 0, 1)[:B], (
        params, x, gxf, gxb, ghf, hpf, ghb, hpb, B
    )


def _bigru_vjp_bwd(interpret, res, dy_out):
    (fwd, bwd), x, gxf, gxb, ghf, hpf, ghb, hpb, B = res
    T, Bp, H3 = gxf.shape
    H = H3 // 3
    dy = jnp.swapaxes(dy_out, 0, 1)
    if Bp != B:
        dy = jnp.pad(dy, ((0, 0), (0, Bp - B), (0, 0)))
    dyf = dy[..., :H]
    dyb = dy[..., H:]

    nat = lambda bi, t: (t, bi, 0)  # noqa: E731
    rev = lambda bi, t: (T - 1 - t, bi, 0)  # noqa: E731
    const = lambda bi, t: (0, 0)  # noqa: E731
    whfT = jnp.swapaxes(fwd.w_hh, 0, 1).astype(jnp.bfloat16)
    whbT = jnp.swapaxes(bwd.w_hh, 0, 1).astype(jnp.bfloat16)

    dGxf, dGhf, dGxb, dGhb = pl.pallas_call(
        lambda *refs: _bigru_bwd_kernel(
            *refs[:-2], dhf_s=refs[-2], dhb_s=refs[-1]
        ),
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, Bp, 3 * H), rev, memory_space=pltpu.VMEM),  # gxf
            pl.BlockSpec((1, Bp, 3 * H), rev, memory_space=pltpu.VMEM),  # ghf
            pl.BlockSpec((1, Bp, H), rev, memory_space=pltpu.VMEM),  # hpf
            pl.BlockSpec((1, Bp, 3 * H), nat, memory_space=pltpu.VMEM),  # gxb
            pl.BlockSpec((1, Bp, 3 * H), nat, memory_space=pltpu.VMEM),  # ghb
            pl.BlockSpec((1, Bp, H), nat, memory_space=pltpu.VMEM),  # hpb
            pl.BlockSpec((3 * H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), rev, memory_space=pltpu.VMEM),  # dyf
            pl.BlockSpec((1, Bp, H), nat, memory_space=pltpu.VMEM),  # dyb
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 3 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 3 * H), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, 3 * H), nat, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, 3 * H), jnp.bfloat16)
            for _ in range(4)
        ],
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32) for _ in range(2)],
        interpret=interpret,
    )(gxf, ghf, hpf, gxb, ghb, hpb, whfT, whbT, dyf, dyb)

    cd = jnp.bfloat16
    x_tm = jnp.swapaxes(x, 0, 1).astype(cd)
    if Bp != B:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, Bp - B), (0, 0)))

    def grads(p: GRUParams, dGx, dGh, h_prev):
        dW_ih = jax.lax.dot_general(
            x_tm, dGx, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dW_hh = jax.lax.dot_general(
            h_prev, dGh, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ih = dGx.astype(jnp.float32).sum(axis=(0, 1))
        db_hh = dGh.astype(jnp.float32).sum(axis=(0, 1))
        return GRUParams(w_ih=dW_ih, w_hh=dW_hh, b_ih=db_ih, b_hh=db_hh)

    dfwd = grads(fwd, dGxf, dGhf, hpf)
    dbwd = grads(bwd, dGxb, dGhb, hpb)
    dx_tm = (
        jnp.dot(dGxf, jnp.swapaxes(fwd.w_ih.astype(cd), 0, 1),
                preferred_element_type=jnp.float32)
        + jnp.dot(dGxb, jnp.swapaxes(bwd.w_ih.astype(cd), 0, 1),
                  preferred_element_type=jnp.float32)
    )
    dx = jnp.swapaxes(dx_tm, 0, 1)[:B]
    return ((dfwd, dbwd), dx, None)


_bigru_custom.defvjp(_bigru_vjp_fwd, _bigru_vjp_bwd)


def bigru_pallas(
    fwd: GRUParams, bwd: GRUParams, x: jax.Array,
    compute_dtype=jnp.bfloat16, unroll: int = 4,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in for :func:`ops.gru.bigru_fused` backed by the fused
    bidirectional resident-weight kernel (same fallback rules as
    :func:`bilstm_pallas`)."""
    if interpret is None:
        interpret = False
    if not supported(fwd.hidden_size, compute_dtype) \
            or not _on_path(compute_dtype, interpret):
        from multi_speaker_tts_tpu.ops.gru import bigru_fused

        return bigru_fused(fwd, bwd, x, compute_dtype=compute_dtype,
                           unroll=unroll)
    return _bigru_custom((fwd, bwd), x, None, bool(interpret))
