"""Resident-weight Pallas AR decode segment (VERDICT r4 item 4).

The serving-shape decode budget (tools/decode_probe.py, tools/gates_probe.py
on v5e, B=8, production width):

- full decode step under XLA: 30.8 us (f32/bf16 fixed scan) — and the two
  gate GEMMs ALONE measure 35.1 us in isolation, i.e. the step is ~100%
  weight-streaming bound and XLA already overlaps every glue op behind the
  stream (and pins ~16 MB of the 40 MB bf16 fused weights in VMEM:
  24 MB @ ~819 GB/s = 29 us, matching the measurement);
- XLA's weight-only int8 path is SLOWER at this batch (47.4 us/step): the
  per-step activation quantize + s32 dequant are extra serial latency that
  a latency-bound B=8 loop cannot hide.

The only remaining lever is fewer streamed bytes without the XLA int8
glue. This kernel runs a K-step decode segment in ONE ``pallas_call``:

- layer-0 fused weights (2048 x 4096) live in VMEM as int8 for the whole
  segment (8.4 MB — the bf16 16.8 MB would not fit alongside the rest);
- layer-1 fused weights (2816 x 4096, 11.5 MB int8) stream once per step
  as column tiles on the inner grid axis, double-buffered by Pallas;
- prenet, location-sensitive attention (31-tap conv as unrolled FMAs,
  f32 energies + softmax), context, frame/stop projections, and the
  autoregressive frame feedback all execute in-kernel, f32;
- activations quantize per row (symmetric max/127) exactly as
  ``decoder_scan.quantize_fused``'s consumer does, so the kernel's
  numerics match the XLA int8 path.

Streamed bytes drop from ~24 MB to ~11.5 MB per step. Early-exit /
streaming integration stays OUTSIDE (the chunked while_loop calls this as
its segment body and applies the stopped/lengths bookkeeping to the
returned stop logits — bit-identical bookkeeping, same chunk semantics).

Prenet dropout masks are NOT drawn in-kernel: they are precomputed
outside the ``pallas_call`` with exactly the XLA path's stream
(``bernoulli(split(fold_in(rng, t)))``, models/layers.py prenet_apply)
and streamed in as (K, B, P) scale tensors — 16 KB/step against the
~12 MB of weights, free. The kernel therefore follows the SAME decode
trajectory as the XLA paths given the same top-level rng, so the
mel-L1 quality gate vs the f32 path isolates int8 quantization error
instead of conflating it with RNG divergence in the chaotic AR loop
(an earlier PRNG-in-kernel draft measured 0.022 mel L1 vs f32 — all
trajectory noise; this version matches XLA int8's 0.004).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_speaker_tts_tpu.ops.decoder_scan import DecoderScanParams

_LANE = 128
_COL_TILE = 128  # layer-1 column tile (streamed axis); 128 keeps the
# double-buffered tile pair + the resident int8 L0 weights inside the
# default 16 MB scoped-VMEM budget at production width (256 overflowed
# the while_loop body's stack by ~0.5 MB on v5e)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supported(p: DecoderScanParams, prenet_size: int, memory_dim: int,
              S: int, compute_ok: bool = True,
              mode: str = "int8") -> bool:
    """Kernel capability gate: the production 2-layer decoder with
    lane-multiple widths and a small memory axis. Anything else falls back
    to the XLA paths."""
    if len(p.lstm) != 2:
        return False
    H = p.lstm[0].hidden_size
    if p.lstm[1].hidden_size != H:
        return False
    if H % _LANE or memory_dim % _LANE or prenet_size % _LANE:
        return False
    if (4 * H) % _COL_TILE:
        return False
    if S > 256:
        return False  # keys/memory/energies VMEM budget
    if mode == "bf16":
        # Both fused matrices VMEM-resident in bf16: gate on the weight
        # bytes actually fitting the kernel's 100 MB budget with room for
        # the activations/operands (production width is ~40 MB).
        w_bytes = 2 * 4 * H * ((prenet_size + memory_dim + H)
                               + (2 * H + memory_dim))
        if w_bytes > 80 * 1024 * 1024:
            return False
    return compute_ok


def quantize_w(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 (same scheme as
    decoder_scan.quantize_fused); returns (int8 (D, N), scale f32 (1, N))."""
    w = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0,
                        1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def prepare_bundle(p: DecoderScanParams, prenet_ws, frame_w, stop_w,
                   mel_dim: int, r: int, quantize: bool = True) -> dict:
    """Pack + quantize every per-step weight for the kernel. Pure jnp (runs
    inside jit; XLA hoists it out of the decode loop).

    prenet_ws: [(w1 (mel, P1), b1), (w2 (P1, P2), b2)] — exactly 2 layers.
    frame_w / stop_w: (w (X, mel*r), b), (w (X, 1), b).

    quantize=False keeps both fused LSTM weight matrices bf16 (the
    FULL-PRECISION resident mode: ~40 MB of VMEM-resident weights instead
    of int8's ~20 MB, zero streamed bytes AND zero quantization error —
    the same numerics as the XLA bf16 gates). Scales are kept as dummy
    ones so the operand plumbing is identical in both modes.
    """
    assert len(prenet_ws) == 2, "kernel supports the 2-layer Taco2 prenet"
    H = p.lstm[0].hidden_size
    (w_p1, b_p1), (w_p2, b_p2) = prenet_ws

    mel_pad = _round_up(w_p1.shape[0], _LANE)
    w_p1 = jnp.pad(w_p1.astype(jnp.float32),
                   ((0, mel_pad - w_p1.shape[0]), (0, 0)))

    w0cat = jnp.concatenate([p.lstm[0].w_ih, p.lstm[0].w_hh], axis=0)
    w1cat = jnp.concatenate([p.lstm[1].w_ih, p.lstm[1].w_hh], axis=0)
    if quantize:
        w0q, s0 = quantize_w(w0cat)
        w1q, s1 = quantize_w(w1cat)
    else:
        w0q = w0cat.astype(jnp.bfloat16)
        s0 = jnp.ones((1, 4 * H), jnp.float32)
        w1q = w1cat.astype(jnp.bfloat16)
        s1 = jnp.ones((1, 4 * H), jnp.float32)

    # Fused frame+stop projection, f32 (tiny, and the XLA AR path projects
    # in f32 — keeping it f32 avoids a feedback-loop numerics fork).
    wproj = jnp.concatenate(
        [frame_w[0].astype(jnp.float32), stop_w[0].astype(jnp.float32)],
        axis=1)  # (X, mel*r + 1)
    bproj = jnp.concatenate(
        [frame_w[1].astype(jnp.float32), stop_w[1].astype(jnp.float32)])

    ap = p.attention
    return {
        "w0q": w0q, "s0": s0, "b0": p.lstm[0].b.astype(jnp.float32)[None],
        "w1q": w1q, "s1": s1, "b1": p.lstm[1].b.astype(jnp.float32)[None],
        "wproj": wproj, "bproj": bproj[None],
        "wp1": w_p1, "bp1": b_p1.astype(jnp.float32)[None],
        "wp2": w_p2.astype(jnp.float32), "bp2": b_p2.astype(jnp.float32)[None],
        "wq_a": ap.wq.astype(jnp.float32),
        # (Kw, 2, C) -> two (Kw, C) tap banks (prev / cumulative channels).
        "ck_w": ap.conv_kernel[:, 0, :].astype(jnp.float32),
        "ck_c": ap.conv_kernel[:, 1, :].astype(jnp.float32),
        "wloc": ap.wloc.astype(jnp.float32),
        "v": ap.v.astype(jnp.float32),
        "mel_pad": mel_pad,
        "quantized": quantize,
    }


def _kernel(w0q_ref, s0_ref, b0_ref,
            w1q_ref, s1_ref, b1_ref,  # per-j tiles
            wproj_ref, bproj_ref,
            wp1_ref, bp1_ref, wp2_ref, bp2_ref,
            wq_ref, ckw_ref, ckc_ref, wloc_ref, v_ref,
            keys_ref, mem_ref, mask_ref,
            h0i_ref, c0i_ref, h1i_ref, c1i_ref,
            wi_ref, cumi_ref, ctxi_ref, previ_ref,
            m1_ref, m2_ref,  # per-k prenet dropout scale masks
            ys_ref, aligns_ref,
            h0o_ref, c0o_ref, h1o_ref, c1o_ref,
            wo_ref, cumo_ref, ctxo_ref, prevo_ref,
            h0s, c0s, h1s, c1s, ws, cums, ctxs, prevs, g1s, x1qs, a1s,
            *, K: int, S: int, H: int, D: int, mel: int, r: int,
            conv_k: int, dropout: float, quantized: bool):
    k = pl.program_id(0)
    j = pl.program_id(1)
    NJ = pl.num_programs(1)
    CT = w1q_ref.shape[1]

    Bp = h0s.shape[0]
    mel_pad = prevs.shape[1]

    def lane_pad(val):  # (Bp, mel) -> (Bp, mel_pad) without sub-lane writes
        return jnp.concatenate(
            [val, jnp.zeros((Bp, mel_pad - mel), jnp.float32)], axis=-1)

    @pl.when((k == 0) & (j == 0))
    def _():  # load the incoming decode state into persistent scratch
        h0s[:] = h0i_ref[:]
        c0s[:] = c0i_ref[:]
        h1s[:] = h1i_ref[:]
        c1s[:] = c1i_ref[:]
        ws[:] = wi_ref[:]
        cums[:] = cumi_ref[:]
        ctxs[:] = ctxi_ref[:]
        prevs[:] = lane_pad(previ_ref[:])

    @pl.when(j == 0)
    def _():  # prenet -> L0 gates -> attention -> context -> quantize x1
        B = Bp
        # -- prenet (always-on dropout, Taco2; masks precomputed to match
        # the XLA path's fold_in/bernoulli stream exactly) -------------------
        a1 = jnp.maximum(
            jnp.dot(prevs[:], wp1_ref[:],
                    preferred_element_type=jnp.float32) + bp1_ref[:], 0.0)
        if dropout > 0.0:
            a1 = a1 * m1_ref[0]
        a2 = jnp.maximum(
            jnp.dot(a1, wp2_ref[:],
                    preferred_element_type=jnp.float32) + bp2_ref[:], 0.0)
        if dropout > 0.0:
            a2 = a2 * m2_ref[0]

        # -- layer-0 gates (resident weights: int8 or bf16) -----------------
        xh0 = jnp.concatenate([a2, ctxs[:], h0s[:]], axis=-1)
        if quantized:
            amax0 = jnp.maximum(
                jnp.max(jnp.abs(xh0), axis=-1, keepdims=True), 1e-8) / 127.0
            x0q = jnp.clip(jnp.round(xh0 / amax0), -127, 127).astype(jnp.int8)
            g0 = jax.lax.dot_general(
                x0q, w0q_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (amax0 * s0_ref[:]) + b0_ref[:]
        else:
            # Same math as decoder_scan._gates' bf16 arm: bf16 operands,
            # f32 accumulation, f32 bias add.
            g0 = jnp.dot(
                xh0.astype(jnp.bfloat16), w0q_ref[:],
                preferred_element_type=jnp.float32,
            ) + b0_ref[:]
        i0 = jax.nn.sigmoid(g0[:, :H])
        f0 = jax.nn.sigmoid(g0[:, H:2 * H])
        gg0 = jnp.tanh(g0[:, 2 * H:3 * H])
        o0 = jax.nn.sigmoid(g0[:, 3 * H:])
        c0 = f0 * c0s[:] + i0 * gg0
        h0 = o0 * jnp.tanh(c0)
        h0s[:] = h0
        c0s[:] = c0

        # -- location-sensitive attention (f32) -----------------------------
        q = jnp.dot(h0, wq_ref[:], preferred_element_type=jnp.float32)
        half = (conv_k - 1) // 2
        zpad_l = jnp.zeros((B, half), jnp.float32)
        zpad_r = jnp.zeros((B, conv_k - 1 - half), jnp.float32)
        # Explicit concat + lax.slice: jnp.pad wraps in an inner jit whose
        # downstream slices lower to Mosaic gathers (unsupported in cond).
        wp_pad = jnp.concatenate([zpad_l, ws[:], zpad_r], axis=1)
        cm_pad = jnp.concatenate([zpad_l, cums[:], zpad_r], axis=1)
        loc = jnp.zeros((B, S, ckw_ref.shape[1]), jnp.float32)
        ckw = ckw_ref[:]  # (conv_k, C) — 2-D loads; 1-D tap reads lower
        ckc = ckc_ref[:]  # to Mosaic gathers, which fail in cond branches
        for t in range(conv_k):  # 31 static taps, unrolled FMAs on the VPU
            wp_t = jax.lax.slice_in_dim(wp_pad, t, t + S, axis=1)
            cm_t = jax.lax.slice_in_dim(cm_pad, t, t + S, axis=1)
            loc = (loc
                   + wp_t[:, :, None] * ckw[t:t + 1, :][None, :, :]
                   + cm_t[:, :, None] * ckc[t:t + 1, :][None, :, :])
        loc_a = jnp.dot(
            loc.reshape(B * S, -1), wloc_ref[:],
            preferred_element_type=jnp.float32,
        ).reshape(B, S, -1)
        e = jnp.dot(
            jnp.tanh(q[:, None, :] + keys_ref[:] + loc_a).reshape(B * S, -1),
            v_ref[:], preferred_element_type=jnp.float32,
        ).reshape(B, S)
        e = jnp.where(mask_ref[:] > 0, e, -1e9)
        e = e - jnp.max(e, axis=-1, keepdims=True)
        p_att = jnp.exp(e)
        p_att = p_att / jnp.sum(p_att, axis=-1, keepdims=True)
        ws[:] = p_att
        cums[:] = cums[:] + p_att
        ctx = jnp.sum(p_att[:, :, None] * mem_ref[:], axis=1)
        ctxs[:] = ctx

        # -- stage the layer-1 input once; tiles consume it -----------------
        xh1 = jnp.concatenate([h0, ctx, h1s[:]], axis=-1)
        if quantized:
            amax1 = jnp.maximum(
                jnp.max(jnp.abs(xh1), axis=-1, keepdims=True), 1e-8) / 127.0
            x1qs[:] = jnp.clip(
                jnp.round(xh1 / amax1), -127, 127).astype(jnp.int8)
            a1s[:] = amax1
        else:
            x1qs[:] = xh1.astype(jnp.bfloat16)

    # -- layer-1 gates: one column tile per inner grid step (streamed in
    # int8 mode; a single resident full-width "tile" in bf16 mode) ----------
    if quantized:
        g1_tile = jax.lax.dot_general(
            x1qs[:], w1q_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (a1s[:] * s1_ref[:]) + b1_ref[:]
    else:
        g1_tile = jnp.dot(
            x1qs[:], w1q_ref[:], preferred_element_type=jnp.float32,
        ) + b1_ref[:]
    g1s[:, pl.ds(j * CT, CT)] = g1_tile

    @pl.when(j == NJ - 1)
    def _():  # cell 1, projections, outputs, frame feedback
        g1 = g1s[:]
        i1 = jax.nn.sigmoid(g1[:, :H])
        f1 = jax.nn.sigmoid(g1[:, H:2 * H])
        gg1 = jnp.tanh(g1[:, 2 * H:3 * H])
        o1 = jax.nn.sigmoid(g1[:, 3 * H:])
        c1 = f1 * c1s[:] + i1 * gg1
        h1 = o1 * jnp.tanh(c1)
        h1s[:] = h1
        c1s[:] = c1

        x = jnp.concatenate([h1, ctxs[:]], axis=-1)
        # y carries frames AND the stop logit in one (Bp, mel*r + 1) row —
        # packing them avoids a 1-D lane write for the stop scalar.
        y = jnp.dot(x, wproj_ref[:],
                    preferred_element_type=jnp.float32) + bproj_ref[:]
        ys_ref[0] = y
        aligns_ref[0] = ws[:]
        prevs[:] = lane_pad(y[:, mel * (r - 1): mel * r])

        @pl.when(k == K - 1)
        def _():
            h0o_ref[:] = h0s[:]
            c0o_ref[:] = c0s[:]
            h1o_ref[:] = h1
            c1o_ref[:] = c1
            wo_ref[:] = ws[:]
            cumo_ref[:] = cums[:]
            ctxo_ref[:] = ctxs[:]
            prevo_ref[:] = prevs[:, :mel]


def decode_segment_pallas(
    bundle: dict,
    keys: jax.Array,  # (B, S, A) f32
    memory: jax.Array,  # (B, S, D)
    mask: jax.Array,  # (B, S)
    carry,  # DecoderScanCarry
    prev: jax.Array,  # (B, mel)
    t0: jax.Array,  # () int32
    K: int,
    rng: jax.Array,
    mel_dim: int,
    r: int,
    prenet_dropout: float,
    interpret: bool | None = None,
):
    """Run ``K`` decode steps in one kernel launch. Returns
    (carry', prev', frames (K, B, mel*r), stops (K, B), aligns (K, B, S))
    — the same per-step outputs as ``decoder_ar_segment``'s inner scan;
    stopped/lengths bookkeeping is the caller's (vectorized on ``stops``).
    """
    from multi_speaker_tts_tpu.ops.decoder_scan import DecoderScanCarry

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, S, A = keys.shape
    D = memory.shape[-1]
    H = carry.h[0].shape[-1]
    Bp = _round_up(max(B, 8), 8)
    mel_pad = bundle["mel_pad"]
    conv_k = bundle["ck_w"].shape[0]
    quantized = bool(bundle.get("quantized", True))
    # int8: layer-1 streams as 128-column tiles (the int8 resident set plus
    # one double-buffered tile pair fits a modest VMEM budget). bf16: BOTH
    # fused matrices are VMEM-resident (~40 MB at production width), so the
    # "tile" is the full 4H width and the inner grid axis collapses to 1 —
    # zero streamed bytes per step.
    CT = _COL_TILE if quantized else bundle["w1q"].shape[1]
    NJ = bundle["w1q"].shape[1] // CT

    def pad_b(a, rows=Bp):
        if a.shape[0] == rows:
            return a
        pad = [(0, rows - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad)

    keys_p = pad_b(keys.astype(jnp.float32))
    mem_p = pad_b(memory.astype(jnp.float32))
    mask_p = pad_b(mask.astype(jnp.float32))
    h0i, h1i = pad_b(carry.h[0]), pad_b(carry.h[1])
    c0i, c1i = pad_b(carry.c[0]), pad_b(carry.c[1])
    wi, cumi = pad_b(carry.weights), pad_b(carry.cum_weights)
    ctxi, previ = pad_b(carry.context), pad_b(prev)

    def c2(k, j):  # constant 2-D block
        return (0, 0)

    def c3(k, j):
        return (0, 0, 0)

    # Prenet dropout scale masks, drawn OUTSIDE the kernel with exactly
    # the XLA path's stream (prenet_apply: split(fold_in(rng, t)) ->
    # bernoulli at the UNPADDED batch) so the kernel's trajectory matches
    # the XLA decode bit-for-bit in mask pattern.
    P1 = bundle["wp1"].shape[1]
    P2 = bundle["wp2"].shape[1]
    if prenet_dropout > 0.0:
        keep_prob = 1.0 - float(prenet_dropout)

        def step_masks(i):
            k1, k2 = jax.random.split(jax.random.fold_in(rng, t0 + i), 2)
            m1 = jax.random.bernoulli(k1, keep_prob, (B, P1))
            m2 = jax.random.bernoulli(k2, keep_prob, (B, P2))
            return (m1.astype(jnp.float32) / keep_prob,
                    m2.astype(jnp.float32) / keep_prob)

        m1s, m2s = jax.vmap(step_masks)(jnp.arange(K))
        m1s = jnp.pad(m1s, ((0, 0), (0, Bp - B), (0, 0)))
        m2s = jnp.pad(m2s, ((0, 0), (0, Bp - B), (0, 0)))
        mask_idx = lambda k, j: (k, 0, 0)  # noqa: E731
    else:  # unused by the kernel (static dropout flag); constant dummy
        m1s = jnp.ones((1, Bp, P1), jnp.float32)
        m2s = jnp.ones((1, Bp, P2), jnp.float32)
        mask_idx = c3

    rows0 = bundle["wp2"].shape[1] + D + H  # prenet-out + context + h0
    in_specs = [
        pl.BlockSpec((rows0, 4 * H), c2,
                     memory_space=pltpu.VMEM),  # w0q (resident)
        pl.BlockSpec((1, 4 * H), c2, memory_space=pltpu.VMEM),  # s0
        pl.BlockSpec((1, 4 * H), c2, memory_space=pltpu.VMEM),  # b0
        pl.BlockSpec((2 * H + D, CT), lambda k, j: (0, j),
                     memory_space=pltpu.VMEM),  # w1q tile (or resident full)
        pl.BlockSpec((1, CT), lambda k, j: (0, j),
                     memory_space=pltpu.VMEM),  # s1 tile
        pl.BlockSpec((1, CT), lambda k, j: (0, j),
                     memory_space=pltpu.VMEM),  # b1 tile
        pl.BlockSpec(bundle["wproj"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["bproj"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["wp1"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["bp1"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["wp2"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["bp2"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["wq_a"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["ck_w"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["ck_c"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["wloc"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec(bundle["v"].shape, c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((Bp, S, A), c3, memory_space=pltpu.VMEM),  # keys
        pl.BlockSpec((Bp, S, D), c3, memory_space=pltpu.VMEM),  # memory
        pl.BlockSpec((Bp, S), c2, memory_space=pltpu.VMEM),  # mask
    ] + [pl.BlockSpec((Bp, H), c2, memory_space=pltpu.VMEM)] * 4 + [
        pl.BlockSpec((Bp, S), c2, memory_space=pltpu.VMEM),  # w_prev
        pl.BlockSpec((Bp, S), c2, memory_space=pltpu.VMEM),  # cum
        pl.BlockSpec((Bp, D), c2, memory_space=pltpu.VMEM),  # ctx
        pl.BlockSpec((Bp, mel_dim), c2, memory_space=pltpu.VMEM),  # prev
        pl.BlockSpec((1, Bp, P1), mask_idx, memory_space=pltpu.VMEM),  # m1
        pl.BlockSpec((1, Bp, P2), mask_idx, memory_space=pltpu.VMEM),  # m2
    ]

    out_shape = [
        # frames + stop logit packed per row (see kernel)
        jax.ShapeDtypeStruct((K, Bp, mel_dim * r + 1), jnp.float32),
        jax.ShapeDtypeStruct((K, Bp, S), jnp.float32),
        jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        jax.ShapeDtypeStruct((Bp, S), jnp.float32),
        jax.ShapeDtypeStruct((Bp, S), jnp.float32),
        jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        jax.ShapeDtypeStruct((Bp, mel_dim), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, Bp, mel_dim * r + 1), lambda k, j: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bp, S), lambda k, j: (k, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((Bp, H), c2, memory_space=pltpu.VMEM)] * 4 + [
        pl.BlockSpec((Bp, S), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((Bp, S), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((Bp, D), c2, memory_space=pltpu.VMEM),
        pl.BlockSpec((Bp, mel_dim), c2, memory_space=pltpu.VMEM),
    ]

    kernel = functools.partial(
        _kernel, K=K, S=S, H=H, D=D, mel=mel_dim, r=r, conv_k=conv_k,
        dropout=float(prenet_dropout), quantized=quantized,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(K, NJ),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Bp, H), jnp.float32),  # h0
            pltpu.VMEM((Bp, H), jnp.float32),  # c0
            pltpu.VMEM((Bp, H), jnp.float32),  # h1
            pltpu.VMEM((Bp, H), jnp.float32),  # c1
            pltpu.VMEM((Bp, S), jnp.float32),  # w
            pltpu.VMEM((Bp, S), jnp.float32),  # cum
            pltpu.VMEM((Bp, D), jnp.float32),  # ctx
            pltpu.VMEM((Bp, mel_pad), jnp.float32),  # prev (lane-padded)
            pltpu.VMEM((Bp, 4 * H), jnp.float32),  # g1 accumulator
            pltpu.VMEM((Bp, 2 * H + D),
                       jnp.int8 if quantized else jnp.bfloat16),  # x1 staged
            pltpu.VMEM((Bp, 1), jnp.float32),  # x1 row scale (int8 only)
        ],
        # int8: the serving-shape buffer set (8.4 MB resident layer-0
        # weights + streamed layer-1 tiles + memory/keys/projection
        # operands) totals ~17.7 MB with Mosaic's pipelining buffers — just
        # over the 16 MB DEFAULT scoped-VMEM budget, while v5e physical
        # VMEM is 128 MB. Pin an explicit limit so the kernel never rides
        # the compiler's default-budget edge (a libtpu update mid-round
        # moved exactly that edge and broke compilation at the shipped
        # shape). bf16: both fused matrices resident (~40 MB) need a
        # correspondingly larger budget.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(48 if quantized else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        bundle["w0q"], bundle["s0"], bundle["b0"],
        bundle["w1q"], bundle["s1"], bundle["b1"],
        bundle["wproj"], bundle["bproj"],
        bundle["wp1"], bundle["bp1"], bundle["wp2"], bundle["bp2"],
        bundle["wq_a"], bundle["ck_w"], bundle["ck_c"],
        bundle["wloc"], bundle["v"],
        keys_p, mem_p, mask_p,
        h0i, c0i, h1i, c1i, wi, cumi, ctxi, previ,
        m1s, m2s,
    )
    (ys, aligns, h0o, c0o, h1o, c1o, wo, cumo, ctxo, prevo) = outs
    carry_out = DecoderScanCarry(
        h=(h0o[:B], h1o[:B]), c=(c0o[:B], c1o[:B]),
        weights=wo[:B], cum_weights=cumo[:B], context=ctxo[:B],
    )
    frames = ys[:, :B, : mel_dim * r]
    stops = ys[:, :B, mel_dim * r]
    return carry_out, prevo[:B], frames, stops, aligns[:, :B]


def decoder_ar_segment_pallas(
    bundle: dict,
    keys, memory, mask, carry, prev, t0, stopped, lengths,
    n_steps_seg: int, stop_threshold: float, rng, mel_dim: int, r: int,
    prenet_dropout: float, interpret: bool | None = None,
):
    """Drop-in for ``decoder_scan.decoder_ar_segment`` backed by the
    kernel: same return tuple, identical stopped/lengths bookkeeping
    applied (vectorized) to the kernel's per-step stop logits."""
    carry, prev, f_k, s_k, w_k = decode_segment_pallas(
        bundle, keys, memory, mask, carry, prev, t0, n_steps_seg, rng,
        mel_dim, r, prenet_dropout, interpret=interpret,
    )
    flags = jax.nn.sigmoid(s_k.astype(jnp.float32)) > stop_threshold  # (K,B)
    # inner_step order: lengths += ~stopped, THEN stopped |= flag(t) —
    # i.e. step t counts iff not stopped before t (exclusive prefix).
    before = jnp.concatenate(
        [stopped[None], stopped[None] | (jnp.cumsum(flags, 0)[:-1] > 0)], 0
    ) if f_k.shape[0] > 1 else stopped[None]
    lengths = lengths + jnp.sum(~before, axis=0).astype(jnp.int32)
    stopped = stopped | jnp.any(flags, axis=0)
    return carry, prev, stopped, lengths, f_k, s_k, w_k
