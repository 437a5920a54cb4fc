"""Isolated probe: fused Pallas attention step vs XLA's fused loop body.

VERDICT r3 item 3 names "a fused decoder-step Pallas kernel (gates +
attention glue in one launch)" as the next train-throughput lever to
measure. The gate GEMMs already run at 91% of the bf16 MXU peak inside
the scan (PROFILE.md), so the only winnable time is the attention glue:
query proj, location conv, energies tanh-chain, softmax, and the context
contraction. This probe times EXACTLY that block two ways, both inside a
``lax.fori_loop`` (the same execution context as the real scan):

1. XLA: :func:`ops.decoder_scan._attention_block` + the context einsum,
   as the train step runs it today.
2. Pallas: one fused kernel computing the identical math with every
   intermediate VMEM-resident (grid over B blocks).

Run on the real TPU: ``python tools/attention_probe.py [-B 96] [-S 100]``.
The verdict lands in PROFILE.md ("Fused attention-step kernel").
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_speaker_tts_tpu.ops.decoder_scan import (
    AttentionParams, _attention_block,
)


def make_xla_loop(ap: AttentionParams, keys, memory, mask, n_iters: int):
    """The attention block + context contraction as the TF scan runs it."""

    @jax.jit
    def run(h0, w0, cum0):
        def body(_, carry):
            w, cum, ctx = carry
            # h0 depends on ctx in the real scan; fold ctx back in so the
            # loop carries a true data dependence (no hoisting).
            h = h0 + jnp.pad(ctx, ((0, 0), (0, h0.shape[1] - ctx.shape[1])))
            w, cum = _attention_block(h, w, cum, keys, ap, mask)
            ctx = jnp.einsum("bs,bsd->bd", w, memory.astype(jnp.float32))
            return (w, cum, ctx)

        ctx0 = jnp.zeros((h0.shape[0], memory.shape[2]), jnp.float32)
        return jax.lax.fori_loop(0, n_iters, body, (w0, cum0, ctx0))

    return run


def _fused_attn_kernel(h0_ref, wprev_ref, cumprev_ref, keys_ref, mem_ref,
                       maskadd_ref, wq_ref, ck_ref, wloc_ref, v_ref,
                       w_out, cum_out, ctx_out):
    """One attention step, all intermediates VMEM-resident.

    wprev/cumprev arrive PRE-PADDED to S + K - 1 along the sequence axis
    (zero borders) so the location conv is K static shifted slices.
    """
    K = ck_ref.shape[0]
    S = keys_ref.shape[1]
    q = jnp.dot(h0_ref[:], wq_ref[:],
                preferred_element_type=jnp.float32)  # (Bb, A)
    wprev_pad = wprev_ref[:]  # (Bb, S + K - 1)
    cumprev_pad = cumprev_ref[:]
    ck = ck_ref[:]  # (K, 2, C)
    loc = None
    for k in range(K):
        sw = wprev_pad[:, k : k + S]  # (Bb, S)
        sc = cumprev_pad[:, k : k + S]
        term = (sw[:, :, None] * ck[k, 0][None, None, :]
                + sc[:, :, None] * ck[k, 1][None, None, :])
        loc = term if loc is None else loc + term  # (Bb, S, C)
    Bb = loc.shape[0]
    C = loc.shape[2]
    A = wq_ref.shape[1]
    loc_feat = jnp.dot(loc.reshape(Bb * S, C), wloc_ref[:],
                       preferred_element_type=jnp.float32).reshape(Bb, S, A)
    e = jnp.tanh(q[:, None, :] + keys_ref[:] + loc_feat)
    e = jnp.sum(e * v_ref[:].reshape(1, 1, A), axis=-1)  # (Bb, S)
    e = e + maskadd_ref[:]
    e = e - jnp.max(e, axis=-1, keepdims=True)
    ew = jnp.exp(e)
    w = ew / jnp.sum(ew, axis=-1, keepdims=True)
    half = (K - 1) // 2
    cum = cumprev_pad[:, half : half + S] + w
    w_out[:] = w
    cum_out[:] = cum
    ctx_out[:] = jnp.sum(
        w[:, :, None] * mem_ref[:].astype(jnp.float32), axis=1
    )


def make_pallas_loop(ap: AttentionParams, keys, memory, mask, n_iters: int,
                     block_b: int = 32):
    B, S, A = keys.shape
    D = memory.shape[2]
    K = ap.conv_kernel.shape[0]
    half = (K - 1) // 2
    maskadd = jnp.where(mask > 0, 0.0, -1e9).astype(jnp.float32)

    grid = (B // block_b,)
    row = lambda i: (i, 0)  # noqa: E731
    row3 = lambda i: (i, 0, 0)  # noqa: E731
    rep = lambda i: (0, 0)  # noqa: E731
    rep3 = lambda i: (0, 0, 0)  # noqa: E731

    step = pl.pallas_call(
        _fused_attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 1024), row),        # h0
            pl.BlockSpec((block_b, S + K - 1), row),   # wprev padded
            pl.BlockSpec((block_b, S + K - 1), row),   # cumprev padded
            pl.BlockSpec((block_b, S, A), row3),       # keys
            pl.BlockSpec((block_b, S, D), row3),       # memory
            pl.BlockSpec((block_b, S), row),           # mask additive
            pl.BlockSpec((1024, A), rep),              # wq
            pl.BlockSpec((K, 2, ap.conv_kernel.shape[2]), rep3),  # ck
            pl.BlockSpec((ap.conv_kernel.shape[2], A), rep),      # wloc
            pl.BlockSpec((A, 1), rep),                 # v
        ],
        out_specs=[
            pl.BlockSpec((block_b, S), row),
            pl.BlockSpec((block_b, S), row),
            pl.BlockSpec((block_b, D), row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
            jax.ShapeDtypeStruct((B, D), jnp.float32),
        ],
    )

    @jax.jit
    def run(h0, w0, cum0):
        def body(_, carry):
            w, cum, ctx = carry
            h = h0 + jnp.pad(ctx, ((0, 0), (0, h0.shape[1] - ctx.shape[1])))
            wp = jnp.pad(w, ((0, 0), (half, K - 1 - half)))
            cp = jnp.pad(cum, ((0, 0), (half, K - 1 - half)))
            w, cum, ctx = step(h, wp, cp, keys, memory, maskadd,
                               ap.wq, ap.conv_kernel, ap.wloc, ap.v)
            return (w, cum, ctx)

        ctx0 = jnp.zeros((h0.shape[0], memory.shape[2]), jnp.float32)
        return jax.lax.fori_loop(0, n_iters, body, (w0, cum0, ctx0))

    return run


def time_loop(fn, h0, w0, cum0) -> float:
    out = fn(h0, w0, cum0)
    float(out[0].sum())  # compile + sync

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(h0, w0, cum0)
        float(o[0].sum())
        return time.perf_counter() - t0

    pers = []
    for _ in range(3):
        a, b = run(1), run(5)
        pers.append((b - a) / 4)
    return sorted(pers)[1]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-B", type=int, default=96)
    p.add_argument("-S", type=int, default=100)
    p.add_argument("-A", type=int, default=128)
    p.add_argument("-D", type=int, default=512)
    p.add_argument("-H", type=int, default=1024)
    p.add_argument("-iters", type=int, default=200)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)  # noqa
    ap = AttentionParams(
        wq=f(args.H, args.A), conv_kernel=f(31, 2, 32),
        wloc=f(32, args.A), v=f(args.A, 1),
    )
    keys = f(args.B, args.S, args.A)
    memory = f(args.B, args.S, args.D)
    mask = jnp.ones((args.B, args.S), jnp.float32)
    h0 = f(args.B, args.H)
    w0 = jax.nn.one_hot(jnp.zeros((args.B,), jnp.int32), args.S)
    cum0 = w0

    xla = make_xla_loop(ap, keys, memory, mask, args.iters)
    t_xla = time_loop(xla, h0, w0, cum0)
    print(f"XLA   : {t_xla * 1e3:8.3f} ms / {args.iters} steps "
          f"({t_xla / args.iters * 1e6:6.2f} us/step)")

    pallas = make_pallas_loop(ap, keys, memory, mask, args.iters)
    t_pal = time_loop(pallas, h0, w0, cum0)
    print(f"Pallas: {t_pal * 1e3:8.3f} ms / {args.iters} steps "
          f"({t_pal / args.iters * 1e6:6.2f} us/step)")

    # Numerics check.
    ox = xla(h0, w0, cum0)
    op = pallas(h0, w0, cum0)
    for a, b, name in zip(ox, op, ("w", "cum", "ctx")):
        d = float(jnp.abs(a - b).max())
        print(f"max|XLA - Pallas| {name}: {d:.2e}")

    print(f"verdict: pallas/xla = {t_pal / t_xla:.3f}x")


if __name__ == "__main__":
    main()
