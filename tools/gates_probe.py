"""Isolate the AR-decode gate GEMMs at the serving shape (VERDICT r4 item 4).

The decode step is: L0 gates (B,2048)@(2048,4096) -> attention -> L1 gates
(B,2816)@(2816,4096) -> projections. tools/decode_probe.py measured the
whole step at 30.8 us (f32/bf16) and 47.4 us (int8) at B=8; this probe
times JUST the two sequentially-dependent gate GEMMs in a fori_loop (true
step-to-step dependence), bf16 vs XLA-int8 vs a fused Pallas int8 variant
if present, so the kernel A/B has an honest denominator:

    python tools/gates_probe.py [-batch 8] [-steps 200]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-batch", type=int, default=8)
    parser.add_argument("-steps", type=int, default=200)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, T = args.batch, args.steps
    H = 1024
    D0, D1 = 1024 + H, 1792 + H  # fused [x; h] rows per layer
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.standard_normal((D0, 4 * H)) * 0.02, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D1, 4 * H)) * 0.02, jnp.float32)
    b0 = jnp.zeros((4 * H,), jnp.float32)
    b1 = jnp.zeros((4 * H,), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((B, D0 - H)), jnp.float32)

    from multi_speaker_tts_tpu.ops.decoder_scan import _gates, quantize_fused

    def cell(g, c):
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        return jax.nn.sigmoid(o) * jnp.tanh(c), c

    def make_loop(fused0, fused1, cd):
        @jax.jit
        def run(x0):
            def body(_, s):
                h0, c0, h1, c1 = s
                g0 = _gates(fused0, b0, x0, h0, cd)
                h0, c0 = cell(g0, c0)
                # stand-in for attention/context: reuse h0 slice as input
                x1 = jnp.concatenate([h0, h0[:, :768]], axis=-1)
                g1 = _gates(fused1, b1, x1, h1, cd)
                h1, c1 = cell(g1, c1)
                return (h0, c0, h1, c1)

            z = jnp.zeros((B, H), jnp.float32)
            s = jax.lax.fori_loop(0, T, body, (z, z, z, z))
            # Touch BOTH layers' outputs: a probe returning only h0 lets
            # XLA dead-code-eliminate the entire L1 GEMM.
            return s[0].mean() + s[2].mean()

        return run

    report = {"batch": B, "steps": T}

    class P:  # minimal DecoderScanParams stand-in for quantize_fused
        pass

    from multi_speaker_tts_tpu.ops.lstm import LSTMParams
    from multi_speaker_tts_tpu.ops.decoder_scan import DecoderScanParams, AttentionParams

    params = DecoderScanParams(
        lstm=(LSTMParams(w_ih=w0[: D0 - H], w_hh=w0[D0 - H:], b=b0),
              LSTMParams(w_ih=w1[: D1 - H], w_hh=w1[D1 - H:], b=b1)),
        attention=AttentionParams(
            wq=jnp.zeros((H, 128)), conv_kernel=jnp.zeros((31, 2, 32)),
            wloc=jnp.zeros((32, 128)), v=jnp.zeros((128, 1))),
    )

    variants = {
        "bf16": tuple(w.astype(jnp.bfloat16) for w in (w0, w1)),
        "int8_xla": quantize_fused(params),
    }
    try:
        from multi_speaker_tts_tpu.ops.gates_pallas import quantize_for_kernel
        variants["int8_pallas"] = tuple(
            quantize_for_kernel(w) for w in (w0, w1))
    except ImportError:
        pass

    for name, (f0, f1) in variants.items():
        cd = jnp.bfloat16
        run = make_loop(f0, f1, cd)
        float(run(x0))  # compile + warm

        def timed(n):
            t0 = time.perf_counter()
            v = None
            for _ in range(n):
                v = run(x0)
            float(v)
            return time.perf_counter() - t0

        t_lo = min(timed(1) for _ in range(3))
        t_hi = min(timed(5) for _ in range(3))
        us = (t_hi - t_lo) / 4 / T * 1e6
        report[f"gates_us_per_step_{name}"] = round(us, 2)
        print(f"{name}: {us:.1f} us/step (2 gate GEMMs)", flush=True)

    print("PROBE " + json.dumps(report))


if __name__ == "__main__":
    main()
