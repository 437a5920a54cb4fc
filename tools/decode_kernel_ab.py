"""A/B: resident-weight Pallas decode segment vs the XLA segment at the
production serving shape (VERDICT r4 item 4 accept-or-reject gate).

Chains ceil(T/K) K-step segments in a fori_loop (the early-exit loop's
structure without the stop condition) and reports per-step microseconds
for: XLA bf16, XLA int8, Pallas int8 kernel.

    python tools/decode_kernel_ab.py [-batch 8] [-steps 192] [-chunk 16] [-S 48]
"""

from __future__ import annotations

import argparse
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
    parser.add_argument("-steps", type=int, default=192)
    parser.add_argument("-chunk", type=int, default=16)
    parser.add_argument("-S", type=int, default=48)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multi_speaker_tts_tpu.ops import decode_pallas as dkp
    from multi_speaker_tts_tpu.ops import decoder_scan as dscan
    from multi_speaker_tts_tpu.ops.lstm import LSTMParams

    B, T, K, S = args.batch, args.steps, args.chunk, args.S
    H, D, P, A, MEL, R, CONV_K, CONV_C = 1024, 768, 256, 128, 80, 2, 31, 32
    NSEG = T // K
    rng = np.random.default_rng(0)

    def w(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    cellp = dscan.DecoderScanParams(
        lstm=(
            LSTMParams(w_ih=w(P + D, 4 * H), w_hh=w(H, 4 * H), b=w(4 * H)),
            LSTMParams(w_ih=w(H + D, 4 * H), w_hh=w(H, 4 * H), b=w(4 * H)),
        ),
        attention=dscan.AttentionParams(
            wq=w(H, A), conv_kernel=w(CONV_K, 2, CONV_C),
            wloc=w(CONV_C, A), v=w(A, 1),
        ),
    )
    prenet_ws = [(w(MEL, P), w(P)), (w(P, P), w(P))]
    frame_w = (w(H + D, MEL * R), w(MEL * R))
    stop_w = (w(H + D, 1), w(1))
    keys = w(B, S, A, scale=0.3)
    memory = w(B, S, D, scale=0.3)
    mask = jnp.ones((B, S), jnp.float32)
    rngkey = jax.random.PRNGKey(7)

    from multi_speaker_tts_tpu.models.layers import prenet_apply

    DROP = 0.5  # production Taco2 always-on prenet dropout

    def prenet_fn(frame, rk):
        return prenet_apply(prenet_ws, frame, DROP, rk)

    def project_fn(x):
        frames = jnp.dot(x, frame_w[0]) + frame_w[1]
        stop = (jnp.dot(x, stop_w[0]) + stop_w[1])[..., 0]
        return frames, stop

    report = {"batch": B, "steps": T, "chunk": K, "S": S}

    # Drive the PRODUCTION early-exit while_loop (threshold 1.5 never
    # fires, so every variant runs the full n_steps) — the exact machinery
    # the serving path compiles, with segment_fn switching the chunk body.
    def early_exit_run(fused, segment_fn):
        @jax.jit
        def run():
            frames, stops, aligns, lengths = dscan.decoder_ar_early_exit(
                cellp, prenet_fn, project_fn, keys, memory, mask,
                T, 1.5, rngkey, MEL, jnp.bfloat16, chunk=K,
                fused=fused, segment_fn=segment_fn,
            )
            return frames.astype(jnp.float32).mean()

        return run

    bundle = dkp.prepare_bundle(cellp, prenet_ws, frame_w, stop_w, MEL, R)
    bundle_bf16 = dkp.prepare_bundle(
        cellp, prenet_ws, frame_w, stop_w, MEL, R, quantize=False)

    def segment_of(b):
        def pallas_segment(keys_, mem_, mask_, carry_, prev_, t0_,
                           stopped_, lengths_, K_, th_, rng_):
            return dkp.decoder_ar_segment_pallas(
                b, keys_, mem_, mask_, carry_, prev_, t0_, stopped_,
                lengths_, K_, th_, rng_, MEL, R, prenet_dropout=DROP)
        return pallas_segment

    variants = {
        "xla_bf16": early_exit_run(None, None),
        "xla_int8": early_exit_run(dscan.quantize_fused(cellp), None),
        "pallas_int8": early_exit_run(None, segment_of(bundle)),
        "pallas_bf16": early_exit_run(None, segment_of(bundle_bf16)),
    }
    for name, run in variants.items():
        t0 = time.perf_counter()
        float(run())  # compile + warm
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

        def timed(n):
            t0 = time.perf_counter()
            v = None
            for _ in range(n):
                v = run()
            float(v)
            return time.perf_counter() - t0

        t_lo = min(timed(1) for _ in range(3))
        t_hi = min(timed(5) for _ in range(3))
        us = (t_hi - t_lo) / 4 / T * 1e6
        report[f"us_per_step_{name}"] = round(us, 2)
        print(f"{name}: {us:.1f} us/step", flush=True)

    print("PROBE " + json.dumps(report))


if __name__ == "__main__":
    main()
