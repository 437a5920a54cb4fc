"""GE2E train-step roofline: budget table + (N, M, T) shape sweep.

VERDICT r3 item 8: the TTS train step got an exhaustive roofline in
PROFILE.md but the GE2E wavefront step's 15.9% MFU was never explained.
This tool measures the GE2E trainer step (the exact bench workload,
``bench.py::_bench_ge2e_train``) across a batch-shape grid, derives the
analytic wavefront budget, and can capture a device trace summarized with
``profile_train.summarize``.

Usage::

    python tools/ge2e_roofline.py                 # base shape + analytics
    python tools/ge2e_roofline.py -sweep          # (N, M, T) grid
    python tools/ge2e_roofline.py -trace DIR      # trace the base shape
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _peak_flops(jax) -> float:
    # v5e bf16 peak (matches bench.py's MFU convention).
    return 197e12


def measure(N: int, M: int, T: int, trace_dir: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from multi_speaker_tts_tpu.hparams import default_hparams
    from multi_speaker_tts_tpu.models import GE2E
    from multi_speaker_tts_tpu.train.ge2e_trainer import (
        init_ge2e_state, make_ge2e_train_step,
    )

    hp = default_hparams(
        GE2E_Train={"Batch_Speakers": N, "Batch_Utterances": M,
                    "Frame_Length": T}
    )
    model = GE2E.from_hp(hp)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.uniform(0, 1, size=(N * M, T, hp.Sound.Mel_Dim)), jnp.float32
    )
    state = init_ge2e_state(hp, model, jax.random.PRNGKey(0), mels)
    step = jax.jit(make_ge2e_train_step(hp, model), donate_argnums=0)

    flops = None
    try:
        cost = step.lower(state, mels).compile().cost_analysis()
        if cost:
            flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    state, m = step(state, mels)
    float(m["loss"])  # compile + warmup sync

    def run(n, state):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, mels)
        float(m["loss"])
        return time.perf_counter() - t0, state

    # Median of 5 differential timings: the tunneled link's ~30 ms fixed
    # round trip is noisy enough that a 3-sample median occasionally goes
    # non-positive for fast steps (seen once in the round-4 sweep).
    pers = []
    for _ in range(5):
        a, state = run(2, state)
        b, state = run(12, state)
        pers.append((b - a) / 10)
    per = max(sorted(pers)[2], 1e-9)

    if trace_dir:
        print(f"[ge2e_roofline] tracing 4 steps -> {trace_dir}")
        with jax.profiler.trace(trace_dir):
            for _ in range(4):
                state, m = step(state, mels)
            float(m["loss"])

    out = {
        "N": N, "M": M, "T": T, "rows": N * M,
        "ms_per_step": round(per * 1e3, 3),
        "frames_per_sec": round(N * M * T / per, 1),
    }
    if flops:
        out["step_tflops"] = round(flops / 1e12, 3)
        out["mfu"] = round(flops / per / _peak_flops(jax), 4)
    return out


def analytic_budget(N: int, M: int, T: int) -> dict:
    """Wavefront FLOP/sequential-depth model for the production GE2E
    (3x768 LSTM + 256 proj, mel 80): what bounds the step at this shape."""
    B = N * M
    L, H, mel, E = 3, 768, 80, 256
    # Layer-batched wavefront GEMM per step: (L, B, in+H) x (L, in+H, 4H)
    # with in = max(mel, H) padded to H lanes after layer 0 -> model the
    # fused operand as 2H wide for layers 1-2 and (mel+H) for layer 0.
    steps = T + L - 1
    flop_l0 = 2 * B * (mel + H) * 4 * H
    flop_l12 = 2 * 2 * B * (2 * H) * 4 * H
    fwd = steps * (flop_l0 + flop_l12) / (L / L)  # per wavefront step all L run
    bwd_scan = 2 * fwd  # transposed gate GEMMs + cell vjps ~ 2x fwd GEMM cost
    dW = 2 * fwd  # post-loop contraction reads the same residual volume
    proj = 2 * B * H * E * 3  # fwd + bwd dx + dW
    total = fwd + bwd_scan + dW + proj
    # Sequential depth: (T + L - 1) fwd + (T + L - 1) bwd steps whose
    # per-step GEMM only exposes B rows of MXU work.
    per_step_rows = B
    return {
        "model_tflop_per_step": round(total / 1e12, 3),
        "sequential_steps": 2 * steps,
        "rows_per_wavefront_gemm": per_step_rows,
        "note": (
            "per-wavefront-step GEMM is (3, B, ~1.5k)x(3, ~1.5k, 3k); at "
            f"B={B} rows the MXU tile is underfed below B=128 and the "
            "sequential depth (2*(T+L-1) dependent steps) sets the floor"
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-sweep", action="store_true")
    ap.add_argument("-trace", default=None, help="trace dir for base shape")
    ap.add_argument("-N", type=int, default=16)
    ap.add_argument("-M", type=int, default=10)
    ap.add_argument("-T", type=int, default=160)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

    shapes = [(args.N, args.M, args.T)]
    if args.sweep:
        shapes = [
            (16, 10, 160),   # paper/bench base
            (8, 10, 160),    # fewer speakers
            (32, 10, 160),   # more speakers (rows 320)
            (64, 10, 160),   # rows 640
            (16, 5, 160),    # fewer utterances
            (16, 20, 160),   # rows 320 via M
            (16, 10, 80),    # shorter crops
            (16, 10, 240),   # longer crops
        ]

    results = []
    for (N, M, T) in shapes:
        r = measure(N, M, T, trace_dir=args.trace if not args.sweep else None)
        results.append(r)
        print(json.dumps(r))

    if args.trace and not args.sweep:
        from tools.profile_train import summarize

        summarize(args.trace, n_steps=4, top=25)

    base = analytic_budget(args.N, args.M, args.T)
    print("analytic:", json.dumps(base))
    if args.sweep:
        print("\n| N | M | T | rows | ms/step | frames/s | MFU |")
        print("|---|---|---|---|---|---|---|")
        for r in results:
            print(f"| {r['N']} | {r['M']} | {r['T']} | {r['rows']} | "
                  f"{r['ms_per_step']} | {r['frames_per_sec']:,.0f} | "
                  f"{r.get('mfu', '-')} |")


if __name__ == "__main__":
    main()
