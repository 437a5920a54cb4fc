"""Serving-shape decode budget probe (VERDICT r4 item 4 groundwork).

Measures the PRODUCTION-WIDTH (44M-param) AR decode at the serving shape
(B=8, bucketed tokens) on the real TPU, device-bound (vocode off, outputs
fetched by scalar): fixed-length scan vs chunked early-exit, f32 vs int8
weights, per-step microseconds. This is the baseline any resident-weight
Pallas decode kernel must beat (PROFILE.md round-4 rejection was at B=96
train shapes; the serving shape has ~10 MB int8 weights that fit VMEM).

    python tools/decode_probe.py [-batch 8] [-steps 400]
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
    parser.add_argument("-steps", type=int, default=400)
    parser.add_argument("-ckpt", default=str(
        pathlib.Path(__file__).resolve().parents[1]
        / "demo" / "serving_ckpt_full.msgpack"))
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multi_speaker_tts_tpu.inference import Synthesizer

    root = pathlib.Path(__file__).resolve().parents[1]
    texts = [
        "the quick brown fox jumps over the lazy dog.",
        "she sells sea shells by the sea shore.",
        "a stitch in time saves nine.",
        "all that glitters is not gold.",
        "actions speak louder than words.",
        "the early bird catches the worm.",
        "practice makes perfect.",
        "better late than never.",
    ][: args.batch]

    report: dict = {"batch": args.batch, "max_steps": args.steps}

    def decode_ms(synth, spk, early_exit: bool, max_steps=None) -> float:
        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = synth.synthesize(
                    texts, spk, vocode=False, early_exit=early_exit,
                    return_device=True, max_steps=max_steps or args.steps,
                )
            np.asarray(jax.device_get(o["mel_lengths"]))
            return time.perf_counter() - t0

        run(1)  # compile + warm
        t_lo = min(run(1) for _ in range(3))
        t_hi = min(run(5) for _ in range(3))
        return (t_hi - t_lo) / 4 * 1e3

    for quant, tag in ((None, "f32"), ("int8", "int8")):
        synth = Synthesizer.from_compact(args.ckpt, quantize=quant)
        spk = synth.enroll([
            str(root / "demo" / "enroll_spk0_utt0.wav"),
            str(root / "demo" / "enroll_spk0_utt1.wav"),
        ])
        r = int(synth.hp.Decoder.get("N_Frames_Per_Step", 1))
        n_scan = args.steps // r
        for early_exit, mode in ((False, "fixed"), (True, "early_exit")):
            # Force the full bucket on the early-exit path too (threshold
            # out of reach) so both modes time the SAME step count and the
            # difference is pure loop machinery.
            if early_exit:
                synth_ne = Synthesizer.from_compact(args.ckpt, quantize=quant)
                synth_ne.hp = synth_ne.hp.replace(
                    Decoder={"Stop_Threshold": 1.5})
                ms = decode_ms(synth_ne, spk, True)
            else:
                ms = decode_ms(synth, spk, False)
            key = f"decode_ms_{tag}_{mode}"
            report[key] = round(ms, 3)
            report[f"us_per_step_{tag}_{mode}"] = round(ms * 1e3 / n_scan, 2)
            print(f"{key}: {ms:.2f} ms ({ms * 1e3 / n_scan:.1f} us/step, "
                  f"{n_scan} scan steps)", flush=True)

    print("PROBE " + json.dumps(report))


if __name__ == "__main__":
    main()
