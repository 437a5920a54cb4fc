"""Streamed-vs-batch vocode quality on a trained compact checkpoint.

The streaming vocoder's ONE approximation vs batch synthesis is windowed
Griffin-Lim (per-window phase + crossfade); mel/linear are exactly the
batched values (tests/test_streaming.py). This tool quantifies that
approximation the way a listener-proxy metric can: re-analyze each wav
through the model's own mel front-end and take L1 against the model's
(normalized, post-postnet) mel output over the decoded region.

Reports three numbers per run:
  batch      — the batched vocoder (the floor: pure GL reconstruction error)
  stream     — windowed GL, crossfade only (gl_warm_start=False; round-3 mode)
  stream+ws  — windowed GL warm-started from the previous window's converged
               overlap audio (RTISI-style init; gl_warm_start=True — measured
               a no-op on quality and rejected as default, see PROFILE.md
               "Streaming GL warm start")

Usage: python tools/stream_quality.py [-ckpt demo/serving_ckpt.msgpack]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells by the sea shore",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
]


def reanalyzed_l1(wav: np.ndarray, mel_ref: np.ndarray, synth) -> float:
    """L1 between the wav's re-analyzed normalized mel and the model's own
    mel output, over the decoded frames (mel_ref is already trimmed)."""
    import jax.numpy as jnp

    from multi_speaker_tts_tpu.audio import dsp

    T = mel_ref.shape[0]
    need = (T - 1) * synth.dsp_cfg.hop + synth.dsp_cfg.n_fft
    w = np.zeros((need,), np.float32)
    w[: min(wav.shape[0], need)] = wav[:need]
    mel = np.asarray(dsp.melspectrogram(jnp.asarray(w), synth.dsp_cfg))[:T]
    return float(np.abs(mel - mel_ref).mean())


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-ckpt", default="demo/serving_ckpt.msgpack")
    parser.add_argument("-segment_steps", type=int, default=16)
    args = parser.parse_args()

    from multi_speaker_tts_tpu.inference import Synthesizer

    synth = Synthesizer.from_compact(args.ckpt)
    rng = np.random.default_rng(0)
    t = np.arange(24000, dtype=np.float32) / synth.dsp_cfg.sample_rate
    enroll = (0.25 * np.sin(2 * np.pi * 220.0 * t)
              * (1.0 + 0.1 * rng.normal(size=t.size))).astype(np.float32)
    spk = synth.enroll([enroll])

    out = synth.synthesize(TEXTS, spk)
    refs = [np.asarray(o["mel"]) for o in out]
    l1_batch = [reanalyzed_l1(np.asarray(o["wav"]), m, synth)
                for o, m in zip(out, refs)]

    def stream_l1(warm: bool) -> list[float]:
        chunks = list(synth.stream(
            TEXTS, spk, segment_steps=args.segment_steps,
            gl_warm_start=warm,
        ))
        wav = np.concatenate([c["wav_chunk"] for c in chunks], axis=1)
        return [reanalyzed_l1(wav[b], refs[b], synth)
                for b in range(len(TEXTS))]

    l1_stream = stream_l1(False)
    l1_ws = stream_l1(True)

    report = {
        "ckpt": args.ckpt,
        "segment_steps": args.segment_steps,
        "n_texts": len(TEXTS),
        "wav_mel_l1_batch": round(float(np.mean(l1_batch)), 5),
        "wav_mel_l1_stream_crossfade": round(float(np.mean(l1_stream)), 5),
        "wav_mel_l1_stream_warmstart": round(float(np.mean(l1_ws)), 5),
        "per_utt": {
            "batch": [round(x, 5) for x in l1_batch],
            "stream_crossfade": [round(x, 5) for x in l1_stream],
            "stream_warmstart": [round(x, 5) for x in l1_ws],
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
