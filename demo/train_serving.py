"""Train the committed serving checkpoint + the reduction-factor quality run.

Full SV2TTS recipe (GE2E-loss pretrain -> frozen-encoder TTS training) on
the deterministic synthetic corpus, at a configurable reduction factor r
(VERDICT r2 items 1 and 2):

    python demo/train_serving.py -r 2 -out /tmp/serving_r2 \
        [-export demo/serving_ckpt.msgpack]

Reduced-width FULL architecture (every block of the production model, ~2M
params) so the exported f16 single-file checkpoint stays a few MB; Sound/
DSP params are the production ones, so the bench's serving section drives
the exact production vocode path with trained weights.

Reports (JSON): eval losses + attention diagonality, speaker-verification
EER/margins, per-utterance self-stop lengths, and a re-enrollment identity
check (embed the SYNTHESIZED wavs, cosine vs the enrolled speaker vs a
different speaker).
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


def full_hp(r: int, use_phoneme: bool = False, lexicon: str | None = None,
            batch: int = 32):
    """PRODUCTION-width hparams (the Hyper_Parameters.yaml architecture
    verbatim, ~44M params) with only corpus-scale knobs changed: the demo
    corpus utterances are 34-103 mel frames, so the GE2E window/crop drops
    to 64/32 frames (a data knob -- LSTM 768x3 and every model width stay
    at production values) and train buckets fit the corpus."""
    from multi_speaker_tts_tpu.hparams import default_hparams

    return default_hparams(
        Tokens={"Use_Phoneme": use_phoneme, "Phoneme_Lexicon": lexicon},
        Speaker_Embedding={"GE2E": {"Window_Length": 64, "Window_Shift": 32}},
        Decoder={"N_Frames_Per_Step": r, "Max_Step": 400,
                 "Max_Frames_Per_Token": 12, "Stop_Threshold": 0.5},
        Train={"Batch_Size": batch, "Num_Workers": 0,
               "Learning_Rate": {"Initial": 1.0e-3, "Warmup_Step": 400},
               "Logging_Interval": 100, "Checkpoint_Save_Interval": 2000,
               "Evaluation_Interval": 2000, "Inference_Interval": 10**9,
               "Batch_Bucketing": {"Token_Buckets": [64],
                                   "Mel_Buckets": [132]}},
        GE2E_Train={"Batch_Speakers": 4, "Batch_Utterances": 8,
                    "Frame_Length": 64, "Learning_Rate": 1.0e-4},
    )


def serving_hp(r: int, use_phoneme: bool = False, lexicon: str | None = None):
    from multi_speaker_tts_tpu.hparams import default_hparams

    return default_hparams(
        Tokens={"Use_Phoneme": use_phoneme, "Phoneme_Lexicon": lexicon},
        Speaker_Embedding={
            "Embedding_Size": 64,
            "GE2E": {"LSTM": {"Sizes": 256, "Stacks": 2},
                     "Window_Length": 48, "Window_Shift": 24},
        },
        Encoder={"Embedding_Size": 128,
                 "Conv": {"Stacks": 2, "Channels": 128, "Kernel_Size": 5,
                          "Dropout_Rate": 0.5},
                 "LSTM_Size": 128},
        Decoder={"Prenet": {"Sizes": [64, 64], "Dropout_Rate": 0.5},
                 "Attention": {"Size": 64,
                               "Conv": {"Channels": 32, "Kernel_Size": 31}},
                 "LSTM": {"Sizes": 256, "Stacks": 2},
                 "N_Frames_Per_Step": r,
                 "Max_Step": 400, "Max_Frames_Per_Token": 12,
                 "Stop_Threshold": 0.5},
        Postnet={"Conv": {"Stacks": 3, "Channels": 128, "Kernel_Size": 5,
                          "Dropout_Rate": 0.5}},
        Linear_Head={"Use": True, "Type": "Conv",
                     "Conv": {"Stacks": 1, "Channels": 128, "Kernel_Size": 5,
                              "Dropout_Rate": 0.5}},
        Train={"Batch_Size": 16, "Num_Workers": 0,
               "Learning_Rate": {"Initial": 1.0e-3, "Warmup_Step": 200},
               "Logging_Interval": 100, "Checkpoint_Save_Interval": 1000,
               "Evaluation_Interval": 1000, "Inference_Interval": 10**9,
               "Batch_Bucketing": {"Token_Buckets": [64],
                                   "Mel_Buckets": [132]}},
        GE2E_Train={"Batch_Speakers": 4, "Batch_Utterances": 8,
                    "Frame_Length": 48, "Learning_Rate": 1.0e-4},
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-r", type=int, default=1)
    parser.add_argument("-out", required=True)
    parser.add_argument("-steps", type=int, default=3000)
    parser.add_argument("-ge2e_steps", type=int, default=500)
    parser.add_argument("-corpus", default=None)
    parser.add_argument("-export", default=None,
                        help="write a compact f16 checkpoint here")
    parser.add_argument("-use_phoneme", action="store_true")
    parser.add_argument("-lexicon", default=None)
    parser.add_argument("-width", choices=["serving", "full"], default="serving",
                        help="'full' = the production Hyper_Parameters.yaml "
                             "architecture (~44M params)")
    parser.add_argument("-batch", type=int, default=None)
    args = parser.parse_args()

    t0 = time.perf_counter()

    def stage(msg):
        print(f"[serving +{time.perf_counter() - t0:.0f}s] {msg}", flush=True)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multi_speaker_tts_tpu import evaluate as eval_lib
    from multi_speaker_tts_tpu.data import generate_synthetic_dataset
    from multi_speaker_tts_tpu.inference import Synthesizer
    from multi_speaker_tts_tpu.train.checkpoints import export_compact
    from multi_speaker_tts_tpu.train.ge2e_trainer import GE2ETrainer
    from multi_speaker_tts_tpu.train.trainer import Trainer

    if args.width == "full":
        hp = full_hp(args.r, args.use_phoneme, args.lexicon,
                     batch=args.batch or 32)
    else:
        hp = serving_hp(args.r, args.use_phoneme, args.lexicon)
        if args.batch:
            hp = hp.replace(Train={"Batch_Size": args.batch})
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    corpus = pathlib.Path(args.corpus or (out / "corpus"))
    if not (corpus / "patterns").exists():
        stage("generating synthetic corpus")
        generate_synthetic_dataset(hp, corpus, n_speakers=6, n_utterances=20)
    patterns = str(corpus / "patterns")

    stage(f"GE2E pretrain ({args.ge2e_steps} steps)")
    ge2e_dir = str(out / "ge2e")
    GE2ETrainer(hp, checkpoint_dir=ge2e_dir, log_dir=str(out / "ge2e_logs")) \
        .train(patterns, max_steps=args.ge2e_steps)

    stage(f"TTS train r={args.r} ({args.steps} steps, frozen encoder)")
    hp_tts = hp.replace(Speaker_Embedding={"GE2E": {
        "Pretrained_Checkpoint": ge2e_dir, "Freeze": True}})
    trainer = Trainer(hp_tts, checkpoint_dir=str(out / "tts"),
                      log_dir=str(out / "tts_logs"))
    state = trainer.train(patterns, eval_pattern_dir=patterns,
                          max_steps=args.steps)

    stage("evaluate: teacher-forced + speaker verification")
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(jax.device_get(state.params)))
    report: dict = {"r": args.r, "steps": args.steps, "width": args.width,
                    "params_m": round(n_params / 1e6, 3)}
    metrics = eval_lib.evaluate(hp_tts, state, trainer.models, patterns,
                                max_batches=8)
    report.update({k: float(v) for k, v in metrics.items()})
    report.update(eval_lib.speaker_verification(
        hp_tts, jax.device_get(state.params), trainer.models, patterns
    ))

    stage("zero-shot cloning: self-stop lengths + identity")
    synth = Synthesizer.from_state(hp_tts, jax.device_get(state))
    wavs = sorted((corpus / "wavs").glob("spk0_*.wav"))[:2]
    wavs5 = sorted((corpus / "wavs").glob("spk5_*.wav"))[:2]
    emb0 = synth.enroll([str(w) for w in wavs])
    emb5 = synth.enroll([str(w) for w in wavs5])
    texts = [
        "the quick brown fox jumps over the lazy dog.",
        "she sells sea shells by the sea shore.",
        "practice makes perfect.",
        "better late than never.",
    ]
    results = synth.synthesize(texts, emb0, vocode=True)
    lengths = [item["mel_length"] for item in results]
    report["self_stop_lengths"] = lengths
    report["self_stop_all_below_cap"] = bool(
        all(l < hp.Decoder.Max_Step for l in lengths)
    )
    # Identity: re-embed the synthesized wavs; own-vs-cross cosine.
    own, cross = [], []
    for item in results:
        e = synth.enroll([np.asarray(item["wav"], np.float32)])
        own.append(float(np.dot(e, emb0)))
        cross.append(float(np.dot(e, emb5)))
    report["reenroll_own_cos"] = float(np.mean(own))
    report["reenroll_cross_cos"] = float(np.mean(cross))
    report["reenroll_margin"] = float(np.mean(own) - np.mean(cross))

    if args.export:
        stage(f"export compact checkpoint -> {args.export}")
        export_compact(
            args.export,
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
            meta={"hp": hp_tts.to_dict(), "r": args.r,
                  "trained_steps": args.steps, "width": args.width,
                  "params_m": round(n_params / 1e6, 3),
                  "corpus": "synthetic-6spk (demo/make_corpus recipe)"},
        )
        report["export_bytes"] = pathlib.Path(args.export).stat().st_size

    print("REPORT " + json.dumps(report), flush=True)
    (out / "report.json").write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
