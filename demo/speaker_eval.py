"""Scaled speaker-identity evaluation (VERDICT r4 item 3).

Rounds 2-4 evaluated speaker identity over the 6-speaker demo corpus, where
re-enroll margins saturate and EER cannot distinguish a good encoder from a
lucky one. This script evaluates at population scale on the "rich"
synthetic voice model (bounded f0 + per-speaker harmonic timbre,
``data/pattern_generator.py``):

1. generate a 32-speaker training corpus and a DISJOINT 16-speaker
   held-out corpus (speaker_offset keeps the voice profiles disjoint);
2. pretrain the GE2E encoder on the 32 (N=16 x M=8 batches);
3. report verification EER + cosine margins + nearest-centroid accuracy on
   BOTH corpora (held-out EER is the honest number: those voices were
   never seen in training);
4. train the serving-width synthesizer on the 32 speakers (frozen GE2E,
   the SV2TTS recipe) and re-run the cloning re-enroll identity check
   against a 16-candidate gallery — margin DISTRIBUTION and
   identification accuracy, for both seen and zero-shot speakers.

    python demo/speaker_eval.py -out /tmp/spk_eval \
        [-speakers 32] [-heldout 16] [-ge2e_steps 3000] [-tts_steps 3000]

Writes <out>/report_speakers.json; demo/RESULTS.md summarizes the numbers.
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
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-out", required=True)
    parser.add_argument("-speakers", type=int, default=32)
    parser.add_argument("-heldout", type=int, default=16)
    parser.add_argument("-utts", type=int, default=12)
    parser.add_argument("-ge2e_steps", type=int, default=3000)
    parser.add_argument("-tts_steps", type=int, default=6000)
    parser.add_argument("-gallery", type=int, default=16,
                        help="candidate speakers in the re-enroll gallery")
    parser.add_argument("-clone_speakers", type=int, default=8,
                        help="speakers cloned per split (seen / zero-shot)")
    args = parser.parse_args()

    t0 = time.perf_counter()

    def stage(msg):
        print(f"[spk_eval +{time.perf_counter() - t0:.0f}s] {msg}", flush=True)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from train_serving import serving_hp  # demo-local module

    from multi_speaker_tts_tpu import evaluate as eval_lib
    from multi_speaker_tts_tpu.data import generate_synthetic_dataset
    from multi_speaker_tts_tpu.inference import Synthesizer
    from multi_speaker_tts_tpu.train import trainer as trainer_lib
    from multi_speaker_tts_tpu.train.ge2e_trainer import GE2ETrainer
    from multi_speaker_tts_tpu.train.trainer import Trainer

    hp = serving_hp(r=2).replace(  # r=2: the shipped default (RESULTS.md sweep)
        GE2E_Train={"Batch_Speakers": 16, "Batch_Utterances": 8,
                    "Frame_Length": 48, "Learning_Rate": 1.0e-4},
    )
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    train_corpus = out / "corpus_train"
    held_corpus = out / "corpus_heldout"
    if not (train_corpus / "patterns").exists():
        stage(f"generating rich train corpus ({args.speakers} speakers)")
        generate_synthetic_dataset(
            hp, train_corpus, n_speakers=args.speakers,
            n_utterances=args.utts, voice="rich", seed=0, num_workers=8,
        )
    if not (held_corpus / "patterns").exists():
        stage(f"generating rich held-out corpus ({args.heldout} speakers)")
        generate_synthetic_dataset(
            hp, held_corpus, n_speakers=args.heldout, n_utterances=10,
            voice="rich", seed=1, speaker_offset=args.speakers,
            num_workers=8,
        )
    train_patterns = str(train_corpus / "patterns")
    held_patterns = str(held_corpus / "patterns")

    report: dict = {
        "voice_model": "rich",
        "n_train_speakers": args.speakers,
        "n_heldout_speakers": args.heldout,
        "ge2e_steps": args.ge2e_steps,
        "tts_steps": args.tts_steps,
    }

    stage(f"GE2E pretrain on {args.speakers} speakers ({args.ge2e_steps} steps)")
    ge2e_dir = str(out / "ge2e")
    ge2e_trainer = GE2ETrainer(hp, checkpoint_dir=ge2e_dir,
                               log_dir=str(out / "ge2e_logs"))
    ge2e_state = ge2e_trainer.train(train_patterns, max_steps=args.ge2e_steps)

    stage("speaker verification: EER on train + held-out speaker sets")
    models = trainer_lib.build_models(hp)
    sv_params = {"ge2e": jax.device_get(ge2e_state.params)["encoder"]}
    for name, patterns in (("train", train_patterns), ("heldout", held_patterns)):
        sv = eval_lib.speaker_verification(hp, sv_params, models, patterns)
        report[f"sv_{name}"] = {k: (round(float(v), 6)
                                    if isinstance(v, (int, float)) else v)
                                for k, v in sv.items()}
        stage(f"  {name}: EER {sv['sv_eer']:.4f} margin {sv['sv_margin']:.4f} "
              f"centroid-acc {sv['sv_centroid_accuracy']:.4f} "
              f"({sv['sv_num_utterances']} utts / {sv['sv_num_speakers']} spk)")

    stage(f"TTS train on {args.speakers} speakers ({args.tts_steps} steps, "
          f"frozen GE2E)")
    hp_tts = hp.replace(Speaker_Embedding={"GE2E": {
        "Pretrained_Checkpoint": ge2e_dir, "Freeze": True}})
    trainer = Trainer(hp_tts, checkpoint_dir=str(out / "tts"),
                      log_dir=str(out / "tts_logs"))
    state = trainer.train(train_patterns, eval_pattern_dir=train_patterns,
                          max_steps=args.tts_steps)

    metrics = eval_lib.evaluate(hp_tts, state, trainer.models, train_patterns,
                                max_batches=8)
    report["eval"] = {k: round(float(v), 6) for k, v in metrics.items()}

    stage("cloning re-enroll against a multi-speaker gallery")
    synth = Synthesizer.from_state(hp_tts, jax.device_get(state))
    texts = [
        "the quick brown fox jumps over the lazy dog.",
        "she sells sea shells by the sea shore.",
        "practice makes perfect.",
        "better late than never.",
    ]

    def enroll_speaker(corpus_dir: pathlib.Path, spk: int):
        wavs = sorted((corpus_dir / "wavs").glob(f"spk{spk}_utt*.wav"))[:3]
        assert wavs, (corpus_dir, spk)
        return synth.enroll([str(w) for w in wavs])

    # Gallery: half seen (train) + half zero-shot (held-out) speakers.
    n_half = args.gallery // 2
    gallery = (
        [("seen", s, enroll_speaker(train_corpus, s))
         for s in range(n_half)]
        + [("zero_shot", args.speakers + s, enroll_speaker(held_corpus,
                                                           args.speakers + s))
           for s in range(args.gallery - n_half)]
    )
    embs = np.stack([e for _, _, e in gallery])  # (G, E)

    clone_rows = []
    for split in ("seen", "zero_shot"):
        idxs = [i for i, (sp, _, _) in enumerate(gallery) if sp == split]
        for gi in idxs[: args.clone_speakers]:
            split_g, spk_g, emb_g = gallery[gi]
            results = synth.synthesize(texts, emb_g, vocode=True)
            own, margin, correct, es = [], [], 0, []
            for item in results:
                e = synth.enroll([np.asarray(item["wav"], np.float32)])
                es.append(e)
                cos = embs @ e  # (G,)
                own_cos = float(cos[gi])
                others = np.delete(cos, gi)
                own.append(own_cos)
                margin.append(own_cos - float(others.max()))
                correct += int(np.argmax(cos) == gi)
            # Speaker-level: average the synthesized-utterance embeddings
            # (what enrollment does with real audio) before identifying.
            e_avg = np.mean(es, axis=0)
            e_avg = e_avg / np.linalg.norm(e_avg)
            cos_avg = embs @ e_avg
            clone_rows.append({
                "split": split_g, "speaker": spk_g,
                "own_cos": round(float(np.mean(own)), 4),
                "margin_vs_best_other": round(float(np.mean(margin)), 4),
                "id_accuracy": correct / len(results),
                "spk_level_correct": int(np.argmax(cos_avg) == gi),
                "spk_level_margin": round(
                    float(cos_avg[gi] - np.delete(cos_avg, gi).max()), 4),
                "mel_lengths": [int(r["mel_length"]) for r in results],
            })
            stage(f"  {split_g} spk{spk_g}: own {clone_rows[-1]['own_cos']} "
                  f"margin {clone_rows[-1]['margin_vs_best_other']} "
                  f"id-acc {clone_rows[-1]['id_accuracy']} "
                  f"spk-level {clone_rows[-1]['spk_level_correct']} "
                  f"(margin {clone_rows[-1]['spk_level_margin']})")

    for split in ("seen", "zero_shot"):
        rows = [r for r in clone_rows if r["split"] == split]
        margins = np.asarray([r["margin_vs_best_other"] for r in rows])
        report[f"clone_{split}"] = {
            "n_speakers": len(rows),
            "gallery_size": args.gallery,
            "margin_mean": round(float(margins.mean()), 4),
            "margin_min": round(float(margins.min()), 4),
            "margin_p10": round(float(np.percentile(margins, 10)), 4),
            "id_accuracy": round(
                float(np.mean([r["id_accuracy"] for r in rows])), 4),
            "spk_level_id_accuracy": round(
                float(np.mean([r["spk_level_correct"] for r in rows])), 4),
            "spk_level_margin_mean": round(
                float(np.mean([r["spk_level_margin"] for r in rows])), 4),
        }
    report["clone_rows"] = clone_rows

    (out / "report_speakers.json").write_text(json.dumps(report, indent=2))
    print("REPORT " + json.dumps(
        {k: v for k, v in report.items() if k != "clone_rows"}))


if __name__ == "__main__":
    main()
