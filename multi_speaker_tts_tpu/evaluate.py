"""Model evaluation: mel L1 parity and attention health over a pattern set.

The driver's quality metric is "mel L1 parity vs the PyTorch reference"
(BASELINE.json:2,5). This tool computes teacher-forced mel L1 (pre/post
postnet), linear L1, stop accuracy, and attention diagonality for any
checkpoint, so two models (ours vs a converted reference checkpoint) can be
compared on the same patterns.

CLI: ``python -m multi_speaker_tts_tpu.evaluate -hp <yaml> -checkpoint <dir>
-pattern <dir> [-batches N]``
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from multi_speaker_tts_tpu.hparams import load_hyper_parameters
from multi_speaker_tts_tpu.train import trainer as trainer_lib


def attention_diagonality(alignments: np.ndarray, token_lengths, mel_lengths,
                          n_frames_per_step: int = 1) -> float:
    """Mean attention mass within a +-20% band around the ideal diagonal -
    the de-facto health metric the reference reads off TensorBoard plots
    (SURVEY.md section 4). Alignment rows are decode STEPS (r frames each);
    ``mel_lengths`` arrives in frames and is converted."""
    B, T, S = alignments.shape
    total, count = 0.0, 0
    for b in range(B):
        tl = int(token_lengths[b])
        ml = -(-int(mel_lengths[b]) // n_frames_per_step)  # steps
        if tl < 2 or ml < 2:
            continue
        t_pos = np.arange(ml) / ml
        s_pos = np.arange(tl) / tl
        band = np.abs(s_pos[None, :] - t_pos[:, None]) <= 0.2
        total += float((alignments[b, :ml, :tl] * band).sum() / ml)
        count += 1
    return total / max(count, 1)


def evaluate(hp, state, models, pattern_dir: str, max_batches: int = 16,
             seed: int = 0) -> dict:
    """Teacher-forced metrics over up to ``max_batches`` bucketed batches."""
    from multi_speaker_tts_tpu.data.datasets import BucketBatcher, PatternDataset

    lh = hp.get("Linear_Head")
    batcher = BucketBatcher(
        PatternDataset(pattern_dir),
        batch_size=hp.Train.get("Eval_Batch_Size", 8),
        token_buckets=list(hp.Train.Batch_Bucketing.Token_Buckets),
        mel_buckets=list(hp.Train.Batch_Bucketing.Mel_Buckets),
        mel_dim=hp.Sound.Mel_Dim,
        n_frames_per_step=hp.Decoder.get("N_Frames_Per_Step", 1),
        ref_window=(
            hp.Speaker_Embedding.GE2E.Window_Length if models.ge2e is not None else None
        ),
        spect_dim=hp.Sound.Spectrogram_Dim if (lh is not None and lh.Use) else None,
        shuffle=False,
    )
    eval_step = jax.jit(trainer_lib.make_eval_step(hp, models))
    rng = jax.random.PRNGKey(seed)

    sums: dict[str, float] = {}
    diag_sum, n = 0.0, 0
    for _, batch in batcher:
        if n >= max_batches:
            break
        import jax.numpy as jnp

        batch_dev = jax.tree.map(jnp.asarray, batch)
        losses, outputs = eval_step(state, batch_dev, rng)
        losses = jax.device_get(losses)
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        diag_sum += attention_diagonality(
            np.asarray(outputs["alignments"]),
            batch["token_lengths"],
            batch["mel_lengths"],
            n_frames_per_step=int(hp.Decoder.get("N_Frames_Per_Step", 1)),
        )
        n += 1
    if n == 0:
        raise ValueError(f"no evaluable batches under {pattern_dir}")
    metrics = {k: v / n for k, v in sums.items()}
    metrics["attention_diagonality"] = diag_sum / n
    metrics["num_batches"] = n
    return metrics


def compute_eer(scores: np.ndarray, labels: np.ndarray) -> float:
    """Equal error rate of a verification trial set.

    ``scores``: similarity per trial (higher = more likely same speaker);
    ``labels``: True for same-speaker trials. The EER is the operating
    point where the false-accept rate equals the false-reject rate; between
    discrete thresholds the two curves are linearly interpolated."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels, bool)
    pos = np.sort(scores[labels])
    neg = np.sort(scores[~labels])
    if len(pos) == 0 or len(neg) == 0:
        raise ValueError("EER needs both same- and cross-speaker trials")
    ts = np.unique(scores)
    # FRR(t) = fraction of positives below t; FAR(t) = fraction of
    # negatives at or above t (accept iff score >= t).
    frr = np.searchsorted(pos, ts, side="left") / len(pos)
    far = 1.0 - np.searchsorted(neg, ts, side="left") / len(neg)
    diff = far - frr  # decreasing in t
    i = int(np.argmax(diff <= 0))
    if i == 0 or diff[i] == 0:
        return float((far[i] + frr[i]) / 2.0)
    # Interpolate the crossing between thresholds i-1 and i.
    w = diff[i - 1] / (diff[i - 1] - diff[i])
    far_x = far[i - 1] + w * (far[i] - far[i - 1])
    frr_x = frr[i - 1] + w * (frr[i] - frr[i - 1])
    return float((far_x + frr_x) / 2.0)


def speaker_verification(
    hp,
    params: dict,
    models,
    pattern_dir: str,
    max_utts_per_speaker: int = 10,
    batch_size: int = 16,
    return_embeddings: bool = False,
) -> dict:
    """GE2E encoder quality over a pattern set (BASELINE config 2): EER and
    own-vs-cross cosine statistics from ``embed_utterance`` embeddings.

    Every pattern mel (up to ``max_utts_per_speaker`` per speaker) is
    embedded with the production sliding-window path; trials are all
    utterance pairs, scored by cosine. Reported: ``sv_eer``,
    ``sv_own_cos`` / ``sv_cross_cos`` (mean same/cross-speaker pair
    cosine), ``sv_margin`` (their difference), and
    ``sv_centroid_accuracy`` (nearest-centroid speaker identification with
    leave-self-out centroids)."""
    if models.ge2e is None:
        raise ValueError("model has no GE2E speaker encoder")
    import jax.numpy as jnp

    from multi_speaker_tts_tpu.data.datasets import PatternDataset

    spk_cfg = hp.Speaker_Embedding.GE2E
    win_len, win_shift = spk_cfg.Window_Length, spk_cfg.Window_Shift
    ds = PatternDataset(pattern_dir)

    chosen: list[int] = []
    for s in sorted(ds.indices_by_speaker):
        chosen.extend(ds.indices_by_speaker[s][:max_utts_per_speaker])
    mels = [ds[i]["Mel"] for i in chosen]
    spk_of = np.asarray([ds.speaker_ids[ds.speakers[i]] for i in chosen])
    lengths = np.asarray([m.shape[0] for m in mels], np.int32)
    T_pad = max(int(lengths.max()), win_len)

    mel_dim = mels[0].shape[-1]
    packed = np.zeros((len(mels), T_pad, mel_dim), np.float32)
    for i, m in enumerate(mels):
        packed[i, : m.shape[0]] = m

    @jax.jit
    def embed(mel_b, len_b):
        return models.ge2e.apply(
            {"params": params["ge2e"]},
            mel_b, win_len, win_shift, None, len_b,
            method=models.ge2e.embed_utterance,
        )

    embs = []
    for lo in range(0, len(mels), batch_size):
        hi = min(lo + batch_size, len(mels))
        # Fixed batch shape: wrap the tail so one program serves all calls.
        idx = np.arange(lo, lo + batch_size) % len(mels)
        out = embed(jnp.asarray(packed[idx]), jnp.asarray(lengths[idx]))
        embs.append(np.asarray(jax.device_get(out))[: hi - lo])
    E = np.concatenate(embs, axis=0)  # (U, emb), unit-norm

    cos = E @ E.T
    iu, ju = np.triu_indices(len(E), k=1)
    scores = cos[iu, ju]
    same = spk_of[iu] == spk_of[ju]

    # Nearest-centroid identification with leave-self-out own centroids.
    correct = 0
    for i in range(len(E)):
        best, best_s = -np.inf, None
        for s in np.unique(spk_of):
            members = (spk_of == s) & (np.arange(len(E)) != i)
            if not members.any():
                continue
            c = E[members].mean(axis=0)
            c = c / max(np.linalg.norm(c), 1e-9)
            score = float(E[i] @ c)
            if score > best:
                best, best_s = score, s
        correct += int(best_s == spk_of[i])

    out_extra = (
        {"embeddings": E, "speaker_of": spk_of} if return_embeddings else {}
    )
    return {
        **out_extra,
        "sv_eer": compute_eer(scores, same),
        "sv_own_cos": float(scores[same].mean()),
        "sv_cross_cos": float(scores[~same].mean()),
        "sv_margin": float(scores[same].mean() - scores[~same].mean()),
        "sv_centroid_accuracy": correct / len(E),
        "sv_num_utterances": len(E),
        "sv_num_speakers": int(len(np.unique(spk_of))),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="Evaluate a TTS checkpoint")
    parser.add_argument("-hp", "--hyper_parameters", default=None)
    parser.add_argument("-checkpoint", required=True)
    parser.add_argument("-pattern", required=True)
    parser.add_argument("-batches", type=int, default=16)
    parser.add_argument("-sv", action="store_true",
                        help="also report GE2E speaker-verification metrics "
                             "(EER, cosine margins) over the pattern set")
    args = parser.parse_args()

    from multi_speaker_tts_tpu.inference import Synthesizer, _enable_compilation_cache

    _enable_compilation_cache()
    if args.checkpoint.endswith(".msgpack"):
        # Compact single-file checkpoint: hp rides in its meta.
        synth = Synthesizer.from_compact(
            args.checkpoint,
            hp=(load_hyper_parameters(args.hyper_parameters)
                if args.hyper_parameters else None),
        )
        hp = synth.hp
    else:
        hp = load_hyper_parameters(args.hyper_parameters)
        synth = Synthesizer.from_checkpoint(args.checkpoint, hp)
    import jax.numpy as jnp

    state = trainer_lib.TrainState(
        step=jnp.zeros([], jnp.int32),
        params=synth.params,
        batch_stats=synth.batch_stats,
        opt_state=None,
    )
    metrics = evaluate(hp, state, synth.models, args.pattern, args.batches)
    if args.sv:
        metrics.update(
            speaker_verification(hp, synth.params, synth.models, args.pattern)
        )
    print(json.dumps({k: round(float(v), 6) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
