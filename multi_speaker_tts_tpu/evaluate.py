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


def attention_diagonality(alignments: np.ndarray, token_lengths, mel_lengths) -> float:
    """Mean attention mass within a +-20% band around the ideal diagonal -
    the de-facto health metric the reference reads off TensorBoard plots
    (SURVEY.md section 4)."""
    B, T, S = alignments.shape
    total, count = 0.0, 0
    for b in range(B):
        tl, ml = int(token_lengths[b]), int(mel_lengths[b])
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
        )
        n += 1
    if n == 0:
        raise ValueError(f"no evaluable batches under {pattern_dir}")
    metrics = {k: v / n for k, v in sums.items()}
    metrics["attention_diagonality"] = diag_sum / n
    metrics["num_batches"] = n
    return metrics


def main() -> None:
    parser = argparse.ArgumentParser(description="Evaluate a TTS checkpoint")
    parser.add_argument("-hp", "--hyper_parameters", default=None)
    parser.add_argument("-checkpoint", required=True)
    parser.add_argument("-pattern", required=True)
    parser.add_argument("-batches", type=int, default=16)
    args = parser.parse_args()

    hp = load_hyper_parameters(args.hyper_parameters)
    from multi_speaker_tts_tpu.inference import Synthesizer, _enable_compilation_cache

    _enable_compilation_cache()
    synth = Synthesizer.from_checkpoint(args.checkpoint, hp)
    import jax.numpy as jnp

    state = trainer_lib.TrainState(
        step=jnp.zeros([], jnp.int32),
        params=synth.params,
        batch_stats=synth.batch_stats,
        opt_state=None,
    )
    metrics = evaluate(hp, state, synth.models, args.pattern, args.batches)
    print(json.dumps({k: round(float(v), 6) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
