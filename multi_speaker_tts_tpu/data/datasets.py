"""Online dataset: bucketed, statically-shaped batches (SURVEY.md section 2
"Dataset / collator").

The reference sorts/buckets by length and pads to the batch max (dynamic
shapes - fine for CUDA, poison for XLA). Here every batch is padded to one
of a small set of static (token_bucket, mel_bucket) shapes from
hp.Train.Batch_Bucketing, so the jitted train step compiles once per bucket
and is reused forever (BASELINE.json:5).
"""

from __future__ import annotations

import pathlib
import pickle

import numpy as np

from multi_speaker_tts_tpu.text import PAD_ID

METADATA_FILE = "METADATA.PICKLE"


class PatternDataset:
    """Loads pattern pickles produced by ``pattern_generator``."""

    def __init__(self, pattern_dir: str | pathlib.Path, metadata_file: str = METADATA_FILE):
        self.pattern_dir = pathlib.Path(pattern_dir)
        with open(self.pattern_dir / metadata_file, "rb") as f:
            self.metadata = pickle.load(f)
        self.files = self.metadata["Files"]
        self.mel_lengths = np.asarray(self.metadata["Mel_Lengths"])
        self.token_lengths = np.asarray(self.metadata["Token_Lengths"])
        self.speakers = list(self.metadata["Speakers"])
        self.speaker_ids = {s: i for i, s in enumerate(sorted(set(self.speakers)))}
        by_speaker: dict[str, list[int]] = {}
        for i, s in enumerate(self.speakers):
            by_speaker.setdefault(s, []).append(i)
        self.indices_by_speaker = by_speaker

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        with open(self.pattern_dir / self.files[idx], "rb") as f:
            pattern = pickle.load(f)
        pattern["Speaker_ID"] = self.speaker_ids[self.speakers[idx]]
        return pattern


def _bucket_of(value: int, buckets: list[int]) -> int | None:
    """Smallest bucket >= value, or None if value exceeds all buckets."""
    for b in buckets:
        if value <= b:
            return b
    return None


def collate_tts(
    patterns: list[dict],
    token_bucket: int,
    mel_bucket: int,
    mel_dim: int,
    n_frames_per_step: int = 1,
    ref_window: int | None = None,
    rng: np.random.Generator | list[np.random.Generator] | None = None,
    spect_dim: int | None = None,
) -> dict[str, np.ndarray]:
    """Pad a list of patterns to the static bucket shape.

    Returns tokens (B,S), token_lengths, mels (B,T,M), mel_lengths,
    speaker_ids, and (if ref_window) a fixed-length reference mel crop per
    item for GE2E conditioning.

    ``rng`` may be one shared Generator, or a list with one Generator per
    item - the multi-host path uses per-item rngs so a host collating only
    its row slice draws exactly the crops the full-batch collate would.
    """
    B = len(patterns)
    assert mel_bucket % n_frames_per_step == 0
    tokens = np.full((B, token_bucket), PAD_ID, np.int32)
    mels = np.zeros((B, mel_bucket, mel_dim), np.float32)
    spects = (
        np.zeros((B, mel_bucket, spect_dim), np.float32) if spect_dim else None
    )
    token_lengths = np.zeros((B,), np.int32)
    mel_lengths = np.zeros((B,), np.int32)
    speaker_ids = np.zeros((B,), np.int32)
    refs = np.zeros((B, ref_window, mel_dim), np.float32) if ref_window else None
    rng = rng or np.random.default_rng()

    for i, p in enumerate(patterns):
        tk = p["Tokens"][:token_bucket]
        mel = p["Mel"][:mel_bucket]
        # Round the mel length down to an r multiple so stop targets align.
        T = (mel.shape[0] // n_frames_per_step) * n_frames_per_step
        mel = mel[:T]
        tokens[i, : len(tk)] = tk
        mels[i, :T] = mel
        if spects is not None:
            spects[i, :T] = p["Spect"][:T]
        token_lengths[i] = len(tk)
        mel_lengths[i] = T
        speaker_ids[i] = p.get("Speaker_ID", 0)
        if refs is not None:
            src = p.get("Ref_Mel", p["Mel"])
            r_i = rng[i] if isinstance(rng, list) else rng
            if src.shape[0] >= ref_window:
                start = int(r_i.integers(0, src.shape[0] - ref_window + 1))
                refs[i] = src[start : start + ref_window]
            else:
                # Wrap-pad short clips (matches inference.enroll): a GE2E
                # window ending in zero padding embeds as silence, skewing
                # the training-time speaker conditioning distribution.
                refs[i] = np.pad(
                    src, ((0, ref_window - src.shape[0]), (0, 0)), mode="wrap"
                )
    batch = {
        "tokens": tokens,
        "token_lengths": token_lengths,
        "mels": mels,
        "mel_lengths": mel_lengths,
        "speaker_ids": speaker_ids,
    }
    if refs is not None:
        batch["ref_mels"] = refs
    if spects is not None:
        batch["spects"] = spects
    return batch


class BucketBatcher:
    """Groups utterances into static (token_bucket, mel_bucket) shapes and
    yields full batches; drops utterances longer than the largest buckets."""

    def __init__(
        self,
        dataset: PatternDataset,
        batch_size: int,
        token_buckets: list[int],
        mel_buckets: list[int],
        mel_dim: int,
        n_frames_per_step: int = 1,
        ref_window: int | None = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        spect_dim: int | None = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.token_buckets = sorted(token_buckets)
        self.mel_buckets = sorted(
            (b // n_frames_per_step) * n_frames_per_step for b in mel_buckets
        )
        self.mel_dim = mel_dim
        self.r = n_frames_per_step
        self.ref_window = ref_window
        self.spect_dim = spect_dim
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

        self.assignment: dict[tuple[int, int], list[int]] = {}
        self.n_dropped = 0
        for i in range(len(dataset)):
            tb = _bucket_of(int(dataset.token_lengths[i]), self.token_buckets)
            mb = _bucket_of(int(dataset.mel_lengths[i]), self.mel_buckets)
            if tb is None or mb is None:
                self.n_dropped += 1
                continue
            self.assignment.setdefault((tb, mb), []).append(i)

    @property
    def bucket_shapes(self) -> list[tuple[int, int]]:
        return sorted(self.assignment.keys())

    def __iter__(self):
        """One epoch of batches: each batch is (bucket_shape, batch dict)."""
        plan: list[tuple[tuple[int, int], list[int]]] = []
        for shape, idxs in self.assignment.items():
            idxs = list(idxs)
            if self.shuffle:
                self.rng.shuffle(idxs)
            for k in range(0, len(idxs), self.batch_size):
                chunk = idxs[k : k + self.batch_size]
                if len(chunk) < self.batch_size:
                    if self.drop_last:
                        continue
                    # Static batch size: pad by repeating items.
                    chunk = (chunk * self.batch_size)[: self.batch_size]
                plan.append((shape, chunk))
        if self.shuffle:
            self.rng.shuffle(plan)
        for (tb, mb), chunk in plan:
            patterns = [self.ds[i] for i in chunk]
            yield (tb, mb), collate_tts(
                patterns, tb, mb, self.mel_dim, self.r, self.ref_window,
                self.rng, self.spect_dim,
            )


class GE2EBatchSampler:
    """N speakers x M utterances batches of fixed-length mel crops
    (SURVEY.md section 3.4 GE2E training step)."""

    def __init__(
        self,
        dataset: PatternDataset,
        n_speakers: int,
        m_utterances: int,
        frame_length: int,
        seed: int = 0,
    ):
        self.ds = dataset
        self.N = n_speakers
        self.M = m_utterances
        self.L = frame_length
        self.rng = np.random.default_rng(seed)
        # A speaker needs >= 2 distinct utterances: sampling M with
        # replacement from one utterance makes the leave-one-out centroid
        # degenerate (cosine 1 against itself), biasing the loss toward
        # trivial positives (GE2E batches are N speakers x M *distinct*
        # utterances, Wan et al. section 2.1).
        self.eligible = [
            s for s, idxs in dataset.indices_by_speaker.items() if len(idxs) >= 2
        ]
        if len(self.eligible) < n_speakers:
            raise ValueError(
                f"need >= {n_speakers} speakers with >= 2 utterances each, "
                f"dataset has {len(self.eligible)}"
            )

    def sample(self) -> dict[str, np.ndarray]:
        """Returns mels (N*M, L, mel_dim) grouped by speaker + speaker ids."""
        speakers = self.rng.choice(self.eligible, size=self.N, replace=False)
        mel_dim = self.ds.metadata["Mel_Dim"]
        mels = np.zeros((self.N, self.M, self.L, mel_dim), np.float32)
        ids = np.zeros((self.N,), np.int32)
        for j, s in enumerate(speakers):
            idxs = self.ds.indices_by_speaker[s]
            chosen = self.rng.choice(idxs, size=self.M, replace=len(idxs) < self.M)
            for m, idx in enumerate(chosen):
                mel = self.ds[int(idx)]["Mel"]
                if mel.shape[0] >= self.L:
                    start = int(self.rng.integers(0, mel.shape[0] - self.L + 1))
                    mels[j, m] = mel[start : start + self.L]
                else:
                    mels[j, m, : mel.shape[0]] = mel
            ids[j] = self.ds.speaker_ids[s]
        return {"mels": mels.reshape(self.N * self.M, self.L, mel_dim), "speaker_ids": ids}
