"""Data pipeline tests: pattern generation, bucketing, collation, GE2E sampling."""

import numpy as np
import pytest

from multi_speaker_tts_tpu.data import (
    BucketBatcher,
    GE2EBatchSampler,
    PatternDataset,
    generate_synthetic_dataset,
)
from multi_speaker_tts_tpu.text import PAD_ID


@pytest.fixture(scope="module")
def pattern_dir(tiny_hp, tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    meta = generate_synthetic_dataset(tiny_hp, root, n_speakers=3, n_utterances=4)
    assert len(meta["Files"]) == 12
    return root / "patterns"


def test_pattern_contents(pattern_dir, tiny_hp):
    ds = PatternDataset(pattern_dir)
    assert len(ds) == 12
    p = ds[0]
    assert p["Mel"].shape[1] == tiny_hp.Sound.Mel_Dim
    assert p["Spect"].shape[1] == tiny_hp.Sound.Spectrogram_Dim
    assert p["Mel"].shape[0] == p["Spect"].shape[0]
    assert p["Tokens"].dtype == np.int32
    assert 0.0 <= p["Mel"].min() and p["Mel"].max() <= 1.0
    assert p["Mel"].shape[0] == ds.mel_lengths[0]


def test_speaker_index(pattern_dir):
    ds = PatternDataset(pattern_dir)
    assert len(ds.indices_by_speaker) == 3
    assert sorted(ds.speaker_ids.values()) == [0, 1, 2]


def test_bucket_batcher_static_shapes(pattern_dir, tiny_hp):
    ds = PatternDataset(pattern_dir)
    batcher = BucketBatcher(
        ds,
        batch_size=4,
        token_buckets=[16, 32],
        mel_buckets=[64, 128, 256],
        mel_dim=tiny_hp.Sound.Mel_Dim,
        ref_window=24,
    )
    seen_shapes = set()
    n_items = 0
    for (tb, mb), batch in batcher:
        assert batch["tokens"].shape == (4, tb)
        assert batch["mels"].shape == (4, mb, tiny_hp.Sound.Mel_Dim)
        assert batch["ref_mels"].shape == (4, 24, tiny_hp.Sound.Mel_Dim)
        assert (batch["token_lengths"] <= tb).all()
        assert (batch["mel_lengths"] <= mb).all()
        # padding is PAD_ID / zeros beyond the lengths
        for i in range(4):
            assert (batch["tokens"][i, batch["token_lengths"][i]:] == PAD_ID).all()
            assert (batch["mels"][i, batch["mel_lengths"][i]:] == 0).all()
        seen_shapes.add((tb, mb))
        n_items += 4
    assert len(seen_shapes) <= 6  # bounded compile count
    assert n_items >= len(ds) - batcher.n_dropped


def test_bucket_batcher_drops_oversized(pattern_dir, tiny_hp):
    ds = PatternDataset(pattern_dir)
    batcher = BucketBatcher(
        ds, batch_size=2, token_buckets=[16, 32],
        mel_buckets=[8],  # everything longer gets dropped
        mel_dim=tiny_hp.Sound.Mel_Dim,
    )
    assert batcher.n_dropped > 0


def test_bucket_batcher_r_alignment(pattern_dir, tiny_hp):
    ds = PatternDataset(pattern_dir)
    batcher = BucketBatcher(
        ds, batch_size=2, token_buckets=[32], mel_buckets=[250],
        mel_dim=tiny_hp.Sound.Mel_Dim, n_frames_per_step=3,
    )
    for (tb, mb), batch in batcher:
        assert mb % 3 == 0
        assert (batch["mel_lengths"] % 3 == 0).all()


def test_ge2e_sampler(pattern_dir, tiny_hp):
    ds = PatternDataset(pattern_dir)
    sampler = GE2EBatchSampler(ds, n_speakers=3, m_utterances=2, frame_length=24)
    batch = sampler.sample()
    assert batch["mels"].shape == (6, 24, tiny_hp.Sound.Mel_Dim)
    assert len(set(batch["speaker_ids"].tolist())) == 3


def test_ge2e_sampler_too_few_speakers(pattern_dir):
    ds = PatternDataset(pattern_dir)
    with pytest.raises(ValueError, match="speakers"):
        GE2EBatchSampler(ds, n_speakers=10, m_utterances=2, frame_length=24)
