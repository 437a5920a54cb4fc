"""Streaming synthesis: segment-wise decode + incremental vocode.

Contract (inference.Synthesizer.stream): emitted mel chunks equal the
batched ``synthesize`` mel_post EXACTLY (same per-step prenet rng, same
masking, boundary-masked windowed convs); only the windowed Griffin-Lim
phase differs from batch vocoding.
"""

import numpy as np
import pytest

import jax

from multi_speaker_tts_tpu.data import (
    BucketBatcher,
    PatternDataset,
    generate_synthetic_dataset,
)
from multi_speaker_tts_tpu.inference import Synthesizer
from multi_speaker_tts_tpu.train import trainer as trainer_lib


@pytest.fixture(scope="module")
def setup(tiny_hp, tmp_path_factory):
    root = tmp_path_factory.mktemp("streamsynth")
    generate_synthetic_dataset(tiny_hp, root, n_speakers=2, n_utterances=3)
    batcher = BucketBatcher(
        PatternDataset(root / "patterns"),
        batch_size=4,
        token_buckets=list(tiny_hp.Train.Batch_Bucketing.Token_Buckets),
        mel_buckets=list(tiny_hp.Train.Batch_Bucketing.Mel_Buckets),
        mel_dim=tiny_hp.Sound.Mel_Dim,
        ref_window=tiny_hp.Speaker_Embedding.GE2E.Window_Length,
        spect_dim=tiny_hp.Sound.Spectrogram_Dim,
        shuffle=False,
    )
    batch = next(iter(batcher))[1]
    models = trainer_lib.build_models(tiny_hp)
    state = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)
    synth = Synthesizer.from_state(tiny_hp, state)
    spk = synth.enroll(
        [np.random.default_rng(3).normal(size=8000).astype(np.float32)]
    )
    return synth, spk


def test_stream_mel_matches_batch_exactly(setup):
    synth, spk = setup
    texts = ["hello there", "hi"]
    chunks = list(synth.stream(texts, spk, max_steps=32, segment_steps=16,
                             return_mel=True))
    assert chunks[-1]["done"] and all(not c["done"] for c in chunks[:-1])
    # Chunks tile the decoded frames contiguously.
    E = 16 * int(synth.hp.Decoder.get("N_Frames_Per_Step", 1))
    assert [c["frame_offset"] for c in chunks] == [E * i for i in range(len(chunks))]
    mel_stream = np.concatenate([c["mel_chunk"] for c in chunks], axis=1)

    out = synth.synthesize(texts, spk, max_steps=32)
    for b, o in enumerate(out):
        T = o["mel_length"]
        assert chunks[-1]["mel_lengths"][b] == T
        np.testing.assert_allclose(
            mel_stream[b, :T], o["mel"][:T], atol=1e-5
        )
        # Past the decoded region the emitted mel is masked to zero.
        if mel_stream.shape[1] > T:
            assert np.abs(mel_stream[b, T:]).max() == 0.0


def test_stream_wav_chunks(setup):
    synth, spk = setup
    texts = ["hello there streaming"]
    hop = synth.dsp_cfg.hop
    chunks = list(synth.stream(texts, spk, max_steps=32, segment_steps=16))
    E = 16 * int(synth.hp.Decoder.get("N_Frames_Per_Step", 1))
    for c in chunks:
        assert c["wav_chunk"].shape == (1, E * hop)
        assert np.isfinite(c["wav_chunk"]).all()
    wav = np.concatenate([c["wav_chunk"] for c in chunks], axis=1)[0]
    T = int(chunks[-1]["mel_lengths"][0])
    # The valid region carries signal; the masked pad region is the
    # vocoder's rendering of the silence floor (tiny amplitude).
    if T * hop < len(wav):
        assert (
            np.abs(wav[T * hop:]).mean() <= np.abs(wav[: T * hop]).mean() + 1e-3
        )


def test_stream_pcm16(setup):
    synth, spk = setup
    chunks = list(
        synth.stream(["hello"], spk, max_steps=32, segment_steps=16,
                     pcm16=True)
    )
    assert all(c["wav_chunk"].dtype == np.int16 for c in chunks)


def test_stream_rejects_cbhg(setup, tiny_hp):
    lh = {k: (dict(v) if isinstance(v, dict) else v)
          for k, v in dict(tiny_hp.Linear_Head).items()}
    hp = tiny_hp.replace(Linear_Head={"Type": "CBHG"})
    models = trainer_lib.build_models(hp)
    synth_c = Synthesizer.__new__(Synthesizer)  # no init compile needed
    synth_c.hp = hp
    synth_c.models = models
    with pytest.raises(NotImplementedError):
        next(synth_c.stream(["x"], np.zeros(16, np.float32)))
    del lh


def test_stream_segment_too_short_raises(setup):
    synth, spk = setup
    with pytest.raises(ValueError):
        # 4 steps < postnet+linear+vocoder right-context need.
        next(synth.stream(["hello"], spk, max_steps=32, segment_steps=4))


def test_stream_respects_max_steps_cap(setup):
    """The streaming decode bucket rounds up to whole segments, but
    decoded lengths stay capped at the caller's max_steps budget -
    matching the batched infer at the same cap (review finding)."""
    synth, spk = setup
    r = int(synth.hp.Decoder.get("N_Frames_Per_Step", 1))
    # max_steps=24 with segment_steps=16 -> bucket rounds to 32 steps,
    # but no row may report more than (24 // r) * r frames.
    chunks = list(synth.stream(["hello there friend"], spk, max_steps=24,
                               segment_steps=16))
    cap_frames = (24 // r) * r
    assert chunks[-1]["mel_lengths"].max() <= cap_frames


def test_stream_mel_not_fetched_by_default(setup):
    synth, spk = setup
    chunks = list(synth.stream(["hi"], spk, max_steps=32, segment_steps=16))
    assert all("mel_chunk" not in c for c in chunks)


def test_stream_matches_batch_under_int8(setup, tiny_hp):
    """quantize='int8' threads the SAME quantized fused weights into the
    early-exit chunk body and the streaming segment driver, so streamed mel
    must still equal the batched mel exactly."""
    synth_f32, spk = setup
    state_like = (synth_f32.params, synth_f32.batch_stats)
    synth = Synthesizer(tiny_hp, *state_like, quantize="int8")
    texts = ["hello there", "hi"]
    chunks = list(synth.stream(texts, spk, max_steps=32, segment_steps=16,
                               return_mel=True))
    mel_stream = np.concatenate([c["mel_chunk"] for c in chunks], axis=1)
    out = synth.synthesize(texts, spk, max_steps=32)
    for b, o in enumerate(out):
        T = o["mel_length"]
        assert chunks[-1]["mel_lengths"][b] == T
        np.testing.assert_allclose(mel_stream[b, :T], o["mel"][:T], atol=1e-5)


def test_stream_gl_warm_start_opt_in(setup):
    """gl_warm_start=True (RTISI-style init, opt-in — measured a quality
    no-op and rejected as default, PROFILE.md "Streaming GL warm start")
    keeps the streaming contract: mel chunks stay EXACTLY the batched
    values (warm start touches only the vocoder init), wav chunks stay
    finite and close to the crossfade-only stream (same GL fixed-point
    family, different init)."""
    synth, spk = setup
    texts = ["warm start check", "hi"]
    warm = list(synth.stream(texts, spk, max_steps=32, segment_steps=16,
                             return_mel=True, gl_warm_start=True))
    cold = list(synth.stream(texts, spk, max_steps=32, segment_steps=16,
                             return_mel=True, gl_warm_start=False))
    assert len(warm) == len(cold)
    mel_w = np.concatenate([c["mel_chunk"] for c in warm], axis=1)
    mel_c = np.concatenate([c["mel_chunk"] for c in cold], axis=1)
    np.testing.assert_allclose(mel_w, mel_c, atol=1e-6)
    wav_w = np.concatenate([c["wav_chunk"] for c in warm], axis=1)
    wav_c = np.concatenate([c["wav_chunk"] for c in cold], axis=1)
    assert np.isfinite(wav_w).all()
    assert wav_w.shape == wav_c.shape
    # The first window has no predecessor: its init is gated to the
    # zero-phase start, so the first emitted block matches closely.
    hop = synth.dsp_cfg.hop
    E = 16 * int(synth.hp.Decoder.get("N_Frames_Per_Step", 1))
    rms = float(np.sqrt((wav_c[:, : E * hop] ** 2).mean()))
    diff0 = float(np.abs(wav_w[:, : E * hop] - wav_c[:, : E * hop]).max())
    assert diff0 <= max(0.05 * rms, 1e-4), (diff0, rms)
