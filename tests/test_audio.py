"""DSP golden tests: JAX front-end vs numpy/scipy oracle at <=1e-4.

Covers BASELINE config 1 (mel extraction + Griffin-Lim resynthesis) and the
parity target "bit-matched mel extraction within 1e-4" (BASELINE.json:5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.audio import oracle, dsp, wav_io
from multi_speaker_tts_tpu.audio.dsp import DSPConfig
from multi_speaker_tts_tpu.audio.mel_filterbank import mel_filterbank


@pytest.fixture(scope="module")
def cfg(hp):
    return DSPConfig.from_hp(hp)


def test_mel_filterbank_shape_and_coverage(hp):
    basis = mel_filterbank(22050, 1024, 80)
    assert basis.shape == (80, 513)
    assert np.all(basis >= 0)
    # Every mel band has nonzero support; interior fft bins are covered.
    assert np.all(basis.sum(axis=1) > 0)
    covered = basis.sum(axis=0)
    assert np.count_nonzero(covered[1:-1] == 0) < 5


def test_hann_window_matches(cfg):
    np.testing.assert_allclose(
        np.asarray(dsp.hann_window(cfg.n_fft)), oracle.hann_window(cfg.n_fft),
        atol=1e-6,
    )


def test_preemphasis_roundtrip_oracle(speech_like_wav):
    pre = oracle.preemphasis(speech_like_wav, 0.97)
    back = oracle.inv_preemphasis(pre, 0.97)
    np.testing.assert_allclose(back, speech_like_wav, atol=1e-5)


def test_preemphasis_jax_matches_oracle(speech_like_wav):
    got = np.asarray(dsp.preemphasis(jnp.asarray(speech_like_wav), 0.97))
    want = oracle.preemphasis(speech_like_wav, 0.97)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_inv_preemphasis_jax_matches_oracle(speech_like_wav):
    pre = oracle.preemphasis(speech_like_wav, 0.97)
    got = np.asarray(dsp.inv_preemphasis(jnp.asarray(pre), 0.97))
    want = oracle.inv_preemphasis(pre.astype(np.float64), 0.97)
    # IIR with pole 0.97 amplifies f32 rounding; 1e-4 on a ~[-0.5,0.5] signal.
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_stft_frames_match_oracle(cfg, speech_like_wav):
    got = np.asarray(dsp.frame_signal(jnp.asarray(speech_like_wav), cfg.n_fft, cfg.hop))
    want = oracle.frame_signal(speech_like_wav, cfg.n_fft, cfg.hop)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_stft_magnitude_matches_oracle(cfg, speech_like_wav):
    got = np.asarray(dsp.stft_magnitude(jnp.asarray(speech_like_wav), cfg.n_fft, cfg.hop))
    want = np.abs(oracle.stft(speech_like_wav, cfg.n_fft, cfg.hop))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_melspectrogram_parity_1e4(hp, cfg, speech_like_wav):
    """The headline parity target: mel extraction within 1e-4."""
    got = np.asarray(dsp.melspectrogram(jnp.asarray(speech_like_wav), cfg))
    want = oracle.melspectrogram(speech_like_wav, hp)
    assert got.shape == want.shape == (cfg.num_frames(len(speech_like_wav)), 80)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_spectrogram_parity(hp, cfg, speech_like_wav):
    """Linear spectrogram: f32 FFT noise near the -100 dB floor makes a
    global 1e-4 unattainable in float32 (the f64 oracle itself differs from
    a float32 numpy pipeline by ~2e-4 there), so assert 1e-4 on the vast
    majority of bins and a tight f32 bound on the worst bin. The contractual
    1e-4 target (BASELINE.json:5) is on *mel* extraction, tested above."""
    got = np.asarray(dsp.spectrogram(jnp.asarray(speech_like_wav), cfg))
    want = oracle.spectrogram(speech_like_wav, hp)
    assert got.shape == want.shape
    err = np.abs(got - want)
    assert err.max() < 5e-4
    assert (err > 1e-4).mean() < 0.01


def test_spectrogram_algorithmic_parity_x64(hp, cfg, speech_like_wav):
    """Under float64 the JAX spectrogram matches the oracle to 1e-6,
    proving the residual f32 difference above is rounding, not algorithm."""
    with jax.enable_x64():
        got = np.asarray(
            dsp.spectrogram(jnp.asarray(speech_like_wav, jnp.float64), cfg)
        )
    want = oracle.spectrogram(speech_like_wav, hp)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_normalize_denormalize_roundtrip():
    S = np.random.default_rng(0).uniform(-120, 10, size=(50, 80))
    norm = oracle.normalize(S, -100.0)
    assert norm.min() >= 0.0 and norm.max() <= 1.0
    denorm = oracle.denormalize(norm, -100.0)
    clipped = np.clip(S, -100.0, 0.0)
    np.testing.assert_allclose(denorm, clipped, atol=1e-10)
    jnorm = np.asarray(dsp.normalize(jnp.asarray(S), -100.0))
    np.testing.assert_allclose(jnorm, norm, atol=1e-6)


def test_istft_matches_oracle(cfg, speech_like_wav):
    spec = oracle.stft(speech_like_wav, cfg.n_fft, cfg.hop)
    length = cfg.hop * (spec.shape[0] - 1)
    got = np.asarray(
        dsp.istft(jnp.asarray(spec.astype(np.complex64)), cfg.n_fft, cfg.hop, length)
    )
    want = oracle.istft(spec, cfg.n_fft, cfg.hop, length)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_istft_inverts_stft(cfg, speech_like_wav):
    spec = oracle.stft(speech_like_wav, cfg.n_fft, cfg.hop)
    rec = oracle.istft(spec, cfg.n_fft, cfg.hop, len(speech_like_wav))
    # Perfect reconstruction away from the unpadded tail.
    n = len(speech_like_wav) - cfg.n_fft
    np.testing.assert_allclose(rec[:n], speech_like_wav[:n], atol=1e-6)


def test_griffin_lim_jax_matches_oracle_few_iters(cfg, speech_like_wav):
    mag = np.abs(oracle.stft(speech_like_wav, cfg.n_fft, cfg.hop))[:40]
    length = cfg.hop * (mag.shape[0] - 1)
    want = oracle.griffin_lim(mag, cfg.n_fft, cfg.hop, 4, length)
    got = np.asarray(
        dsp.griffin_lim(jnp.asarray(mag, jnp.float32), cfg.n_fft, cfg.hop, 4, length)
    )
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_griffin_lim_resynthesis_quality(hp, cfg, speech_like_wav):
    """BASELINE config 1: spectrogram -> Griffin-Lim -> wav reproduces the
    signal's spectral envelope (mel-domain L1 after resynthesis is small)."""
    S = oracle.spectrogram(speech_like_wav, hp)
    wav_rec = np.asarray(dsp.inv_spectrogram(jnp.asarray(S), cfg))
    assert np.all(np.isfinite(wav_rec))
    mel_orig = oracle.melspectrogram(speech_like_wav, hp)
    mel_rec = oracle.melspectrogram(wav_rec, hp)
    T = min(mel_orig.shape[0], mel_rec.shape[0])
    l1 = np.mean(np.abs(mel_orig[:T] - mel_rec[:T]))
    assert l1 < 0.05, f"resynthesis mel L1 too high: {l1}"


def test_batched_melspectrogram(cfg, speech_like_wav):
    """Batched (B, L) front-end gives identical rows as per-item calls."""
    wav = speech_like_wav[: 4 * cfg.hop * 50]
    batch = np.stack([wav, wav * 0.5])
    out = np.asarray(dsp.melspectrogram(jnp.asarray(batch), cfg))
    single = np.asarray(dsp.melspectrogram(jnp.asarray(wav), cfg))
    np.testing.assert_allclose(out[0], single, atol=1e-6)


def test_trim_silence(speech_like_wav):
    trimmed = oracle.trim_silence(speech_like_wav, top_db=40.0)
    assert len(trimmed) < len(speech_like_wav)
    assert len(trimmed) > 0.5 * len(speech_like_wav)
    peak = np.max(np.abs(speech_like_wav))
    assert np.max(np.abs(trimmed)) == peak


def test_wav_io_roundtrip(tmp_path, speech_like_wav):
    path = tmp_path / "x.wav"
    wav_io.save_wav(path, speech_like_wav, 22050)
    loaded, sr = wav_io.load_wav(path)
    assert sr == 22050
    np.testing.assert_allclose(loaded, speech_like_wav, atol=1e-3)


def test_resample():
    sr_in, sr_out = 48000, 22050
    t = np.arange(sr_in, dtype=np.float64) / sr_in
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = wav_io.resample(wav, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 2
    t2 = np.arange(len(out), dtype=np.float64) / sr_out
    want = np.sin(2 * np.pi * 440 * t2)
    n = len(out) - 100
    np.testing.assert_allclose(out[100:n], want[100:n], atol=5e-3)
