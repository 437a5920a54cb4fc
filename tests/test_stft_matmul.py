"""GEMM-native STFT/ISTFT/Griffin-Lim vs the FFT implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_speaker_tts_tpu.audio import dsp, oracle
from multi_speaker_tts_tpu.ops import stft_matmul as sm


N_FFT, HOP = 256, 64


@pytest.fixture(scope="module")
def wav(speech_like_wav):
    # Crop to a hop multiple for the strided framing path.
    L = (len(speech_like_wav) // HOP) * HOP
    return speech_like_wav[:L]


def test_frame_strided_matches_gather(wav):
    a = np.asarray(sm.frame_strided(jnp.asarray(wav), N_FFT, HOP))
    b = np.asarray(dsp.frame_signal(jnp.asarray(wav), N_FFT, HOP))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_stft_magnitude_matmul_matches_fft(wav):
    a = np.asarray(sm.stft_magnitude_matmul(jnp.asarray(wav), N_FFT, HOP))
    win = oracle.hann_window(N_FFT)
    b = np.abs(oracle.stft(wav, N_FFT, HOP))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_overlap_add_matches_istft(wav):
    spec = oracle.stft(wav, N_FFT, HOP)
    T = spec.shape[0]
    length = HOP * (T - 1)
    frames = np.fft.irfft(spec, n=N_FFT, axis=-1).astype(np.float32)
    a = np.asarray(sm.overlap_add(jnp.asarray(frames), N_FFT, HOP, length))
    b = oracle.istft(spec, N_FFT, HOP, length)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_idft_matrices_invert_dft():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, N_FFT)).astype(np.float32)
    Wr, Wi = sm._dft_matrices(N_FFT)
    Vr, Vi = sm._idft_matrices(N_FFT)
    re, im = x @ Wr, x @ Wi
    back = re @ Vr + im @ Vi
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_griffin_lim_matmul_matches_fft_gl(wav):
    mag = np.abs(oracle.stft(wav, N_FFT, HOP))[:60].astype(np.float32)
    length = HOP * (mag.shape[0] - 1)
    a = np.asarray(
        sm.griffin_lim_matmul(jnp.asarray(mag), N_FFT, HOP, 8, length)
    )
    b = np.asarray(dsp.griffin_lim(jnp.asarray(mag), N_FFT, HOP, 8, length))
    # Same iteration, different transform algebra: close in f32.
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_griffin_lim_matmul_batched(wav):
    mag = np.abs(oracle.stft(wav, N_FFT, HOP))[:40].astype(np.float32)
    batch = np.stack([mag, mag * 0.5])
    length = HOP * (mag.shape[0] - 1)
    out = np.asarray(
        sm.griffin_lim_matmul(jnp.asarray(batch), N_FFT, HOP, 4, length)
    )
    single = np.asarray(
        sm.griffin_lim_matmul(jnp.asarray(mag), N_FFT, HOP, 4, length)
    )
    assert out.shape == (2, length)
    np.testing.assert_allclose(out[0], single, atol=1e-5)


def test_griffin_lim_matmul_resynthesis_quality(hp, wav):
    """End-to-end quality gate: GEMM-GL resynthesis mel-L1 stays small, and
    bf16 ('default') precision stays close to f32."""
    cfg = dsp.DSPConfig.from_hp(hp)
    S = oracle.spectrogram(wav, hp)
    S_db = oracle.denormalize(S, cfg.min_level_db)
    mag = oracle.db_to_amp(S_db + cfg.ref_level_db) ** cfg.power
    T = (mag.shape[0] // 4) * 4 + 1
    mag = mag[:T].astype(np.float32)
    length = cfg.hop * (T - 1)

    for precision, tol in [("highest", 0.06), ("default", 0.08)]:
        y = np.asarray(
            sm.griffin_lim_matmul(
                jnp.asarray(mag), cfg.n_fft, cfg.hop, 30, length, precision
            )
        )
        y = np.asarray(dsp.inv_preemphasis(jnp.asarray(y), cfg.preemphasis))
        mel_rec = oracle.melspectrogram(y, hp)
        mel_orig = oracle.melspectrogram(wav, hp)
        n = min(mel_rec.shape[0], mel_orig.shape[0], T)
        l1 = np.mean(np.abs(mel_rec[:n] - mel_orig[:n]))
        assert l1 < tol, f"{precision}: mel L1 {l1}"
