"""Fused Pallas mel kernel vs the reference JAX front-end (interpret mode on
the CPU test mesh; the real-TPU path is exercised by bench/verify)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_speaker_tts_tpu.audio import dsp
from multi_speaker_tts_tpu.hparams import default_hparams
from multi_speaker_tts_tpu.ops.mel_kernel import melspectrogram_pallas


@pytest.fixture(scope="module")
def cfg():
    # Small n_fft keeps interpret-mode runtime sane; same structure as prod.
    hp = default_hparams(
        Sound={"Frame_Length": 256, "Frame_Shift": 64, "Spectrogram_Dim": 129,
               "Sample_Rate": 16000}
    )
    return dsp.DSPConfig.from_hp(hp)


@pytest.fixture(scope="module")
def wav(cfg, speech_like_wav):
    L = (16000 // cfg.hop) * cfg.hop
    return np.stack([speech_like_wav[:L], speech_like_wav[1000 : 1000 + L]])


def test_mel_kernel_matches_dsp(cfg, wav):
    got = np.asarray(melspectrogram_pallas(jnp.asarray(wav), cfg, tile_t=16))
    want = np.asarray(dsp.melspectrogram(jnp.asarray(wav), cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mel_kernel_nondivisible_tiles(cfg, wav):
    """T not a multiple of tile_t exercises the zero-padded tail tile."""
    got = np.asarray(melspectrogram_pallas(jnp.asarray(wav), cfg, tile_t=48))
    want = np.asarray(dsp.melspectrogram(jnp.asarray(wav), cfg))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mel_kernel_rejects_bad_length(cfg):
    with pytest.raises(AssertionError, match="hop multiple"):
        melspectrogram_pallas(jnp.zeros((1, 1001)), cfg)


def test_mel_kernel_non_lane_aligned_hop(speech_like_wav):
    """hop=200 (16 kHz house style, NOT a 128 multiple): runs the fused
    kernel via lane-padded row blocks instead of silently falling back
    (VERDICT round-1 item 7)."""
    hp = default_hparams(
        Sound={"Frame_Length": 800, "Frame_Shift": 200, "Spectrogram_Dim": 401,
               "Sample_Rate": 16000}
    )
    cfg = dsp.DSPConfig.from_hp(hp)
    L = (16000 // cfg.hop) * cfg.hop
    wav = np.stack([speech_like_wav[:L], speech_like_wav[500 : 500 + L]])
    got = np.asarray(melspectrogram_pallas(jnp.asarray(wav), cfg, tile_t=16))
    want = np.asarray(dsp.melspectrogram(jnp.asarray(wav), cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)
