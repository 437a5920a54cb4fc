"""Pallas Griffin-Lim kernel vs the GEMM (XLA) implementation (interpret
mode here; the compiled TPU path is driven by bench/verify)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_speaker_tts_tpu.audio import oracle
from multi_speaker_tts_tpu.ops import stft_matmul as sm
from multi_speaker_tts_tpu.ops.griffin_lim_kernel import griffin_lim_pallas

N_FFT, HOP = 256, 64


@pytest.fixture(scope="module")
def mag(speech_like_wav):
    L = (len(speech_like_wav) // HOP) * HOP
    m = np.abs(oracle.stft(speech_like_wav[:L], N_FFT, HOP))[:49]
    return np.stack([m, m * 0.7]).astype(np.float32)  # (2, 49, 129)


def test_gl_kernel_single_iteration_matches_gemm(mag):
    """With one iteration, boundary-handling differences (the kernel re-frames
    real edge samples, the GEMM path crops + reflect-pads per iteration) have
    not propagated: interiors must agree closely."""
    length = HOP * (mag.shape[1] - 1)
    got = np.asarray(
        griffin_lim_pallas(jnp.asarray(mag), N_FFT, HOP, 1, compute_dtype="float32")
    )
    want = np.asarray(
        sm.griffin_lim_matmul(jnp.asarray(mag), N_FFT, HOP, 1, length)
    )
    assert got.shape == want.shape == (2, length)
    np.testing.assert_allclose(
        got[:, N_FFT:-N_FFT], want[:, N_FFT:-N_FFT], atol=2e-3
    )


def test_gl_kernel_resynthesis_quality(mag):
    """Functional gate: the kernel's phase recovery reaches the same spectral
    consistency as the GEMM GL (|STFT(y)| close to the target magnitude)."""
    def consistency(y):
        rec = np.abs(oracle.stft(y, N_FFT, HOP))[: mag.shape[1]]
        tgt = mag[0, : rec.shape[0]]
        return np.abs(rec - tgt).mean() / (np.abs(tgt).mean() + 1e-9)

    length = HOP * (mag.shape[1] - 1)
    y_kernel = np.asarray(
        griffin_lim_pallas(jnp.asarray(mag), N_FFT, HOP, 12, compute_dtype="float32")
    )[0]
    y_gemm = np.asarray(
        sm.griffin_lim_matmul(jnp.asarray(mag), N_FFT, HOP, 12, length)
    )[0]
    c_kernel, c_gemm = consistency(y_kernel), consistency(y_gemm)
    assert np.isfinite(y_kernel).all()
    assert c_kernel < c_gemm * 1.5 + 0.02, (c_kernel, c_gemm)


def test_gl_kernel_bf16_quality(mag, hp):
    """bf16 DFT matrices: resynthesis stays close to the f32 result."""
    got16 = np.asarray(
        griffin_lim_pallas(jnp.asarray(mag), N_FFT, HOP, 6, compute_dtype="bfloat16")
    )
    got32 = np.asarray(
        griffin_lim_pallas(jnp.asarray(mag), N_FFT, HOP, 6, compute_dtype="float32")
    )
    # Same iteration; bf16 transform error must stay bounded.
    scale = np.abs(got32).max()
    assert np.abs(got16 - got32).max() < 0.05 * scale


def test_gl_kernel_reconstructs_nyquist_energy():
    """The Nyquist bin is folded out of the DFT GEMMs and carried as a
    rank-1 term; a magnitude with strong Nyquist content must still be
    reconstructed (a regression that zeroed the bin would pass the other
    tests, which use speech-like spectra with ~no energy there)."""
    n_fft, hop, T = 256, 64, 33
    F = n_fft // 2 + 1
    mag = np.full((1, T, F), 1e-3, np.float32)
    mag[..., -1] = 1.0  # all the energy in the Nyquist bin
    y = np.asarray(
        griffin_lim_pallas(jnp.asarray(mag), n_fft, hop, 8, compute_dtype="float32")
    )[0]
    rec = np.abs(oracle.stft(y, n_fft, hop))[: T - 2]
    # Interior frames recover most of the Nyquist magnitude...
    assert rec[2:, -1].mean() > 0.5, rec[2:, -1].mean()
    # ...and it dominates every other bin, as in the target.
    assert rec[2:, -1].mean() > 10 * rec[2:, :-1].mean()


def test_momentum_gl_converges_tighter(mag):
    """Accelerated (fast) Griffin-Lim (momentum ~0.99) must reach better
    spectral consistency than the plain iteration at the SAME iteration
    count, in all three implementations."""
    from multi_speaker_tts_tpu.audio import dsp

    length = HOP * (mag.shape[1] - 1)

    def consistency(y):
        rec = np.abs(oracle.stft(np.asarray(y), N_FFT, HOP))[: mag.shape[1]]
        tgt = mag[0, : rec.shape[0]]
        return np.abs(rec - tgt).mean() / (np.abs(tgt).mean() + 1e-9)

    m = jnp.asarray(mag)
    for name, fn in [
        ("gemm", lambda mom: sm.griffin_lim_matmul(m, N_FFT, HOP, 12, length,
                                                   momentum=mom)[0]),
        ("fft", lambda mom: dsp.griffin_lim(m, N_FFT, HOP, 12, length,
                                            momentum=mom)[0]),
        ("pallas", lambda mom: griffin_lim_pallas(m, N_FFT, HOP, 12,
                                                  compute_dtype="float32",
                                                  momentum=mom)[0]),
    ]:
        plain, fast = consistency(fn(0.0)), consistency(fn(0.99))
        assert fast < plain, (name, fast, plain)


def test_momentum_gl_pallas_matches_gemm(mag):
    """The kernel's momentum branch computes the same accelerated iteration
    as the GEMM path (f32, interiors)."""
    length = HOP * (mag.shape[1] - 1)
    got = np.asarray(griffin_lim_pallas(
        jnp.asarray(mag), N_FFT, HOP, 4, compute_dtype="float32", momentum=0.99
    ))
    want = np.asarray(sm.griffin_lim_matmul(
        jnp.asarray(mag), N_FFT, HOP, 4, length, momentum=0.99
    ))
    np.testing.assert_allclose(
        got[:, N_FFT:-N_FFT], want[:, N_FFT:-N_FFT], atol=5e-3
    )


def test_gl_kernel_rejects_odd_ratio():
    with pytest.raises(AssertionError, match="even"):
        griffin_lim_pallas(jnp.zeros((1, 8, 97)), 192, 64, 2)


def test_chunked_batch_matches_full():
    """lax.map-chunked kernel calls (the scoped-VMEM fallback for long
    decodes in griffin_lim_auto) produce exactly the full-batch result."""
    import jax

    rng = np.random.default_rng(11)
    n_fft, hop, T, B = 512, 128, 17, 8
    F = n_fft // 2 + 1
    mag = jnp.asarray(rng.uniform(0.0, 1.0, size=(B, T, F)), jnp.float32)
    full = griffin_lim_pallas(mag, n_fft, hop, 4, interpret=True)
    chunked = jax.lax.map(
        lambda m: griffin_lim_pallas(m, n_fft, hop, 4, interpret=True),
        mag.reshape(2, B // 2, T, F),
    ).reshape(B, -1)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_pallas_gl_batch_cap_calibration():
    from multi_speaker_tts_tpu.ops.stft_matmul import _pallas_gl_max_batch

    # Observed compiler behavior (v5e, n_fft=1024, hop=256): B=16 fits at
    # T=1000, B=64 does not; short decodes allow large batches.
    assert _pallas_gl_max_batch(1000, 1024, 256) >= 16
    assert _pallas_gl_max_batch(1000, 1024, 256) < 64
    assert _pallas_gl_max_batch(401, 1024, 256) >= 128


def test_pallas_gl_momentum_cap_scales_base_term():
    """The momentum variant's 3 extra (T, Fp) f32 carries scale the
    T-proportional base term, not the per-batch term (ADVICE r2): the cap
    must shrink with T under momentum, and must stay positive at T=1000
    (where the old max_b//2 heuristic was calibrated)."""
    from multi_speaker_tts_tpu.ops.stft_matmul import _pallas_gl_max_batch

    # T=1000: the momentum live set alone (~1.6 x 14.9 MB) exceeds the
    # 16 MB scoped limit - no batch fits; the dispatcher must fall back to
    # GEMM instead of failing to compile at serve time (the old max_b//2
    # heuristic claimed 9 rows would fit).
    plain = _pallas_gl_max_batch(1000, 1024, 256)
    mom = _pallas_gl_max_batch(1000, 1024, 256, momentum=0.99)
    assert mom <= 0 < plain
    # Moderate T: momentum shrinks the cap but stays usable.
    mid_plain = _pallas_gl_max_batch(600, 1024, 256)
    mid_mom = _pallas_gl_max_batch(600, 1024, 256, momentum=0.99)
    assert 0 < mid_mom < mid_plain
    # Short T: the absolute overhead is small; the cap must NOT be halved
    # as the old batch-term heuristic did.
    short_plain = _pallas_gl_max_batch(200, 1024, 256)
    short_mom = _pallas_gl_max_batch(200, 1024, 256, momentum=0.99)
    assert short_mom > short_plain // 2


def test_chunk_plan_pads_awkward_batches():
    """Prime/awkward batch sizes keep the kernel by padding up to equal
    chunks instead of dropping to the ~8x slower GEMM path (ADVICE r2)."""
    from multi_speaker_tts_tpu.ops.stft_matmul import _chunk_plan

    n, c = _chunk_plan(61, 18)  # prime batch
    assert n * c >= 61 and c <= 18
    assert n * c - 61 <= 3  # minimal padding (4 chunks of 16)
    n, c = _chunk_plan(64, 16)
    assert (n, c) == (4, 16)  # exact divisor: no padding
    n, c = _chunk_plan(8, 100)
    assert (n, c) == (1, 8)  # fits in one call


def test_chunked_padded_batch_matches_unpadded():
    """Zero-padded rows through the chunked path must not change the real
    rows (the dispatcher slices them off)."""
    import jax

    rng = np.random.default_rng(13)
    n_fft, hop, T, B = 512, 128, 17, 5
    F = n_fft // 2 + 1
    mag = jnp.asarray(rng.uniform(0.0, 1.0, size=(B, T, F)), jnp.float32)
    plain = griffin_lim_pallas(mag, n_fft, hop, 4, interpret=True)
    mag_p = jnp.concatenate([mag, jnp.zeros((1, T, F), jnp.float32)], axis=0)
    chunked = jax.lax.map(
        lambda m: griffin_lim_pallas(m, n_fft, hop, 4, interpret=True),
        mag_p.reshape(2, 3, T, F),
    ).reshape(6, -1)[:B]
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(chunked))
