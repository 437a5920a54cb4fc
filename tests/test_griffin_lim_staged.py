"""Staged (8-leaf) Griffin-Lim kernel: parity with the dense kernel.

The staged kernel iterates the EXACT same fixed-point map as
``griffin_lim_kernel.griffin_lim_pallas`` (same framing grid, windows,
OLA normalization, crop) - only the DFT factorization differs - so in
f32 the two agree elementwise to float tolerance, on every branch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.ops.griffin_lim_kernel import griffin_lim_pallas
from multi_speaker_tts_tpu.ops.griffin_lim_staged import (
    _staged_operands,
    griffin_lim_staged,
)

N_FFT, HOP = 1024, 256


@pytest.fixture(scope="module")
def mag():
    rng = np.random.default_rng(0)
    return (rng.random((2, 24, N_FFT // 2 + 1)).astype(np.float32)) ** 2


@pytest.mark.parametrize("n_iter", [0, 1, 8])
def test_matches_dense_kernel_f32(mag, n_iter):
    ref = np.asarray(griffin_lim_pallas(
        jnp.asarray(mag), N_FFT, HOP, n_iter,
        compute_dtype="float32", interpret=True,
    ))
    got = np.asarray(griffin_lim_staged(
        jnp.asarray(mag), N_FFT, HOP, n_iter,
        compute_dtype="float32", interpret=True,
    ))
    assert got.shape == ref.shape == (2, HOP * (mag.shape[1] - 1))
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert err < 1e-4, err


def test_matches_dense_kernel_momentum(mag):
    ref = np.asarray(griffin_lim_pallas(
        jnp.asarray(mag), N_FFT, HOP, 6, momentum=0.99,
        compute_dtype="float32", interpret=True,
    ))
    got = np.asarray(griffin_lim_staged(
        jnp.asarray(mag), N_FFT, HOP, 6, momentum=0.99,
        compute_dtype="float32", interpret=True,
    ))
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert err < 1e-4, err


def test_magnitude_permutation_covers_all_bins():
    """Every stored lane pulls a valid one-sided bin; every one-sided bin
    is represented at least once (possibly via its conjugate mirror)."""
    _, _, _, _, perm = _staged_operands("float32")
    assert perm.shape == (640,)
    assert perm.min() >= 0 and perm.max() <= N_FFT // 2
    covered = set()
    for g, c in enumerate((0, 1, 2, 3, 4)):
        for t in range(128):
            k = 8 * t + c
            covered.add(k if k <= N_FFT // 2 else N_FFT - k)
    assert covered == set(range(N_FFT // 2 + 1))


def test_staged_leaf_matrices_reconstruct_dft():
    """The per-class leaf matrices are literally columns k = 8t + c of the
    full DFT matrix (all twiddles folded): multiplying an impulse's leaf
    decomposition through them reproduces np.fft bins exactly."""
    fwd, _, _, _, _ = _staged_operands("float32")
    rng = np.random.default_rng(3)
    x = rng.standard_normal(N_FFT)
    X = np.fft.fft(x)
    xb = x.reshape(8, 128)
    for g, c in enumerate((0, 1, 2, 3, 4)):
        z = sum(xb[j] * np.exp(-2j * np.pi * j * c / 8) for j in range(8))
        Mr, Mi = fwd[g]
        y = (z.real @ Mr - z.imag @ Mi) + 1j * (z.real @ Mi + z.imag @ Mr)
        np.testing.assert_allclose(
            y, X[c::8], rtol=2e-4, atol=2e-4 * np.abs(X).max()
        )


def test_dispatcher_prefers_staged_on_tpu(monkeypatch):
    """griffin_lim_auto routes n_fft=1024 to the staged kernel on TPU
    (source-level check: CPU can't execute the compiled path)."""
    import inspect

    from multi_speaker_tts_tpu.ops import stft_matmul

    src = inspect.getsource(stft_matmul.griffin_lim_auto)
    assert "griffin_lim_staged" in src and "pallas_staged" in src
