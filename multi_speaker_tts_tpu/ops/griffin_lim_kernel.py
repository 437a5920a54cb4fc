"""Pallas TPU kernel: batched Griffin-Lim with VMEM-resident state.

BASELINE.json:5 mandates Griffin-Lim as "a batched iterative STFT/iSTFT
Pallas kernel so text-to-waveform never leaves the chip". The XLA GEMM
version (``ops.stft_matmul``) already avoids FFTs; this kernel additionally
keeps the (re, im) spectra and the overlap-add accumulator in VMEM across
ALL iterations - per utterance, HBM sees one magnitude read and one waveform
write, nothing in between.

Layout tricks (all forced by Mosaic's alignment rules, cf. mel_kernel.py):

- Frames live as k = n_fft/hop column blocks of shape (T, hop); hop is a
  lane multiple.
- Overlap-add and re-framing need +-i row shifts, which are expressed with
  ``pltpu.roll`` (supported primitive) instead of sublane-offset slices
  (unsupported).
- The analysis window is folded into the forward DFT matrices, the synthesis
  window + 1/N into the inverse ones. Matrices are held in bf16 (halves
  VMEM; Griffin-Lim's alternating projections tolerate it - quality-gated
  in tests), accumulation in f32.

Grid: one program per batch item; weight matrices have constant index maps
and stay resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_speaker_tts_tpu.ops.stft_matmul import _dft_matrices, _idft_matrices, _hann

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _gl_operands(n_fft: int, hop: int, dtype_str: str):
    """Windowed DFT/IDFT matrices, lane-padded, plus metadata."""
    dtype = np.dtype(dtype_str)
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    win = _hann(n_fft).astype(np.float64)
    Wr, Wi = _dft_matrices(n_fft)
    Vr, Vi = _idft_matrices(n_fft)
    Wr_p = np.zeros((n_fft, Fp), np.float64)
    Wi_p = np.zeros((n_fft, Fp), np.float64)
    Wr_p[:, :F] = win[:, None] * Wr
    Wi_p[:, :F] = win[:, None] * Wi
    Vr_p = np.zeros((Fp, n_fft), np.float64)
    Vi_p = np.zeros((Fp, n_fft), np.float64)
    Vr_p[:F] = Vr * win[None, :]  # synthesis window folded in
    Vi_p[:F] = Vi * win[None, :]
    return (
        Wr_p.astype(dtype),
        Wi_p.astype(dtype),
        Vr_p.astype(dtype),
        Vi_p.astype(dtype),
        Fp,
    )


def _wsum_rows(n_fft: int, hop: int, T: int, rows_pad: int) -> np.ndarray:
    """Window-square OLA normalizer in (rows, hop) layout, f64->f32."""
    k = n_fft // hop
    wsq = (_hann(n_fft).astype(np.float64) ** 2).reshape(k, hop)
    acc = np.zeros((rows_pad, hop), np.float64)
    for i in range(k):
        acc[i : i + T] += wsq[i]
    return (1.0 / np.maximum(acc, 1e-11)).astype(np.float32)


def _gl_kernel(
    mag_ref,  # (1, T, Fp) magnitude, VMEM
    wr_ref, wi_ref,  # (n_fft, Fp) analysis (windowed) DFT
    vr_ref, vi_ref,  # (Fp, n_fft) synthesis (windowed, 1/N) inverse DFT
    wsum_ref,  # (rows_pad, hop) OLA normalizer
    out_ref,  # (1, T - 1, hop) waveform rows, VMEM
    *,
    T: int,
    n_fft: int,
    hop: int,
    n_iter: int,
    rows_pad: int,
):
    k = n_fft // hop
    mag = mag_ref[0, :, :]  # (T, Fp)
    cdtype = wr_ref.dtype

    def istft_rows(re, im):
        """(re, im) -> OLA'd signal rows (rows_pad, hop).

        The synthesis transform is computed one (T, hop) column block at a
        time instead of materializing the full (T, n_fft) frame buffer:
        same FLOPs (the IDFT GEMM is simply split along its output lanes),
        but ~T*n_fft*4 bytes less scoped-VMEM stack - the difference
        between fitting and not fitting long decodes (T=1000) under the
        16 MB scoped limit."""
        rec = re.astype(cdtype)
        imc = im.astype(cdtype)
        acc = jnp.zeros((rows_pad, hop), jnp.float32)
        for i in range(k):
            block = jnp.dot(
                rec, vr_ref[:, i * hop : (i + 1) * hop],
                preferred_element_type=jnp.float32,
            ) + jnp.dot(
                imc, vi_ref[:, i * hop : (i + 1) * hop],
                preferred_element_type=jnp.float32,
            )  # (T, hop), synthesis-windowed, lane-aligned
            padded = jnp.pad(block, ((0, rows_pad - T), (0, 0)))
            acc = acc + pltpu.roll(padded, i, 0)
        return acc * wsum_ref[:, :]

    def stft_of(rows):
        """Signal rows -> (re, im), analysis-windowed DFT."""
        re = jnp.zeros((T, wr_ref.shape[1]), jnp.float32)
        im = jnp.zeros((T, wr_ref.shape[1]), jnp.float32)
        for i in range(k):
            # rows[i : i + T] via a non-negative circular shift (pltpu.roll
            # rejects negative shifts): roll by rows_pad - i.
            rows_i = pltpu.roll(rows, (rows_pad - i) % rows_pad, 0)[:T, :]
            re = re + jnp.dot(
                rows_i.astype(cdtype),
                wr_ref[i * hop : (i + 1) * hop, :],
                preferred_element_type=jnp.float32,
            )
            im = im + jnp.dot(
                rows_i.astype(cdtype),
                wi_ref[i * hop : (i + 1) * hop, :],
                preferred_element_type=jnp.float32,
            )
        return re, im

    def body(_, carry):
        re, im = carry
        rows = istft_rows(re, im)
        re2, im2 = stft_of(rows)
        scale = mag / jnp.maximum(jnp.sqrt(re2 * re2 + im2 * im2 + 1e-12), 1e-11)
        return re2 * scale, im2 * scale

    re, im = jax.lax.fori_loop(0, n_iter, body, (mag, jnp.zeros_like(mag)))
    rows = istft_rows(re, im)
    # Centered crop: skip n_fft/2 = (k/2)*hop samples -> k/2 rows.
    out_ref[0, :, :] = pltpu.roll(rows, rows_pad - k // 2, 0)[: T - 1, :]


def griffin_lim_pallas(
    magnitude: jax.Array,  # (B, T, F) linear magnitude (already **power)
    n_fft: int,
    hop: int,
    n_iter: int,
    interpret: bool | None = None,
    compute_dtype: str = "bfloat16",
) -> jax.Array:
    """Batched VMEM-resident Griffin-Lim: (B, T, F) -> (B, hop * (T - 1)).

    Same fixed-point iteration and zero-phase init as
    ``stft_matmul.griffin_lim_matmul``; quality-gated against it in tests.
    """
    assert n_fft % hop == 0
    k = n_fft // hop
    assert k % 2 == 0, "centered crop needs an even n_fft/hop ratio"
    B, T, F = magnitude.shape
    assert F == n_fft // 2 + 1

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret:
        assert hop % 128 == 0, f"compiled kernel requires hop % 128 == 0, got {hop}"

    Wr, Wi, Vr, Vi, Fp = _gl_operands(n_fft, hop, compute_dtype)
    mag_p = jnp.pad(magnitude.astype(jnp.float32), ((0, 0), (0, 0), (0, Fp - F)))
    rows_pad = _round_up(T + k - 1, 8)
    wsum = _wsum_rows(n_fft, hop, T, rows_pad)

    kernel = functools.partial(
        _gl_kernel, T=T, n_fft=n_fft, hop=hop, n_iter=n_iter, rows_pad=rows_pad
    )
    const = lambda b: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, Fp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, Fp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, Fp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, n_fft), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, n_fft), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_pad, hop), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T - 1, hop), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T - 1, hop), jnp.float32),
        interpret=interpret,
    )(
        mag_p,
        jnp.asarray(Wr), jnp.asarray(Wi), jnp.asarray(Vr), jnp.asarray(Vi),
        jnp.asarray(wsum),
    )
    return out.reshape(B, (T - 1) * hop)
