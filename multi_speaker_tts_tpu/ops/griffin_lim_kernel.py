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
    """Windowed DFT/IDFT matrices for bins 0..n_fft/2-1, lane-padded, plus
    the Nyquist bin's analysis/synthesis vectors in (k, hop) row layout.

    The Nyquist bin (f = n_fft/2) of a real signal is itself real: its
    sin column in both transforms is identically zero. Folding it OUT of
    the GEMMs drops the padded lane count from round_up(F, 128) to
    n_fft/2 (640 -> 512 at n_fft=1024) - 20% fewer MXU flops for exactly
    the same math - and the bin is carried as a cheap rank-1 VPU term
    (cos(pi n) = (-1)^n), in f32."""
    dtype = np.dtype(dtype_str)
    F = n_fft // 2 + 1
    Fm = F - 1  # main GEMM bins 0..Fm-1; Nyquist folded out
    Fp = _round_up(Fm, LANE)
    win = _hann(n_fft).astype(np.float64)
    Wr, Wi = _dft_matrices(n_fft)
    Vr, Vi = _idft_matrices(n_fft)
    Wr_p = np.zeros((n_fft, Fp), np.float64)
    Wi_p = np.zeros((n_fft, Fp), np.float64)
    Wr_p[:, :Fm] = win[:, None] * Wr[:, :Fm]
    Wi_p[:, :Fm] = win[:, None] * Wi[:, :Fm]
    Vr_p = np.zeros((Fp, n_fft), np.float64)
    Vi_p = np.zeros((Fp, n_fft), np.float64)
    Vr_p[:Fm] = Vr[:Fm] * win[None, :]  # synthesis window folded in
    Vi_p[:Fm] = Vi[:Fm] * win[None, :]
    k = n_fft // hop
    sign = (-1.0) ** np.arange(n_fft)  # cos(pi n), exact
    rows8 = _round_up(k, 8)
    wny = np.zeros((rows8, hop), np.float64)  # analysis: re_ny = sum rows*wny
    vny = np.zeros((rows8, hop), np.float64)  # synthesis: weight 1, cos/N
    wny[:k] = (win * sign).reshape(k, hop)
    vny[:k] = (sign * win / n_fft).reshape(k, hop)
    return (
        Wr_p.astype(dtype),
        Wi_p.astype(dtype),
        Vr_p.astype(dtype),
        Vi_p.astype(dtype),
        wny.astype(np.float32),
        vny.astype(np.float32),
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
    mag_ref,  # (1, T, Fp) magnitude bins 0..Fp-1, VMEM
    ny_ref,  # (1, T, LANE) Nyquist-bin magnitude in lane 0, VMEM
    wr_ref, wi_ref,  # (n_fft, Fp) analysis (windowed) DFT
    vr_ref, vi_ref,  # (Fp, n_fft) synthesis (windowed, 1/N) inverse DFT
    wny_ref, vny_ref,  # (rows8, hop) Nyquist analysis/synthesis vectors
    wsum_ref,  # (rows_pad, hop) OLA normalizer
    out_ref,  # (1, T - 1, hop) waveform rows, VMEM
    *,
    T: int,
    n_fft: int,
    hop: int,
    n_iter: int,
    rows_pad: int,
    momentum: float,
):
    k = n_fft // hop
    mag = mag_ref[0, :, :]  # (T, Fp)
    mag_ny = ny_ref[0, :, :1]  # (T, 1)
    cdtype = wr_ref.dtype

    def istft_rows(re, im, rny):
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
            block = block + rny * vny_ref[i : i + 1, :]  # Nyquist rank-1 term
            padded = jnp.pad(block, ((0, rows_pad - T), (0, 0)))
            acc = acc + pltpu.roll(padded, i, 0)
        return acc * wsum_ref[:, :]

    def stft_of(rows):
        """Signal rows -> (re, im, re_nyquist), analysis-windowed DFT."""
        re = jnp.zeros((T, wr_ref.shape[1]), jnp.float32)
        im = jnp.zeros((T, wr_ref.shape[1]), jnp.float32)
        rny = jnp.zeros((T, 1), jnp.float32)
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
            rny = rny + jnp.sum(
                rows_i * wny_ref[i : i + 1, :], axis=-1, keepdims=True
            )
        return re, im, rny

    if momentum > 0.0:
        # Accelerated ("fast") Griffin-Lim: extrapolate the projected
        # spectrum against the previous projection (3 extra carries).
        beta = momentum / (1.0 + momentum)

        def body_m(_, carry):
            re, im, rny, pre, pim, prny = carry
            rows = istft_rows(re, im, rny)
            re2, im2, rny2 = stft_of(rows)
            ere, eim, erny = re2 - beta * pre, im2 - beta * pim, rny2 - beta * prny
            scale = mag / jnp.maximum(
                jnp.sqrt(ere * ere + eim * eim + 1e-12), 1e-11
            )
            sny = mag_ny / jnp.maximum(jnp.sqrt(erny * erny + 1e-12), 1e-11)
            return ere * scale, eim * scale, erny * sny, re2, im2, rny2

        zero = jnp.zeros_like(mag)
        re, im, rny, _, _, _ = jax.lax.fori_loop(
            0, n_iter, body_m,
            (mag, zero, mag_ny, zero, zero, jnp.zeros_like(mag_ny)),
        )
        rows = istft_rows(re, im, rny)
        out_ref[0, :, :] = pltpu.roll(rows, rows_pad - k // 2, 0)[: T - 1, :]
        return

    def body(_, carry):
        re, im, rny = carry
        rows = istft_rows(re, im, rny)
        re2, im2, rny2 = stft_of(rows)
        scale = mag / jnp.maximum(jnp.sqrt(re2 * re2 + im2 * im2 + 1e-12), 1e-11)
        sny = mag_ny / jnp.maximum(jnp.sqrt(rny2 * rny2 + 1e-12), 1e-11)
        return re2 * scale, im2 * scale, rny2 * sny

    re, im, rny = jax.lax.fori_loop(
        0, n_iter, body, (mag, jnp.zeros_like(mag), mag_ny)
    )
    rows = istft_rows(re, im, rny)
    # Centered crop: skip n_fft/2 = (k/2)*hop samples -> k/2 rows.
    out_ref[0, :, :] = pltpu.roll(rows, rows_pad - k // 2, 0)[: T - 1, :]


def griffin_lim_pallas(
    magnitude: jax.Array,  # (B, T, F) linear magnitude (already **power)
    n_fft: int,
    hop: int,
    n_iter: int,
    interpret: bool | None = None,
    compute_dtype: str = "bfloat16",
    momentum: float = 0.0,
) -> jax.Array:
    """Batched VMEM-resident Griffin-Lim: (B, T, F) -> (B, hop * (T - 1)).

    Same fixed-point iteration and zero-phase init as
    ``stft_matmul.griffin_lim_matmul``; quality-gated against it in tests.
    ``momentum`` > 0 = the accelerated variant (see ``dsp.griffin_lim``).
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

    Wr, Wi, Vr, Vi, wny, vny, Fp = _gl_operands(n_fft, hop, compute_dtype)
    mag_f = magnitude.astype(jnp.float32)
    mag_p = jnp.pad(mag_f[..., : F - 1], ((0, 0), (0, 0), (0, Fp - (F - 1))))
    ny_p = jnp.pad(mag_f[..., F - 1 :], ((0, 0), (0, 0), (0, LANE - 1)))
    rows_pad = _round_up(T + k - 1, 8)
    rows8 = wny.shape[0]
    wsum = _wsum_rows(n_fft, hop, T, rows_pad)

    kernel = functools.partial(
        _gl_kernel, T=T, n_fft=n_fft, hop=hop, n_iter=n_iter,
        rows_pad=rows_pad, momentum=momentum,
    )
    const = lambda b: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, Fp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, LANE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, Fp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, Fp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, n_fft), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, n_fft), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows8, hop), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows8, hop), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_pad, hop), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T - 1, hop), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T - 1, hop), jnp.float32),
        interpret=interpret,
    )(
        mag_p, ny_p,
        jnp.asarray(Wr), jnp.asarray(Wi), jnp.asarray(Vr), jnp.asarray(Vi),
        jnp.asarray(wny), jnp.asarray(vny),
        jnp.asarray(wsum),
    )
    return out.reshape(B, (T - 1) * hop)
