"""GEMM-native STFT / ISTFT / Griffin-Lim for the MXU.

XLA's TPU FFT is the single hottest cost in the vocode path (SURVEY.md
section 3.3); on a systolic-array machine the rDFT of a 1024-sample frame is
better expressed as a matmul (cf. MelT, PAPERS.md): frames (T, N) @ W (N, F)
with the analysis window folded into W. Framing and overlap-add become k =
n_fft/hop shifted strided views / adds - no gather, no scatter.

FLOP cost per Griffin-Lim iteration: 4 * T * n_fft * (n_fft/2+1) * 2 - tiny
for the MXU; the win over ``jnp.fft`` on TPU is ~an order of magnitude.

Precision: DFT matmuls run in float32 (``Precision.HIGHEST``) by default;
``precision='default'`` (bf16 on MXU) is ~3x faster and fine for
Griffin-Lim's iterative projections - quality-gated in tests via SNR vs the
f64 oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward rDFT as two real matrices Wr, Wi: (n_fft, n_fft//2+1)."""
    F = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(F)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse rDFT as two real matrices Vr, Vi: (n_fft//2+1, n_fft).

    x[n] = sum_k w_k * (Re X_k cos(2 pi k n / N) - Im X_k sin(...)) / N with
    hermitian weights w_k = 2 except DC and Nyquist.
    """
    F = n_fft // 2 + 1
    k = np.arange(F)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((F, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    Vr = (w * np.cos(ang) / n_fft).astype(np.float32)
    Vi = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return Vr, Vi


def _hann(n_fft: int) -> np.ndarray:
    n = np.arange(n_fft, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(np.float32)


def frame_strided(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Centered framing via k = n_fft/hop shifted views: (..., L) ->
    (..., T, n_fft) with T = 1 + L/hop. Requires n_fft % hop == 0."""
    assert n_fft % hop == 0, "strided framing requires hop | n_fft"
    k = n_fft // hop
    L = wav.shape[-1]
    assert L % hop == 0, f"signal length {L} must be a hop multiple"
    T = 1 + L // hop
    pad = [(0, 0)] * (wav.ndim - 1) + [(n_fft // 2, n_fft // 2 + hop)]
    padded = jnp.pad(wav, pad, mode="reflect")  # length L + n_fft + hop
    rows = padded.reshape(*wav.shape[:-1], -1, hop)  # (..., L/hop + k + 1, hop)
    # frame t = rows[t : t + k]; stack k shifted views of the row axis.
    views = [rows[..., i : i + T, :] for i in range(k)]
    return jnp.concatenate(views, axis=-1)  # (..., T, k*hop = n_fft)


def overlap_add(
    frames: jax.Array, n_fft: int, hop: int, length: int
) -> jax.Array:
    """Windowed overlap-add via k shifted adds: (..., T, n_fft) -> (..., length).

    Matches ``dsp.istft``'s window-square normalization and centered crop.
    """
    assert n_fft % hop == 0
    k = n_fft // hop
    T = frames.shape[-2]
    win = jnp.asarray(_hann(n_fft))
    fw = frames * win  # (..., T, n_fft)
    parts = fw.reshape(*frames.shape[:-1], k, hop)  # (..., T, k, hop)
    out_rows = T + k - 1
    acc = jnp.zeros((*frames.shape[:-2], out_rows, hop), frames.dtype)
    for i in range(k):
        acc = acc.at[..., i : i + T, :].add(parts[..., i, :])
    out = acc.reshape(*frames.shape[:-2], out_rows * hop)

    # Window-square normalization (host-side constant for this T).
    wsq_np = _hann(n_fft).astype(np.float64) ** 2
    wsq_parts = wsq_np.reshape(k, hop)
    wacc = np.zeros((out_rows, hop), np.float32)
    for i in range(k):
        wacc[i : i + T] += wsq_parts[i]
    wsum = jnp.asarray(wacc.reshape(-1))
    out = out / jnp.maximum(wsum, 1e-11)
    start = n_fft // 2
    return jax.lax.dynamic_slice_in_dim(out, start, length, axis=-1)


def stft_magnitude_matmul(
    wav: jax.Array, n_fft: int, hop: int, precision: str = "highest"
) -> jax.Array:
    """|STFT| via windowed-DFT matmuls: (..., L) -> (..., T, F)."""
    prec = _PRECISIONS[precision]
    frames = frame_strided(wav, n_fft, hop)
    win = jnp.asarray(_hann(n_fft))
    Wr, Wi = (jnp.asarray(m) for m in _dft_matrices(n_fft))
    fw = frames * win
    re = jnp.dot(fw, Wr, precision=prec)
    im = jnp.dot(fw, Wi, precision=prec)
    return jnp.sqrt(re * re + im * im + 1e-12)


def _pallas_gl_max_batch(T: int, n_fft: int, hop: int,
                         momentum: float = 0.0, staged: bool = False) -> int:
    """Largest per-call batch for which the Pallas Griffin-Lim kernel fits
    Mosaic's 16 MB scoped-VMEM stack limit.

    Calibrated against the compiler's own OOM reports (n_fft=1024,
    hop=256, Fp=640): scoped demand ~= a(T) + 0.031 MB x batch with
    a(1000) = 14.9 MB — (B=16, T=1000) compiles, (B=64, T=1000) reports
    16.88 MB, (B=128, T=1000) reports 18.84 MB. a(T) is the kernel's
    (T, Fp)-proportional live set (spectra carries + casts + OLA rows), so
    it is scaled by T*Fp relative to the calibration point; the batch term
    is Mosaic's per-grid-step bookkeeping. ``griffin_lim_auto`` chunks
    oversized batches to this size instead of failing to compile.

    ``momentum`` > 0 carries the previous projection too (3 extra
    (T, Fp)-class f32 live buffers); that scales the T-proportional base
    term - NOT the per-batch bookkeeping term - so it is modeled as a
    factor on a(T) (~1.6x: base set is re/im/rny + scale temps ~5 live
    (T, Fp) buffers, momentum adds 3).

    ``staged`` = the 8-leaf factored kernel, which stores the target
    magnitudes (and the momentum branch's previous-projection carries) in
    bf16 - its per-row live set is SMALLER than the dense kernel's.
    Probed at T=1000 on v5e: plain compiles at B=112 and fails at 128
    (a ~ 11.6-12.1 MB, modeled 12.2); momentum-0.99 compiles at B=40 and
    fails at 44 (a ~ 14.2, modeled 14.35). The margins make the model
    err conservative; oversized batches chunk, so a conservative cap
    costs only chunking granularity."""
    # Nyquist-folded kernel: round_up(n_fft/2, 128) main lanes plus one
    # 128-lane block for the Nyquist carry - 640 lane-equivalents at
    # n_fft=1024, the original calibration point.
    Fp = ((n_fft // 2 + 127) // 128) * 128 + 128
    scale = (T * Fp) / (1000.0 * 640.0)
    if staged:
        base_mb = (14.35 if momentum > 0.0 else 12.2) * scale
    else:
        base_mb = 14.92 * scale
        if momentum > 0.0:
            base_mb *= 1.6
    return int((16.0 - 0.5 - base_mb) / 0.0306)


def _chunk_plan(B: int, max_b: int) -> tuple[int, int]:
    """(n_chunks, chunk) splitting B rows into equal chunks of <= max_b.

    chunk = ceil(B / n_chunks) minimizes the zero-padding when B is not a
    multiple (e.g. B=61, max_b=18 -> 4 chunks of 16: 3 pad rows, vs. the
    18-row naive chunking's 11)."""
    n_chunks = -(-B // max_b)
    chunk = -(-B // n_chunks)
    return n_chunks, chunk


def griffin_lim_auto(
    magnitude: jax.Array,  # (..., T, F)
    n_fft: int,
    hop: int,
    n_iter: int,
    length: int,
    precision: str = "highest",
    momentum: float = 0.0,
) -> jax.Array:
    """Best available Griffin-Lim: the VMEM-resident Pallas kernel when
    eligible (TPU, hop % 128 == 0, even n_fft/hop, batched, default
    length), else the GEMM XLA path — ~8x apart on a v5e (39.9 ms vs
    333 ms at B=64, T=400, 60 iters; XLA's native FFT path is 1.26 s,
    30x off, so GEMM is the honest fallback). Long decodes
    whose working set would blow the scoped-VMEM stack limit run the
    kernel over sequential batch chunks (one compiled program via
    ``lax.map``) rather than losing it entirely."""
    k = n_fft // hop
    B, T = magnitude.shape[0], magnitude.shape[-2]
    eligible = (
        magnitude.ndim == 3
        and n_fft % hop == 0
        and k % 2 == 0
        and hop % 128 == 0
        and length == hop * (T - 1)
        and jax.default_backend() == "tpu"
    )
    if eligible:
        from multi_speaker_tts_tpu.audio.dsp import _log_dispatch
        from multi_speaker_tts_tpu.ops.griffin_lim_kernel import (
            griffin_lim_pallas,
        )

        # Pick the kernel with the HIGHER scoped-VMEM cap, THEN decide
        # eligibility. The staged (8-leaf) kernel factors the DFT GEMMs
        # down to 1/4 of the dense kernel's MXU units (B=96/T=400
        # plain-60: 58.9 -> 25.1 ms with the butterfly combines) and
        # stores magnitudes in bf16, so its cap is usually the higher
        # one (T=1000 rows fit to B~112 where dense manages 18; dense
        # momentum at T=1000 fits NOTHING while staged fits 37) - gating
        # on the dense cap first would skip Pallas exactly where the
        # staged kernel is the only one that fits. Staged is specialized
        # to n_fft=1024 (the production config); other sizes keep dense.
        max_b = _pallas_gl_max_batch(T, n_fft, hop, momentum)
        kernel_fn = griffin_lim_pallas
        kind = "pallas"
        if n_fft == 1024 and not os.environ.get("GL_DENSE_KERNEL"):
            max_b_staged = _pallas_gl_max_batch(
                T, n_fft, hop, momentum, staged=True
            )
            if max_b_staged > max_b:
                from multi_speaker_tts_tpu.ops.griffin_lim_staged import (
                    griffin_lim_staged,
                )

                def kernel_fn(m, n_fft, hop, n_iter, momentum=0.0):
                    return griffin_lim_staged(
                        m, n_fft, hop, n_iter, momentum=momentum
                    )

                kind = "pallas_staged"
                max_b = max_b_staged

        if max_b >= min(B, 8):
            if B <= max_b:
                _log_dispatch("griffin_lim", kind,
                              f"VMEM-resident kernel, T={T}")
                return kernel_fn(
                    magnitude, n_fft, hop, n_iter, momentum=momentum
                )
            # Oversized batch: run the kernel over equal sequential chunks
            # via ONE compiled program (lax.map). The batch is zero-padded
            # up to n_chunks * chunk (zero magnitude rows cost compute but
            # keep the ~8x-faster kernel for awkward/prime batch sizes);
            # chunk = ceil(B / n_chunks) minimizes the padding.
            n_chunks, chunk = _chunk_plan(B, max_b)
            Bp = n_chunks * chunk
            _log_dispatch(
                "griffin_lim", f"{kind}_chunked",
                f"T={T}: scoped-VMEM cap {max_b} rows/call, "
                f"{n_chunks} chunks of {chunk}"
                + (f" ({Bp - B} pad rows)" if Bp > B else ""),
            )
            mag_p = magnitude
            if Bp > B:
                mag_p = jnp.concatenate(
                    [magnitude,
                     jnp.zeros((Bp - B, *magnitude.shape[1:]), magnitude.dtype)],
                    axis=0,
                )
            out = jax.lax.map(
                lambda m: kernel_fn(
                    m, n_fft, hop, n_iter, momentum=momentum
                ),
                mag_p.reshape(n_chunks, chunk, T, magnitude.shape[-1]),
            )
            return out.reshape(Bp, -1)[:B]
    if jax.default_backend() == "tpu":
        from multi_speaker_tts_tpu.audio.dsp import _log_dispatch

        _log_dispatch("griffin_lim", "gemm",
                      f"T={T}, hop={hop}, ndim={magnitude.ndim}")
    return griffin_lim_matmul(
        magnitude, n_fft, hop, n_iter, length, precision, momentum
    )


def griffin_lim_matmul(
    magnitude: jax.Array,  # (..., T, F)
    n_fft: int,
    hop: int,
    n_iter: int,
    length: int,
    precision: str = "highest",
    momentum: float = 0.0,
    init_head: jax.Array | None = None,  # (..., L) warm-start samples
    init_head_gate: jax.Array | None = None,  # scalar 0/1 blend
) -> jax.Array:
    """Batched Griffin-Lim with every transform as an MXU matmul.

    Same fixed-point iteration as ``dsp.griffin_lim`` (zero initial phase),
    but STFT/ISTFT are windowed-DFT GEMMs and framing/OLA are shifted views:
    the entire vocoder is matmul + elementwise, no FFT, no scatter.
    ``momentum`` > 0 = the accelerated variant (see ``dsp.griffin_lim``).

    ``init_head`` warm-starts the iteration: the first ``L`` samples of
    the initial waveform are taken from the caller (e.g. the previous
    streaming window's converged audio over the overlap region — the
    RTISI idea) instead of the zero-phase ISTFT, steering GL toward a
    phase-continuous local fixed point. ``init_head_gate`` (a traced 0/1
    scalar) blends it in, so a first-window-has-no-predecessor case can
    stay a single compiled program."""
    prec = _PRECISIONS[precision]
    mag = magnitude.astype(jnp.float32)
    T = mag.shape[-2]
    win = jnp.asarray(_hann(n_fft))
    Wr, Wi = (jnp.asarray(m) for m in _dft_matrices(n_fft))
    Vr, Vi = (jnp.asarray(m) for m in _idft_matrices(n_fft))

    def istft_from(re, im):
        t = jnp.dot(re, Vr, precision=prec) + jnp.dot(im, Vi, precision=prec)
        return overlap_add(t, n_fft, hop, length)

    def stft_of(y):
        frames = frame_strided(y, n_fft, hop)[..., :T, :] * win
        re = jnp.dot(frames, Wr, precision=prec)
        im = jnp.dot(frames, Wi, precision=prec)
        return re, im

    y0 = istft_from(mag, jnp.zeros_like(mag))  # zero phase
    if init_head is not None:
        L = init_head.shape[-1]
        head = init_head.astype(jnp.float32)
        if init_head_gate is not None:
            g = init_head_gate.astype(jnp.float32)
            head = g * head + (1.0 - g) * y0[..., :L]
        y0 = jnp.concatenate([head, y0[..., L:]], axis=-1)

    if momentum > 0.0:
        beta = momentum / (1.0 + momentum)

        def body_m(_, carry):
            y, pre, pim = carry
            re, im = stft_of(y)
            ere, eim = re - beta * pre, im - beta * pim
            scale = mag / jnp.maximum(
                jnp.sqrt(ere * ere + eim * eim + 1e-12), 1e-11
            )
            return istft_from(ere * scale, eim * scale), re, im

        y, _, _ = jax.lax.fori_loop(
            0, n_iter, body_m, (y0, jnp.zeros_like(mag), jnp.zeros_like(mag))
        )
        return y

    def body(_, y):
        re, im = stft_of(y)
        scale = mag / jnp.maximum(jnp.sqrt(re * re + im * im + 1e-12), 1e-11)
        return istft_from(re * scale, im * scale)

    return jax.lax.fori_loop(0, n_iter, body, y0)
