"""Pure-JAX, jit-able, batched DSP matching ``oracle.py`` within 1e-4.

TPU-first design notes (vs the reference's librosa/CPU front-end,
SURVEY.md section 2 "Audio front-end" / section 3.5):

- Static shapes everywhere: functions take fixed (padded) signal lengths and
  frame counts so XLA compiles one program per bucket.
- ``inv_preemphasis`` (an IIR y[n] = x[n] + a*y[n-1]) is an
  ``associative_scan`` over affine maps - O(log N) depth instead of a
  sequential sample loop.
- Griffin-Lim is a ``lax.fori_loop`` over batched STFT <-> ISTFT so vocoding
  never leaves the chip (BASELINE.json:5).
- The mel projection is a plain matmul against the shared filterbank from
  ``mel_filterbank.py``; the fully fused framing+window+DFT+mel Pallas kernel
  lives in ``multi_speaker_tts_tpu.ops.mel_kernel``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from multi_speaker_tts_tpu.audio.mel_filterbank import mel_filterbank

_AMP_FLOOR = 1e-5


@dataclass(frozen=True)
class DSPConfig:
    """Static DSP parameters derived from hp.Sound (hashable for jit)."""

    sample_rate: int
    n_fft: int
    hop: int
    n_mels: int
    f_min: float
    f_max: float | None
    preemphasis: float
    min_level_db: float
    ref_level_db: float
    power: float
    griffin_lim_iter: int
    # Accelerated ("fast") Griffin-Lim momentum (Perraudin et al. 2013);
    # 0.0 = the reference's plain iteration. ~0.99 converges markedly
    # tighter at the same iteration count.
    griffin_lim_momentum: float = 0.0

    @classmethod
    def from_hp(cls, hp) -> "DSPConfig":
        return cls(
            sample_rate=hp.Sound.Sample_Rate,
            n_fft=hp.Sound.Frame_Length,
            hop=hp.Sound.Frame_Shift,
            n_mels=hp.Sound.Mel_Dim,
            f_min=float(hp.Sound.Mel_F_Min),
            f_max=hp.Sound.get("Mel_F_Max"),
            preemphasis=float(hp.Sound.Preemphasis),
            min_level_db=float(hp.Sound.Min_Level_DB),
            ref_level_db=float(hp.Sound.Ref_Level_DB),
            power=float(hp.Sound.Power),
            griffin_lim_iter=int(hp.Sound.Griffin_Lim_Iter),
            griffin_lim_momentum=float(hp.Sound.get("Griffin_Lim_Momentum", 0.0)),
        )

    @functools.cached_property
    def mel_basis(self) -> np.ndarray:
        """(n_mels, n_fft//2 + 1), float32."""
        return mel_filterbank(
            self.sample_rate, self.n_fft, self.n_mels, self.f_min, self.f_max
        )

    def num_frames(self, num_samples: int) -> int:
        """Frame count of a centered STFT over ``num_samples`` samples."""
        return 1 + num_samples // self.hop


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    # Computed in float64 on the host (numpy) and cast: window edge values are
    # ~1e-9, where f32 trig error is a ~1e-2 *relative* error that leaks into
    # near-silent STFT bins.
    n = np.arange(win_length, dtype=np.float64)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length), dtype=dtype)


def preemphasis(wav: jax.Array, coef: float) -> jax.Array:
    """FIR y[n] = x[n] - coef*x[n-1], batched over leading dims."""
    shifted = jnp.pad(wav[..., :-1], [(0, 0)] * (wav.ndim - 1) + [(1, 0)])
    return wav - coef * shifted


def inv_preemphasis(wav: jax.Array, coef: float, block: int = 1024) -> jax.Array:
    """IIR y[n] = x[n] + coef*y[n-1] as a BLOCKED parallel associative scan.

    Each sample is an affine map y -> coef*y + x[n]; composition of affine
    maps is associative, so the prefix is computable in O(log N) depth on
    the VPU. A single full-length associative_scan compiles pathologically
    slowly on TPU at waveform lengths (minutes at ~256k samples - measured),
    so the recurrence is split exactly into (1) independent in-block
    prefixes, (2) a tiny block-level scan over the per-block carries
    L[i] = coef^B * L[i-1] + last_i, and (3) y = p + coef^(n+1) * L[i-1]
    within each block. Both scans are short; the result is bit-equivalent
    math, not an approximation.
    """
    if coef == 0.0:
        return wav
    L = wav.shape[-1]
    nb = -(-L // block)
    pad = nb * block - L
    x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])
    x = x.reshape(*wav.shape[:-1], nb, block)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    # (1) in-block prefixes (zero initial state per block).
    a = jnp.full_like(x, coef)
    _, p = jax.lax.associative_scan(combine, (a, x), axis=-1)

    # (2) carry recurrence over blocks: L[i] = coef^block * L[i-1] + last_i.
    lasts = p[..., -1]
    a_blk = jnp.full_like(lasts, coef**block)
    _, carries = jax.lax.associative_scan(combine, (a_blk, lasts), axis=-1)
    prev = jnp.concatenate(
        [jnp.zeros_like(carries[..., :1]), carries[..., :-1]], axis=-1
    )

    # (3) inject the incoming carry: y[n] = p[n] + coef^(n+1) * L[i-1].
    decay = coef ** (jnp.arange(block, dtype=wav.dtype) + 1.0)
    y = p + prev[..., None] * decay
    return y.reshape(*wav.shape[:-1], nb * block)[..., :L]


def frame_signal(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Centered (reflect-padded) framing: (..., L) -> (..., T, n_fft)."""
    pad = [(0, 0)] * (wav.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    padded = jnp.pad(wav, pad, mode="reflect")
    n_frames = 1 + wav.shape[-1] // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return padded[..., idx]


def stft(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Complex STFT: (..., L) -> (..., T, n_fft//2+1)."""
    frames = frame_signal(wav, n_fft, hop)
    win = hann_window(n_fft, frames.dtype)
    return jnp.fft.rfft(frames * win, axis=-1)


def stft_magnitude(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    return jnp.abs(stft(wav, n_fft, hop))


def istft(spec: jax.Array, n_fft: int, hop: int, length: int) -> jax.Array:
    """Inverse STFT via windowed overlap-add: (..., T, F) -> (..., length).

    Overlap-add is a scatter-add (`.at[].add`), which XLA lowers to an
    efficient on-chip scatter; window-square normalization matches the
    oracle's istft.
    """
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., T, n_fft)
    win = hann_window(n_fft, frames.dtype)
    n_frames = frames.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)

    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
    flat = (frames * win).reshape(*frames.shape[:-2], -1)
    out = jnp.zeros((*frames.shape[:-2], out_len), frames.dtype)
    out = out.at[..., idx].add(flat)

    wsq = jnp.zeros(out_len, win.dtype).at[idx].add(jnp.tile(win * win, n_frames))
    out = out / jnp.maximum(wsq, 1e-11)
    start = n_fft // 2
    return jax.lax.dynamic_slice_in_dim(out, start, length, axis=-1)


def amp_to_db(x: jax.Array) -> jax.Array:
    return 20.0 * jnp.log10(jnp.maximum(_AMP_FLOOR, x))


def db_to_amp(x: jax.Array) -> jax.Array:
    return jnp.power(10.0, x * 0.05)


def normalize(S_db: jax.Array, min_level_db: float) -> jax.Array:
    return jnp.clip((S_db - min_level_db) / (-min_level_db), 0.0, 1.0)


def denormalize(S_norm: jax.Array, min_level_db: float) -> jax.Array:
    return jnp.clip(S_norm, 0.0, 1.0) * (-min_level_db) + min_level_db


@functools.partial(jax.jit, static_argnums=1)
def spectrogram(wav: jax.Array, cfg: DSPConfig) -> jax.Array:
    """Normalized linear spectrogram: (..., L) -> (..., T, n_fft//2+1)."""
    y = preemphasis(wav, cfg.preemphasis)
    D = stft_magnitude(y, cfg.n_fft, cfg.hop)
    return normalize(amp_to_db(D) - cfg.ref_level_db, cfg.min_level_db)


@functools.partial(jax.jit, static_argnums=1)
def melspectrogram(wav: jax.Array, cfg: DSPConfig) -> jax.Array:
    """Normalized log-mel spectrogram: (..., L) -> (..., T, n_mels)."""
    y = preemphasis(wav, cfg.preemphasis)
    D = stft_magnitude(y, cfg.n_fft, cfg.hop)
    # Full-f32 matmul: the default (bf16-on-MXU) precision costs ~4e-3
    # relative error, blowing the 1e-4 parity budget; this matmul is tiny.
    M = jnp.dot(
        D, jnp.asarray(cfg.mel_basis).T, precision=jax.lax.Precision.HIGHEST
    )
    return normalize(amp_to_db(M) - cfg.ref_level_db, cfg.min_level_db)


_DISPATCH_LOGGED: set = set()
# Most recent choice per op, ALWAYS updated (logging is once per choice):
# lets tools assert which branch a call actually dispatched to instead of
# trusting a host-side reconstruction (a vacuous "chunked parity" check
# slipped through in round 3 because both sides silently ran GEMM).
LAST_DISPATCH: dict = {}


def _log_dispatch(op: str, chosen: str, why: str) -> None:
    """One line per (op, choice) per process: silent fallbacks hid a 128-
    aligned-hop-only kernel in round 1 (VERDICT item 7)."""
    LAST_DISPATCH[op] = chosen
    key = (op, chosen)
    if key not in _DISPATCH_LOGGED:
        _DISPATCH_LOGGED.add(key)
        print(f"[dispatch] {op} -> {chosen} ({why})")


def melspectrogram_auto(wav: jax.Array, cfg: DSPConfig) -> jax.Array:
    """Dispatch to the fused Pallas front-end kernel when eligible (TPU,
    hop | n_fft, batched hop-multiple length - ANY hop: non-lane-aligned
    hops run lane-padded), else the rfft path. Both match the oracle within
    1e-4."""
    eligible = (
        wav.ndim == 2
        and cfg.n_fft % cfg.hop == 0
        and wav.shape[-1] % cfg.hop == 0
        and jax.default_backend() == "tpu"
    )
    if eligible:
        from multi_speaker_tts_tpu.ops.mel_kernel import melspectrogram_pallas

        _log_dispatch("melspectrogram", "pallas", f"fused kernel, hop={cfg.hop}")
        return melspectrogram_pallas(wav, cfg)
    _log_dispatch(
        "melspectrogram", "xla_rfft",
        f"backend={jax.default_backend()}, ndim={wav.ndim}, "
        f"n_fft%hop={cfg.n_fft % cfg.hop}",
    )
    return melspectrogram(wav, cfg)


def griffin_lim(
    magnitude: jax.Array, n_fft: int, hop: int, n_iter: int, length: int,
    momentum: float = 0.0,
) -> jax.Array:
    """Batched Griffin-Lim phase recovery: (..., T, F) magnitude -> (..., length).

    Runs the STFT<->ISTFT fixed-point iteration as a ``lax.fori_loop`` so the
    whole vocoder is one XLA program (SURVEY.md section 3.3 "VOCODE" stage,
    kept on-chip per BASELINE.json:5). Zero initial phase, matching the
    oracle for testability. ``momentum`` > 0 runs the accelerated ("fast")
    variant of Perraudin et al. 2013: the projected spectrum is extrapolated
    against the previous projection before its phase is reused, which
    converges markedly tighter at equal iteration count; 0 is the
    reference's plain iteration.
    """
    mag = magnitude.astype(jnp.float32)

    if momentum > 0.0:
        beta = momentum / (1.0 + momentum)

        def body_m(_, carry):
            y, tprev = carry
            D = stft(y, n_fft, hop)[..., : mag.shape[-2], :]
            E = D - beta * tprev
            phase = E / jnp.maximum(jnp.abs(E), 1e-11)
            return istft(mag * phase, n_fft, hop, length), D

        y0 = istft(mag.astype(jnp.complex64), n_fft, hop, length)
        y, _ = jax.lax.fori_loop(
            0, n_iter, body_m, (y0, jnp.zeros_like(mag, jnp.complex64))
        )
        return y

    def body(_, y):
        D = stft(y, n_fft, hop)
        D = D[..., : mag.shape[-2], :]
        phase = D / jnp.maximum(jnp.abs(D), 1e-11)
        return istft(mag * phase, n_fft, hop, length)

    y0 = istft(mag.astype(jnp.complex64), n_fft, hop, length)
    return jax.lax.fori_loop(0, n_iter, body, y0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def inv_spectrogram(S_norm: jax.Array, cfg: DSPConfig, length: int | None = None) -> jax.Array:
    """Normalized linear spectrogram -> waveform (on-chip Griffin-Lim)."""
    if length is None:
        length = cfg.hop * (S_norm.shape[-2] - 1)
    S_db = denormalize(S_norm, cfg.min_level_db)
    mag = db_to_amp(S_db + cfg.ref_level_db)
    wav = griffin_lim(
        mag**cfg.power, cfg.n_fft, cfg.hop, cfg.griffin_lim_iter, length,
        momentum=cfg.griffin_lim_momentum,
    )
    return inv_preemphasis(wav, cfg.preemphasis)
