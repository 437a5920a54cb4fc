"""Staged (8-leaf) Pallas Griffin-Lim: 4x fewer DFT MACs via class pruning.

The dense kernel (``ops.griffin_lim_kernel``) spends 77% of the synthesis
step in its (1024 x 512) DFT GEMMs (PROFILE.md round-3 trace). This kernel
factors the 1024-point transform: with n = 128 j + m and k = 8 t + c,

    X[8t + c] = sum_m  z_c[m] * exp(-2 pi i m (8t + c) / 1024),
    z_c[m]    = sum_j  x[128 j + m] * w8^{j c},            w8 = e^{-2 pi i / 8}

so the per-frame transform becomes an 8-point combine across contiguous
128-sample blocks (coefficients in {0, +-1, +-sqrt(2)/2} - multiply-free
except two scalings; pure VPU adds) followed by per-class (128 x 128) leaf
GEMMs whose matrices are just COLUMNS k = 8t + c of the full DFT matrix -
every twiddle folds into the precomputed leaves.

Hermitian pruning: for a real signal, class 8 - c is the conjugate mirror
of class c (u_{8-c}[m] = conj(u_c[m]) exactly - the w^{mc} leaf folds make
the relation clean), classes 0 and 4 are self-conjugate with REAL
time-domain leaves. Only classes {0, 1, 2, 3, 4} are computed and stored
(640 spectral lanes, the same VMEM as the dense kernel's 512 + Nyquist
block); the inverse combine reconstructs the mirrored classes' REAL
contribution as 2 Re(u_c w8^{-jc}). Per iteration the leaf GEMMs total 32
(128 x 128) MXU units against the dense kernel's 128 - the Nyquist bin
(k = 512 = 8 * 64 + 0) rides inside class 0, so the dense kernel's
separate rank-1 Nyquist path disappears too.

Same fixed-point iteration, init, OLA, and centered crop as the dense
kernel; magnitudes are permuted into staged order OUTSIDE the kernel (one
gather), so bin order never matters on-chip. n_fft = 1024 only (the
production configuration; other sizes dispatch to the dense kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_speaker_tts_tpu.ops.griffin_lim_kernel import _round_up, _wsum_rows
from multi_speaker_tts_tpu.ops.stft_matmul import _hann

LANE = 128
N_FFT = 1024
S = 8  # leaves
L = 128  # leaf length
KEPT = (0, 1, 2, 3, 4)  # stored classes; 5..7 are conjugate mirrors
R2 = float(np.sqrt(2.0) / 2.0)

@functools.lru_cache(maxsize=4)
def _staged_operands(dtype_str: str):
    """Leaf GEMM matrices + windows in block layout + magnitude permutation.

    Forward leaf c: Mc[m, t] = exp(-2 pi i m (8t + c) / N) - the DFT
    matrix's k = 8t + c columns. Inverse leaf: conj(Mc).T / 128 (the w^{mc}
    fold makes u_{8-c} = conj(u_c) exact; see module docstring).
    """
    dtype = np.dtype(dtype_str)
    m = np.arange(L, dtype=np.float64)[:, None]
    fwd, inv = [], []
    for c in KEPT:
        k = (8 * np.arange(L, dtype=np.float64) + c)[None, :]
        ang = -2.0 * np.pi * m * k / N_FFT
        Mr, Mi = np.cos(ang), np.sin(ang)
        fwd.append((Mr.astype(dtype), Mi.astype(dtype)))
        # u_c[m] = (1/128) sum_t Y_c[t] exp(+2 pi i m (8t + c) / 1024);
        # the mirrored classes' 2x (u_{8-c} conjugate fold) is pre-scaled
        # into their leaves so the inverse combine is scale-free.
        two = 2.0 if c in (1, 2, 3) else 1.0
        inv.append(((two * Mr.T / L).astype(dtype),
                    (-two * Mi.T / L).astype(dtype)))
    win = _hann(N_FFT).astype(np.float64)
    win_blocks = win.reshape(S, L).astype(np.float32)  # analysis
    # Synthesis: the inverse leaves carry 1/128, the combine's 1/8 is
    # folded HERE -> total 1/1024 = 1/N (the dense kernel's IDFT scaling).
    syn_blocks = (win.reshape(S, L) / S).astype(np.float32)
    perm = np.zeros((len(KEPT) * L,), np.int32)  # staged lane -> source bin
    for g, c in enumerate(KEPT):
        k = 8 * np.arange(L) + c
        k = np.where(k <= N_FFT // 2, k, N_FFT - k)  # mirror magnitude
        perm[g * L:(g + 1) * L] = k
    return fwd, inv, win_blocks, syn_blocks, perm


def _combine_forward(blocks):
    """8 real (T, L) blocks -> z_c (re, im) for c in KEPT, via the exact
    8-point DFT butterfly (shared partial sums: 21 VPU adds + 2 scalings
    vs ~56 for term-by-term evaluation). z_0 and z_4 are exactly real
    (real inputs, real coefficients) and return ``im=None`` so the leaf
    GEMMs against their imaginary plane can be skipped entirely."""
    b = blocks
    s = [b[j] + b[j + 4] for j in range(4)]
    d = [b[j] - b[j + 4] for j in range(4)]
    u0, u1 = s[0] + s[2], s[1] + s[3]
    v0, v1 = s[0] - s[2], s[1] - s[3]
    p = (d[1] - d[3]) * R2
    q = (d[1] + d[3]) * R2
    return [
        (u0 + u1, None),          # c=0
        (d[0] + p, -q - d[2]),    # c=1
        (v0, -v1),                # c=2
        (d[0] - p, -q + d[2]),    # c=3
        (u0 - u1, None),          # c=4
    ]


def _combine_inverse(us):
    """u_c for c in KEPT -> 8 real (T, L) frame blocks, exact butterfly:

        x_j = (1/8) [u_0 + (-1)^j u_4 + sum_{c=1..3} Re(U_c w8^{-jc})]

    where U_c = 2 u_c for the mirrored classes - the 2x is pre-folded into
    the c in {1,2,3} inverse leaf matrices and the 1/8 into the synthesis
    window (``_staged_operands``), so this routine is scale-free: 22 adds
    + 4 sqrt(2)/2 scalings vs ~50 ops + 8 scalings term-by-term. Even-c
    terms E_j have period 4 in j, odd-c terms O_j antiperiod 4, giving the
    final radix-2 split x_j = E_j + O_j, x_{j+4} = E_j - O_j."""
    u0, u4 = us[0][0], us[4][0]
    Ur1, Ui1 = us[1]
    Ur2, Ui2 = us[2]
    Ur3, Ui3 = us[3]
    P, Q = u0 + u4, u0 - u4
    E = [P + Ur2, Q - Ui2, P - Ur2, Q + Ui2]
    g1, h1 = (Ur1 - Ui1) * R2, (Ur1 + Ui1) * R2
    g3, h3 = (Ur3 - Ui3) * R2, (Ur3 + Ui3) * R2
    O = [Ur1 + Ur3, g1 - h3, Ui3 - Ui1, g3 - h1]
    return [E[0] + O[0], E[1] + O[1], E[2] + O[2], E[3] + O[3],
            E[0] - O[0], E[1] - O[1], E[2] - O[2], E[3] - O[3]]


def _gl_staged_kernel(
    mag_ref,  # (1, T, 640) magnitudes in staged order, VMEM
    *refs,
    T: int,
    hop: int,
    n_iter: int,
    rows_pad: int,
    momentum: float,
):
    n_mats = 4 * len(KEPT)
    mats = refs[:n_mats]  # per class: fwd (Mr, Mi), inv (IMr, IMi)
    win_ref, syn_ref, wsum_ref, out_ref = refs[n_mats:]
    k_blocks = N_FFT // hop  # OLA row-blocks of width hop
    per_row = hop // L  # leaf blocks per OLA row-block
    # Magnitudes stay bf16 in VMEM (halves the largest resident buffer -
    # what lets this kernel fit T=1000 rows under the scoped-VMEM limit);
    # the projection upcasts per use.
    mag = mag_ref[0, :, :]
    cdtype = mats[0].dtype

    def leaf(c):
        return (mats[4 * c][...], mats[4 * c + 1][...],
                mats[4 * c + 2][...], mats[4 * c + 3][...])

    def istft_rows(re, im):
        """Stored spectra (T, 640) -> OLA'd signal rows (rows_pad, hop)."""
        us = []
        for g, c in enumerate(KEPT):
            _, _, IMr, IMi = leaf(g)
            Yr = re[:, g * L:(g + 1) * L].astype(cdtype)
            Yi = im[:, g * L:(g + 1) * L].astype(cdtype)
            ur = jnp.dot(Yr, IMr, preferred_element_type=jnp.float32) - \
                jnp.dot(Yi, IMi, preferred_element_type=jnp.float32)
            if c in (0, 4):  # self-conjugate classes: u is real
                us.append((ur, None))
            else:
                ui = jnp.dot(Yr, IMi, preferred_element_type=jnp.float32) + \
                    jnp.dot(Yi, IMr, preferred_element_type=jnp.float32)
                us.append((ur, ui))
        blocks = _combine_inverse(us)
        acc = jnp.zeros((rows_pad, hop), jnp.float32)
        for i in range(k_blocks):
            parts = []
            for p in range(per_row):
                j = i * per_row + p
                parts.append(blocks[j] * syn_ref[j, :])
            row_block = jnp.concatenate(parts, axis=-1)  # (T, hop)
            padded = jnp.pad(row_block, ((0, rows_pad - T), (0, 0)))
            acc = acc + pltpu.roll(padded, i, 0)
        return acc * wsum_ref[:, :]

    def stft_of(rows):
        """Signal rows -> stored spectra (re, im) of shape (T, 640)."""
        blocks = []
        for i in range(k_blocks):
            rows_i = pltpu.roll(rows, (rows_pad - i) % rows_pad, 0)[:T, :]
            for p in range(per_row):
                j = i * per_row + p
                blocks.append(rows_i[:, p * L:(p + 1) * L] * win_ref[j, :])
        zs = _combine_forward(blocks)
        res, ims = [], []
        for g, c in enumerate(KEPT):
            Mr, Mi, _, _ = leaf(g)
            zr, zi = zs[g]
            zrc = zr.astype(cdtype)
            yr = jnp.dot(zrc, Mr, preferred_element_type=jnp.float32)
            yi = jnp.dot(zrc, Mi, preferred_element_type=jnp.float32)
            if zi is not None:  # z_0 / z_4 are exactly real: 2 GEMMs only
                zic = zi.astype(cdtype)
                yr = yr - jnp.dot(zic, Mi, preferred_element_type=jnp.float32)
                yi = yi + jnp.dot(zic, Mr, preferred_element_type=jnp.float32)
            res.append(yr)
            ims.append(yi)
        return jnp.concatenate(res, axis=-1), jnp.concatenate(ims, axis=-1)

    def project(re2, im2):
        # mag * rsqrt(|X|^2 + 1e-12): identical to the dense kernel's
        # mag / max(sqrt(.), 1e-11) - the clamp can never bind (the +1e-12
        # floor already bounds sqrt >= 1e-6) - but rsqrt is a single fast
        # VPU op where sqrt-then-divide is two slow ones, and this runs
        # over (T, 640) f32 every iteration.
        scale = mag.astype(jnp.float32) * jax.lax.rsqrt(
            re2 * re2 + im2 * im2 + 1e-12
        )
        return re2 * scale, im2 * scale

    mag0 = mag.astype(jnp.float32)
    zero = jnp.zeros((T, len(KEPT) * L), jnp.float32)
    if momentum > 0.0:
        beta = momentum / (1.0 + momentum)

        def body_m(_, carry):
            # Previous-projection carries live in bf16: they only feed the
            # extrapolation correction (re2 - beta * pre), so storage
            # precision is uncritical and the two extra (T, 640) buffers
            # cost half the VMEM.
            re, im, pre, pim = carry
            rows = istft_rows(re, im)
            re2, im2 = stft_of(rows)
            ere = re2 - beta * pre.astype(jnp.float32)
            eim = im2 - beta * pim.astype(jnp.float32)
            pr, pi = project(ere, eim)
            return pr, pi, re2.astype(mag.dtype), im2.astype(mag.dtype)

        zero_s = jnp.zeros((T, len(KEPT) * L), mag.dtype)
        re, im, _, _ = jax.lax.fori_loop(
            0, n_iter, body_m, (mag0, zero, zero_s, zero_s)
        )
    else:
        def body(_, carry):
            re, im = carry
            re2, im2 = stft_of(istft_rows(re, im))
            return project(re2, im2)

        re, im = jax.lax.fori_loop(0, n_iter, body, (mag0, zero))

    rows = istft_rows(re, im)
    out_ref[0, :, :] = pltpu.roll(rows, rows_pad - k_blocks // 2, 0)[: T - 1, :]


def griffin_lim_staged(
    magnitude: jax.Array,  # (B, T, F) linear magnitude (already **power)
    n_fft: int,
    hop: int,
    n_iter: int,
    interpret: bool | None = None,
    compute_dtype: str = "bfloat16",
    momentum: float = 0.0,
) -> jax.Array:
    """Batched staged Griffin-Lim: (B, T, F) -> (B, hop * (T - 1)).

    Same fixed-point map as ``griffin_lim_kernel.griffin_lim_pallas`` (the
    iteration is mathematically identical; only the DFT factorization
    differs), so outputs agree to bf16 tolerance. n_fft must be 1024 and
    hop a 128-multiple divisor with an even n_fft/hop ratio."""
    assert n_fft == N_FFT, "staged kernel is specialized to n_fft=1024"
    assert n_fft % hop == 0 and hop % L == 0
    k_blocks = n_fft // hop
    assert k_blocks % 2 == 0, "centered crop needs an even n_fft/hop ratio"
    B, T, F = magnitude.shape
    assert F == n_fft // 2 + 1

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    fwd, inv, win_blocks, syn_blocks, perm = _staged_operands(compute_dtype)
    # Storage dtype follows compute_dtype: in bf16 production mode the
    # magnitudes (and the momentum branch's previous-projection carries)
    # are held in bf16, halving the kernel's largest VMEM-resident
    # buffers - what lets T=1000 rows fit the scoped-VMEM limit. The
    # target spectrum is only ever read through the projection's mag/|X|
    # ratio, where bf16's ~0.4% relative step is far inside the
    # iteration's own convergence tolerance (parity-gated at 5% rel SC);
    # f32 mode keeps exact elementwise parity with the dense kernel.
    store_dtype = (
        jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    )
    mag_staged = jnp.take(
        magnitude.astype(store_dtype), jnp.asarray(perm), axis=-1
    )  # (B, T, 640)
    G = len(KEPT) * L
    rows_pad = _round_up(T + k_blocks - 1, 8)
    wsum = _wsum_rows(n_fft, hop, T, rows_pad)

    kernel = functools.partial(
        _gl_staged_kernel, T=T, hop=hop, n_iter=n_iter,
        rows_pad=rows_pad, momentum=momentum,
    )
    const = lambda b: (0, 0)  # noqa: E731
    mat_args, mat_specs = [], []
    for g in range(len(KEPT)):
        for a in (*fwd[g], *inv[g]):
            mat_args.append(jnp.asarray(a))
            mat_specs.append(
                pl.BlockSpec((L, L), const, memory_space=pltpu.VMEM)
            )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, G), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            *mat_specs,
            pl.BlockSpec((S, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_pad, hop), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T - 1, hop), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T - 1, hop), jnp.float32),
        interpret=interpret,
    )(
        mag_staged, *mat_args,
        jnp.asarray(win_blocks), jnp.asarray(syn_blocks), jnp.asarray(wsum),
    )
    return out.reshape(B, (T - 1) * hop)
