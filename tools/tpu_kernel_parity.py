"""Compiled-mode (real TPU) Pallas kernel parity check with a recorded
artifact (VERDICT round-1 weak item 6: the CPU test suite exercises the
kernels only in interpret mode).

Runs the fused mel front-end and the VMEM-resident Griffin-Lim kernel
COMPILED on the chip against their XLA reference implementations and writes
``KERNEL_PARITY.json`` at the repo root:

    python tools/tpu_kernel_parity.py

Covers every dispatcher branch serving can select (VERDICT r2 item 4):
- mel kernel at the shipped hop (256), a non-lane-aligned hop (200), and a
  long-T enrollment-length call;
- Griffin-Lim kernel vs the GEMM path at the shipped config (T=401), the
  ``pallas_chunked`` long-decode path (T=1000, chunked with pad rows), and
  the momentum (accelerated) branch near its scoped-VMEM batch cap.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multi_speaker_tts_tpu.audio import dsp
    from multi_speaker_tts_tpu.hparams import default_hparams
    from multi_speaker_tts_tpu.ops.griffin_lim_kernel import griffin_lim_pallas
    from multi_speaker_tts_tpu.ops.mel_kernel import melspectrogram_pallas
    from multi_speaker_tts_tpu.ops.stft_matmul import griffin_lim_matmul

    backend = jax.default_backend()
    results: dict = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "checks": {},
    }
    if backend != "tpu":
        print("not on TPU; refusing to record a compiled-mode artifact")
        sys.exit(1)

    rng = np.random.default_rng(0)

    # --- mel kernel, shipped hop 256 and non-lane-aligned hop 200 ----------
    for frame_length, hop, spect_dim in ((1024, 256, 513), (800, 200, 401)):
        hp = default_hparams(Sound={
            "Frame_Length": frame_length, "Frame_Shift": hop,
            "Spectrogram_Dim": spect_dim,
        })
        cfg = dsp.DSPConfig.from_hp(hp)
        L = (cfg.sample_rate // hop) * hop
        wav = (0.3 * rng.standard_normal((4, L))).astype(np.float32)
        got = np.asarray(jax.device_get(
            jax.jit(lambda w: melspectrogram_pallas(w, cfg))(jnp.asarray(wav))
        ))
        want = np.asarray(jax.device_get(dsp.melspectrogram(jnp.asarray(wav), cfg)))
        err = float(np.abs(got - want).max())
        results["checks"][f"mel_kernel_hop{hop}_vs_xla_rfft"] = {
            "max_abs_err": err, "tolerance": 1e-4, "pass": err <= 1e-4,
        }

    # --- Griffin-Lim kernel vs GEMM path, shipped config --------------------
    hp = default_hparams()
    cfg = dsp.DSPConfig.from_hp(hp)
    T = 401
    mag = rng.random((4, T, cfg.n_fft // 2 + 1)).astype(np.float32) ** 2
    length = cfg.hop * (T - 1)
    wav_pl = np.asarray(jax.device_get(jax.jit(
        lambda m: griffin_lim_pallas(m, cfg.n_fft, cfg.hop, 30)
    )(jnp.asarray(mag))))
    wav_mm = np.asarray(jax.device_get(jax.jit(
        lambda m: griffin_lim_matmul(m, cfg.n_fft, cfg.hop, 30, length)
    )(jnp.asarray(mag))))
    # Griffin-Lim phase recovery amplifies tiny numeric differences (the
    # Pallas kernel holds its DFT matrices in bf16 by design); the honest
    # comparison is spectral-convergence of each result to the target
    # magnitude, which must match closely.
    def spectral_convergence(wav):
        # Magnitude computed on-device: complex64 transfers are
        # unimplemented over the tunneled TPU backend.
        D = np.asarray(jax.device_get(jax.jit(
            lambda w: jnp.abs(dsp.stft(w, cfg.n_fft, cfg.hop))
        )(jnp.asarray(wav))))[:, :T]
        return float(
            np.linalg.norm(D - mag) / np.maximum(np.linalg.norm(mag), 1e-9)
        )

    sc_pl, sc_mm = spectral_convergence(wav_pl), spectral_convergence(wav_mm)
    results["checks"]["griffin_lim_pallas_vs_gemm"] = {
        "spectral_convergence_pallas": sc_pl,
        "spectral_convergence_gemm": sc_mm,
        "rel_gap": abs(sc_pl - sc_mm) / max(sc_mm, 1e-9),
        "tolerance_rel_gap": 0.05,
        "pass": abs(sc_pl - sc_mm) / max(sc_mm, 1e-9) <= 0.05,
    }

    # --- staged (8-leaf) GL kernel: the serving dispatch at n_fft=1024 ------
    from multi_speaker_tts_tpu.ops.griffin_lim_staged import griffin_lim_staged

    for label, it, mom in (("plain30", 30, 0.0), ("momentum30", 30, 0.99)):
        wav_st = np.asarray(jax.device_get(jax.jit(
            lambda m, it=it, mom=mom: griffin_lim_staged(
                m, cfg.n_fft, cfg.hop, it, momentum=mom
            )
        )(jnp.asarray(mag))))
        wav_ref = np.asarray(jax.device_get(jax.jit(
            lambda m, it=it, mom=mom: griffin_lim_matmul(
                m, cfg.n_fft, cfg.hop, it, length, momentum=mom
            )
        )(jnp.asarray(mag))))
        sc_st = spectral_convergence(wav_st)
        sc_rf = spectral_convergence(wav_ref)
        results["checks"][f"griffin_lim_staged_{label}"] = {
            "spectral_convergence_staged": sc_st,
            "spectral_convergence_gemm": sc_rf,
            "rel_gap": abs(sc_st - sc_rf) / max(sc_rf, 1e-9),
            "tolerance_rel_gap": 0.05,
            "pass": abs(sc_st - sc_rf) / max(sc_rf, 1e-9) <= 0.05,
        }

    # --- long-T mel (enrollment-length wav through the fused kernel) --------
    cfg_main = dsp.DSPConfig.from_hp(default_hparams())
    L_long = (1 << 17)  # ~6 s at 22.05 kHz; T = 513 frames
    wav = (0.3 * rng.standard_normal((2, L_long))).astype(np.float32)
    got = np.asarray(jax.device_get(
        jax.jit(lambda w: melspectrogram_pallas(w, cfg_main))(jnp.asarray(wav))
    ))
    want = np.asarray(jax.device_get(
        dsp.melspectrogram(jnp.asarray(wav), cfg_main)
    ))
    err = float(np.abs(got - want).max())
    results["checks"]["mel_kernel_long_T_vs_xla_rfft"] = {
        "frames": got.shape[1], "max_abs_err": err, "tolerance": 1e-4,
        "pass": err <= 1e-4,
    }

    # --- chunked Pallas GL: the T=1000 serving path (with pad rows) ---------
    from multi_speaker_tts_tpu.ops.stft_matmul import (
        _chunk_plan,
        _pallas_gl_max_batch,
        griffin_lim_auto,
    )

    def sc_of(wav, mag_ref, T_ref):
        D = np.asarray(jax.device_get(jax.jit(
            lambda w: jnp.abs(dsp.stft(w, cfg.n_fft, cfg.hop))
        )(jnp.asarray(wav))))[:, :T_ref]
        return float(
            np.linalg.norm(D - mag_ref)
            / np.maximum(np.linalg.norm(mag_ref), 1e-9)
        )

    # Plain T=1000 now fits the staged kernel VMEM-RESIDENT (bf16
    # magnitude storage; cap ~107 rows vs the dense kernel's 18), so this
    # records the long-decode staged branch...
    T_long, B_long = 1000, 40
    max_b_staged = _pallas_gl_max_batch(
        T_long, cfg.n_fft, cfg.hop, staged=True
    )
    mag_l = rng.random((B_long, T_long, cfg.n_fft // 2 + 1)).astype(np.float32) ** 2
    length_l = cfg.hop * (T_long - 1)
    wav_ck = np.asarray(jax.device_get(jax.jit(
        lambda m: griffin_lim_auto(m, cfg.n_fft, cfg.hop, 30, length_l)
    )(jnp.asarray(mag_l))))
    # The dispatcher records its choice at trace time: assert the branch
    # this check claims to cover actually ran (a host-side reconstruction
    # of the chunk plan once recorded a vacuous "pass" while both sides
    # silently dispatched to GEMM).
    disp_resident = dsp.LAST_DISPATCH.get("griffin_lim")
    wav_mm_l = np.asarray(jax.device_get(jax.jit(
        lambda m: griffin_lim_matmul(m, cfg.n_fft, cfg.hop, 30, length_l)
    )(jnp.asarray(mag_l))))
    sc_ck, sc_mm_l = sc_of(wav_ck, mag_l, T_long), sc_of(wav_mm_l, mag_l, T_long)
    results["checks"]["griffin_lim_staged_resident_T1000"] = {
        "batch": B_long, "staged_cap": max_b_staged,
        "dispatched": disp_resident,
        "spectral_convergence_pallas": sc_ck,
        "spectral_convergence_gemm": sc_mm_l,
        "rel_gap": abs(sc_ck - sc_mm_l) / max(sc_mm_l, 1e-9),
        "tolerance_rel_gap": 0.05,
        "pass": (disp_resident == "pallas_staged")
        and abs(sc_ck - sc_mm_l) / max(sc_mm_l, 1e-9) <= 0.05,
    }

    # ...and the CHUNKED branch is exercised where a cap still binds:
    # momentum at T=1000 (staged cap ~37) with B=96 -> sequential chunks
    # with the lax.map plan, including the pad-row path (B=90).
    B_ck = 90
    cap_ck = _pallas_gl_max_batch(
        T_long, cfg.n_fft, cfg.hop, momentum=0.99, staged=True
    )
    n_chunks, chunk = _chunk_plan(B_ck, cap_ck)
    mag_ck = rng.random((B_ck, T_long, cfg.n_fft // 2 + 1)).astype(np.float32) ** 2
    wav_ck2 = np.asarray(jax.device_get(jax.jit(
        lambda m: griffin_lim_auto(m, cfg.n_fft, cfg.hop, 30, length_l,
                                   momentum=0.99)
    )(jnp.asarray(mag_ck))))
    disp_chunked = dsp.LAST_DISPATCH.get("griffin_lim")
    wav_mm2 = np.asarray(jax.device_get(jax.jit(
        lambda m: griffin_lim_matmul(m, cfg.n_fft, cfg.hop, 30, length_l,
                                     momentum=0.99)
    )(jnp.asarray(mag_ck))))
    sc_ck2 = sc_of(wav_ck2, mag_ck, T_long)
    sc_mm2 = sc_of(wav_mm2, mag_ck, T_long)
    results["checks"]["griffin_lim_staged_chunked_T1000_momentum"] = {
        "batch": B_ck, "chunks": n_chunks, "chunk": chunk,
        "pad_rows": n_chunks * chunk - B_ck,
        "dispatched": disp_chunked,
        "spectral_convergence_pallas": sc_ck2,
        "spectral_convergence_gemm": sc_mm2,
        "rel_gap": abs(sc_ck2 - sc_mm2) / max(sc_mm2, 1e-9),
        "tolerance_rel_gap": 0.05,
        "pass": (disp_chunked == "pallas_staged_chunked")
        and (n_chunks > 1)
        and abs(sc_ck2 - sc_mm2) / max(sc_mm2, 1e-9) <= 0.05,
    }

    # --- momentum (accelerated) branch near its scoped-VMEM cap -------------
    T_m = 600
    cap_m = _pallas_gl_max_batch(T_m, cfg.n_fft, cfg.hop, momentum=0.99)
    B_m = max(min(cap_m - 4, 32), 8)  # just inside the modeled cap
    mag_m = rng.random((B_m, T_m, cfg.n_fft // 2 + 1)).astype(np.float32) ** 2
    length_m = cfg.hop * (T_m - 1)
    try:
        wav_mom = np.asarray(jax.device_get(jax.jit(
            lambda m: griffin_lim_pallas(m, cfg.n_fft, cfg.hop, 30,
                                         momentum=0.99)
        )(jnp.asarray(mag_m))))
        wav_mm_m = np.asarray(jax.device_get(jax.jit(
            lambda m: griffin_lim_matmul(m, cfg.n_fft, cfg.hop, 30, length_m,
                                         momentum=0.99)
        )(jnp.asarray(mag_m))))
        sc_mom = sc_of(wav_mom, mag_m, T_m)
        sc_mm_m = sc_of(wav_mm_m, mag_m, T_m)
        results["checks"]["griffin_lim_momentum_T600"] = {
            "batch": B_m, "modeled_cap": cap_m,
            "spectral_convergence_pallas": sc_mom,
            "spectral_convergence_gemm": sc_mm_m,
            "rel_gap": abs(sc_mom - sc_mm_m) / max(sc_mm_m, 1e-9),
            "tolerance_rel_gap": 0.05,
            "pass": abs(sc_mom - sc_mm_m) / max(sc_mm_m, 1e-9) <= 0.05,
        }
    except Exception as e:  # compile failure = the VMEM cap model is wrong
        results["checks"]["griffin_lim_momentum_T600"] = {
            "batch": B_m, "modeled_cap": cap_m,
            "error": str(e)[:500], "pass": False,
        }

    # --- resident-weight LSTM stack (GE2E backend) vs XLA wavefront ---------
    from multi_speaker_tts_tpu.ops import lstm as lstm_ops
    from multi_speaker_tts_tpu.ops import lstm_pallas

    D_in, H_l, L_stack = 128, 768, 3  # GE2E contract stack (mel 80 -> pad 128)
    B_l, T_l = 160, 160  # N=16 x M=10 rows, 160-frame crops
    layers = []
    d = D_in
    for _ in range(L_stack):
        k = 1.0 / np.sqrt(H_l)
        layers.append(lstm_ops.LSTMParams(
            w_ih=jnp.asarray(rng.uniform(-k, k, (d, 4 * H_l)), jnp.float32),
            w_hh=jnp.asarray(rng.uniform(-k, k, (H_l, 4 * H_l)), jnp.float32),
            b=jnp.asarray(rng.uniform(-k, k, (4 * H_l,)), jnp.float32),
        ))
        d = H_l
    layers = tuple(layers)
    x_l = jnp.asarray(rng.normal(size=(B_l, T_l, D_in)), jnp.float32)
    probe = jnp.asarray(
        np.cos(np.arange(B_l * H_l).reshape(B_l, H_l) * 0.01), jnp.float32
    )

    def _loss(fn):
        def f(ls, xx):
            _, h = fn(ls, xx)
            return (h * probe).sum()
        return f

    fwd_p = jax.jit(lambda ls, xx: lstm_pallas.lstm_stack_seq_pallas(ls, xx)[1])
    fwd_w = jax.jit(lambda ls, xx: lstm_ops.lstm_stack_wavefront(
        ls, xx, compute_dtype=jnp.bfloat16)[1])
    h_p = np.asarray(jax.device_get(fwd_p(layers, x_l)))
    h_w = np.asarray(jax.device_get(fwd_w(layers, x_l)))
    fwd_err = float(np.abs(h_p - h_w).max())

    g_p = jax.device_get(jax.jit(jax.grad(_loss(
        lambda ls, xx: lstm_pallas.lstm_stack_seq_pallas(ls, xx))))(layers, x_l))
    g_w = jax.device_get(jax.jit(jax.grad(_loss(
        lambda ls, xx: lstm_ops.lstm_stack_wavefront(
            ls, xx, compute_dtype=jnp.bfloat16))))(layers, x_l))
    grad_rel = max(
        float(np.abs(np.asarray(a.w_hh) - np.asarray(b.w_hh)).max()
              / max(np.abs(np.asarray(a.w_hh)).max(), 1e-9))
        for a, b in zip(g_w, g_p)
    )
    results["checks"]["lstm_stack_pallas_vs_wavefront"] = {
        "shape": [B_l, T_l, D_in, H_l, L_stack],
        "fwd_hT_max_abs_err": fwd_err, "fwd_tolerance": 5e-3,
        "grad_w_hh_max_rel_err": grad_rel, "grad_tolerance_rel": 2e-2,
        "pass": fwd_err <= 5e-3 and grad_rel <= 2e-2,
    }

    # --- fused bidirectional kernels (encoder BiLSTM / CBHG BiGRU) ----------
    from multi_speaker_tts_tpu.ops import birnn_pallas
    from multi_speaker_tts_tpu.ops import gru as gru_ops

    # Model shapes: encoder BiLSTM 512 total -> H=256/dir over D=512 conv
    # features at token length ~100; CBHG BiGRU 256 total -> H=128/dir over
    # the highway's 128 features at mel length ~400.
    def _mk_lstm(d, h):
        k = 1.0 / np.sqrt(h)
        return lstm_ops.LSTMParams(
            w_ih=jnp.asarray(rng.uniform(-k, k, (d, 4 * h)), jnp.float32),
            w_hh=jnp.asarray(rng.uniform(-k, k, (h, 4 * h)), jnp.float32),
            b=jnp.asarray(rng.uniform(-k, k, (4 * h,)), jnp.float32),
        )

    def _mk_gru(d, h):
        k = 1.0 / np.sqrt(h)
        return gru_ops.GRUParams(
            w_ih=jnp.asarray(rng.uniform(-k, k, (d, 3 * h)), jnp.float32),
            w_hh=jnp.asarray(rng.uniform(-k, k, (h, 3 * h)), jnp.float32),
            b_ih=jnp.asarray(rng.uniform(-k, k, (3 * h,)), jnp.float32),
            b_hh=jnp.asarray(rng.uniform(-k, k, (3 * h,)), jnp.float32),
        )

    # Both the Pallas kernel and the XLA fused scan run bf16 cell math at
    # these sequence lengths, so elementwise agreement between the two
    # APPROXIMATIONS is the wrong contract (rounding orders differ and the
    # gap compounds over T). The honest check (same reasoning as the GL
    # spectral-convergence checks above): compare each against the f32 XLA
    # ground truth and require the Pallas approximation error to be
    # comparable to the already-accepted bf16-XLA error.
    for name, mk, pallas_fn, xla16_fn, xla32_fn, (B_r, T_r, D_r, H_r) in (
        ("bilstm_pallas_vs_fused", _mk_lstm, birnn_pallas.bilstm_pallas,
         lambda f, b, xx: lstm_ops.bilstm_fused(
             f, b, xx, compute_dtype=jnp.bfloat16),
         lambda f, b, xx: lstm_ops.bilstm_fused(
             f, b, xx, compute_dtype=jnp.float32),
         (16, 100, 512, 256)),
        ("bigru_pallas_vs_fused", _mk_gru, birnn_pallas.bigru_pallas,
         lambda f, b, xx: gru_ops.bigru_fused(
             f, b, xx, compute_dtype=jnp.bfloat16),
         lambda f, b, xx: gru_ops.bigru_fused(
             f, b, xx, compute_dtype=jnp.float32),
         (16, 400, 128, 128)),
    ):
        fwd_d, bwd_d = mk(D_r, H_r), mk(D_r, H_r)
        x_r = jnp.asarray(
            0.5 * rng.standard_normal((B_r, T_r, D_r)), jnp.float32
        )
        probe_r = jnp.asarray(
            np.cos(np.arange(B_r * T_r * 2 * H_r)
                   .reshape(B_r, T_r, 2 * H_r) * 0.001),
            jnp.float32,
        )

        def fwd_of(fn):
            return np.asarray(jax.device_get(
                jax.jit(lambda f, b, xx: fn(f, b, xx))(fwd_d, bwd_d, x_r)
            ))

        y_p, y_16, y_32 = fwd_of(pallas_fn), fwd_of(xla16_fn), fwd_of(xla32_fn)
        fwd_err_p = float(np.abs(y_p - y_32).max())
        fwd_err_16 = float(np.abs(y_16 - y_32).max())

        def loss_of(fn):
            return lambda f, b, xx: (fn(f, b, xx) * probe_r).sum()

        def grad_of(fn):
            return jax.device_get(jax.jit(jax.grad(
                loss_of(fn), argnums=(0, 1)))(fwd_d, bwd_d, x_r))

        gp, g16, g32 = grad_of(pallas_fn), grad_of(xla16_fn), grad_of(xla32_fn)

        def rel_to_truth(g):
            return max(
                float(np.abs(np.asarray(a) - np.asarray(b)).max()
                      / max(np.abs(np.asarray(b)).max(), 1e-9))
                for ta, tb in zip(g, g32)
                for a, b in zip(jax.tree.leaves(ta), jax.tree.leaves(tb))
            )

        grad_rel_p, grad_rel_16 = rel_to_truth(gp), rel_to_truth(g16)
        # Measured caveat: XLA default-precision f32 matmuls run a single
        # bf16 MXU pass on TPU, so the two XLA forwards are bit-identical
        # here (fwd_err_16 == 0) and the f32 arm differs only in backward
        # cotangent casts. Contract: Pallas forward within the absolute
        # tolerance the lstm_stack check uses, and Pallas gradient error
        # vs f32 truth no worse than the accepted bf16-XLA baseline's own.
        grad_tol = max(grad_rel_16, 2e-2)
        results["checks"][name] = {
            "shape": [B_r, T_r, D_r, H_r],
            "fwd_max_abs_err_vs_f32": fwd_err_p,
            "fwd_max_abs_err_bf16_xla_vs_f32": fwd_err_16,
            "fwd_tolerance": 5e-3,
            "grad_max_rel_err_vs_f32": grad_rel_p,
            "grad_max_rel_err_bf16_xla_vs_f32": grad_rel_16,
            "grad_tolerance_rel": grad_tol,
            "pass": fwd_err_p <= 5e-3 and grad_rel_p <= grad_tol,
        }

    # --- resident-weight int8 AR decode segment (serving kernel) ------------
    # Compiled-mode companion to tests/test_decode_pallas.py (which runs the
    # kernel only in interpret mode on CPU): one production-shape K-step
    # segment (B=8, S=48, H=1024, chunk 16, always-on prenet dropout 0.5 with
    # the shared rng stream) against the XLA int8 segment — the same
    # quantization scheme, so the only gap is MXU s8 accumulation order plus
    # activation-quantization rounding flips compounding over the feedback.
    from multi_speaker_tts_tpu.models.layers import prenet_apply
    from multi_speaker_tts_tpu.ops import decode_pallas as dkp
    from multi_speaker_tts_tpu.ops import decoder_scan as dscan
    from multi_speaker_tts_tpu.ops.lstm import LSTMParams as _LP

    B_d, S_d, K_d = 8, 48, 16
    H_d, D_d, P_d, A_d, MEL_d, R_d = 1024, 768, 256, 128, 80, 2

    def wd(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    cellp_d = dscan.DecoderScanParams(
        lstm=(
            _LP(w_ih=wd(P_d + D_d, 4 * H_d), w_hh=wd(H_d, 4 * H_d),
                b=wd(4 * H_d)),
            _LP(w_ih=wd(H_d + D_d, 4 * H_d), w_hh=wd(H_d, 4 * H_d),
                b=wd(4 * H_d)),
        ),
        attention=dscan.AttentionParams(
            wq=wd(H_d, A_d), conv_kernel=wd(31, 2, 32),
            wloc=wd(32, A_d), v=wd(A_d, 1),
        ),
    )
    prenet_ws_d = [(wd(MEL_d, P_d), wd(P_d)), (wd(P_d, P_d), wd(P_d))]
    frame_w_d = (wd(H_d + D_d, MEL_d * R_d), wd(MEL_d * R_d))
    stop_w_d = (wd(H_d + D_d, 1), wd(1))
    keys_d = wd(B_d, S_d, A_d, scale=0.3)
    memory_d = wd(B_d, S_d, D_d, scale=0.3)
    mask_d = jnp.ones((B_d, S_d), jnp.float32)
    rng_d = jax.random.PRNGKey(11)

    def prenet_fn_d(frame, rk):
        return prenet_apply(prenet_ws_d, frame, 0.5, rk)

    def project_fn_d(x):
        frames = jnp.dot(x, frame_w_d[0]) + frame_w_d[1]
        stop = (jnp.dot(x, stop_w_d[0]) + stop_w_d[1])[..., 0]
        return frames, stop

    carry_d = dscan.initial_carry(B_d, memory_d, 2, H_d)
    prev_d = jnp.zeros((B_d, MEL_d), jnp.float32)
    stopped_d = jnp.zeros((B_d,), bool)
    lengths_d = jnp.zeros((B_d,), jnp.int32)
    # threshold 1.5: sigmoid can never cross, so both arms decode exactly
    # K_d steps and the length bookkeeping is deterministic.
    seg_args = (carry_d, prev_d, jnp.int32(0), stopped_d, lengths_d, K_d,
                1.5, rng_d, MEL_d)

    if dkp.supported(cellp_d, P_d, D_d, S_d):
        bundle_d = dkp.prepare_bundle(
            cellp_d, prenet_ws_d, frame_w_d, stop_w_d, MEL_d, R_d)
        ref_seg = jax.device_get(jax.jit(
            lambda: dscan.decoder_ar_segment(
                cellp_d, prenet_fn_d, project_fn_d, keys_d, memory_d,
                mask_d, *seg_args, jnp.float32,
                fused=dscan.quantize_fused(cellp_d)))())
        got_seg = jax.device_get(jax.jit(
            lambda: dkp.decoder_ar_segment_pallas(
                bundle_d, keys_d, memory_d, mask_d, *seg_args, R_d,
                prenet_dropout=0.5))())
        # outputs: carry, prev, stopped, lengths, frames, stops, aligns
        frames_err = float(np.abs(
            np.asarray(got_seg[4], np.float32)
            - np.asarray(ref_seg[4], np.float32)).max())
        aligns_err = float(np.abs(
            np.asarray(got_seg[6], np.float32)
            - np.asarray(ref_seg[6], np.float32)).max())
        lengths_equal = bool(
            (np.asarray(got_seg[3]) == np.asarray(ref_seg[3])).all())
        results["checks"]["decode_pallas_int8_vs_xla_int8"] = {
            "shape": [B_d, S_d, K_d, H_d, D_d],
            "frames_max_abs_err": frames_err,
            "aligns_max_abs_err": aligns_err,
            "lengths_equal": lengths_equal,
            "tolerance": 1e-2,
            "pass": frames_err <= 1e-2 and aligns_err <= 1e-2
            and lengths_equal,
        }
    else:  # pragma: no cover - the production shape is always supported
        results["checks"]["decode_pallas_int8_vs_xla_int8"] = {
            "error": "supported() rejected the production shape",
            "pass": False,
        }

    results["all_pass"] = all(c["pass"] for c in results["checks"].values())
    out = pathlib.Path(__file__).resolve().parents[1] / "KERNEL_PARITY.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    sys.exit(0 if results["all_pass"] else 1)


if __name__ == "__main__":
    main()
