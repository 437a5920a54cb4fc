"""Benchmark: batched zero-shot synthesis speed on the real TPU chip.

Headline metric (BASELINE.json:5 target): batched synthesis x-realtime per
TPU core, full pipeline on-chip - GE2E enrollment embedding, Tacotron AR
decode to a fixed frame budget (stop disabled so the workload is constant),
linear head, and 60-iteration Griffin-Lim vocoding. Audio-seconds generated
per wall-second. Target >= 20x; vs_baseline is value / 20.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Secondary mode (``BENCH_MODE=train``): teacher-forced training throughput in
mel frames/sec/chip (BASELINE.json:2's other metric; no reference number
exists - measured 116k frames/s/chip at B=32, T=400, 44.3M params).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multi_speaker_tts_tpu.audio import dsp
    from multi_speaker_tts_tpu.hparams import default_hparams
    from multi_speaker_tts_tpu.ops import stft_matmul
    from multi_speaker_tts_tpu.train import trainer as trainer_lib

    if os.environ.get("BENCH_MODE") == "train":
        _bench_train(jax, jnp, np, default_hparams, trainer_lib)
        return

    # Constant-workload decode: threshold > 1 means sigmoid never crosses it,
    # so every utterance runs the full MAX_STEPS frames.
    hp = default_hparams(Decoder={"Stop_Threshold": 1.5})
    cfg = dsp.DSPConfig.from_hp(hp)
    models = trainer_lib.build_models(hp)

    BATCH = int(os.environ.get("BENCH_BATCH", "16"))
    MAX_STEPS = int(os.environ.get("BENCH_FRAMES", "400"))
    S = 64

    rng = np.random.default_rng(0)
    init_batch = {
        "tokens": rng.integers(2, 30, size=(BATCH, S)).astype(np.int32),
        "token_lengths": np.full((BATCH,), S, np.int32),
        "mels": rng.uniform(0, 1, size=(BATCH, 32, hp.Sound.Mel_Dim)).astype(np.float32),
        "ref_mels": rng.uniform(
            0, 1,
            size=(BATCH, hp.Speaker_Embedding.GE2E.Window_Length, hp.Sound.Mel_Dim),
        ).astype(np.float32),
    }
    state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), init_batch)

    def synthesize(params, batch_stats, tokens, token_lengths, ref_mels, rngkey):
        spk = models.ge2e.apply({"params": params["ge2e"]}, ref_mels)
        out = models.tacotron.apply(
            {"params": params["tacotron"], "batch_stats": batch_stats["tacotron"]},
            tokens,
            token_lengths,
            spk,
            MAX_STEPS,
            hp.Decoder.Stop_Threshold,
            method=models.tacotron.infer,
            rngs={"prenet": rngkey},
        )
        S_db = dsp.denormalize(out["linear"], cfg.min_level_db)
        mag = dsp.db_to_amp(S_db + cfg.ref_level_db)
        length = cfg.hop * (mag.shape[-2] - 1)
        wav = stft_matmul.griffin_lim_auto(
            mag**cfg.power, cfg.n_fft, cfg.hop, cfg.griffin_lim_iter, length,
            precision=os.environ.get("BENCH_GL_PRECISION", "highest"),
        )
        wav = dsp.inv_preemphasis(wav, cfg.preemphasis)
        # Scalar probe: fetching this float forces full execution. On the
        # axon-tunneled TPU, jax.block_until_ready does NOT synchronize and a
        # full wav transfer costs seconds of tunnel overhead; a scalar fetch
        # is the only honest sync.
        return jnp.abs(wav).mean()

    fn = jax.jit(synthesize)
    args = (
        state.params,
        state.batch_stats,
        jnp.asarray(init_batch["tokens"]),
        jnp.asarray(init_batch["token_lengths"]),
        jnp.asarray(init_batch["ref_mels"]),
        jax.random.PRNGKey(1),
    )

    float(fn(*args))  # compile + warmup

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        probe = None
        for _ in range(n):
            probe = fn(*args)
        float(probe)  # sync
        return time.perf_counter() - t0

    # Two-point slope cancels the fixed host<->device round-trip (~30 ms).
    n_hi = 3
    t_lo = min(timed(1) for _ in range(2))
    t_hi = min(timed(n_hi) for _ in range(2))
    dt = max((t_hi - t_lo) / (n_hi - 1), 1e-9)

    audio_seconds = BATCH * MAX_STEPS * cfg.hop / cfg.sample_rate
    x_realtime = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "batched_synthesis_x_realtime_per_core",
                "value": round(x_realtime, 2),
                "unit": "x_realtime",
                "vs_baseline": round(x_realtime / 20.0, 3),
            }
        )
    )


def _bench_train(jax, jnp, np, default_hparams, trainer_lib) -> None:
    """BENCH_MODE=train: teacher-forced training throughput."""
    import json as _json
    import time as _time

    hp = default_hparams()
    models = trainer_lib.build_models(hp)
    B, S, T = 32, 100, 400
    rng = np.random.default_rng(0)
    batch = {
        "tokens": rng.integers(2, 30, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "mels": rng.uniform(0, 1, size=(B, T, hp.Sound.Mel_Dim)).astype(np.float32),
        "mel_lengths": np.full((B,), T, np.int32),
        "spects": rng.uniform(0, 1, size=(B, T, hp.Sound.Spectrogram_Dim)).astype(np.float32),
        "ref_mels": rng.uniform(
            0, 1, size=(B, hp.Speaker_Embedding.GE2E.Window_Length, hp.Sound.Mel_Dim)
        ).astype(np.float32),
        "speaker_ids": np.zeros((B,), np.int32),
    }
    state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer_lib.make_train_step(hp, models), donate_argnums=0)
    bd = jax.tree.map(jnp.asarray, batch)
    key = jax.random.PRNGKey(1)
    state, m = step(state, bd, key)
    float(m["total"])  # sync (block_until_ready is a no-op on the tunnel)

    def run(n, state):
        t0 = _time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, bd, key)
        float(m["total"])
        return _time.perf_counter() - t0, state

    a, state = run(1, state)
    b, state = run(4, state)
    per = (b - a) / 3
    frames_per_sec = B * T / per
    print(
        _json.dumps(
            {
                "metric": "teacher_forced_train_mel_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 1),
                "unit": "frames/sec",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
