"""Weight-only int8 AR-decode serving mode (Decoder.Quantize_Int8 /
Synthesizer(quantize="int8")).

The quantized path only ever changes the AR inference LSTM GEMMs; the
teacher-forced training path must be bit-identical with the flag on."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.ops import decoder_scan as dscan
from multi_speaker_tts_tpu.ops.lstm import LSTMParams


def _random_params(rng, n_layers=2, d_in=24, hidden=16, attn=8, conv_c=4,
                   kernel=5):
    lstm = []
    for i in range(n_layers):
        din = d_in if i == 0 else hidden + 12
        lstm.append(LSTMParams(
            w_ih=jnp.asarray(rng.normal(0, 0.08, (din, 4 * hidden)), jnp.float32),
            w_hh=jnp.asarray(rng.normal(0, 0.08, (hidden, 4 * hidden)), jnp.float32),
            b=jnp.asarray(rng.normal(0, 0.01, (4 * hidden,)), jnp.float32),
        ))
    ap = dscan.AttentionParams(
        wq=jnp.asarray(rng.normal(0, 0.1, (hidden, attn)), jnp.float32),
        conv_kernel=jnp.asarray(rng.normal(0, 0.1, (kernel, 2, conv_c)), jnp.float32),
        wloc=jnp.asarray(rng.normal(0, 0.1, (conv_c, attn)), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.1, (attn, 1)), jnp.float32),
    )
    return dscan.DecoderScanParams(lstm=tuple(lstm), attention=ap)


def test_quantize_fused_reconstruction():
    rng = np.random.default_rng(0)
    p = _random_params(rng)
    qs = dscan.quantize_fused(p)
    assert len(qs) == len(p.lstm)
    for (wq, scale), q in zip(qs, p.lstm):
        w = np.concatenate([np.asarray(q.w_ih), np.asarray(q.w_hh)], axis=0)
        assert wq.dtype == jnp.int8 and scale.dtype == jnp.float32
        assert wq.shape == w.shape and scale.shape == (w.shape[1],)
        recon = np.asarray(wq, np.float32) * np.asarray(scale)[None, :]
        # Symmetric per-channel max scaling: error <= scale/2 per element.
        assert np.all(np.abs(recon - w) <= np.asarray(scale)[None, :] * 0.5 + 1e-7)


def test_gates_int8_close_to_f32():
    rng = np.random.default_rng(1)
    p = _random_params(rng)
    q0 = dscan.quantize_fused(p)[0]
    w_cat = jnp.concatenate([p.lstm[0].w_ih, p.lstm[0].w_hh], axis=0)
    B = 6
    x = jnp.asarray(rng.normal(0, 1, (B, p.lstm[0].w_ih.shape[0])), jnp.float32)
    h = jnp.asarray(rng.normal(0, 0.5, (B, 16)), jnp.float32)
    g_f = dscan._gates(w_cat, p.lstm[0].b, x, h, jnp.float32)
    g_q = dscan._gates(q0, p.lstm[0].b, x, h, jnp.float32)
    # int8 weight + dynamic per-row activation quant: a few percent of the
    # gate magnitude scale.
    tol = 0.05 * float(jnp.std(g_f)) + 1e-3
    assert float(jnp.max(jnp.abs(g_f - g_q))) < tol * 10
    assert float(jnp.mean(jnp.abs(g_f - g_q))) < tol


def test_ar_scan_quantized_runs_and_tracks_f32():
    rng = np.random.default_rng(2)
    p = _random_params(rng)
    hidden = 16
    B, S, D_mem, mel = 3, 7, 12, 5
    keys = jnp.asarray(rng.normal(0, 0.3, (B, S, 8)), jnp.float32)
    memory = jnp.asarray(rng.normal(0, 0.3, (B, S, D_mem)), jnp.float32)
    mask = jnp.ones((B, S), jnp.float32)
    wf = jnp.asarray(rng.normal(0, 0.1, (hidden + D_mem, mel)), jnp.float32)
    ws = jnp.asarray(rng.normal(0, 0.1, (hidden + D_mem, 1)), jnp.float32)

    def prenet_fn(frame, rngkey):
        return jnp.tanh(frame @ jnp.ones((mel, 12), jnp.float32) * 0.1)

    def project_fn(x):
        return x @ wf, (x @ ws)[..., 0]

    kw = dict(n_steps=10, rng=jax.random.PRNGKey(0), mel_dim=mel)
    f32 = dscan.decoder_ar_scan(p, prenet_fn, project_fn, keys, memory, mask,
                                **kw)
    q = dscan.decoder_ar_scan(p, prenet_fn, project_fn, keys, memory, mask,
                              fused=dscan.quantize_fused(p), **kw)
    for a, b in zip(f32, q):
        assert np.isfinite(np.asarray(b)).all()
        # AR feedback accumulates quantization error; the trajectories must
        # still be close on this tiny well-conditioned cell.
        assert float(jnp.max(jnp.abs(a - b))) < 0.15


def test_early_exit_quantized_matches_fixed_scan_lengths():
    rng = np.random.default_rng(3)
    p = _random_params(rng)
    hidden = 16
    B, S, D_mem, mel = 2, 5, 12, 5
    keys = jnp.asarray(rng.normal(0, 0.3, (B, S, 8)), jnp.float32)
    memory = jnp.asarray(rng.normal(0, 0.3, (B, S, D_mem)), jnp.float32)
    mask = jnp.ones((B, S), jnp.float32)
    wf = jnp.asarray(rng.normal(0, 0.1, (hidden + D_mem, mel)), jnp.float32)
    ws = jnp.asarray(rng.normal(0, 0.1, (hidden + D_mem, 1)), jnp.float32)

    def prenet_fn(frame, rngkey):
        return jnp.tanh(frame @ jnp.ones((mel, 12), jnp.float32) * 0.1)

    def project_fn(x):
        return x @ wf, (x @ ws)[..., 0]

    fused = dscan.quantize_fused(p)
    frames, stops, aligns, lengths = dscan.decoder_ar_early_exit(
        p, prenet_fn, project_fn, keys, memory, mask, 8, 0.5,
        jax.random.PRNGKey(0), mel, chunk=4, fused=fused,
    )
    f2, s2, a2 = dscan.decoder_ar_scan(
        p, prenet_fn, project_fn, keys, memory, mask, 8,
        jax.random.PRNGKey(0), mel, fused=fused,
    )
    # Same quantized math in both drivers: identical until the first stop.
    L = int(np.asarray(lengths).min())
    np.testing.assert_allclose(np.asarray(frames)[:L], np.asarray(f2)[:L],
                               rtol=0, atol=1e-5)


def test_teacher_forced_unaffected_by_flag(tiny_hp):
    """Quantize_Int8 must not change the training path at all."""
    from multi_speaker_tts_tpu.train import trainer as trainer_lib

    rng = np.random.default_rng(4)
    hp_q = tiny_hp.replace(Decoder={"Quantize_Int8": True})
    B, S = 2, 10
    r = int(tiny_hp.Decoder.get("N_Frames_Per_Step", 1))
    T = 12 * r
    batch = {
        "tokens": rng.integers(2, 20, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "mels": rng.uniform(0, 1, (B, T, tiny_hp.Sound.Mel_Dim)).astype(np.float32),
        "mel_lengths": np.full((B,), T, np.int32),
        "spects": rng.uniform(
            0, 1, (B, T, tiny_hp.Sound.Spectrogram_Dim)
        ).astype(np.float32),
        "ref_mels": rng.uniform(
            0, 1,
            (B, tiny_hp.Speaker_Embedding.GE2E.Window_Length, tiny_hp.Sound.Mel_Dim),
        ).astype(np.float32),
        "speaker_ids": np.zeros((B,), np.int32),
    }
    outs = []
    for hp in (tiny_hp, hp_q):
        models = trainer_lib.build_models(hp)
        state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), batch)
        step = jax.jit(trainer_lib.make_train_step(hp, models))
        _, m = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
        outs.append(float(m["total"]))
    assert outs[0] == outs[1]


def test_synthesizer_int8_end_to_end(tiny_hp):
    from multi_speaker_tts_tpu.inference import Synthesizer
    from multi_speaker_tts_tpu.train import trainer as trainer_lib

    rng = np.random.default_rng(5)
    B, S = 2, 10
    batch = {
        "tokens": rng.integers(2, 20, size=(B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "mels": rng.uniform(0, 1, (B, 12, tiny_hp.Sound.Mel_Dim)).astype(np.float32),
        "ref_mels": rng.uniform(
            0, 1,
            (B, tiny_hp.Speaker_Embedding.GE2E.Window_Length, tiny_hp.Sound.Mel_Dim),
        ).astype(np.float32),
    }
    models = trainer_lib.build_models(tiny_hp)
    state = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)
    synth = Synthesizer.from_state(tiny_hp, state, quantize="int8")
    assert synth.hp.Decoder.Quantize_Int8 is True
    spk = synth.enroll(
        [rng.normal(0, 0.1, 8000).astype(np.float32)]
    )
    out = synth.synthesize(["hello world"], spk, max_steps=16, vocode=False)
    assert np.isfinite(out[0]["mel"]).all()
    assert out[0]["mel"].shape[-1] == tiny_hp.Sound.Mel_Dim

    with pytest.raises(ValueError):
        Synthesizer.from_state(tiny_hp, state, quantize="int4")
