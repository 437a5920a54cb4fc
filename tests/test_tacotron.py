"""Synthesizer tests: shapes, masking, TF/AR param sharing, loss properties."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.models import losses as L
from multi_speaker_tts_tpu.models.tacotron import Tacotron


B, S, T, MEL, SPK = 2, 11, 16, 16, 8


@pytest.fixture(scope="module")
def tiny_taco(tiny_hp):
    model = Tacotron.from_hp(
        tiny_hp, speaker_embedding_size=SPK, compute_dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(2, 30, size=(B, S)), jnp.int32)
    token_lengths = jnp.asarray([S, S - 4], jnp.int32)
    mels = jnp.asarray(rng.uniform(0, 1, size=(B, T, MEL)), jnp.float32)
    spk = jnp.asarray(rng.normal(size=(B, SPK)), jnp.float32)
    spk = spk / jnp.linalg.norm(spk, axis=-1, keepdims=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)},
        tokens, token_lengths, mels, spk,
    )
    return model, variables, tokens, token_lengths, mels, spk


def test_teacher_forced_shapes(tiny_taco):
    model, variables, tokens, token_lengths, mels, spk = tiny_taco
    out = model.apply(
        variables, tokens, token_lengths, mels, spk,
        rngs={"prenet": jax.random.PRNGKey(2)},
    )
    assert out["mel_pre"].shape == (B, T, MEL)
    assert out["mel_post"].shape == (B, T, MEL)
    assert out["stop_logits"].shape == (B, T)
    assert out["alignments"].shape == (B, T, S)
    for v in out.values():
        assert bool(jnp.all(jnp.isfinite(v)))


def test_alignments_are_distributions(tiny_taco):
    model, variables, tokens, token_lengths, mels, spk = tiny_taco
    out = model.apply(
        variables, tokens, token_lengths, mels, spk,
        rngs={"prenet": jax.random.PRNGKey(2)},
    )
    sums = np.asarray(out["alignments"].sum(axis=-1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)
    # attention never lands on padded token positions of item 1
    padded_mass = np.asarray(out["alignments"])[1, :, S - 4 :].sum()
    assert padded_mass < 1e-6


def test_ar_inference_shapes_and_masking(tiny_taco):
    model, variables, tokens, token_lengths, _, spk = tiny_taco
    out = model.apply(
        variables, tokens, token_lengths, spk, 32, 0.5,
        method=model.infer,
        rngs={"prenet": jax.random.PRNGKey(3)},
    )
    assert out["mel_post"].shape == (B, 32, MEL)
    assert out["mel_lengths"].shape == (B,)
    lengths = np.asarray(out["mel_lengths"])
    mel = np.asarray(out["mel_post"])
    for b in range(B):
        assert np.all(mel[b, lengths[b]:] == 0.0), "frames past stop not masked"


def test_early_exit_matches_fixed_length_decode(tiny_hp):
    """The stop-aware while_loop decode produces the same lengths and the
    same frames (up to each utterance's stop) as the fixed-length scan with
    post-hoc masking. Prenet dropout is zeroed so both paths are
    deterministic regardless of rng folding differences."""
    hp = tiny_hp.replace(Decoder={"Prenet": {"Dropout_Rate": 0.0}})
    model = Tacotron.from_hp(hp)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(2, 30, size=(B, S)), jnp.int32)
    token_lengths = jnp.asarray([S, S - 4], jnp.int32)
    spk = rng.standard_normal((B, 16))
    spk = jnp.asarray(spk / np.linalg.norm(spk, axis=-1, keepdims=True), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)},
        tokens, token_lengths,
        jnp.zeros((B, 8, MEL), jnp.float32), spk,
    )
    outs = {}
    for early_exit in (False, True):
        outs[early_exit] = model.apply(
            variables, tokens, token_lengths, spk, 32, 0.5, early_exit,
            method=model.infer, rngs={"prenet": jax.random.PRNGKey(2)},
        )
    np.testing.assert_array_equal(
        np.asarray(outs[True]["mel_lengths"]), np.asarray(outs[False]["mel_lengths"])
    )
    lengths = np.asarray(outs[True]["mel_lengths"])
    for b in range(B):
        L = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(outs[True]["mel_post"])[b, :L],
            np.asarray(outs[False]["mel_post"])[b, :L],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True]["alignments"])[b, :L],
            np.asarray(outs[False]["alignments"])[b, :L],
            atol=1e-5,
        )
        assert np.all(np.asarray(outs[True]["mel_post"])[b, L:] == 0.0)


def test_tf_and_ar_share_params(tiny_taco):
    """The same variables dict drives both call paths - one cell, two modes
    (SURVEY.md section 7 hard part #1)."""
    model, variables, tokens, token_lengths, mels, spk = tiny_taco
    tf_out = model.apply(
        variables, tokens, token_lengths, mels, spk,
        rngs={"prenet": jax.random.PRNGKey(4)},
    )
    ar_out = model.apply(
        variables, tokens, token_lengths, spk, 16, 0.5,
        method=model.infer, rngs={"prenet": jax.random.PRNGKey(4)},
    )
    assert tf_out["mel_pre"].shape[2] == ar_out["mel_pre"].shape[2]


def test_unconditioned_model(tiny_hp):
    """speaker_embedding_size=0 -> single-speaker LJ config, no spk input."""
    model = Tacotron.from_hp(tiny_hp, speaker_embedding_size=0)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(2, 30, size=(1, 7)), jnp.int32)
    mels = jnp.asarray(rng.uniform(size=(1, 8, MEL)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)},
        tokens, jnp.asarray([7]), mels,
    )
    out = model.apply(
        variables, tokens, jnp.asarray([7]), mels,
        rngs={"prenet": jax.random.PRNGKey(2)},
    )
    assert out["mel_post"].shape == (1, 8, MEL)


def test_batchnorm_train_mode_updates_stats(tiny_taco):
    model, variables, tokens, token_lengths, mels, spk = tiny_taco
    out, mutated = model.apply(
        variables, tokens, token_lengths, mels, spk, True,
        rngs={"prenet": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_losses_masking():
    rng = np.random.default_rng(2)
    mels = jnp.asarray(rng.uniform(size=(B, T, MEL)), jnp.float32)
    outputs = {
        "mel_pre": mels + 0.1,
        "mel_post": mels + 0.05,
        "stop_logits": jnp.zeros((B, T)),
        "alignments": jnp.ones((B, T, S)) / S,
    }
    mel_lengths = jnp.asarray([T, T // 2], jnp.int32)
    token_lengths = jnp.asarray([S, S // 2], jnp.int32)
    out = L.tacotron_losses(outputs, mels, mel_lengths, token_lengths)
    np.testing.assert_allclose(float(out["mel_pre"]), 0.1, atol=1e-5)
    np.testing.assert_allclose(float(out["mel_post"]), 0.05, atol=1e-5)
    assert float(out["total"]) > 0
    # corrupting only the padded region must not change the loss
    corrupted = dict(outputs)
    corrupted["mel_pre"] = outputs["mel_pre"].at[1, T // 2 :].add(99.0)
    out2 = L.tacotron_losses(corrupted, mels, mel_lengths, token_lengths)
    np.testing.assert_allclose(float(out2["mel_pre"]), float(out["mel_pre"]), atol=1e-6)


def test_guided_attention_prefers_diagonal():
    diag = jnp.eye(10)[None, :, :]  # (1, 10, 10) perfect diagonal
    anti = jnp.eye(10)[::-1][None, :, :]
    lengths = jnp.asarray([10], jnp.int32)
    l_diag = L.guided_attention_loss(diag, lengths, lengths)
    l_anti = L.guided_attention_loss(anti, lengths, lengths)
    assert float(l_diag) < float(l_anti)


def test_stop_bce_decreases_with_correct_logits():
    mel_lengths = jnp.asarray([8, 4], jnp.int32)
    steps = jnp.arange(8)[None, :]
    good_target = (steps >= (mel_lengths[:, None] - 1)).astype(jnp.float32)
    good = (good_target * 2 - 1) * 5.0  # +5 where stop, -5 elsewhere
    bad = -good
    l_good = L.stop_token_bce(good, mel_lengths)
    l_bad = L.stop_token_bce(bad, mel_lengths)
    assert float(l_good) < 0.05 < float(l_bad)


def test_conv_via_gemm_matches_lax_conv(monkeypatch):
    """The shifted-GEMM conv form (MSTTS_CONV_GEMM=1; PROFILE.md 'Conv as
    shifted GEMMs') must be a drop-in for nn.Conv: identical param tree,
    same outputs, same gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_speaker_tts_tpu.models.layers import ConvBNBlock

    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 19, 6)), jnp.float32
    )
    blk = ConvBNBlock(channels=8, kernel_size=5, activation="tanh",
                      dropout_rate=0.0)
    variables = blk.init(jax.random.PRNGKey(0), x)

    def loss(v, use_gemm):
        if use_gemm:
            monkeypatch.setenv("MSTTS_CONV_GEMM", "1")
        else:
            monkeypatch.delenv("MSTTS_CONV_GEMM", raising=False)
        return (blk.apply(v, x) ** 2).mean()

    ref, gref = jax.value_and_grad(lambda v: loss(v, False))(variables)
    out, gout = jax.value_and_grad(lambda v: loss(v, True))(variables)
    assert jax.tree_util.tree_structure(gref) == jax.tree_util.tree_structure(gout)
    np.testing.assert_allclose(ref, out, atol=1e-6)
    for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gout)):
        np.testing.assert_allclose(a, b, atol=1e-5)
