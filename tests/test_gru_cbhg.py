"""GRU primitive parity vs torch, and the CBHG linear head (SURVEY.md
section 2 "Synthesizer": Taco1 post-processing CBHG)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.models.cbhg import CBHG, CBHGHead
from multi_speaker_tts_tpu.ops import gru as gru_ops


def test_gru_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B, T, D, H = 3, 11, 6, 8
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    torch.manual_seed(1)
    ref = torch.nn.GRU(D, H, batch_first=True)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))

    params = gru_ops.GRUParams(
        w_ih=jnp.asarray(ref.weight_ih_l0.detach().numpy().T),
        w_hh=jnp.asarray(ref.weight_hh_l0.detach().numpy().T),
        b_ih=jnp.asarray(ref.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(ref.bias_hh_l0.detach().numpy()),
    )
    got, h_T = gru_ops.gru(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[:, -1]), np.asarray(h_T), atol=1e-6)


def test_gru_reverse_matches_torch_bidirectional_back_half():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    B, T, D, H = 2, 9, 5, 4
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    torch.manual_seed(3)
    ref = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))
    params = gru_ops.GRUParams(
        w_ih=jnp.asarray(ref.weight_ih_l0_reverse.detach().numpy().T),
        w_hh=jnp.asarray(ref.weight_hh_l0_reverse.detach().numpy().T),
        b_ih=jnp.asarray(ref.bias_ih_l0_reverse.detach().numpy()),
        b_hh=jnp.asarray(ref.bias_hh_l0_reverse.detach().numpy()),
    )
    got, _ = gru_ops.gru(params, jnp.asarray(x), reverse=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy()[..., H:], atol=1e-5)


@pytest.fixture(scope="module")
def cbhg_hp(tiny_hp):
    return tiny_hp.replace(Linear_Head={"Type": "CBHG"})


def test_cbhg_shapes(cbhg_hp):
    cb = cbhg_hp.Linear_Head.CBHG
    model = CBHG(
        bank_k=cb.Bank_K, bank_channels=cb.Bank_Channels,
        projection_channels=cb.Projection_Channels,
        highway_layers=cb.Highway.Layers, highway_size=cb.Highway.Size,
        gru_size=cb.GRU_Size,
    )
    x = jnp.asarray(np.random.default_rng(0).random((2, 20, 16), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 20, cb.GRU_Size)
    assert "bank_0" in variables["params"] and f"bank_{cb.Bank_K-1}" in variables["params"]


def test_cbhg_head_in_tacotron_train_step(cbhg_hp):
    """A CBHG-headed synthesizer trains: jitted step, finite decreasing loss."""
    from multi_speaker_tts_tpu.train import trainer as trainer_lib

    models = trainer_lib.build_models(cbhg_hp)
    rng = np.random.default_rng(1)
    B, S, T = 4, 12, 16
    batch = {
        "tokens": rng.integers(1, 20, (B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "mels": rng.random((B, T, cbhg_hp.Sound.Mel_Dim), np.float32),
        "mel_lengths": np.asarray([T, T, T - 2, T - 4], np.int32),
        "ref_mels": rng.random(
            (B, cbhg_hp.Speaker_Embedding.GE2E.Window_Length,
             cbhg_hp.Sound.Mel_Dim), np.float32,
        ),
        "spects": rng.random((B, T, cbhg_hp.Sound.Spectrogram_Dim), np.float32),
        "speaker_ids": np.zeros((B,), np.int32),
    }
    state = trainer_lib.init_state(cbhg_hp, models, jax.random.PRNGKey(0), batch)
    assert "cbhg" in state.params["tacotron"]["linear_head"]
    step = jax.jit(trainer_lib.make_train_step(cbhg_hp, models))
    batch_dev = jax.tree.map(jnp.asarray, batch)
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch_dev, jax.random.PRNGKey(2))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0]


def test_cbhg_head_infer(cbhg_hp):
    """AR inference produces a linear spectrogram from the CBHG branch."""
    from multi_speaker_tts_tpu.models import Tacotron

    model = Tacotron.from_hp(cbhg_hp)
    rng = np.random.default_rng(3)
    tokens = rng.integers(1, 20, (2, 10)).astype(np.int32)
    tl = np.asarray([10, 7], np.int32)
    spk = rng.standard_normal((2, cbhg_hp.Speaker_Embedding.Embedding_Size))
    spk = (spk / np.linalg.norm(spk, axis=-1, keepdims=True)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)},
        jnp.asarray(tokens), jnp.asarray(tl),
        jnp.zeros((2, 8, cbhg_hp.Sound.Mel_Dim), jnp.float32),
        jnp.asarray(spk),
    )
    out = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(tl), jnp.asarray(spk),
        16, 0.5, method=model.infer, rngs={"prenet": jax.random.PRNGKey(2)},
    )
    assert out["linear"].shape == (2, 16, cbhg_hp.Sound.Spectrogram_Dim)
    assert np.isfinite(np.asarray(out["linear"])).all()
