"""End-to-end checkpoint-conversion parity (VERDICT round-1 item 1;
BASELINE.json:5 "checkpoint-convertible weights ... mel L1 parity").

A live PyTorch model of the reference architecture (convert.reference_torch,
reconstructed per SURVEY.md section 2) is saved reference-style
(``torch.save({'Model': ...})``), converted with the full-model mapping
table (convert.mapping), loaded into the JAX models, and the two frameworks'
forward passes are compared at <= 1e-4: teacher-forced mel pre/post, stop
logits, alignments, the linear branch, and GE2E embeddings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multi_speaker_tts_tpu.convert.mapping import (  # noqa: E402
    convert_full_checkpoint,
    full_mapping,
)
from multi_speaker_tts_tpu.convert.reference_torch import (  # noqa: E402
    build_reference_ge2e,
    build_reference_tacotron,
    save_reference_checkpoint,
)
from multi_speaker_tts_tpu.models import GE2E, Tacotron  # noqa: E402


@pytest.fixture(scope="module", params=["Conv", "CBHG"])
def parity_hp(tiny_hp, request):
    # Prenet dropout must be 0 for determinism (the reference keeps prenet
    # dropout always on; with rate 0 both sides reduce to identity). Both
    # linear-branch designs are parity-tested: the reference-faithful CBHG
    # and the conv stand-in.
    return tiny_hp.replace(
        Decoder={"Prenet": {"Dropout_Rate": 0.0}},
        Linear_Head={"Type": request.param},
    )


@pytest.fixture(scope="module")
def torch_models(parity_hp):
    torch.manual_seed(7)
    taco = build_reference_tacotron(parity_hp)
    ge2e = build_reference_ge2e(parity_hp)
    # Run a few train-mode steps so BatchNorm running stats are non-trivial
    # (otherwise stats-conversion bugs hide behind mean=0/var=1).
    g = torch.Generator().manual_seed(0)
    taco.train()
    for _ in range(3):
        tokens = torch.randint(1, 20, (2, 12), generator=g)
        mels = torch.rand((2, 16, parity_hp.Sound.Mel_Dim), generator=g)
        spk = torch.nn.functional.normalize(
            torch.randn((2, parity_hp.Speaker_Embedding.Embedding_Size), generator=g),
            dim=-1,
        )
        taco(tokens, torch.tensor([12, 9]), mels, spk)
    taco.eval()
    ge2e.eval()
    return taco, ge2e


@pytest.fixture(scope="module")
def converted(torch_models, parity_hp, tmp_path_factory):
    taco, ge2e = torch_models
    path = tmp_path_factory.mktemp("ref_ckpt") / "S_100.pt"
    save_reference_checkpoint(str(path), tacotron=taco, ge2e=ge2e, steps=100)
    return convert_full_checkpoint(str(path), parity_hp)


def test_mapping_covers_whole_state_dict(torch_models, parity_hp):
    """Every torch parameter/buffer is consumed by the mapping (no silently
    unconverted weights), except BN's num_batches_tracked bookkeeping."""
    taco, ge2e = torch_models
    state = dict(taco.state_dict())
    state.update({f"ge2e.{k}": v for k, v in ge2e.state_dict().items()})
    mapped = {k for _, keys in full_mapping(parity_hp).values() for k in keys}
    unmapped = {
        k for k in state if k not in mapped and "num_batches_tracked" not in k
    }
    assert not unmapped, f"unconverted torch keys: {sorted(unmapped)[:10]}"


def test_step_roundtrip(converted):
    assert converted["step"] == 100


def test_full_tacotron_forward_parity(torch_models, converted, parity_hp):
    taco_t, _ = torch_models
    rng = np.random.default_rng(3)
    B, S, T = 2, 12, 16
    tokens = rng.integers(1, 20, (B, S)).astype(np.int32)
    token_lengths = np.asarray([S, S - 3], np.int32)
    mels = rng.random((B, T, parity_hp.Sound.Mel_Dim), np.float32)
    spk = rng.standard_normal((B, parity_hp.Speaker_Embedding.Embedding_Size))
    spk = (spk / np.linalg.norm(spk, axis=-1, keepdims=True)).astype(np.float32)

    with torch.no_grad():
        out_t = taco_t(
            torch.from_numpy(tokens).long(),
            torch.from_numpy(token_lengths).long(),
            torch.from_numpy(mels),
            torch.from_numpy(spk),
        )

    model = Tacotron.from_hp(parity_hp)
    out_j = model.apply(
        {
            "params": converted["params"]["tacotron"],
            "batch_stats": converted["batch_stats"]["tacotron"],
        },
        jnp.asarray(tokens),
        jnp.asarray(token_lengths),
        jnp.asarray(mels),
        jnp.asarray(spk),
        False,
        rngs={"prenet": jax.random.PRNGKey(0)},
    )
    for key in ("mel_pre", "mel_post", "stop_logits", "alignments", "linear"):
        got = np.asarray(jax.device_get(out_j[key]), np.float32)
        want = out_t[key].numpy()
        np.testing.assert_allclose(
            got, want, atol=1e-4, rtol=1e-4, err_msg=f"parity failure: {key}"
        )


def test_ge2e_embedding_parity(torch_models, converted, parity_hp):
    _, ge2e_t = torch_models
    rng = np.random.default_rng(4)
    L = parity_hp.Speaker_Embedding.GE2E.Window_Length
    mels = rng.random((3, L, parity_hp.Sound.Mel_Dim), np.float32)
    with torch.no_grad():
        want = ge2e_t(torch.from_numpy(mels)).numpy()
    model = GE2E.from_hp(parity_hp)
    got = np.asarray(
        jax.device_get(
            model.apply({"params": converted["params"]["ge2e"]}, jnp.asarray(mels))
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # Embeddings are unit-norm on both sides.
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_converted_weights_drive_training_state(converted, parity_hp):
    """The converted tree slots straight into the Trainer's param layout:
    a jitted train step runs and produces finite losses."""
    from multi_speaker_tts_tpu.train import trainer as trainer_lib

    models = trainer_lib.build_models(parity_hp)
    rng = np.random.default_rng(5)
    B, S, T = 4, 12, 16
    batch = {
        "tokens": rng.integers(1, 20, (B, S)).astype(np.int32),
        "token_lengths": np.full((B,), S, np.int32),
        "mels": rng.random((B, T, parity_hp.Sound.Mel_Dim), np.float32),
        "mel_lengths": np.asarray([T, T, T - 2, T - 4], np.int32),
        "ref_mels": rng.random(
            (B, parity_hp.Speaker_Embedding.GE2E.Window_Length,
             parity_hp.Sound.Mel_Dim), np.float32,
        ),
        "spects": rng.random((B, T, parity_hp.Sound.Spectrogram_Dim), np.float32),
        "speaker_ids": np.zeros((B,), np.int32),
    }
    state = trainer_lib.init_state(parity_hp, models, jax.random.PRNGKey(0), batch)
    # Graft the converted weights over the freshly initialized layout; tree
    # structures must match exactly.
    jax.tree.map(lambda a, b: None, state.params["tacotron"],
                 converted["params"]["tacotron"])
    state = state.replace(
        params=dict(state.params, **converted["params"]),
        batch_stats=converted["batch_stats"],
    )
    step = jax.jit(trainer_lib.make_train_step(parity_hp, models))
    state, metrics = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))


def test_convert_cli_to_servable_compact(torch_models, parity_hp, tmp_path,
                                         monkeypatch):
    """python -m multi_speaker_tts_tpu.convert: one command from the
    reference torch.save file to a compact checkpoint the Synthesizer
    loads and serves from."""
    import sys

    from multi_speaker_tts_tpu.convert.__main__ import main as convert_main
    from multi_speaker_tts_tpu.inference import Synthesizer

    taco, ge2e = torch_models
    src = tmp_path / "S_100.pt"
    dst = tmp_path / "converted.msgpack"
    save_reference_checkpoint(str(src), tacotron=taco, ge2e=ge2e, steps=100)
    hp_yaml = tmp_path / "hp.yaml"
    import yaml

    hp_yaml.write_text(yaml.safe_dump(parity_hp.to_dict()))
    monkeypatch.setattr(sys, "argv", [
        "convert", "-in", str(src), "-hp", str(hp_yaml), "-out", str(dst),
    ])
    convert_main()
    synth = Synthesizer.from_compact(str(dst))  # hp from meta
    spk = synth.enroll(
        [np.random.default_rng(9).normal(size=4096).astype(np.float32)]
    )
    out = synth.synthesize(["converted"], spk, max_steps=8, vocode=False)[0]
    assert out["mel_length"] >= 1
    assert np.isfinite(out["mel"]).all()
