"""GE2E speaker-encoder training: loss decreases, w stays positive,
checkpoint resume works (the reference trains this encoder separately)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.data import generate_synthetic_dataset
from multi_speaker_tts_tpu.train.ge2e_trainer import (
    GE2ETrainer,
    init_ge2e_state,
    make_ge2e_train_step,
)
from multi_speaker_tts_tpu.models import GE2E


@pytest.fixture(scope="module")
def ge2e_hp(tiny_hp):
    return tiny_hp.replace(
        GE2E_Train={
            "Batch_Speakers": 3,
            "Batch_Utterances": 4,
            "Frame_Length": 24,
            "Learning_Rate": 0.01,
            "Scale_Gradient": 0.01,
        }
    )


@pytest.fixture(scope="module")
def pattern_dir(ge2e_hp, tmp_path_factory):
    root = tmp_path_factory.mktemp("ge2esynth")
    generate_synthetic_dataset(ge2e_hp, root, n_speakers=3, n_utterances=6)
    return root / "patterns"


def test_ge2e_step_reduces_loss(ge2e_hp):
    model = GE2E.from_hp(ge2e_hp, compute_dtype=jnp.float32)
    N, M, L, D = 3, 4, 24, ge2e_hp.Sound.Mel_Dim
    rng = np.random.default_rng(0)
    base = rng.normal(size=(N, 1, 1, D)) * 2.0
    mels = jnp.asarray(
        (base + 0.3 * rng.normal(size=(N, M, L, D))).reshape(N * M, L, D), jnp.float32
    )
    state = init_ge2e_state(ge2e_hp, model, jax.random.PRNGKey(0), mels)
    step = jax.jit(make_ge2e_train_step(ge2e_hp, model))
    losses = []
    for _ in range(20):
        state, metrics = step(state, mels)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert float(metrics["w"]) > 0


def test_ge2e_trainer_end_to_end(ge2e_hp, pattern_dir, tmp_path):
    trainer = GE2ETrainer(
        ge2e_hp, checkpoint_dir=tmp_path / "ckpt", log_dir=tmp_path / "logs"
    )
    state = trainer.train(str(pattern_dir), max_steps=6, log_interval=3, save_interval=6)
    assert int(jax.device_get(state.step)) == 6
    assert trainer.checkpoints.latest_step() == 6

    # resume: a fresh trainer picks up from step 6
    trainer2 = GE2ETrainer(
        ge2e_hp, checkpoint_dir=tmp_path / "ckpt", log_dir=tmp_path / "logs2"
    )
    state2 = trainer2.train(str(pattern_dir), max_steps=8, log_interval=3, save_interval=8)
    assert int(jax.device_get(state2.step)) == 8
