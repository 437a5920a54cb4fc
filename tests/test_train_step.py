"""BASELINE config 3: teacher-forced train step on a bucketed batch -
jitted, finite, decreasing loss; plus optimizer schedule checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.data import BucketBatcher, PatternDataset, generate_synthetic_dataset
from multi_speaker_tts_tpu.train.optim import noam_schedule
from multi_speaker_tts_tpu.train import trainer as trainer_lib


@pytest.fixture(scope="module")
def pattern_dir(tiny_hp, tmp_path_factory):
    root = tmp_path_factory.mktemp("trainsynth")
    generate_synthetic_dataset(tiny_hp, root, n_speakers=2, n_utterances=3)
    return root / "patterns"


def test_noam_schedule_shape():
    sched = noam_schedule(1e-3, 100)
    lrs = [float(sched(s)) for s in [1, 50, 100, 400]]
    assert lrs[0] < lrs[1] < lrs[2]  # warmup ramp
    np.testing.assert_allclose(lrs[2], 1e-3, rtol=1e-5)  # peak at warmup
    np.testing.assert_allclose(lrs[3], 1e-3 / 2, rtol=1e-5)  # inv-sqrt decay


def _first_batch(tiny_hp, pattern_dir):
    batcher = BucketBatcher(
        PatternDataset(pattern_dir),
        batch_size=tiny_hp.Train.Batch_Size,
        token_buckets=list(tiny_hp.Train.Batch_Bucketing.Token_Buckets),
        mel_buckets=list(tiny_hp.Train.Batch_Bucketing.Mel_Buckets),
        mel_dim=tiny_hp.Sound.Mel_Dim,
        ref_window=tiny_hp.Speaker_Embedding.GE2E.Window_Length,
        shuffle=False,
    )
    return next(iter(batcher))[1]


def test_train_step_runs_and_loss_decreases(tiny_hp, pattern_dir):
    models = trainer_lib.build_models(tiny_hp)
    assert models.ge2e is not None  # tiny hp is GE2E-conditioned
    batch = _first_batch(tiny_hp, pattern_dir)
    state = trainer_lib.init_state(
        tiny_hp, models, jax.random.PRNGKey(0), batch
    )
    step = jax.jit(trainer_lib.make_train_step(tiny_hp, models))
    batch_dev = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(1)

    losses = []
    for _ in range(12):
        state, metrics = step(state, batch_dev, rng)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12
    assert float(metrics["grad_norm"]) > 0


def test_eval_step(tiny_hp, pattern_dir):
    models = trainer_lib.build_models(tiny_hp)
    batch = _first_batch(tiny_hp, pattern_dir)
    state = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)
    eval_step = jax.jit(trainer_lib.make_eval_step(tiny_hp, models))
    losses, outputs = eval_step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(2))
    assert np.isfinite(float(losses["total"]))
    assert outputs["mel_post"].shape == batch["mels"].shape


def test_unconditioned_train_step(tiny_hp, pattern_dir):
    """Single-speaker config (Speaker_Embedding.Type null) trains too."""
    hp = tiny_hp.replace(Speaker_Embedding={"Type": None})
    models = trainer_lib.build_models(hp)
    assert models.ge2e is None
    batch = _first_batch(tiny_hp, pattern_dir)
    batch.pop("ref_mels", None)
    state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer_lib.make_train_step(hp, models))
    state, metrics = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))


def test_checkpoint_roundtrip(tiny_hp, pattern_dir, tmp_path):
    from multi_speaker_tts_tpu.train.checkpoints import CheckpointManager

    models = trainer_lib.build_models(tiny_hp)
    batch = _first_batch(tiny_hp, pattern_dir)
    state = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(7, jax.device_get(state))
    assert mgr.latest_step() == 7
    restored, step = mgr.restore(state)
    assert step == 7
    orig = jax.tree.leaves(state.params)
    back = jax.tree.leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_mixed_precision_train_step(tiny_hp, pattern_dir):
    """Use_Mixed_Precision: bf16 matmuls with f32 state - step stays finite
    and the loss decreases."""
    hp = tiny_hp.replace(Train={"Use_Mixed_Precision": True})
    models = trainer_lib.build_models(hp)
    assert models.tacotron.compute_dtype == jnp.bfloat16
    batch = _first_batch(hp, pattern_dir)
    state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer_lib.make_train_step(hp, models))
    batch_dev = jax.tree.map(jnp.asarray, batch)
    losses = []
    for _ in range(20):
        state, metrics = step(state, batch_dev, jax.random.PRNGKey(1))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all(), losses
    assert min(losses[-4:]) < losses[0], losses
    # params stay f32 (mixed precision = compute-only downcast)
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_nan_guard_skips_update(tiny_hp, pattern_dir):
    """A batch that produces a non-finite loss must leave params and opt
    state untouched and report skipped_nonfinite=1."""
    models = trainer_lib.build_models(tiny_hp)
    batch = _first_batch(tiny_hp, pattern_dir)
    state = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer_lib.make_train_step(tiny_hp, models))

    poisoned = dict(batch)
    poisoned["mels"] = batch["mels"].copy()
    poisoned["mels"][0, 0, 0] = np.nan
    new_state, metrics = step(state, jax.tree.map(jnp.asarray, poisoned), jax.random.PRNGKey(1))
    assert float(metrics["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == 1  # step counter still advances

    # and a clean batch still updates
    new_state2, metrics2 = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))
    assert float(metrics2["skipped_nonfinite"]) == 0.0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state2.params))
    )
    assert changed


def test_frozen_pretrained_ge2e(tiny_hp, pattern_dir, tmp_path):
    """SV2TTS recipe: GE2E pretrained with its own loss, loaded into the TTS
    trainer, optionally frozen (params must not move)."""
    from multi_speaker_tts_tpu.train.ge2e_trainer import GE2ETrainer

    ge2e_hp = tiny_hp.replace(
        GE2E_Train={"Batch_Speakers": 2, "Batch_Utterances": 2, "Frame_Length": 24,
                    "Learning_Rate": 0.01, "Scale_Gradient": 0.01},
    )
    pre = GE2ETrainer(ge2e_hp, checkpoint_dir=tmp_path / "ge2e", log_dir=tmp_path / "gl")
    pre.train(str(pattern_dir), max_steps=3, save_interval=3)

    from multi_speaker_tts_tpu.train.trainer import Trainer

    hp = tiny_hp.replace(
        Train={"Batch_Size": 8, "Logging_Interval": 100,
               "Checkpoint_Save_Interval": 100, "Evaluation_Interval": 100,
               "Max_Step": 2},
        Speaker_Embedding={"GE2E": {"Pretrained_Checkpoint": str(tmp_path / "ge2e"),
                                    "Freeze": True}},
    )
    trainer = Trainer(hp, checkpoint_dir=tmp_path / "tts", log_dir=tmp_path / "tl")
    batcher = trainer.make_batcher(str(pattern_dir))
    trainer.initialize(next(iter(batcher))[1])

    # grafted params equal the pretrained encoder's
    pre_leaves = jax.tree.leaves(jax.device_get(pre.state).params["encoder"])
    got_leaves = jax.tree.leaves(jax.device_get(trainer.state).params["ge2e"])
    for a, b in zip(pre_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # one train step: frozen encoder must not move, synthesizer must
    before = jax.device_get(trainer.state.params)
    _, batch = next(iter(batcher))
    trainer.train_step(batch)
    after = jax.device_get(trainer.state.params)
    for a, b in zip(jax.tree.leaves(before["ge2e"]), jax.tree.leaves(after["ge2e"])):
        np.testing.assert_array_equal(a, b)
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(before["tacotron"]), jax.tree.leaves(after["tacotron"]))
    )
    assert moved


def test_reduction_factor_train_step(tiny_hp, pattern_dir):
    """r = N_Frames_Per_Step > 1: decoder emits r frames per step; the train
    step stays finite and the loss decreases."""
    hp = tiny_hp.replace(Decoder={"N_Frames_Per_Step": 2})
    models = trainer_lib.build_models(hp)
    from multi_speaker_tts_tpu.data import BucketBatcher, PatternDataset

    batcher = BucketBatcher(
        PatternDataset(pattern_dir),
        batch_size=hp.Train.Batch_Size,
        token_buckets=list(hp.Train.Batch_Bucketing.Token_Buckets),
        mel_buckets=list(hp.Train.Batch_Bucketing.Mel_Buckets),
        mel_dim=hp.Sound.Mel_Dim,
        n_frames_per_step=2,
        ref_window=hp.Speaker_Embedding.GE2E.Window_Length,
        spect_dim=hp.Sound.Spectrogram_Dim,
        shuffle=False,
    )
    batch = next(iter(batcher))[1]
    assert batch["mels"].shape[1] % 2 == 0
    state = trainer_lib.init_state(hp, models, jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer_lib.make_train_step(hp, models))
    bd = jax.tree.map(jnp.asarray, batch)
    losses = []
    for _ in range(20):
        state, metrics = step(state, bd, jax.random.PRNGKey(1))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    # prenet dropout makes single steps noisy; compare window means
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    # AR inference with r=2: stop logits come per step (T/r of them)
    out = models.tacotron.apply(
        {"params": state.params["tacotron"],
         "batch_stats": state.batch_stats["tacotron"]},
        bd["tokens"], bd["token_lengths"],
        models.speaker_embedding(state.params, bd), 32, 0.5,
        method=models.tacotron.infer,
        rngs={"prenet": jax.random.PRNGKey(2)},
    )
    assert out["mel_post"].shape[1] == 32
    assert out["stop_logits"].shape[1] == 16  # 32 frames / r=2 steps
