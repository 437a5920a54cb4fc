"""Multi-chip tests on the 8-virtual-device CPU mesh (SURVEY.md section 4):
data-parallel train step with GSPMD gradient allreduce, and per-chip
utterance sharding at inference (BASELINE configs 3/5 sharded)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.data import BucketBatcher, PatternDataset, generate_synthetic_dataset
from multi_speaker_tts_tpu.parallel import mesh as mesh_lib
from multi_speaker_tts_tpu.train import trainer as trainer_lib


@pytest.fixture(scope="module")
def pattern_dir(tiny_hp, tmp_path_factory):
    root = tmp_path_factory.mktemp("mcsynth")
    generate_synthetic_dataset(tiny_hp, root, n_speakers=2, n_utterances=4)
    return root / "patterns"


@pytest.fixture(scope="module")
def batch(tiny_hp, pattern_dir):
    batcher = BucketBatcher(
        PatternDataset(pattern_dir),
        batch_size=8,  # divisible by the 8-device mesh
        token_buckets=list(tiny_hp.Train.Batch_Bucketing.Token_Buckets),
        mel_buckets=list(tiny_hp.Train.Batch_Bucketing.Mel_Buckets),
        mel_dim=tiny_hp.Sound.Mel_Dim,
        ref_window=tiny_hp.Speaker_Embedding.GE2E.Window_Length,
        shuffle=False,
    )
    return next(iter(batcher))[1]


def test_mesh_creation():
    mesh = mesh_lib.create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_sharded_train_step_matches_single_device(tiny_hp, batch):
    """The DP train step on the 8-device mesh must produce the same loss and
    (replicated) params as the unsharded step - GSPMD allreduce correctness."""
    models = trainer_lib.build_models(tiny_hp)
    state0 = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)
    step_fn = trainer_lib.make_train_step(tiny_hp, models)
    batch_dev = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(3)

    # Single-device reference.
    state_a, metrics_a = jax.jit(step_fn)(state0, batch_dev, rng)

    # 8-device data-parallel.
    mesh = mesh_lib.create_mesh()
    repl, shard = mesh_lib.data_parallel_shardings(mesh)
    state_sharded = mesh_lib.replicate(mesh, state0)
    batch_sharded = mesh_lib.shard_batch(mesh, batch)
    step_dp = jax.jit(
        step_fn, in_shardings=(repl, shard, repl), out_shardings=(repl, repl)
    )
    state_b, metrics_b = step_dp(state_sharded, batch_sharded, rng)

    np.testing.assert_allclose(
        float(metrics_a["total"]), float(metrics_b["total"]), rtol=2e-4
    )
    leaves_a = jax.tree.leaves(state_a.params)
    leaves_b = jax.tree.leaves(state_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4,
            err_msg="sharded step diverged from single-device step",
        )


def test_sharded_train_two_steps_stable(tiny_hp, batch):
    models = trainer_lib.build_models(tiny_hp)
    state = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)
    mesh = mesh_lib.create_mesh()
    repl, shard = mesh_lib.data_parallel_shardings(mesh)
    state = mesh_lib.replicate(mesh, state)
    batch_sharded = mesh_lib.shard_batch(mesh, batch)
    step_dp = jax.jit(
        trainer_lib.make_train_step(tiny_hp, models),
        in_shardings=(repl, shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )
    losses = []
    for i in range(3):
        state, metrics = step_dp(state, batch_sharded, jax.random.PRNGKey(i))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()


def test_sharded_ge2e_train_step_matches_single_device(tiny_hp):
    """The GE2E loss is global (every embedding vs every centroid); the DP
    step shards the N*M rows over the mesh, GSPMD gathers the tiny embedding
    matrix for the loss, and the result must equal the unsharded step."""
    from multi_speaker_tts_tpu.models import GE2E
    from multi_speaker_tts_tpu.train.ge2e_trainer import (
        init_ge2e_state, make_ge2e_train_step,
    )

    hp = tiny_hp.replace(
        GE2E_Train={
            "Batch_Speakers": 4,
            "Batch_Utterances": 2,  # N*M = 8 rows over the 8-device mesh
            "Frame_Length": 24,
            "Learning_Rate": 0.01,
            "Scale_Gradient": 0.01,
        }
    )
    model = GE2E.from_hp(hp, compute_dtype=jnp.float32)
    N, M, L, D = 4, 2, 24, hp.Sound.Mel_Dim
    rng = np.random.default_rng(1)
    base = rng.normal(size=(N, 1, 1, D)) * 2.0
    mels = jnp.asarray(
        (base + 0.3 * rng.normal(size=(N, M, L, D))).reshape(N * M, L, D),
        jnp.float32,
    )
    state0 = init_ge2e_state(hp, model, jax.random.PRNGKey(0), mels)
    step_fn = make_ge2e_train_step(hp, model)

    state_a, metrics_a = jax.jit(step_fn)(state0, mels)

    mesh = mesh_lib.create_mesh()
    repl, shard = mesh_lib.data_parallel_shardings(mesh)
    step_dp = jax.jit(step_fn, in_shardings=(repl, shard), out_shardings=(repl, repl))
    state_b, metrics_b = step_dp(
        mesh_lib.replicate(mesh, state0), jax.device_put(mels, shard)
    )

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=2e-5
    )
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg="sharded GE2E step diverged from single-device step",
        )


def test_ge2e_trainer_sharded_end_to_end(tiny_hp, tmp_path):
    """GE2ETrainer(n_devices=8) trains over the virtual mesh end to end."""
    from multi_speaker_tts_tpu.data import generate_synthetic_dataset
    from multi_speaker_tts_tpu.train.ge2e_trainer import GE2ETrainer

    hp = tiny_hp.replace(
        GE2E_Train={
            "Batch_Speakers": 4,
            "Batch_Utterances": 2,
            "Frame_Length": 24,
            "Learning_Rate": 0.01,
            "Scale_Gradient": 0.01,
        }
    )
    root = tmp_path / "ge2edp"
    generate_synthetic_dataset(hp, root, n_speakers=4, n_utterances=4)
    trainer = GE2ETrainer(
        hp, checkpoint_dir=tmp_path / "ckpt", log_dir=tmp_path / "logs",
        n_devices=8,
    )
    state = trainer.train(root / "patterns", max_steps=3, log_interval=1,
                          save_interval=10)
    assert int(jax.device_get(state.step)) == 3
    assert np.isfinite(jax.device_get(state.params["w"]))


def test_sharded_inference_utterances_per_chip(tiny_hp, batch):
    """BASELINE config 5 sharding: independent utterances sharded over the
    mesh for AR decode; each row equals the single-device result."""
    models = trainer_lib.build_models(tiny_hp)
    state = trainer_lib.init_state(tiny_hp, models, jax.random.PRNGKey(0), batch)

    tokens = jnp.asarray(batch["tokens"])
    token_lengths = jnp.asarray(batch["token_lengths"])
    refs = jnp.asarray(batch["ref_mels"])

    batch_stats = state.batch_stats["tacotron"]

    def infer_fn(params, tokens, token_lengths, refs):
        spk = models.ge2e.apply({"params": params["ge2e"]}, refs)
        return models.tacotron.apply(
            {"params": params["tacotron"], "batch_stats": batch_stats},
            tokens, token_lengths, spk, 16, 0.5,
            method=models.tacotron.infer,
            rngs={"prenet": jax.random.PRNGKey(9)},
        )

    single = jax.jit(infer_fn)(state.params, tokens, token_lengths, refs)

    mesh = mesh_lib.create_mesh()
    repl, shard = mesh_lib.data_parallel_shardings(mesh)
    sharded_infer = jax.jit(
        infer_fn, in_shardings=(repl, shard, shard, shard), out_shardings=shard
    )
    params_r = mesh_lib.replicate(mesh, state.params)
    out = sharded_infer(
        params_r,
        *jax.tree.leaves(mesh_lib.shard_batch(mesh, {"a": tokens}))[:1],
        jax.device_put(token_lengths, shard),
        jax.device_put(refs, shard),
    )
    np.testing.assert_allclose(
        np.asarray(out["mel_post"]), np.asarray(single["mel_post"]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out["mel_lengths"]), np.asarray(single["mel_lengths"])
    )
