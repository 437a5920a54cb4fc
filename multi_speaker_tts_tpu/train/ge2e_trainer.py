"""Standalone GE2E speaker-encoder training (SURVEY.md section 3.4).

N speakers x M utterances batches of fixed-length mel crops -> embeddings ->
leave-one-out similarity matrix -> softmax GE2E loss. Paper-faithful details
(GE2E section 3): the similarity scale/bias (w, b) learn at 0.01x the
encoder's gradient, w is clamped positive inside the loss, and gradients are
clipped. One jitted step; batch = one static shape, so it compiles once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from multi_speaker_tts_tpu.data.datasets import GE2EBatchSampler, PatternDataset
from multi_speaker_tts_tpu.models import GE2E, ge2e_loss
from multi_speaker_tts_tpu.parallel import mesh as mesh_lib
from multi_speaker_tts_tpu.train.checkpoints import CheckpointManager
from multi_speaker_tts_tpu.train.logger import Logger


class GE2ETrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any  # {'encoder': ..., 'w': scalar, 'b': scalar}
    opt_state: Any


def make_ge2e_optimizer(hp) -> optax.GradientTransformation:
    lr = hp.GE2E_Train.Learning_Rate
    scale = hp.GE2E_Train.get("Scale_Gradient", 0.01)

    def scale_wb(updates, state, params=None):
        del params
        updates = dict(updates)
        updates["w"] = updates["w"] * scale
        updates["b"] = updates["b"] * scale
        return updates, state

    return optax.chain(
        optax.clip_by_global_norm(3.0),  # GE2E section 3
        optax.GradientTransformation(lambda p: optax.EmptyState(), scale_wb),
        optax.sgd(lr, momentum=0.9),
    )


def init_ge2e_state(hp, model: GE2E, rng: jax.Array, sample_mels) -> GE2ETrainState:
    """One jitted init program (eager per-op flax init costs minutes over a
    tunneled remote TPU; cf. trainer.init_state)."""
    optimizer = make_ge2e_optimizer(hp)

    def build(rng, mels):
        params = {
            "encoder": model.init(rng, mels)["params"],
            "w": jnp.asarray(float(hp.Speaker_Embedding.GE2E.Loss.Initial_Weight)),
            "b": jnp.asarray(float(hp.Speaker_Embedding.GE2E.Loss.Initial_Bias)),
        }
        return GE2ETrainState(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
        )

    return jax.jit(build)(rng, jnp.asarray(sample_mels))


def make_ge2e_train_step(hp, model: GE2E):
    optimizer = make_ge2e_optimizer(hp)
    N = hp.GE2E_Train.Batch_Speakers
    M = hp.GE2E_Train.Batch_Utterances

    def train_step(state: GE2ETrainState, mels: jax.Array):
        """mels: (N*M, L, mel_dim), grouped by speaker."""

        def loss_fn(params):
            emb = model.apply({"params": params["encoder"]}, mels)
            emb = emb.reshape(N, M, -1)
            return ge2e_loss(emb, params["w"], params["b"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # Keep w positive outside the loss too, so logged values are sane.
        params["w"] = jnp.maximum(params["w"], 1e-6)
        new_state = GE2ETrainState(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, {"loss": loss, "w": params["w"], "b": params["b"]}

    return train_step


class GE2ETrainer:
    """Training driver for the speaker encoder.

    ``n_devices > 1`` trains data-parallel over a 1-D ``data`` mesh: the
    N*M utterance rows are sharded over chips, the LSTM wavefront runs DP,
    and GSPMD all-gathers the tiny (N*M, proj) embeddings for the global
    similarity matrix and psums the gradients over ICI — the GE2E loss is
    intrinsically global (every embedding meets every centroid), so the
    gather is the correct collective, not an approximation. Default stays
    single-device (the batch N*M is small and must divide the mesh size).
    """

    def __init__(self, hp, checkpoint_dir: str | None = None, log_dir: str | None = None,
                 n_devices: int = 1):
        self.hp = hp
        self.model = GE2E.from_hp(hp)
        self.logger = Logger(log_dir or hp.Log_Path)
        self.checkpoints = CheckpointManager(checkpoint_dir or hp.Checkpoint_Path)
        self.state: GE2ETrainState | None = None
        self.mesh = mesh_lib.create_mesh(n_devices)
        self.n_devices = self.mesh.devices.size
        rows = hp.GE2E_Train.Batch_Speakers * hp.GE2E_Train.Batch_Utterances
        if rows % self.n_devices:
            raise ValueError(
                f"GE2E batch rows N*M={rows} must be divisible by the mesh "
                f"size ({self.n_devices})"
            )
        repl, shard = mesh_lib.data_parallel_shardings(self.mesh)
        self._batch_sharding = shard
        self._step_fn = jax.jit(
            make_ge2e_train_step(hp, self.model),
            in_shardings=(repl, shard),
            out_shardings=(repl, repl),
        )

    def train(self, pattern_dir: str, max_steps: int, log_interval: int = 50,
              save_interval: int = 500) -> GE2ETrainState:
        hp = self.hp
        sampler = GE2EBatchSampler(
            PatternDataset(pattern_dir),
            n_speakers=hp.GE2E_Train.Batch_Speakers,
            m_utterances=hp.GE2E_Train.Batch_Utterances,
            frame_length=hp.GE2E_Train.Frame_Length,
        )
        if self.state is None:
            self.state = init_ge2e_state(
                hp, self.model, jax.random.PRNGKey(0), sampler.sample()["mels"]
            )
            restored, step = self.checkpoints.restore(jax.device_get(self.state))
            if restored is not None:
                self.state = restored
                print(f"resumed GE2E training from step {step}")
            self.state = mesh_lib.replicate(self.mesh, jax.device_get(self.state))

        step = int(jax.device_get(self.state.step))
        while step < max_steps:
            batch = sampler.sample()
            mels = jax.device_put(jnp.asarray(batch["mels"]), self._batch_sharding)
            self.state, metrics = self._step_fn(self.state, mels)
            step += 1
            if step % log_interval == 0:
                metrics = jax.device_get(metrics)
                self.logger.add_scalar_dict("GE2E", metrics, step)
            if step % save_interval == 0 or step >= max_steps:
                self.checkpoints.save(step, jax.device_get(self.state))
        self.logger.flush()
        return self.state
