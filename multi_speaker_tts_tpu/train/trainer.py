"""Trainer (SURVEY.md section 2 "Trainer", section 3.2 call stack).

The reference's ``Train.py`` step loop rebuilt TPU-first:

- The train step is ONE jitted program: GE2E conditioning + teacher-forced
  synthesizer forward + losses + grads + optimizer update. XLA compiles one
  program per (token_bucket, mel_bucket) static shape.
- Multi-chip: batches are sharded over a 1-D ``data`` mesh, state is
  replicated; GSPMD inserts the gradient allreduce over ICI automatically
  (BASELINE.json:5). Single-chip is the mesh size-1 special case.
- Checkpoints via Orbax every Checkpoint_Save_Interval steps; TensorBoard
  scalars/images/audio at the reference's intervals.
"""

from __future__ import annotations

import dataclasses
import pathlib
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from multi_speaker_tts_tpu.audio import dsp
from multi_speaker_tts_tpu.data.datasets import BucketBatcher, PatternDataset
from multi_speaker_tts_tpu.models import GE2E, Tacotron
from multi_speaker_tts_tpu.models.speaker import SpeakerLUT
from multi_speaker_tts_tpu.models import losses as losses_lib
from multi_speaker_tts_tpu.parallel import mesh as mesh_lib
from multi_speaker_tts_tpu.train.checkpoints import CheckpointManager
from multi_speaker_tts_tpu.train.logger import Logger, NullLogger
from multi_speaker_tts_tpu.train.optim import make_optimizer, noam_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class Models:
    tacotron: Tacotron
    ge2e: GE2E | None
    speaker_lut: SpeakerLUT | None = None

    def speaker_embedding(self, params: dict, batch: dict):
        """Speaker conditioning for a training/eval batch (None if
        unconditioned): GE2E over reference mel crops, or LUT over ids."""
        if self.ge2e is not None:
            return self.ge2e.apply({"params": params["ge2e"]}, batch["ref_mels"])
        if self.speaker_lut is not None:
            return self.speaker_lut.apply(
                {"params": params["speaker_lut"]}, batch["speaker_ids"]
            )
        return None


def build_models(hp) -> Models:
    spk_type = hp.Speaker_Embedding.get("Type")
    return Models(
        tacotron=Tacotron.from_hp(hp),
        ge2e=GE2E.from_hp(hp) if spk_type == "GE2E" else None,
        speaker_lut=SpeakerLUT.from_hp(hp) if spk_type == "LUT" else None,
    )


def init_state(hp, models: Models, rng: jax.Array, sample_batch: dict) -> TrainState:
    """Initialize parameters from a (host) sample batch's shapes.

    The whole initialization is ONE jitted program: flax's eager module init
    issues thousands of individual device ops, which costs minutes over a
    tunneled remote TPU (~30 ms per op round trip)."""
    optimizer = make_optimizer(hp)

    def build(rng, arrays: dict) -> TrainState:
        rng_taco, rng_ge2e, rng_prenet = jax.random.split(rng, 3)
        params = {}
        batch_stats = {}
        spk = None
        if models.ge2e is not None:
            refs = arrays["ref_mels"]
            gvars = models.ge2e.init(rng_ge2e, refs)
            params["ge2e"] = gvars["params"]
            spk = models.ge2e.apply({"params": params["ge2e"]}, refs)
        elif models.speaker_lut is not None:
            ids = arrays["speaker_ids"]
            params["speaker_lut"] = models.speaker_lut.init(rng_ge2e, ids)["params"]
            spk = models.speaker_lut.apply({"params": params["speaker_lut"]}, ids)
        tvars = models.tacotron.init(
            {"params": rng_taco, "prenet": rng_prenet},
            arrays["tokens"], arrays["token_lengths"], arrays["mels"], spk,
        )
        params["tacotron"] = tvars["params"]
        batch_stats["tacotron"] = tvars.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros([], jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=optimizer.init(params),
        )

    keys = ("tokens", "token_lengths", "mels", "ref_mels", "speaker_ids")
    arrays = {
        k: jnp.asarray(v) for k, v in sample_batch.items() if k in keys
    }
    return jax.jit(build)(rng, arrays)


def make_train_step(hp, models: Models):
    """Returns a jittable (state, batch, rng) -> (state, metrics) function."""
    optimizer = make_optimizer(hp)
    r = hp.Decoder.get("N_Frames_Per_Step", 1)
    ga_sigma, ga_weight = resolve_guided_attention(hp)
    freeze_ge2e = bool(
        models.ge2e is not None
        and hp.Speaker_Embedding.GE2E.get("Freeze", False)
    )

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng_prenet, rng_dropout = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            spk = models.speaker_embedding(params, batch)
            if freeze_ge2e:
                spk = jax.lax.stop_gradient(spk)
            outputs, mutated = models.tacotron.apply(
                {
                    "params": params["tacotron"],
                    "batch_stats": state.batch_stats["tacotron"],
                },
                batch["tokens"],
                batch["token_lengths"],
                batch["mels"],
                spk,
                True,
                rngs={"prenet": rng_prenet, "dropout": rng_dropout},
                mutable=["batch_stats"],
            )
            losses = losses_lib.tacotron_losses(
                outputs,
                batch["mels"],
                batch["mel_lengths"],
                batch["token_lengths"],
                spects=batch.get("spects"),
                n_frames_per_step=r,
                guided_attention_sigma=ga_sigma,
                guided_attention_weight=ga_weight,
            )
            return losses["total"], (losses, mutated["batch_stats"])

        (_, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        if freeze_ge2e:
            # stop_gradient zeroes the grads; also null the updates so
            # weight decay cannot drift the frozen encoder.
            updates = dict(updates)
            updates["ge2e"] = jax.tree.map(jnp.zeros_like, updates["ge2e"])
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        # In-graph NaN/Inf guard (SURVEY.md section 5 "failure detection"):
        # a non-finite loss or gradient skips the whole update (params, opt
        # state, batch stats) instead of poisoning the run - recovery without
        # a restart, which is all the reference offers.
        grad_norm = optax_global_norm(grads)
        finite = jnp.isfinite(losses["total"]) & jnp.isfinite(grad_norm)

        def pick(new, old):
            return jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new, old
            )

        new_state = TrainState(
            step=state.step + 1,
            params=pick(new_params, state.params),
            batch_stats=pick({"tacotron": new_bs}, state.batch_stats),
            opt_state=pick(new_opt_state, state.opt_state),
        )
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = grad_norm
        metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        return new_state, metrics

    return train_step


def optax_global_norm(tree) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree))
    )


def resolve_guided_attention(hp) -> tuple[float | None, float]:
    """(sigma, weight) as the training objective uses them: (None, 0.0)
    when guided attention is disabled, so eval totals match train totals."""
    ga = hp.Train.get("Guided_Attention")
    if ga is not None and ga.Use:
        return ga.Sigma, ga.Weight
    return None, 0.0


def make_eval_step(hp, models: Models):
    """Teacher-forced eval (no dropout/BN update, prenet still stochastic).

    Uses the same loss configuration as the train step (including the
    guided-attention sigma/weight resolution) so 'total' is directly
    comparable between Train/ and Evaluation/ curves."""
    r = hp.Decoder.get("N_Frames_Per_Step", 1)
    ga_sigma, ga_weight = resolve_guided_attention(hp)

    def eval_step(state: TrainState, batch: dict, rng: jax.Array):
        spk = models.speaker_embedding(state.params, batch)
        outputs = models.tacotron.apply(
            {
                "params": state.params["tacotron"],
                "batch_stats": state.batch_stats["tacotron"],
            },
            batch["tokens"],
            batch["token_lengths"],
            batch["mels"],
            spk,
            rngs={"prenet": rng},
        )
        losses = losses_lib.tacotron_losses(
            outputs,
            batch["mels"],
            batch["mel_lengths"],
            batch["token_lengths"],
            spects=batch.get("spects"),
            n_frames_per_step=r,
            guided_attention_sigma=ga_sigma,
            guided_attention_weight=ga_weight,
        )
        return losses, outputs

    return eval_step


class Trainer:
    """End-to-end training driver: data, models, optimizer, mesh, logging,
    checkpointing. ``python -m multi_speaker_tts_tpu.train -hp <yaml>``."""

    def __init__(
        self,
        hp,
        checkpoint_dir: str | None = None,
        log_dir: str | None = None,
        n_devices: int | None = None,
    ):
        self.hp = hp
        self.models = build_models(hp)
        self.mesh = mesh_lib.create_mesh(n_devices)
        self.n_devices = self.mesh.devices.size
        # Multi-host (SURVEY.md section 5 "Distributed comm backend" DCN
        # side): each host loads its disjoint row slice of every global
        # batch; the caller must have run multihost.initialize_distributed
        # (the CLI's -distributed flag) before constructing the Trainer.
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_main = self.process_index == 0
        if hp.Train.Batch_Size % max(self.process_count, 1) != 0:
            raise ValueError(
                f"Train.Batch_Size ({hp.Train.Batch_Size}) must be divisible "
                f"by the process count ({self.process_count})"
            )
        self.train_step_fn = None  # jitted lazily (needs shardings)
        self.eval_step_fn = jax.jit(make_eval_step(hp, self.models))
        if hp.Train.Batch_Size % self.n_devices != 0:
            raise ValueError(
                f"Train.Batch_Size ({hp.Train.Batch_Size}) must be divisible "
                f"by the mesh size ({self.n_devices} devices); pass "
                f"n_devices= to Trainer or adjust the batch size"
            )
        self.logger = (Logger if self.is_main else NullLogger)(
            log_dir or hp.Log_Path
        )
        # Multi-host: ONLY process 0 owns an Orbax manager, scoped to itself
        # (active_processes={0}); state is replicated, so its host copy is
        # the whole checkpoint and the other hosts receive restored state by
        # broadcast in initialize(). Concurrent same-directory managers
        # deadlock Orbax's multiprocess commit barriers - measured.
        self.checkpoints = None
        if self.is_main:
            self.checkpoints = CheckpointManager(
                checkpoint_dir or hp.Checkpoint_Path,
                active_processes={0} if self.process_count > 1 else None,
            )
        self.dsp_cfg = dsp.DSPConfig.from_hp(hp)
        self.state: TrainState | None = None
        self.rng = jax.random.PRNGKey(hp.get("Seed", 0) or 0)
        # (start, stop) step interval to capture a jax.profiler trace for
        # (SURVEY.md section 5 "Tracing / profiling"); None = off.
        self.profile_steps: tuple[int, int] | None = None

    # -- data ------------------------------------------------------------
    def make_batcher(self, pattern_dir: str, shuffle: bool = True) -> BucketBatcher:
        hp = self.hp
        ref_window = None
        if self.models.ge2e is not None:
            ref_window = hp.Speaker_Embedding.GE2E.Window_Length
        lh = hp.get("Linear_Head")
        spect_dim = hp.Sound.Spectrogram_Dim if (lh is not None and lh.Use) else None
        return BucketBatcher(
            PatternDataset(pattern_dir),
            batch_size=hp.Train.Batch_Size,
            token_buckets=list(hp.Train.Batch_Bucketing.Token_Buckets),
            mel_buckets=list(hp.Train.Batch_Bucketing.Mel_Buckets),
            mel_dim=hp.Sound.Mel_Dim,
            n_frames_per_step=hp.Decoder.get("N_Frames_Per_Step", 1),
            ref_window=ref_window,
            shuffle=shuffle,
            spect_dim=spect_dim,
        )

    # -- state -----------------------------------------------------------
    def initialize(self, sample_batch: dict) -> TrainState:
        self.state = init_state(self.hp, self.models, self.rng, sample_batch)
        if self.is_main:
            restored, step = self.checkpoints.restore(self.state)
            if restored is not None:
                self.state = restored
                print(f"resumed from checkpoint step {step}")
            elif self.models.ge2e is not None:
                # SV2TTS recipe: initialize the speaker encoder from a
                # GE2E-loss-pretrained checkpoint (SURVEY.md section 2:
                # "GE2E encoder, possibly frozen/pretrained").
                pre = self.hp.Speaker_Embedding.GE2E.get("Pretrained_Checkpoint")
                if pre:
                    self.load_pretrained_ge2e(pre)
        if self.process_count > 1:
            # Process 0's host state (fresh init, checkpoint resume, or
            # GE2E graft - whichever happened) becomes everyone's state:
            # one broadcast guarantees bit-identical replication regardless
            # of which initialization path ran.
            from jax.experimental import multihost_utils

            from multi_speaker_tts_tpu.parallel import multihost

            # This broadcast is the run's FIRST device collective; fence the
            # per-host init skew (compiles, checkpoint probe) so the
            # communicator handshake's hard 30 s deadline can't trip.
            multihost.coordination_barrier("pre_broadcast")
            self.state = multihost_utils.broadcast_one_to_all(
                jax.device_get(self.state)
            )
        self.state = mesh_lib.replicate(self.mesh, self.state)
        repl, shard = mesh_lib.data_parallel_shardings(self.mesh)
        self._jit_train_step = jax.jit(
            make_train_step(self.hp, self.models),
            in_shardings=(repl, shard, repl),
            out_shardings=(repl, repl),
            donate_argnums=0,
        )
        return self.state

    def load_pretrained_ge2e(self, checkpoint_dir: str) -> None:
        """Graft encoder params from a GE2ETrainer checkpoint into the TTS
        state (shapes must match the Speaker_Embedding config)."""
        from multi_speaker_tts_tpu.train.ge2e_trainer import (
            GE2ETrainState,
            init_ge2e_state,
        )

        template = jax.eval_shape(
            lambda: init_ge2e_state(
                self.hp,
                self.models.ge2e,
                jax.random.PRNGKey(0),
                jnp.zeros(
                    (1, self.hp.Speaker_Embedding.GE2E.Window_Length,
                     self.hp.Sound.Mel_Dim),
                    jnp.float32,
                ),
            )
        )
        mgr = CheckpointManager(checkpoint_dir)
        restored, step = mgr.restore(template)
        mgr.close()
        if restored is None:
            raise FileNotFoundError(f"no GE2E checkpoint under {checkpoint_dir}")
        params = dict(self.state.params)
        params["ge2e"] = restored.params["encoder"]
        self.state = self.state.replace(params=params)
        print(f"loaded pretrained GE2E encoder from step {step}")

    def shard(self, batch: dict) -> dict:
        """Place a host batch on the mesh. Single-process: device_put with
        the batch sharding. Multi-host: ``batch`` is this host's row slice;
        assemble the global array from the per-process shards."""
        if self.process_count > 1:
            from multi_speaker_tts_tpu.parallel import multihost

            return multihost.global_batch_from_local(self.mesh, batch)
        return mesh_lib.shard_batch(self.mesh, batch)

    def _local_rows(self, batch: dict) -> dict:
        """This host's contiguous row slice of a full global batch (the
        in-process loader materializes full batches on every host)."""
        if self.process_count <= 1:
            return batch
        local_bs = self.hp.Train.Batch_Size // self.process_count
        lo = self.process_index * local_bs
        return {k: v[lo : lo + local_bs] for k, v in batch.items()}

    def train_step(self, batch: dict):
        self.state, metrics = self._jit_train_step(
            self.state, self.shard(batch), self.rng
        )
        return metrics

    # -- loop ------------------------------------------------------------
    def train(self, pattern_dir: str, eval_pattern_dir: str | None = None,
              max_steps: int | None = None) -> TrainState:
        hp = self.hp
        max_steps = max_steps or hp.Train.Max_Step
        batcher = self.make_batcher(pattern_dir)
        if self.state is None:
            first = next(iter(batcher))[1]
            self.initialize(first)

        tp = hp.Train.get("Train_Pattern")
        accumulated = int(tp.get("Accumulated_Dataset_Epoch", 1)) if tp else 1
        n_workers = hp.Train.get("Num_Workers", 0) or 0

        def batch_stream():
            """Endless stream of training batches. With Num_Workers > 0,
            batches come from ONE long-lived Grain loader (recreating the
            worker pool per epoch costs a pool spawn every few steps on
            small datasets - measured 30x slowdown); otherwise the in-process
            batcher is iterated epoch by epoch (Accumulated_Dataset_Epoch
            repeats per reshuffle, the reference's knob)."""
            if n_workers > 0:
                from multi_speaker_tts_tpu.data.grain_loader import make_grain_loader
                from multi_speaker_tts_tpu.parallel import multihost

                shard_index, shard_count = multihost.host_shard_info()
                loader = make_grain_loader(
                    batcher, worker_count=n_workers, num_epochs=None,
                    shard_index=shard_index, shard_count=shard_count,
                )
                for batch in loader:
                    batch = dict(batch)
                    batch.pop("bucket", None)
                    yield batch
            else:
                # In-process loading: every host materializes the identical
                # full batch (same seed) and slices its rows.
                while True:
                    for _ in range(accumulated):
                        for _, batch in batcher:
                            yield self._local_rows(batch)
        schedule = noam_schedule(
            hp.Train.Learning_Rate.Initial, hp.Train.Learning_Rate.Warmup_Step
        )

        step = int(jax.device_get(self.state.step))
        t_last, frames_since = time.time(), 0
        synced = self.process_count <= 1
        if step < max_steps:
            for batch in batch_stream():
                if not synced:
                    # Align hosts after per-host setup (worker spawn etc.)
                    # so the first psum's rendezvous cannot time out.
                    from multi_speaker_tts_tpu.parallel import multihost

                    multihost.barrier("first_batch")
                    synced = True
                if self.profile_steps and step == self.profile_steps[0]:
                    jax.profiler.start_trace(str(self.logger.log_dir / "profile"))
                metrics = self.train_step(batch)
                step += 1
                if self.profile_steps and step == self.profile_steps[1]:
                    jax.tree.map(lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                frames_since += int(batch["mel_lengths"].sum())
                if step % hp.Train.Logging_Interval == 0:
                    metrics = jax.device_get(metrics)
                    dt = time.time() - t_last
                    print(
                        f"step {step}: loss {float(metrics['total']):.4f} "
                        f"({frames_since / max(dt, 1e-9):,.0f} mel frames/s)",
                        flush=True,
                    )
                    self.logger.add_scalar_dict("Train/Loss", metrics, step)
                    self.logger.add_scalar(
                        "Train/Learning_Rate", float(schedule(step)), step
                    )
                    self.logger.add_scalar(
                        "Train/Mel_Frames_Per_Sec", frames_since / max(dt, 1e-9), step
                    )
                    t_last, frames_since = time.time(), 0
                if step % hp.Train.Checkpoint_Save_Interval == 0:
                    self.save(step)
                if (
                    eval_pattern_dir is not None
                    and step % hp.Train.Evaluation_Interval == 0
                ):
                    self.evaluate(eval_pattern_dir, step)
                if (
                    eval_pattern_dir is not None
                    and step % hp.Train.get("Inference_Interval", 10**9) == 0
                ):
                    self.inference_step(eval_pattern_dir, step)
                if step >= max_steps:
                    break
        self.save(step)
        self.logger.flush()
        return self.state

    def evaluate(self, pattern_dir: str, step: int, max_batches: int = 8) -> dict:
        batcher = self.make_batcher(pattern_dir, shuffle=False)
        totals: dict[str, float] = {}
        count = 0
        for _, batch in batcher:
            if count >= max_batches:
                break
            losses, outputs = self.eval_step_fn(
                self.state, self.shard(self._local_rows(batch)), self.rng
            )
            losses = jax.device_get(losses)
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        if count:
            means = {k: v / count for k, v in totals.items()}
            self.logger.add_scalar_dict("Evaluation/Loss", means, step)
            if self.process_count == 1:
                # Batch-sharded outputs are not host-indexable on a
                # multi-host mesh; alignment images are single-host only.
                align = np.asarray(jax.device_get(outputs["alignments"][0]))
                self.logger.add_image(
                    "Evaluation/Alignment", align / max(align.max(), 1e-6), step
                )
            return means
        return {}

    def inference_step(self, pattern_dir: str, step: int) -> None:
        """AR-synthesize one eval batch with the current weights and log
        audio + alignment to TensorBoard (the reference's ``Inference_Step``,
        SURVEY.md section 3.2)."""
        if self.process_count > 1:
            # Eager (non-jitted) apply on process-spanning global arrays is
            # invalid; periodic audio samples are a single-host luxury.
            return
        from multi_speaker_tts_tpu.ops import stft_matmul

        hp = self.hp
        cfg = self.dsp_cfg
        batcher = self.make_batcher(pattern_dir, shuffle=False)
        try:
            _, batch = next(iter(batcher))
        except StopIteration:
            return
        spk = self.models.speaker_embedding(
            self.state.params, jax.tree.map(jnp.asarray, batch)
        )
        max_steps = min(hp.Decoder.Max_Step, int(batch["mels"].shape[1]) * 2)
        out = self.models.tacotron.apply(
            {
                "params": self.state.params["tacotron"],
                "batch_stats": self.state.batch_stats["tacotron"],
            },
            jnp.asarray(batch["tokens"]),
            jnp.asarray(batch["token_lengths"]),
            spk,
            max_steps,
            hp.Decoder.Stop_Threshold,
            method=self.models.tacotron.infer,
            rngs={"prenet": jax.random.fold_in(self.rng, step)},
        )
        align = np.asarray(jax.device_get(out["alignments"][0]))
        self.logger.add_image(
            "Inference/Alignment", align / max(align.max(), 1e-6), step
        )
        if "linear" in out and cfg.n_fft % cfg.hop == 0:
            mag = dsp.db_to_amp(
                dsp.denormalize(out["linear"][:1], cfg.min_level_db)
                + cfg.ref_level_db
            )
            length = cfg.hop * (mag.shape[-2] - 1)
            wav = stft_matmul.griffin_lim_auto(
                mag**cfg.power, cfg.n_fft, cfg.hop, cfg.griffin_lim_iter, length
            )
            wav = np.asarray(jax.device_get(dsp.inv_preemphasis(wav, cfg.preemphasis)))[0]
            T = int(jax.device_get(out["mel_lengths"][0]))
            self.logger.add_audio(
                "Inference/Audio", wav[: max(T - 1, 1) * cfg.hop], step, cfg.sample_rate
            )

    def save(self, step: int) -> None:
        # Process 0's manager is scoped to itself (active_processes={0}):
        # its host copy of the replicated state is the whole checkpoint and
        # no cross-process barrier runs (SURVEY.md section 5 "Checkpoint /
        # resume").
        if self.is_main:
            self.checkpoints.save(step, jax.device_get(self.state))
