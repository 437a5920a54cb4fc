"""Multi-host helpers on the virtual mesh + trainer inference logging."""

import numpy as np

import jax
import jax.numpy as jnp

from multi_speaker_tts_tpu.parallel import mesh as mesh_lib
from multi_speaker_tts_tpu.parallel.multihost import (
    global_batch_from_local,
    host_shard_info,
    initialize_distributed,
)


def test_initialize_distributed_single_process_noop():
    initialize_distributed(num_processes=1)  # must not raise


def test_host_shard_info():
    idx, count = host_shard_info()
    assert count == 1 and idx == 0  # single-process test env


def test_global_batch_from_local():
    mesh = mesh_lib.create_mesh()
    local = {
        "tokens": np.arange(8 * 4, dtype=np.int32).reshape(8, 4),
        "lengths": np.full((8,), 4, np.int32),
    }
    out = global_batch_from_local(mesh, local)
    assert out["tokens"].shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), local["tokens"])
    # sharded over the data axis
    assert len(out["tokens"].sharding.device_set) == 8


def test_trainer_inference_step_logs(tiny_hp, tmp_path):
    from multi_speaker_tts_tpu.data import generate_synthetic_dataset
    from multi_speaker_tts_tpu.train.trainer import Trainer

    hp = tiny_hp.replace(
        Train={"Batch_Size": 8, "Logging_Interval": 100, "Checkpoint_Save_Interval": 100,
               "Evaluation_Interval": 100, "Max_Step": 2},
    )
    generate_synthetic_dataset(hp, tmp_path / "c", n_speakers=2, n_utterances=3)
    trainer = Trainer(hp, checkpoint_dir=tmp_path / "ck", log_dir=tmp_path / "lg")
    batcher = trainer.make_batcher(str(tmp_path / "c" / "patterns"))
    trainer.initialize(next(iter(batcher))[1])
    trainer.inference_step(str(tmp_path / "c" / "patterns"), step=1)  # must not raise
