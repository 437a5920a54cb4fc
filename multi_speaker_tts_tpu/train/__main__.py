"""Training CLI, mirroring the reference's ``python Train.py -hp <yaml>``
surface (SURVEY.md section 2 "Trainer"):

    python -m multi_speaker_tts_tpu.train -hp Hyper_Parameters.yaml \
        [-train_pattern DIR] [-eval_pattern DIR] [-max_step N]
    python -m multi_speaker_tts_tpu.train -mode ge2e ...   # speaker encoder
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(description="Train the TTS stack on TPU")
    parser.add_argument("-hp", "--hyper_parameters", default=None)
    parser.add_argument("-mode", choices=["tts", "ge2e"], default="tts")
    parser.add_argument("-train_pattern", default=None)
    parser.add_argument("-eval_pattern", default=None)
    parser.add_argument("-checkpoint", default=None)
    parser.add_argument("-log", default=None)
    parser.add_argument("-max_step", type=int, default=None)
    parser.add_argument("-ge2e_checkpoint", default=None,
                        help="pretrained GE2E checkpoint dir (SV2TTS recipe)")
    parser.add_argument("-freeze_ge2e", action="store_true")
    parser.add_argument("-profile", action="store_true",
                        help="capture a jax.profiler trace of steps 10-20")
    parser.add_argument("-debug_nans", action="store_true")
    parser.add_argument("-distributed", action="store_true",
                        help="multi-host training: initialize the JAX "
                        "distributed control plane before building the "
                        "Trainer (TPU pods auto-detect the coordinator)")
    parser.add_argument("-coordinator", default=None,
                        help="coordinator address host:port (auto on pods)")
    parser.add_argument("-num_processes", type=int, default=None)
    parser.add_argument("-process_id", type=int, default=None)
    args = parser.parse_args()

    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/mstts_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.distributed:
        from multi_speaker_tts_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
            f" with {jax.local_device_count()} local devices"
        )

    from multi_speaker_tts_tpu.hparams import load_hyper_parameters

    hp = load_hyper_parameters(args.hyper_parameters)
    if args.ge2e_checkpoint or args.freeze_ge2e:
        hp = hp.replace(
            Speaker_Embedding={
                "GE2E": {
                    **({"Pretrained_Checkpoint": args.ge2e_checkpoint}
                       if args.ge2e_checkpoint else {}),
                    **({"Freeze": True} if args.freeze_ge2e else {}),
                }
            }
        )
    train_dir = args.train_pattern or hp.Train.Train_Pattern.Path

    if args.mode == "ge2e":
        from multi_speaker_tts_tpu.train.ge2e_trainer import GE2ETrainer

        trainer = GE2ETrainer(hp, checkpoint_dir=args.checkpoint, log_dir=args.log)
        trainer.train(train_dir, max_steps=args.max_step or hp.Train.Max_Step)
        return

    from multi_speaker_tts_tpu.train.trainer import Trainer

    trainer = Trainer(hp, checkpoint_dir=args.checkpoint, log_dir=args.log)
    if args.profile:
        trainer.profile_steps = (10, 20)
    trainer.train(
        train_dir,
        eval_pattern_dir=args.eval_pattern or hp.Train.Eval_Pattern.get("Path"),
        max_steps=args.max_step,
    )


if __name__ == "__main__":
    main()
