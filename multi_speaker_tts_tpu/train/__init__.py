"""Training layer: optimizer/schedule, trainer, checkpoints, logging."""

from multi_speaker_tts_tpu.train.optim import (  # noqa: F401
    noam_schedule,
    make_optimizer,
)
