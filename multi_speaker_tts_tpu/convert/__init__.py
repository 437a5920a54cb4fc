"""Checkpoint conversion: torch state_dicts -> JAX parameter pytrees."""

from multi_speaker_tts_tpu.convert.torch_to_jax import (  # noqa: F401
    convert_dense,
    convert_conv1d,
    convert_lstm,
    convert_batchnorm,
    convert_embedding,
    convert_state_dict,
)
