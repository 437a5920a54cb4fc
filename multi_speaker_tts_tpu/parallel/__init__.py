"""Mesh / sharding utilities (replaces the reference's absent distributed
layer with XLA collectives over ICI; SURVEY.md section 2 "Distributed
communication backend")."""

from multi_speaker_tts_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    shard_batch,
    replicate,
    data_parallel_shardings,
)
