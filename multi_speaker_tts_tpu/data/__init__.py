"""Data pipeline (SURVEY.md section 2: pattern generator, dataset/collator).

Offline: wav trees -> per-utterance pattern pickles + a metadata index.
Online: length-bucketed batches padded to a small static shape set, so XLA
compiles one program per bucket (BASELINE.json:5 "length-bucketing to kill
padding waste").
"""

from multi_speaker_tts_tpu.data.pattern_generator import (  # noqa: F401
    generate_patterns,
    generate_synthetic_dataset,
    lj_info_load,
    vctk_info_load,
)
from multi_speaker_tts_tpu.data.datasets import (  # noqa: F401
    PatternDataset,
    BucketBatcher,
    collate_tts,
    GE2EBatchSampler,
)
