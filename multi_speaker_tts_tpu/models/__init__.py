"""Model zoo: GE2E speaker encoder + Tacotron-style synthesizer."""

from multi_speaker_tts_tpu.models.ge2e import (  # noqa: F401
    GE2E,
    ge2e_similarity_matrix,
    ge2e_loss,
    slide_windows,
)
from multi_speaker_tts_tpu.models.tacotron import Tacotron  # noqa: F401
