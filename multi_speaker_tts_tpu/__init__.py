"""TPU-native zero-shot multi-speaker TTS framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of
``CODEJIN/multi_speaker_tts`` (see SURVEY.md): a GE2E speaker encoder,
a Tacotron-style synthesizer with location-sensitive attention and a
``lax.scan`` autoregressive decoder, and batched on-chip Griffin-Lim
vocoding, fed by a length-bucketed data pipeline.

NOTE: the reference mount (/root/reference) was empty at build time; parity
targets come from BASELINE.json's functional contract. Citations in
docstrings use the SURVEY.md component inventory (SURVEY.md section 2).
"""

from multi_speaker_tts_tpu.hparams import (  # noqa: F401
    Recursive_Parse,
    load_hyper_parameters,
    default_hparams,
)

__version__ = "0.1.0"
