"""Audio DSP front-end (SURVEY.md section 2, "Audio front-end").

Two matched implementations of the reference DSP chain
(preemphasis -> STFT -> |.| -> mel -> dB -> [0,1] normalize; and the
Griffin-Lim inverse path):

- ``oracle``: numpy/scipy golden reference (librosa-compatible semantics),
  used offline in pattern generation and as the test oracle.
- ``dsp``: pure-JAX, jit-able, batched, TPU-resident versions matched to the
  oracle within 1e-4 (BASELINE.json:5 "bit-matched mel extraction").

The fused Pallas mel kernel lives in ``multi_speaker_tts_tpu.ops``.
"""

from multi_speaker_tts_tpu.audio.mel_filterbank import mel_filterbank  # noqa: F401
from multi_speaker_tts_tpu.audio import oracle, dsp, wav_io  # noqa: F401
