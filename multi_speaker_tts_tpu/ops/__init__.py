"""TPU compute primitives: fused-gate LSTM scans and Pallas DSP kernels."""

from multi_speaker_tts_tpu.ops import lstm  # noqa: F401  (module, not the fn)
from multi_speaker_tts_tpu.ops.lstm import (  # noqa: F401
    LSTMParams,
    bilstm,
    init_lstm_params,
    lstm_cell_step,
    lstm_stack,
)
