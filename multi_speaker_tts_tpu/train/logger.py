"""TensorBoard logging (SURVEY.md section 2 "Logger"): scalars, alignment /
mel images, audio samples - same observability surface as the reference's
``Logger.py``, with reference-style tag names for side-by-side curves."""

from __future__ import annotations

import pathlib

import numpy as np


class Logger:
    """Thin TensorBoard writer; degrades to stdout if TF is unavailable."""

    def __init__(self, log_dir: str | pathlib.Path):
        self.log_dir = pathlib.Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        try:
            from flax.metrics import tensorboard

            self._writer = tensorboard.SummaryWriter(str(self.log_dir))
        except Exception as e:  # noqa: BLE001 - TF optional
            print(f"TensorBoard unavailable ({e}); logging scalars to stdout")
            self._writer = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        value = float(np.asarray(value))
        if self._writer is not None:
            self._writer.scalar(tag, value, step)
        else:
            print(f"[step {step}] {tag} = {value:.5f}")

    def add_scalar_dict(self, prefix: str, values: dict, step: int) -> None:
        for key, value in values.items():
            self.add_scalar(f"{prefix}/{key}", value, step)

    def add_image(self, tag: str, image: np.ndarray, step: int) -> None:
        """image: (H, W) or (H, W, C) float array in [0, 1]."""
        if self._writer is None:
            return
        image = np.asarray(image, np.float32)
        if image.ndim == 2:
            image = image[..., None]
        self._writer.image(tag, image, step)

    def add_audio(self, tag: str, wav: np.ndarray, step: int, sample_rate: int) -> None:
        if self._writer is None:
            return
        # flax's SummaryWriter.audio expects rank-3 (batch, samples, channels).
        wav = np.asarray(wav, np.float32).reshape(1, -1, 1)
        peak = np.abs(wav).max()
        if peak > 1.0:
            wav = wav / peak
        self._writer.audio(tag, wav, step, sample_rate=sample_rate, max_outputs=1)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class NullLogger(Logger):
    """No-op logger for non-main processes in multi-host runs (only process
    0 writes TensorBoard events; every host still computes the metrics)."""

    def __init__(self, log_dir: str | pathlib.Path):
        self.log_dir = pathlib.Path(log_dir)
        self._writer = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass
