"""Hyper-parameter system.

Mirrors the reference's single-YAML config surface (SURVEY.md section 2,
"Hyper-parameter system"): one ``Hyper_Parameters.yaml`` holding every knob,
parsed recursively into an attribute-access namespace via ``Recursive_Parse``.
"Same hparams file" is an explicit compatibility contract (BASELINE.json:5),
so key names follow the reference's Capitalized_Snake house style.

Values marked ``# UNVERIFIED`` in the YAML come from the Tacotron 2 / GE2E /
SV2TTS papers rather than the (unavailable) reference checkout; re-verify if
/root/reference is ever populated.
"""

from __future__ import annotations

import copy
import pathlib
from typing import Any, Mapping

import yaml


class HParams:
    """Recursive attribute-access namespace over a nested dict.

    Supports both ``hp.Sound.Mel_Dim`` (reference style) and
    ``hp['Sound']['Mel_Dim']``; hashable-key iteration and ``to_dict`` for
    serialization. Unknown attribute access raises ``AttributeError`` with
    the full dotted path to aid strict-mode validation.
    """

    def __init__(self, data: Mapping[str, Any], _path: str = ""):
        object.__setattr__(self, "_path", _path)
        object.__setattr__(self, "_data", {})
        for key, value in data.items():
            self._data[key] = self._wrap(key, value)

    def _wrap(self, key: str, value: Any) -> Any:
        child_path = f"{self._path}.{key}" if self._path else key
        if isinstance(value, Mapping):
            return HParams(value, child_path)
        if isinstance(value, list):
            return [
                HParams(v, f"{child_path}[{i}]") if isinstance(v, Mapping) else v
                for i, v in enumerate(value)
            ]
        return value

    def __getattr__(self, name: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if name in data:
            return data[name]
        path = object.__getattribute__(self, "_path")
        full = f"{path}.{name}" if path else name
        raise AttributeError(f"No hyper-parameter '{full}'")

    def __setattr__(self, name: str, value: Any) -> None:
        self._data[name] = self._wrap(name, value)

    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def to_dict(self) -> dict:
        out = {}
        for key, value in self._data.items():
            if isinstance(value, HParams):
                out[key] = value.to_dict()
            elif isinstance(value, list):
                out[key] = [
                    v.to_dict() if isinstance(v, HParams) else v for v in value
                ]
            else:
                out[key] = value
        return out

    def replace(self, **overrides: Any) -> "HParams":
        """Return a deep copy with top-level keys replaced (nested dicts merge)."""
        data = copy.deepcopy(self.to_dict())
        for key, value in overrides.items():
            if (
                key in data
                and isinstance(data[key], dict)
                and isinstance(value, Mapping)
            ):
                data[key] = _deep_merge(data[key], value)
            else:
                data[key] = value
        return HParams(data)

    def __repr__(self) -> str:
        return f"HParams({self.to_dict()!r})"

    def __eq__(self, other: object) -> bool:
        if isinstance(other, HParams):
            return self.to_dict() == other.to_dict()
        return NotImplemented


def _deep_merge(base: dict, override: Mapping) -> dict:
    out = dict(base)
    for key, value in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, Mapping):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = copy.deepcopy(value) if isinstance(value, (dict, list)) else value
    return out


def Recursive_Parse(data: Mapping[str, Any]) -> HParams:
    """Reference-compatible entry point: dict (from yaml.load) -> namespace.

    Mirrors the reference's ``Recursive_Parse(yaml.load(...))`` idiom
    (SURVEY.md section 2, L0 config layer).
    """
    return HParams(data)


_DEFAULT_YAML = pathlib.Path(__file__).parent / "Hyper_Parameters.yaml"


def load_hyper_parameters(path: str | pathlib.Path | None = None) -> HParams:
    """Load a reference-format Hyper_Parameters.yaml into an HParams namespace."""
    path = pathlib.Path(path) if path is not None else _DEFAULT_YAML
    with open(path, "r", encoding="utf-8") as f:
        return Recursive_Parse(yaml.safe_load(f))


def default_hparams(**overrides: Any) -> HParams:
    """The shipped default config, optionally with top-level overrides."""
    hp = load_hyper_parameters()
    if overrides:
        hp = hp.replace(**overrides)
    return hp


def tiny_test_hparams() -> HParams:
    """A miniature config for fast unit tests: same structure, tiny dims."""
    return default_hparams(
        Sound={
            "Sample_Rate": 16000,
            "Frame_Length": 256,
            "Frame_Shift": 64,
            "Spectrogram_Dim": 129,
            "Mel_Dim": 16,
            "Griffin_Lim_Iter": 8,
        },
        Encoder={
            "Embedding_Size": 32,
            "Conv": {"Stacks": 2, "Channels": 32, "Kernel_Size": 5, "Dropout_Rate": 0.5},
            "LSTM_Size": 32,
        },
        Speaker_Embedding={
            "Type": "GE2E",
            "Embedding_Size": 16,
            "GE2E": {
                "LSTM": {"Sizes": 32, "Stacks": 2},
                "Window_Length": 24,
                "Window_Shift": 12,
                "Loss": {"Initial_Weight": 10.0, "Initial_Bias": -5.0},
            },
        },
        Decoder={
            "Prenet": {"Sizes": [16, 16], "Dropout_Rate": 0.5},
            "Attention": {"Size": 32, "Conv": {"Channels": 8, "Kernel_Size": 15}},
            "LSTM": {"Sizes": 32, "Stacks": 2},
            "N_Frames_Per_Step": 1,  # r-specific tests override explicitly
            "Max_Step": 64,
            "Stop_Threshold": 0.5,
        },
        Postnet={"Conv": {"Stacks": 2, "Channels": 32, "Kernel_Size": 5, "Dropout_Rate": 0.5}},
        Linear_Head={
            "Use": True,
            "Type": "Conv",  # tests that want CBHG override Type + CBHG dims
            "CBHG": {
                "Bank_K": 4,
                "Bank_Channels": 16,
                "Projection_Channels": 16,
                "Highway": {"Layers": 2, "Size": 16},
                "GRU_Size": 16,
            },
            "Conv": {"Stacks": 1, "Channels": 32, "Kernel_Size": 5, "Dropout_Rate": 0.5},
        },
        Train={
            "Batch_Size": 4,
            "Num_Workers": 0,  # in-process loading; grain workers need a
            # spawn-reimportable __main__, which pytest/stdin scripts lack
            "Max_Mel_Length": 64,
            "Max_Token_Length": 32,
            "Learning_Rate": {"Initial": 1e-3, "Warmup_Step": 10},
            "Weight_Decay": 1e-6,
            "Gradient_Norm": 1.0,
            "Use_Mixed_Precision": False,
        },
    )
