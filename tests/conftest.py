"""Test configuration: force an 8-virtual-device CPU mesh before JAX loads.

Multi-chip sharding tests run on CPU via
``--xla_force_host_platform_device_count=8`` (SURVEY.md section 4), the JAX
idiom for testing mesh code without a real cluster. Pallas kernels detect
the CPU backend and fall back to interpret mode.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The environment's axon site-hook pins JAX_PLATFORMS=axon (single real TPU);
# the env var alone is not honored, so force the CPU backend via config —
# this is what makes --xla_force_host_platform_device_count=8 effective.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: FFT-heavy CPU compiles are ~30 s each;
# cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.device_count() == 8, (
    "tests require the 8-virtual-device CPU mesh; got "
    f"{jax.devices()}"
)


@pytest.fixture(scope="session")
def hp():
    from multi_speaker_tts_tpu.hparams import default_hparams

    return default_hparams()


@pytest.fixture(scope="session")
def tiny_hp():
    from multi_speaker_tts_tpu.hparams import tiny_test_hparams

    return tiny_test_hparams()


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def speech_like_wav():
    """A deterministic pseudo-speech signal: sum of harmonics with an
    amplitude envelope and silence at both ends (exercises trim + DSP)."""
    sr = 22050
    t = np.arange(int(1.2 * sr), dtype=np.float64) / sr
    f0 = 140.0 + 40.0 * np.sin(2 * np.pi * 1.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(4))
    env = np.minimum(1.0, 10 * t) * np.minimum(1.0, 10 * (t[-1] - t))
    wav = 0.4 * wav * env
    silence = np.zeros(int(0.1 * sr))
    return np.concatenate([silence, wav, silence]).astype(np.float32)
