"""Flax building blocks shared by the GE2E encoder and the synthesizer.

Thin linen wrappers over the TPU primitives in ``ops/`` plus the conv/prenet
blocks from the reference architecture (SURVEY.md section 2: encoder convs,
prenet, postnet convs).
"""

from __future__ import annotations

from typing import Sequence

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_speaker_tts_tpu.ops import gru as gru_ops
from multi_speaker_tts_tpu.ops import lstm as lstm_ops


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTM(nn.Module):
    """Single-layer LSTM over (B, T, D) -> (B, T, H); torch gate order."""

    hidden_size: int
    reverse: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h0=None, c0=None, return_state: bool = False):
        D, H = x.shape[-1], self.hidden_size
        bound = 1.0 / math.sqrt(H)
        params = lstm_ops.LSTMParams(
            w_ih=self.param("w_ih", _uniform_init(bound), (D, 4 * H)),
            w_hh=self.param("w_hh", _uniform_init(bound), (H, 4 * H)),
            b=self.param("b", _uniform_init(bound), (4 * H,)),
        )
        ys, state = lstm_ops.lstm(
            params, x, h0, c0, reverse=self.reverse, compute_dtype=self.compute_dtype
        )
        return (ys, state) if return_state else ys


class _LSTMParamBank(nn.Module):
    """Declares one LSTM layer's params (same tree as ``LSTM``) without
    running it - lets ``BiLSTM`` keep the ``forward``/``backward`` scopes
    (checkpoint-converter contract, convert/mapping.py) while executing both
    directions in one fused scan."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self) -> lstm_ops.LSTMParams:
        D, H = self.input_size, self.hidden_size
        bound = 1.0 / math.sqrt(H)
        return lstm_ops.LSTMParams(
            w_ih=self.param("w_ih", _uniform_init(bound), (D, 4 * H)),
            w_hh=self.param("w_hh", _uniform_init(bound), (H, 4 * H)),
            b=self.param("b", _uniform_init(bound), (4 * H,)),
        )


class BiLSTM(nn.Module):
    """Bidirectional LSTM: (B, T, D) -> (B, T, 2 * (hidden_size // 2)).

    Both directions run in ONE direction-batched scan (``ops.lstm.
    bilstm_fused``): XLA executes while-loops serially, so separate
    direction scans would double the sequential depth."""

    hidden_size: int  # total output size; each direction gets half
    compute_dtype: jnp.dtype = jnp.float32
    unroll: int = 4
    # "pallas": fused bidirectional resident-weight kernel
    # (ops/birnn_pallas.py) — falls back to the XLA direction-batched scan
    # for f32, non-lane hidden sizes, or non-TPU backends, so it is safe
    # as the default. "fused": force the XLA scan.
    backend: str = "pallas"

    @nn.compact
    def __call__(self, x):
        half = self.hidden_size // 2
        fwd = _LSTMParamBank(x.shape[-1], half, name="forward")()
        bwd = _LSTMParamBank(x.shape[-1], half, name="backward")()
        if self.backend == "pallas":
            from multi_speaker_tts_tpu.ops import birnn_pallas

            return birnn_pallas.bilstm_pallas(
                fwd, bwd, x, compute_dtype=self.compute_dtype,
                unroll=self.unroll,
            )
        return lstm_ops.bilstm_fused(
            fwd, bwd, x, compute_dtype=self.compute_dtype, unroll=self.unroll
        )


class GRU(nn.Module):
    """Single-layer GRU over (B, T, D) -> (B, T, H); torch gate order."""

    hidden_size: int
    reverse: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D, H = x.shape[-1], self.hidden_size
        bound = 1.0 / math.sqrt(H)
        params = gru_ops.GRUParams(
            w_ih=self.param("w_ih", _uniform_init(bound), (D, 3 * H)),
            w_hh=self.param("w_hh", _uniform_init(bound), (H, 3 * H)),
            b_ih=self.param("b_ih", _uniform_init(bound), (3 * H,)),
            b_hh=self.param("b_hh", _uniform_init(bound), (3 * H,)),
        )
        ys, _ = gru_ops.gru(
            params, x, reverse=self.reverse, compute_dtype=self.compute_dtype
        )
        return ys


class _GRUParamBank(nn.Module):
    """GRU analogue of ``_LSTMParamBank`` (same tree as ``GRU``)."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self) -> gru_ops.GRUParams:
        D, H = self.input_size, self.hidden_size
        bound = 1.0 / math.sqrt(H)
        return gru_ops.GRUParams(
            w_ih=self.param("w_ih", _uniform_init(bound), (D, 3 * H)),
            w_hh=self.param("w_hh", _uniform_init(bound), (H, 3 * H)),
            b_ih=self.param("b_ih", _uniform_init(bound), (3 * H,)),
            b_hh=self.param("b_hh", _uniform_init(bound), (3 * H,)),
        )


class BiGRU(nn.Module):
    """Bidirectional GRU: (B, T, D) -> (B, T, 2 * (hidden_size // 2)).
    One direction-batched scan (see ``BiLSTM``)."""

    hidden_size: int  # total output size; each direction gets half
    compute_dtype: jnp.dtype = jnp.float32
    unroll: int = 4
    backend: str = "pallas"  # same dispatch contract as ``BiLSTM.backend``

    @nn.compact
    def __call__(self, x):
        half = self.hidden_size // 2
        fwd = _GRUParamBank(x.shape[-1], half, name="forward")()
        bwd = _GRUParamBank(x.shape[-1], half, name="backward")()
        if self.backend == "pallas":
            from multi_speaker_tts_tpu.ops import birnn_pallas

            return birnn_pallas.bigru_pallas(
                fwd, bwd, x, compute_dtype=self.compute_dtype,
                unroll=self.unroll,
            )
        return gru_ops.bigru_fused(
            fwd, bwd, x, compute_dtype=self.compute_dtype, unroll=self.unroll
        )


class Highway(nn.Module):
    """Highway layer (Srivastava et al.; Taco1 section 3.1): out =
    relu(H(x)) * sigmoid(T(x)) + x * (1 - sigmoid(T(x))). The transform
    gate bias starts at -1 so early training passes inputs through."""

    size: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.size, name="H")(x))
        t = jax.nn.sigmoid(
            nn.Dense(
                self.size,
                name="T",
                bias_init=lambda key, shape, dtype=jnp.float32: jnp.full(
                    shape, -1.0, dtype
                ),
            )(x)
        )
        return h * t + x * (1.0 - t)


class _ConvViaGEMM(nn.Module):
    """1-D SAME conv expressed as K shifted (B*T, Cin)x(Cin, Cout) GEMMs.

    Same parameter tree as ``nn.Conv`` (kernel (K, Cin, Cout), bias
    (Cout,), same initializers) so checkpoints are interchangeable with
    the lax.conv form. Rationale (PROFILE.md "Conv as shifted GEMMs"):
    the round-4 train trace measured XLA's conv_general_dilated at ~53%
    of the bf16 MXU peak for the postnet shapes, while plain dot_generals
    on the same operands run at ~90% - the K shifted views cost K extra
    reads of x, a bandwidth price that is ~4x smaller than the MXU time
    recovered at (B*T >= 38k, C >= 512) shapes."""

    features: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, Cin) -> (B, T, Cout)
        K, Cin = self.kernel_size, x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (K, Cin, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        T = x.shape[1]
        lo = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, K - 1 - lo), (0, 0))).astype(self.dtype)
        kd = kernel.astype(self.dtype)
        y = None
        for d in range(K):
            yd = jnp.dot(xp[:, d : d + T], kd[d])
            y = yd if y is None else y + yd
        return y + bias.astype(self.dtype)


class ConvBNBlock(nn.Module):
    """Conv1d (SAME) + BatchNorm + activation + dropout, Taco2-style.

    ``dtype`` is the computation dtype: under mixed precision the conv (the
    MXU-bound cost; f32 runs at half the bf16 matmul peak on TPU) and the
    normalize/activation run in bf16 while parameters and the BatchNorm
    statistics stay f32 (flax forces f32 stat reductions)."""

    channels: int
    kernel_size: int
    activation: str = "relu"  # 'relu' | 'tanh' | 'none'
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # x: (B, T, C)
        import os as _os

        if _os.environ.get("MSTTS_CONV_GEMM"):
            x = _ConvViaGEMM(
                self.channels, self.kernel_size, dtype=self.dtype,
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.channels, (self.kernel_size,), padding="SAME",
                dtype=self.dtype, name="Conv_0",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(x)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "tanh":
            x = jnp.tanh(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class DenseParamBank(nn.Module):
    """Declares one Dense layer's params (same names/init as ``nn.Dense``)
    without running it, for functional application inside AND outside a
    scanned cell (the decoder hoists its projections out of the teacher-
    forced frame scan but still applies them per-step in AR mode)."""

    input_size: int
    features: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.input_size, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class DenseKernelBank(nn.Module):
    """Bias-free Dense params (same name/init as ``nn.Dense(use_bias=False)``)
    as a plain array, for functional use inside custom-VJP scans."""

    input_size: int
    features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.input_size, self.features),
        )


class ConvKernelBank(nn.Module):
    """Bias-free 1-D Conv params (same name/init as ``nn.Conv(use_bias=
    False)``) as a plain (K, in, out) array."""

    kernel_size: int
    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
        )


class PrenetBank(nn.Module):
    """Param tree of ``Prenet`` (dense_{i}/kernel,bias) as plain arrays."""

    input_size: int
    sizes: Sequence[int]

    @nn.compact
    def __call__(self) -> list[tuple[jax.Array, jax.Array]]:
        ws, d = [], self.input_size
        for i, size in enumerate(self.sizes):
            ws.append(DenseParamBank(d, size, name=f"dense_{i}")())
            d = size
        return ws


def prenet_apply(
    ws: list[tuple[jax.Array, jax.Array]],
    x: jax.Array,
    dropout_rate: float,
    rng: jax.Array,
) -> jax.Array:
    """Functional Prenet: Dense -> ReLU -> always-on dropout per layer
    (numerics match ``Prenet``/``nn.Dropout``: bernoulli keep mask,
    x / keep_prob scaling)."""
    keep_prob = 1.0 - dropout_rate
    keys = jax.random.split(rng, len(ws))
    for (kernel, bias), key in zip(ws, keys):
        x = nn.relu(jnp.dot(x, kernel) + bias)
        if dropout_rate > 0.0:
            keep = jax.random.bernoulli(key, keep_prob, x.shape)
            x = jnp.where(keep, x / keep_prob, 0.0)
    return x


class Prenet(nn.Module):
    """2x (Dense -> ReLU -> Dropout); dropout stays ON at inference
    (Taco2 section 2.2; SURVEY.md section 2 "Decoder")."""

    sizes: Sequence[int]
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.sizes):
            x = nn.relu(nn.Dense(size, name=f"dense_{i}")(x))
            # Always stochastic: deterministic=False even in eval - this is
            # the Tacotron 2 trick that keeps AR decoding stable.
            x = nn.Dropout(self.dropout_rate, deterministic=False)(
                x, rng=self.make_rng("prenet")
            )
        return x
