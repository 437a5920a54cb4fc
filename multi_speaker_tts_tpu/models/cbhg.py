"""CBHG: the reference's Taco1-style mel->linear post-processing network
(SURVEY.md section 2 "Synthesizer ... predicts mel/linear spectrograms";
Tacotron arXiv:1703.10135 section 3.1, listed in PAPERS.md).

Conv1D bank (k = 1..K) -> max-pool (w=2, s=1) -> two conv projections ->
residual -> highway stack -> bidirectional GRU. All convolutions are
batch-normalized; the bank's K parallel convs are independent XLA convs that
fuse well (same input, concatenated outputs). The BiGRU runs on the
``ops.gru`` scan with the hoisted input projection.

Module names line up with ``convert.mapping.tacotron_mapping`` so reference
CBHG checkpoints convert with the same table as the rest of the model.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from multi_speaker_tts_tpu.models.layers import BiGRU, ConvBNBlock, Highway


class CBHG(nn.Module):
    bank_k: int = 8
    bank_channels: int = 128
    projection_channels: int = 256
    highway_layers: int = 4
    highway_size: int = 128
    gru_size: int = 256  # total; half per direction
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, D) -> (B, T, gru_size)."""
        # Conv bank: kernel sizes 1..K over the same input.
        bank = [
            ConvBNBlock(
                self.bank_channels, k, activation="relu", dropout_rate=0.0,
                dtype=self.compute_dtype, name=f"bank_{k - 1}",
            )(x, train=train)
            for k in range(1, self.bank_k + 1)
        ]
        y = jnp.concatenate(bank, axis=-1)  # (B, T, K*C)
        y = nn.max_pool(y, window_shape=(2,), strides=(1,), padding="SAME")

        y = ConvBNBlock(
            self.projection_channels, 3, activation="relu", dropout_rate=0.0,
            dtype=self.compute_dtype, name="proj_0",
        )(y, train=train)
        y = ConvBNBlock(
            x.shape[-1], 3, activation="none", dropout_rate=0.0,
            dtype=self.compute_dtype, name="proj_1",
        )(y, train=train)
        y = y.astype(jnp.float32) + x  # residual

        if y.shape[-1] != self.highway_size:
            y = nn.Dense(self.highway_size, name="pre_highway")(y)
        for i in range(self.highway_layers):
            y = Highway(self.highway_size, name=f"highway_{i}")(y)
        return BiGRU(self.gru_size, compute_dtype=self.compute_dtype, name="gru")(y)


class CBHGHead(nn.Module):
    """Mel -> linear-spectrogram branch: CBHG + output projection (replaces
    the round-1 conv-stack stand-in when Linear_Head.Type == 'CBHG')."""

    spect_dim: int
    bank_k: int = 8
    bank_channels: int = 128
    projection_channels: int = 256
    highway_layers: int = 4
    highway_size: int = 128
    gru_size: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = CBHG(
            bank_k=self.bank_k,
            bank_channels=self.bank_channels,
            projection_channels=self.projection_channels,
            highway_layers=self.highway_layers,
            highway_size=self.highway_size,
            gru_size=self.gru_size,
            compute_dtype=self.compute_dtype,
            name="cbhg",
        )(mel, train=train)
        return nn.Dense(self.spect_dim, name="projection")(y)
