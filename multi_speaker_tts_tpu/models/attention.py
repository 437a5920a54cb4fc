"""Location-sensitive attention (Taco2 section 2.2; SURVEY.md section 2).

Content + location terms: the location features are a 1-D convolution over
the concatenation of the previous attention weights and their running
cumulative sum (2 input channels). Energies are computed and softmaxed in
float32 regardless of the model compute dtype - location-sensitive attention
is numerically fragile in bf16 (SURVEY.md section 7 "Hard parts" #5).

The memory ("key") projection is factored out into ``precompute_keys`` so
the per-frame decoder scan only pays the small query/location work
(SURVEY.md section 3.2: attention conv is a per-frame hot loop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class AttentionState(NamedTuple):
    weights: jax.Array  # (B, S) previous attention weights
    cum_weights: jax.Array  # (B, S) cumulative attention weights


def init_attention_state(batch: int, memory_len: int, dtype=jnp.float32) -> AttentionState:
    """Initial state: attention pinned to the first memory position."""
    w0 = jnp.zeros((batch, memory_len), dtype).at[:, 0].set(1.0)
    return AttentionState(weights=w0, cum_weights=w0)


class LocationSensitiveAttention(nn.Module):
    attention_size: int = 128
    conv_channels: int = 32
    conv_kernel_size: int = 31

    # NOTE: the memory ("key") projection lives in the Decoder, not here -
    # it must be computed once per utterance OUTSIDE the frame scan, while
    # this module's params are replicated inside the scanned cell.

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, D_q) attention-RNN output for this frame
        keys: jax.Array,  # (B, S, A) from precompute_keys
        memory: jax.Array,  # (B, S, D_mem)
        state: AttentionState,
        memory_mask: jax.Array | None = None,  # (B, S), 1 = valid
    ) -> tuple[jax.Array, AttentionState]:
        """One attention step -> (context (B, D_mem), new state)."""
        q = nn.Dense(self.attention_size, use_bias=False, name="query_layer")(
            query.astype(jnp.float32)
        )  # (B, A)

        loc_input = jnp.stack(
            [state.weights, state.cum_weights], axis=-1
        )  # (B, S, 2), already f32
        loc = nn.Conv(
            self.conv_channels,
            (self.conv_kernel_size,),
            padding="SAME",
            use_bias=False,
            name="location_conv",
        )(loc_input)
        loc = nn.Dense(self.attention_size, use_bias=False, name="location_layer")(loc)

        energies = nn.Dense(1, use_bias=False, name="v")(
            jnp.tanh(q[:, None, :] + keys + loc)
        )[..., 0]  # (B, S), f32
        if memory_mask is not None:
            energies = jnp.where(memory_mask > 0, energies, -1e9)

        weights = jax.nn.softmax(energies, axis=-1)  # (B, S) f32
        context = jnp.einsum("bs,bsd->bd", weights, memory.astype(jnp.float32))
        new_state = AttentionState(
            weights=weights, cum_weights=state.cum_weights + weights
        )
        return context, new_state
