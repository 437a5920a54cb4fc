"""Speaker-identity modules besides GE2E (SURVEY.md section 2: the reference
supports multi-speaker conditioning; a learned lookup table is the
closed-set alternative to zero-shot GE2E embeddings)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SpeakerLUT(nn.Module):
    """Learned per-speaker embedding table (closed speaker set)."""

    num_speakers: int
    embedding_size: int

    @classmethod
    def from_hp(cls, hp) -> "SpeakerLUT":
        return cls(
            num_speakers=hp.Speaker_Embedding.get("Num_Speakers", 256),
            embedding_size=hp.Speaker_Embedding.Embedding_Size,
        )

    @nn.compact
    def __call__(self, speaker_ids: jax.Array) -> jax.Array:  # (B,) -> (B, E)
        emb = nn.Embed(self.num_speakers, self.embedding_size, name="table")(
            speaker_ids
        )
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)
