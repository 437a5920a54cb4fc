"""GE2E speaker encoder (Wan et al., arXiv:1710.10467; SURVEY.md section 2).

Stacked LSTM over mel frames -> linear projection of the last frame's output
-> L2 normalization (paper section 2.1). Utterance embeddings are the
renormalized mean over sliding mel windows (SV2TTS enrollment;
BASELINE.json:5 "stacked LSTM over sliding mel windows + embedding
averaging").

TPU design: windowing is a static-shape gather that folds windows into the
batch dimension, so the LSTM stack runs one large MXU-friendly batch instead
of a per-window Python loop (SURVEY.md section 3.4 hot loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_speaker_tts_tpu.models.layers import _LSTMParamBank
from multi_speaker_tts_tpu.ops import lstm as lstm_ops


def num_windows(length: int, window_length: int, window_shift: int) -> int:
    """Static window count for a (padded) mel length."""
    return max(1, 1 + max(0, length - window_length) // window_shift)


def slide_windows(mel: jax.Array, window_length: int, window_shift: int) -> jax.Array:
    """(..., T, M) -> (..., W, window_length, M) sliding windows.

    If T < window_length the mel is zero-padded to one full window. Pure
    gather: compiles to a single static-shape slice pattern.
    """
    T = mel.shape[-2]
    if T < window_length:
        pad = [(0, 0)] * (mel.ndim - 2) + [(0, window_length - T), (0, 0)]
        mel = jnp.pad(mel, pad)
        T = window_length
    W = num_windows(T, window_length, window_shift)
    starts = jnp.arange(W) * window_shift
    # Clamp the final window inside the signal (reference slides over the
    # utterance and keeps the tail window flush with the end).
    starts = jnp.minimum(starts, T - window_length)
    idx = starts[:, None] + jnp.arange(window_length)[None, :]  # (W, L)
    return mel[..., idx, :]


class GE2E(nn.Module):
    """Speaker encoder: (B, T, mel) -> (B, embedding) unit-norm embeddings."""

    lstm_size: int = 768
    lstm_stacks: int = 3
    embedding_size: int = 256
    compute_dtype: jnp.dtype = jnp.float32
    scan_unroll: int = 4  # wavefront unroll (swept in PROFILE.md "GE2E")
    # "pallas": resident-weight sequential kernel (ops/lstm_pallas.py) —
    # safe as the default because it falls back to the wavefront for f32,
    # non-lane hidden sizes, or non-TPU backends. "wavefront": force the
    # XLA diagonal scan.
    backend: str = "pallas"

    @classmethod
    def from_hp(cls, hp, **overrides) -> "GE2E":
        spk = hp.Speaker_Embedding
        kwargs = dict(
            lstm_size=spk.GE2E.LSTM.Sizes,
            lstm_stacks=spk.GE2E.LSTM.Stacks,
            embedding_size=spk.Embedding_Size,
            compute_dtype=(
                jnp.bfloat16 if hp.Train.Use_Mixed_Precision else jnp.float32
            ),
            scan_unroll=int(spk.GE2E.get("Scan_Unroll", 4)),
            backend=str(spk.GE2E.get("Backend", "pallas")),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, mels: jax.Array) -> jax.Array:
        """Fixed-length mel windows (B, L, M) -> unit-norm embeddings (B, E)."""
        # One wavefront scan advances all stacked layers concurrently
        # (param scopes lstm_{i} unchanged - checkpoint-converter contract).
        layers = []
        d = mels.shape[-1]
        for i in range(self.lstm_stacks):
            layers.append(_LSTMParamBank(d, self.lstm_size, name=f"lstm_{i}")())
            d = self.lstm_size
        if self.backend == "pallas":
            from multi_speaker_tts_tpu.ops import lstm_pallas

            # Falls back to the wavefront internally for f32, non-lane
            # hidden sizes, or non-TPU backends (lstm_pallas.supported).
            x, last = lstm_pallas.lstm_stack_seq_pallas(
                layers, mels, compute_dtype=self.compute_dtype,
                unroll=self.scan_unroll,
            )
        else:
            x, last = lstm_ops.lstm_stack_wavefront(
                layers, mels, compute_dtype=self.compute_dtype,
                unroll=self.scan_unroll,
            )
        del x  # (B, H): final frame output (GE2E paper eq. 4) is `last`
        emb = nn.Dense(self.embedding_size, name="projection")(last)
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)

    def embed_utterance(
        self,
        mel: jax.Array,  # (B, T, M) full (padded) utterance mels
        window_length: int,
        window_shift: int,
        window_mask: jax.Array | None = None,  # (B, W) 1 = valid window
        true_frame_lengths: jax.Array | None = None,  # (B,) pre-padding frames
    ) -> jax.Array:
        """Sliding-window utterance embedding (B, E), windows folded to batch.

        ``true_frame_lengths`` (frames of the utterance BEFORE any batch/
        bucket padding) restricts the average to windows lying fully inside
        the real signal, making the embedding exactly independent of how much
        padding the caller appended (the windows it keeps read identical
        frames in every bucket). Short utterances (no window fits) fall back
        to window 0, whose content the caller's padding scheme determines
        (the inference path wrap-pads, so it is still real speech).
        """
        B, T, M = mel.shape
        windows = slide_windows(mel, window_length, window_shift)  # (B, W, L, M)
        W = windows.shape[1]
        if window_mask is None and true_frame_lengths is not None:
            starts = jnp.minimum(
                jnp.arange(W) * window_shift, max(T, window_length) - window_length
            )
            fits = (
                starts[None, :] + window_length <= true_frame_lengths[:, None]
            )  # (B, W)
            first = jnp.arange(W)[None, :] == 0
            window_mask = jnp.where(fits.any(axis=1, keepdims=True), fits, first)
        flat = windows.reshape(B * W, windows.shape[2], M)
        embs = self(flat).reshape(B, W, -1)  # (B, W, E)
        if window_mask is not None:
            mask = window_mask[..., None].astype(embs.dtype)
            mean = (embs * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
        else:
            mean = embs.mean(axis=1)
        return mean / jnp.maximum(jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-6)


def ge2e_similarity_matrix(
    embeddings: jax.Array,  # (N, M, E) - N speakers x M utterances, unit-norm
    weight: jax.Array,  # scalar w > 0 (GE2E eq. 5)
    bias: jax.Array,  # scalar b
) -> jax.Array:
    """Scaled cosine similarity S[j, i, k] = w * cos(e_ji, c_k) + b.

    The own-speaker column (k == j) uses the leave-one-out centroid
    (GE2E eq. 8/9), which stabilizes training.
    """
    N, M, E = embeddings.shape
    centroids = embeddings.mean(axis=1)  # (N, E)
    centroids_n = centroids / jnp.maximum(
        jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-6
    )
    # Leave-one-out centroids for the own column: (N, M, E)
    loo = (embeddings.sum(axis=1, keepdims=True) - embeddings) / (M - 1)
    loo_n = loo / jnp.maximum(jnp.linalg.norm(loo, axis=-1, keepdims=True), 1e-6)

    # Cosine vs every centroid (embeddings are unit-norm already).
    cos_all = jnp.einsum("jme,ke->jmk", embeddings, centroids_n)  # (N, M, N)
    cos_own = jnp.einsum("jme,jme->jm", embeddings, loo_n)  # (N, M)

    own_col = jax.nn.one_hot(jnp.arange(N), N, dtype=cos_all.dtype)  # (N, N)
    cos = cos_all * (1.0 - own_col[:, None, :]) + cos_own[..., None] * own_col[:, None, :]

    w = jnp.maximum(weight, 1e-6)  # clamp w > 0 (GE2E section 2.1)
    return w * cos + bias


def ge2e_loss(
    embeddings: jax.Array,  # (N, M, E) unit-norm
    weight: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """Softmax GE2E loss (eq. 6): -S_jjm + logsumexp_k S_jmk, averaged."""
    S = ge2e_similarity_matrix(embeddings, weight, bias)  # (N, M, N)
    N = S.shape[0]
    own = jnp.take_along_axis(
        S, jnp.arange(N)[:, None, None].repeat(S.shape[1], 1), axis=2
    )[..., 0]
    loss = -own + jax.nn.logsumexp(S, axis=2)
    return loss.mean()
