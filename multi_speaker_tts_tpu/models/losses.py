"""Training losses (SURVEY.md section 2 "Losses"): masked mel L1 pre/post
postnet, stop-token BCE, and optional guided-attention loss."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_len: int, dtype=jnp.float32) -> jax.Array:
    """(B,) lengths -> (B, max_len) 0/1 mask."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None]).astype(dtype)


def masked_l1(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean absolute error over valid frames only. mask: (B, T)."""
    err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    err = err * mask[..., None]
    denom = jnp.maximum(mask.sum() * pred.shape[-1], 1.0)
    return err.sum() / denom


def stop_token_bce(
    stop_logits: jax.Array,  # (B, n_steps)
    mel_lengths: jax.Array,  # (B,) in frames
    n_frames_per_step: int = 1,
    positive_weight: float = 5.0,
) -> jax.Array:
    """BCE against a target that is 1 at/after the last valid step.

    The single positive step per utterance is upweighted (standard Taco2
    recipe) so the stop head doesn't collapse to "never stop".
    """
    n_steps = stop_logits.shape[1]
    lengths_steps = jnp.ceil(mel_lengths / n_frames_per_step).astype(jnp.int32)
    steps = jnp.arange(n_steps)[None, :]
    target = (steps >= (lengths_steps[:, None] - 1)).astype(jnp.float32)
    valid = (steps < lengths_steps[:, None]).astype(jnp.float32)

    logits = stop_logits.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    weight = jnp.where(target > 0, positive_weight, 1.0) * valid
    return (bce * weight).sum() / jnp.maximum(weight.sum(), 1.0)


def guided_attention_loss(
    alignments: jax.Array,  # (B, T_dec, S)
    token_lengths: jax.Array,  # (B,)
    mel_lengths: jax.Array,  # (B,) in decoder steps
    sigma: float = 0.2,
) -> jax.Array:
    """Tachibana et al. guided attention: penalize off-diagonal mass.

    W[t, s] = 1 - exp(-(s/S - t/T)^2 / (2 sigma^2)), masked to valid region.
    """
    B, T, S = alignments.shape
    t_pos = jnp.arange(T)[None, :, None] / jnp.maximum(mel_lengths[:, None, None], 1)
    s_pos = jnp.arange(S)[None, None, :] / jnp.maximum(token_lengths[:, None, None], 1)
    W = 1.0 - jnp.exp(-((s_pos - t_pos) ** 2) / (2 * sigma**2))
    mask = (
        sequence_mask(mel_lengths, T)[:, :, None]
        * sequence_mask(token_lengths, S)[:, None, :]
    )
    loss = alignments.astype(jnp.float32) * W * mask
    return loss.sum() / jnp.maximum(mask.sum(), 1.0)


def tacotron_losses(
    outputs: dict,
    mels: jax.Array,  # (B, T, mel)
    mel_lengths: jax.Array,  # (B,)
    token_lengths: jax.Array,  # (B,)
    spects: jax.Array | None = None,  # (B, T, spect) linear targets
    n_frames_per_step: int = 1,
    guided_attention_sigma: float | None = 0.2,
    guided_attention_weight: float = 10.0,
) -> dict[str, jax.Array]:
    """All synthesizer losses; 'total' is the training objective."""
    T = mels.shape[1]
    mask = sequence_mask(mel_lengths, T)
    losses = {
        "mel_pre": masked_l1(outputs["mel_pre"], mels, mask),
        "mel_post": masked_l1(outputs["mel_post"], mels, mask),
        "stop": stop_token_bce(
            outputs["stop_logits"], mel_lengths, n_frames_per_step
        ),
    }
    total = losses["mel_pre"] + losses["mel_post"] + losses["stop"]
    if spects is not None and "linear" in outputs:
        losses["linear"] = masked_l1(outputs["linear"], spects, mask)
        total = total + losses["linear"]
    if guided_attention_sigma is not None:
        lengths_steps = jnp.ceil(mel_lengths / n_frames_per_step).astype(jnp.int32)
        losses["guided_attention"] = guided_attention_loss(
            outputs["alignments"], token_lengths, lengths_steps, guided_attention_sigma
        )
        total = total + guided_attention_weight * losses["guided_attention"]
    losses["total"] = total
    return losses
