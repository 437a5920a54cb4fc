"""Optimizer + LR schedule (SURVEY.md section 2 "Optimizer / LR schedule").

The reference vendors RAdam + a Noam warmup scheduler (CODEJIN house
pattern); here both are composed from optax: ``optax.radam`` under a Noam
schedule with global-norm clipping and decoupled weight decay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def noam_schedule(initial_lr: float, warmup_steps: int) -> optax.Schedule:
    """lr(step) = initial * warmup^0.5 * min(step^-0.5, step * warmup^-1.5).

    Equals ``initial_lr`` exactly at ``step == warmup_steps``, linear ramp
    before, inverse-sqrt decay after (Vaswani et al. eq. 3).
    """

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return initial_lr * (warmup_steps**0.5) * jnp.minimum(
            s**-0.5, s * (warmup_steps**-1.5)
        )

    return schedule


def _decoupled_weight_decay(
    weight_decay: float, schedule: optax.Schedule
) -> optax.GradientTransformation:
    """AdamW-style decay added to the (post-optimizer) updates, scaled by lr."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("weight decay requires params")
        lr = schedule(state.count)
        updates = jax.tree.map(lambda u, p: u - lr * weight_decay * p, updates, params)
        return updates, optax.ScaleByScheduleState(count=optax.safe_increment(state.count))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(hp) -> optax.GradientTransformation:
    """clip-by-global-norm -> RAdam(Noam schedule) [-> weight decay]."""
    schedule = noam_schedule(
        hp.Train.Learning_Rate.Initial, hp.Train.Learning_Rate.Warmup_Step
    )
    adam = hp.Train.get("ADAM")
    kwargs = dict(b1=adam.Beta1, b2=adam.Beta2, eps=adam.Epsilon) if adam else {}
    transforms = [
        optax.clip_by_global_norm(hp.Train.Gradient_Norm),
        optax.radam(learning_rate=schedule, **kwargs),
    ]
    wd = hp.Train.get("Weight_Decay", 0.0)
    if wd:
        transforms.append(_decoupled_weight_decay(wd, schedule))
    return optax.chain(*transforms)
