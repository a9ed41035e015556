"""Learning-rate schedules (reference ``lightning.py:22-88``).

Both schedules return a multiplicative *factor* applied to every param
group's base LR — matching torch ``_LRScheduler`` semantics where
``_step_count`` is 1 at the first optimizer update (the scheduler steps once
at construction).  optax step counts are 0-indexed, so factor(count) uses
``t = count + 1``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def linear_decay_factor(count, warmup_updates: int, max_updates: int):
    """Linear warmup to base LR, then linear decay to 0 at ``max_updates``
    (reference ``lightning.py:37-44`` — the schedule the pipeline uses)."""
    t = count + 1
    warm = t / jnp.maximum(warmup_updates, 1)
    pct_remaining = (max_updates - t) / jnp.maximum(
        max_updates - warmup_updates, 1
    )
    factor = jnp.where(t <= warmup_updates, warm, pct_remaining)
    return jnp.where(t >= max_updates, 0.0, factor).astype(jnp.float32)


def tri_stage_factor(
    count,
    warmup_updates: int,
    hold_updates: int,
    decay_updates: int,
    init_lr_scale: float = 0.01,
    final_lr_scale: float = 0.05,
):
    """Warmup / hold / exponential decay (reference ``lightning.py:69-88``)."""
    t = count + 1
    warm = init_lr_scale + t / jnp.maximum(warmup_updates, 1) * (1 - init_lr_scale)
    decay = jnp.exp(
        math.log(final_lr_scale)
        * (t - warmup_updates - hold_updates)
        / jnp.maximum(decay_updates, 1)
    )
    factor = jnp.where(
        t <= warmup_updates,
        warm,
        jnp.where(
            t <= warmup_updates + hold_updates,
            1.0,
            jnp.where(
                t <= warmup_updates + hold_updates + decay_updates,
                decay,
                final_lr_scale,
            ),
        ),
    )
    return factor.astype(jnp.float32)
