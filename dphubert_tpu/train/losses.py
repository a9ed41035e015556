"""Distillation loss (reference ``lightning.py:91-139``).

Per-element weighted sum over stacked (batch, layer, time, feature) student
vs teacher tensors: MSE + L1 + cosine (over the feature axis; ``raw`` is
``-mean(cos)``, ``log_sig`` is ``-mean(log sigmoid(cos))``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cosine_similarity(a, b, axis=-1, eps=1e-8):
    """torch.nn.CosineSimilarity semantics: norms clamped at eps."""
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a32, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b32, axis=axis), eps)
    return jnp.sum(a32 * b32, axis=axis) / (na * nb)


def distill_loss(
    student,
    teacher,
    *,
    l2_weight: float,
    l1_weight: float,
    cos_weight: float,
    cos_type: str = "raw",
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Returns (total, (mse, l1, cos)) like the reference module."""
    if cos_type not in ("raw", "log_sig"):
        raise ValueError(cos_type)
    s32 = student.astype(jnp.float32)
    t32 = teacher.astype(jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    loss_mse = jnp.mean(jnp.square(s32 - t32)) if l2_weight != 0 else zero
    loss_l1 = jnp.mean(jnp.abs(s32 - t32)) if l1_weight != 0 else zero
    if cos_weight != 0:
        cos = cosine_similarity(s32, t32, axis=-1)
        if cos_type == "raw":
            loss_cos = -jnp.mean(cos)
        else:
            loss_cos = -jnp.mean(jnp.log(jax.nn.sigmoid(cos)))
    else:
        loss_cos = zero
    total = l2_weight * loss_mse + l1_weight * loss_l1 + cos_weight * loss_cos
    return total, (loss_mse, loss_l1, loss_cos)
