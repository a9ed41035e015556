"""Three-group AdamW with Lagrangian dual ascent (reference
``lightning.py:200-238``).

Param groups over the training pytree {"student", "projs", "lambdas"}:

  * ``main``      — student params (minus log_alpha) + projections,
                    AdamW @ lr with weight decay;
  * ``log_alpha`` — HardConcrete parameters, AdamW @ reg_lr, no decay;
  * ``lambda``    — the two Lagrange multipliers at **negative** LR: the
                    reference feeds torch.AdamW ``lr=-reg_lr`` so the
                    multipliers do gradient *ascent* (dual ascent).  In optax
                    this is a sign flip on the final scale of that partition
                    — Adam moments still see the raw gradients.

All groups share one LinearDecay schedule factor (torch's scheduler scales
every group's base LR by the same factor), and gradients are globally
clipped to ``clip_norm`` across all groups jointly (Lightning's
``gradient_clip_val``) *scaled like torch*: clip happens on raw grads before
Adam.
"""

from __future__ import annotations

import jax
import optax

from .schedules import linear_decay_factor


def _label_tree(params):
    def label(path, _leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if keys and keys[0] == "lambdas":
            return "lambda"
        if "log_alpha" in keys:
            return "log_alpha"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    *,
    learning_rate: float,
    weight_decay: float,
    warmup_updates: int,
    max_updates: int,
    clip_norm: float,
    use_reg: bool,
    reg_learning_rate: float = 0.0,
) -> optax.GradientTransformation:
    def factor(count):
        return linear_decay_factor(count, warmup_updates, max_updates)

    def _adamw(base_lr, wd=0.0, sign=-1.0):
        tx = [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)]
        if wd:
            tx.append(optax.add_decayed_weights(wd))
        # torch applies lr to (adam_update + wd*param); optax convention adds
        # updates, so descent needs the negative sign.
        tx.append(optax.scale_by_schedule(lambda c: sign * base_lr * factor(c)))
        return optax.chain(*tx)

    transforms = {"main": _adamw(learning_rate, weight_decay)}
    if use_reg:
        transforms["log_alpha"] = _adamw(reg_learning_rate)
        # dual ascent: positive sign
        transforms["lambda"] = _adamw(reg_learning_rate, sign=+1.0)

    tx = optax.multi_transform(transforms, _label_tree)
    if clip_norm and clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
