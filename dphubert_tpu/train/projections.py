"""Distillation projection heads (reference ``distill.py:84-107``).

Two modes:
  * ``layer2layer`` — layers in the same group *share* one Linear,
    identity-initialized (``distill.py:24-26,93-99``).  We store one set of
    weights per group (true sharing under JAX — a shared torch module would
    otherwise become independent copies after one update).
  * ``predlayer`` — DistilHuBERT style: an independent Linear+GELU per
    distill layer, applied to the student's *last* layer.

State-dict interop: the reference saves the shared module once *per list
slot* (``distill_linear_projs.{i}.weight``); we emit the same duplicated
flat keys on export and read slot-0-of-group on import.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def parse_layer_groups(distill_layers: str) -> Tuple[Tuple[int, ...], ...]:
    """Parse the reference's group syntax: periods separate groups, commas
    separate layers within a group ("0.4,8,12" -> [[0], [4, 8, 12]])."""
    return tuple(
        tuple(int(l) for l in g.split(",")) for g in distill_layers.split(".")
    )


def flatten_groups(groups: Sequence[Sequence[int]]) -> Tuple[int, ...]:
    out: List[int] = []
    for g in groups:
        out.extend(g)
    return tuple(out)


def init_projections(
    mode: str,
    groups: Sequence[Sequence[int]],
    student_dim: int,
    teacher_dim: int,
    key,
) -> dict:
    """Projection param pytree: {"groups": {str(g): {weight, bias}}}."""
    if mode == "layer2layer":
        # identity init (distill.py:24-26); requires square when dims match
        gp = {}
        for gi in range(len(groups)):
            w = np.zeros((teacher_dim, student_dim), np.float32)
            n = min(teacher_dim, student_dim)
            w[:n, :n] = np.eye(n, dtype=np.float32)
            gp[str(gi)] = {
                "weight": jnp.asarray(w),
                "bias": jnp.zeros((teacher_dim,), jnp.float32),
            }
        return {"groups": gp}
    elif mode == "predlayer":
        flat = flatten_groups(groups)
        gp = {}
        bound = 1.0 / math.sqrt(student_dim)
        for li in range(len(flat)):
            key, k1, k2 = jax.random.split(key, 3)
            gp[str(li)] = {
                "weight": jax.random.uniform(
                    k1, (teacher_dim, student_dim), jnp.float32, -bound, bound
                ),
                "bias": jax.random.uniform(
                    k2, (teacher_dim,), jnp.float32, -bound, bound
                ),
            }
        return {"groups": gp}
    raise ValueError(f"Invalid distill mode: {mode}")


def apply_projections(
    proj_params: dict,
    mode: str,
    groups: Sequence[Sequence[int]],
    student_hiddens: List[jax.Array],
):
    """Project chosen student layers to teacher width and stack to
    (batch, n_distill_layers, time, teacher_dim) (reference
    ``lightning.py:254-263``)."""
    outs = []
    if mode == "layer2layer":
        for gi, g in enumerate(groups):
            p = proj_params["groups"][str(gi)]
            for layer_idx in g:
                h = student_hiddens[layer_idx]
                outs.append(h @ p["weight"].astype(h.dtype).T + p["bias"].astype(h.dtype))
    elif mode == "predlayer":
        flat = flatten_groups(groups)
        last = student_hiddens[-1]
        for li in range(len(flat)):
            p = proj_params["groups"][str(li)]
            y = last @ p["weight"].astype(last.dtype).T + p["bias"].astype(last.dtype)
            outs.append(jax.nn.gelu(y, approximate=False))
    else:
        raise ValueError(f"Invalid distill mode: {mode}")
    return jnp.stack(outs, axis=1)


# --- state-dict interop -----------------------------------------------------


def projections_to_state_dict(
    proj_params: dict, mode: str, groups: Sequence[Sequence[int]]
) -> Dict[str, np.ndarray]:
    """Duplicate shared group weights into per-slot keys like the reference
    (``distill_linear_projs.{i}.weight`` / predlayer ``...{i}.0.weight``)."""
    out = {}
    slot = 0
    if mode == "layer2layer":
        for gi, g in enumerate(groups):
            p = proj_params["groups"][str(gi)]
            for _ in g:
                out[f"{slot}.weight"] = np.asarray(p["weight"])
                out[f"{slot}.bias"] = np.asarray(p["bias"])
                slot += 1
    else:
        flat = flatten_groups(groups)
        for li in range(len(flat)):
            p = proj_params["groups"][str(li)]
            out[f"{li}.0.weight"] = np.asarray(p["weight"])
            out[f"{li}.0.bias"] = np.asarray(p["bias"])
    return out


def projections_from_state_dict(
    sd: Dict[str, np.ndarray], mode: str, groups: Sequence[Sequence[int]]
) -> dict:
    """Inverse of :func:`projections_to_state_dict` (slot 0 of each group
    carries the shared weights)."""
    gp = {}
    if mode == "layer2layer":
        slot = 0
        for gi, g in enumerate(groups):
            gp[str(gi)] = {
                "weight": jnp.asarray(sd[f"{slot}.weight"]),
                "bias": jnp.asarray(sd[f"{slot}.bias"]),
            }
            slot += len(g)
    else:
        flat = flatten_groups(groups)
        for li in range(len(flat)):
            gp[str(li)] = {
                "weight": jnp.asarray(sd[f"{li}.0.weight"]),
                "bias": jnp.asarray(sd[f"{li}.0.bias"]),
            }
    return {"groups": gp}
