"""Fully-sharded data parallelism (ZeRO-3 style) over the ``data`` axis.

The reference trains DDP-only: every rank holds a full replica of the
student, the frozen teacher, and the Adam moments
(``/root/reference/distill.py:37-51``).  On a TPU slice the idiomatic
equivalent of ZeRO-3 is a *sharding annotation*, not a runtime: store every
large parameter / optimizer-moment leaf split across the mesh's ``data``
axis and let XLA's SPMD partitioner insert the all-gathers at use sites and
reduce-scatters behind the parameter update.  Per-device memory for params
+ moments then scales as 1/n_data while the step stays a single jitted
function — no wrapper classes, no hooks, no bucketing schedule.

Layout rule (one rule for params, Adam moments, and the frozen teacher,
applied per-leaf by shape alone so optimizer pytrees need no matching):
shard the largest dimension divisible by ``n_data`` of every leaf with at
least ``min_size`` elements; replicate everything else (LN scales, biases,
gate vectors — gathering those costs more in collective latency than the
bytes saved).  Composes with the Megatron tensor-parallel layouts
(``sharding.py``): dims already taken by the ``model`` axis are skipped, so
a (data x model) mesh gets a genuinely 2-D hybrid layout (HSDP).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import ModelSpec

# Leaves below this element count replicate: an all-gather's latency floor
# outweighs sharding a few-KB vector, and tiny leaves (LN affines, biases,
# HardConcrete log_alpha) are read by bandwidth-trivial ops anyway.
MIN_SHARD_ELEMS = 2**14


def fsdp_spec(
    shape,
    n_data: int,
    *,
    base: Optional[P] = None,
    min_size: int = MIN_SHARD_ELEMS,
) -> P:
    """PartitionSpec adding ``data`` on the largest free divisible dim.

    ``base`` carries dims already assigned (e.g. ``model`` from the TP
    layouts); those dims are kept and skipped for the data axis.
    """
    ndim = len(shape)
    taken = list(base) + [None] * (ndim - len(base)) if base is not None else [None] * ndim
    if n_data <= 1 or int(np.prod(shape)) < min_size:
        return P(*taken) if any(t is not None for t in taken) else P()
    for d in sorted(range(ndim), key=lambda i: (-shape[i], i)):
        if taken[d] is None and shape[d] % n_data == 0:
            taken[d] = "data"
            return P(*taken)
    return P(*taken) if any(t is not None for t in taken) else P()


def fsdp_shardings(mesh: Mesh, tree, *, base=None, min_size: int = MIN_SHARD_ELEMS):
    """Pytree of NamedShardings parallel to ``tree``.

    ``base``: optional pytree of NamedShardings (same structure) whose
    PartitionSpecs are extended rather than replaced — pass the
    tensor-parallel layouts for a hybrid (data x model) placement.
    """
    n_data = mesh.shape.get("data", 1)

    def rule(leaf, base_sh=None):
        spec = fsdp_spec(
            np.shape(leaf),
            n_data,
            base=base_sh.spec if base_sh is not None else None,
            min_size=min_size,
        )
        return NamedSharding(mesh, spec)

    if base is None:
        return jax.tree.map(rule, tree)
    return jax.tree.map(rule, tree, base)


def place_fsdp(mesh: Mesh, tree, *, base=None, min_size: int = MIN_SHARD_ELEMS):
    """device_put every leaf with its FSDP layout."""
    sh = fsdp_shardings(mesh, tree, base=base, min_size=min_size)
    return jax.tree.map(jax.device_put, tree, sh)


def place_train_params_fsdp(
    student_spec: ModelSpec,
    mesh: Mesh,
    train_params,
    *,
    tensor_parallel: bool = False,
    min_size: int = MIN_SHARD_ELEMS,
):
    """Training pytree {"student", "projs"[, "lambdas"]} with FSDP layouts.

    With ``tensor_parallel`` the student's attention/FFN inner dims keep
    their ``model``-axis split (``sharding.py``) and the data axis lands on
    a remaining dim (HSDP).  Projections are sharded like any other leaf;
    the two Lagrangian scalars replicate.
    """
    out = dict(train_params)
    base = None
    if tensor_parallel and mesh.shape.get("model", 1) > 1:
        from .sharding import param_shardings

        base = param_shardings(student_spec, mesh, train_params["student"])
    out["student"] = place_fsdp(
        mesh, train_params["student"], base=base, min_size=min_size
    )
    if "projs" in out:
        out["projs"] = place_fsdp(mesh, train_params["projs"], min_size=min_size)
    if "lambdas" in out:
        repl = NamedSharding(mesh, P())
        out["lambdas"] = jax.tree.map(
            lambda x: jax.device_put(x, repl), train_params["lambdas"]
        )
    return out
