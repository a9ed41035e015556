"""Tensor-parallel parameter layouts.

The reference never shards parameters (DP-only DDP); here the mesh carries a
``model`` axis and this module produces per-leaf ``NamedSharding``s that
split the transformer's inner dimensions across it:

  * q/k/v projections: output rows (heads x head_dim) over ``model`` —
    attention heads compute independently per shard;
  * out_proj: input columns over ``model`` — the contraction over the
    sharded inner dim makes XLA insert the psum (the classic Megatron
    row/column split);
  * FFN intermediate: same pattern (intermediate_dense rows,
    output_dense columns).

Everything else (embeddings, norms, convs, gates, biases of the *output*
projections) is replicated.  With params annotated this way, the ordinary
jitted train step runs 2-D (data x model) SPMD with XLA-inserted
collectives — no call-site changes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import ModelSpec


def _repl(mesh):
    return NamedSharding(mesh, P())


def param_shardings(spec: ModelSpec, mesh: Mesh, params) -> dict:
    """Pytree of NamedShardings parallel to ``params``.

    Leaves in attention/FFN inner dims are split over ``model`` when
    divisible; anything else (or non-divisible) replicates.
    """
    n_model = mesh.shape.get("model", 1)

    def shard_if(leaf_shape, axis):
        if n_model > 1 and leaf_shape[axis] % n_model == 0:
            spec_dims = [None] * len(leaf_shape)
            spec_dims[axis] = "model"
            return NamedSharding(mesh, P(*spec_dims))
        return _repl(mesh)

    def walk(tree, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
                continue
            sh = _repl(mesh)
            if len(path) >= 2 and path[-1] in ("q_proj", "k_proj", "v_proj"):
                sh = shard_if(v.shape, 0)  # weight (inner, E) / bias (inner,)
            elif len(path) >= 2 and path[-1] == "out_proj" and k == "weight":
                sh = shard_if(v.shape, 1)  # (E, inner): columns
            elif path and path[-1] == "intermediate_dense":
                sh = shard_if(v.shape, 0)  # weight (I, E) / bias (I,)
            elif path and path[-1] == "output_dense" and k == "weight":
                sh = shard_if(v.shape, 1)  # (E, I): columns
            out[k] = sh
        return out

    return walk(params)


def place_params(spec: ModelSpec, mesh: Mesh, params):
    """device_put the param pytree with tensor-parallel layouts."""
    sh = param_shardings(spec, mesh, params)
    return jax.tree.map(jax.device_put, params, sh)


def place_train_params(student_spec: ModelSpec, mesh: Mesh, train_params):
    """Training pytree {"student", "projs"[, "lambdas"]}: student gets TP
    layouts; projections/lambdas replicate."""
    out = dict(train_params)
    out["student"] = place_params(student_spec, mesh, train_params["student"])
    repl = _repl(mesh)
    for key in ("projs", "lambdas"):
        if key in train_params:
            out[key] = jax.tree.map(
                lambda x: jax.device_put(x, repl), train_params[key]
            )
    return out
