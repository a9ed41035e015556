"""Portable checkpoint interop.

The reference's public artifact contract (``README.md:92-101``,
``prune.py:62-74``) is a torch pickle holding::

    {"state_dict": {flat torch keys -> tensors},
     "config": <plain dict>,
     ["distill_linear_projs": {flat keys -> tensors}]}

We read and write that exact format (torch is an optional host-side
dependency — TPU training never touches it), plus a torch-free native
format (``.npz`` + JSON sidecar) with identical content so the framework is
self-contained.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np


def _torch():
    try:
        import torch

        return torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "torch is required for .pth checkpoint interop; use the native "
            ".npz format instead"
        ) from e


def load_checkpoint(path) -> dict:
    """Load a portable checkpoint (.pth torch pickle or native .npz)."""
    path = os.fspath(path)
    if path.endswith(".npz"):
        return load_native(path)
    torch = _torch()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {"config": ckpt["config"]}
    out["state_dict"] = {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in ckpt["state_dict"].items()
    }
    if "distill_linear_projs" in ckpt:
        out["distill_linear_projs"] = {
            k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt["distill_linear_projs"].items()
        }
    return out


def save_checkpoint(
    path,
    config: dict,
    state_dict: Dict[str, np.ndarray],
    distill_linear_projs: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Save in the reference's torch-pickle format (or native .npz)."""
    path = os.fspath(path)
    if path.endswith(".npz"):
        save_native(path, config, state_dict, distill_linear_projs)
        return
    torch = _torch()
    payload = {
        "state_dict": {
            k: torch.from_numpy(np.array(v, copy=True))
            for k, v in state_dict.items()
        },
        "config": config,
    }
    if distill_linear_projs is not None:
        payload["distill_linear_projs"] = {
            k: torch.from_numpy(np.array(v, copy=True))
            for k, v in distill_linear_projs.items()
        }
    torch.save(payload, path)


# --- native torch-free format ----------------------------------------------


def save_native(path, config, state_dict, distill_linear_projs=None) -> None:
    arrays = {f"state_dict/{k}": np.asarray(v) for k, v in state_dict.items()}
    if distill_linear_projs is not None:
        arrays.update(
            {f"distill_linear_projs/{k}": np.asarray(v) for k, v in distill_linear_projs.items()}
        )
    arrays["__config__"] = np.frombuffer(
        json.dumps(config).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_native(path) -> dict:
    data = np.load(path, allow_pickle=False)
    config = json.loads(bytes(data["__config__"]).decode("utf-8"))
    out = {"config": config, "state_dict": {}}
    for k in data.files:
        if k.startswith("state_dict/"):
            out["state_dict"][k[len("state_dict/"):]] = data[k]
        elif k.startswith("distill_linear_projs/"):
            out.setdefault("distill_linear_projs", {})[
                k[len("distill_linear_projs/"):]
            ] = data[k]
    return out


# --- model-level helpers ----------------------------------------------------


def load_model(path) -> Tuple["object", dict]:
    """Checkpoint -> (Wav2Vec2Model, params) — the reference's
    ``wav2vec2_model(**ckpt["config"]) + load_state_dict`` one-liner."""
    from ..models.model import wav2vec2_model
    from ..params import tree_to_jax, unflatten_params

    ckpt = load_checkpoint(path)
    model = wav2vec2_model(**ckpt["config"])
    params = tree_to_jax(unflatten_params(ckpt["state_dict"]))
    return model, params


def verify_strict(model, state_dict: Dict[str, np.ndarray]) -> None:
    """strict=True load check: expected key set must equal the given key set
    with matching shapes (reference ``prune.py:104-105``)."""
    import jax

    from ..params import flatten_params, init_params

    expect = flatten_params(init_params(model.spec, jax.random.key(0)))
    missing = set(expect) - set(state_dict)
    unexpected = set(state_dict) - set(expect)
    if missing or unexpected:
        raise ValueError(
            f"strict load failed: missing={sorted(missing)}, "
            f"unexpected={sorted(unexpected)}"
        )
    for k, v in expect.items():
        got = np.asarray(state_dict[k])
        if tuple(got.shape) != tuple(np.asarray(v).shape):
            raise ValueError(
                f"shape mismatch for {k}: ckpt {got.shape} vs model "
                f"{np.asarray(v).shape}"
            )
