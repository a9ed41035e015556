"""Gate pytrees: sampling (train) and compiling (eval) HardConcrete masks.

The gate pytree parallels the layer structure::

    {
      "conv_layers": {"0": mask, ...},                       # channel gates
      "layers": {
        "0": {
          "attention":   {"heads": mask, "layer": mask},
          "feed_forward": {"intermediate": mask, "layer": mask},
        }, ...
      },
    }

Entries exist only where the spec enables pruning.  Sampling is one jittable
function of (params, key); eval masks are computed host-side with numpy
(data-dependent top-k, reference ``hardconcrete.py:101-114``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..configs import ModelSpec
from .components import RngStream
from .hardconcrete import eval_mask, sample_mask


def has_gates(spec: ModelSpec) -> bool:
    if any(c.prune_channels for c in spec.conv_layers):
        return True
    for l in spec.layers:
        if l.attention is not None and (l.attention.prune_heads or l.attention.prune_layer):
            return True
        if l.feed_forward is not None and (
            l.feed_forward.prune_intermediate or l.feed_forward.prune_layer
        ):
            return True
    return False


def sample_gates(spec: ModelSpec, params, key) -> Optional[dict]:
    """Sample every HardConcrete mask for one training step (jit-safe)."""
    if not has_gates(spec):
        return None
    rngs = RngStream(key)
    gates: dict = {}
    conv = {}
    for i, c in enumerate(spec.conv_layers):
        if c.prune_channels:
            la = params["feature_extractor"]["conv_layers"][str(i)]["hard_concrete"][
                "log_alpha"
            ]
            conv[str(i)] = sample_mask(la, rngs.next())
    if conv:
        gates["conv_layers"] = conv

    layers = {}
    for i, l in enumerate(spec.layers):
        lp = params["encoder"]["transformer"]["layers"][str(i)]
        lg: dict = {}
        if l.attention is not None:
            ag = {}
            if l.attention.prune_heads:
                ag["heads"] = sample_mask(
                    lp["attention"]["hard_concrete_for_heads"]["log_alpha"],
                    rngs.next(),
                )
            if l.attention.prune_layer:
                ag["layer"] = sample_mask(
                    lp["attention"]["hard_concrete_for_layer"]["log_alpha"],
                    rngs.next(),
                )
            if ag:
                lg["attention"] = ag
        if l.feed_forward is not None:
            fg = {}
            if l.feed_forward.prune_intermediate:
                fg["intermediate"] = sample_mask(
                    lp["feed_forward"]["hard_concrete_for_intermediate"]["log_alpha"],
                    rngs.next(),
                )
            if l.feed_forward.prune_layer:
                fg["layer"] = sample_mask(
                    lp["feed_forward"]["hard_concrete_for_layer"]["log_alpha"],
                    rngs.next(),
                )
            if fg:
                lg["feed_forward"] = fg
        if lg:
            layers[str(i)] = lg
    if layers:
        gates["layers"] = layers
    return gates or None


def compile_gates(spec: ModelSpec, params) -> Optional[dict]:
    """Deterministic eval-mode masks (host-side numpy top-k compile).

    Only the HardConcrete ``log_alpha`` leaves are materialized to host —
    on a remote-attached chip a blanket ``np.asarray`` over the whole
    94M-param student would gather ~380 MB through the link every call
    (the trainer calls this once per epoch for validation)."""
    if not has_gates(spec):
        return None

    class _Lazy:
        """Per-leaf host fetch: dict indexing stays device-side until a
        log_alpha leaf is pulled."""

        def __init__(self, node):
            self._node = node

        def __getitem__(self, k):
            child = self._node[k]
            if isinstance(child, dict):
                return _Lazy(child)
            return np.asarray(child)

    p = _Lazy(params)
    gates: dict = {}
    conv = {}
    for i, c in enumerate(spec.conv_layers):
        if c.prune_channels:
            la = p["feature_extractor"]["conv_layers"][str(i)]["hard_concrete"][
                "log_alpha"
            ]
            conv[str(i)] = eval_mask(la)
    if conv:
        gates["conv_layers"] = conv

    layers = {}
    for i, l in enumerate(spec.layers):
        lp = p["encoder"]["transformer"]["layers"][str(i)]
        lg: dict = {}
        if l.attention is not None:
            ag = {}
            if l.attention.prune_heads:
                ag["heads"] = eval_mask(
                    lp["attention"]["hard_concrete_for_heads"]["log_alpha"]
                )
            if l.attention.prune_layer:
                ag["layer"] = eval_mask(
                    lp["attention"]["hard_concrete_for_layer"]["log_alpha"]
                )
            if ag:
                lg["attention"] = ag
        if l.feed_forward is not None:
            fg = {}
            if l.feed_forward.prune_intermediate:
                fg["intermediate"] = eval_mask(
                    lp["feed_forward"]["hard_concrete_for_intermediate"]["log_alpha"]
                )
            if l.feed_forward.prune_layer:
                fg["layer"] = eval_mask(
                    lp["feed_forward"]["hard_concrete_for_layer"]["log_alpha"]
                )
            if fg:
                lg["feed_forward"] = fg
        if lg:
            layers[str(i)] = lg
    if layers:
        gates["layers"] = layers
    return gates or None
