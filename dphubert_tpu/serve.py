"""Batched inference front-end for compressed checkpoints.

The reference's downstream surface is "load the ckpt, call
``extract_features``" (``load_dpmodel.py``, README.md:92-101).  On TPU the
missing piece for production serving is shape discipline: this Predictor
pads each request up to a fixed ladder of lengths so any clip reuses one of
a handful of compiled programs, applies the proper padding masks, and
returns per-clip trimmed features.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.model import Wav2Vec2Model


def _ceil_to(x: int, m: int) -> int:
    return max(m, (x + m - 1) // m * m)


class Predictor:
    """Shape-bucketed, jit-cached feature extractor.

    >>> model, params = load_model("dphubert.pth")
    >>> p = Predictor(model, params)
    >>> feats = p.extract([wave1, wave2])     # list of (T_i,) float arrays
    """

    def __init__(
        self,
        model: Wav2Vec2Model,
        params,
        *,
        length_step: int = 32000,  # 2 s granularity => few compilations
        max_batch: int = 8,
        dtype=jnp.float32,
    ):
        self.model = model
        self.params = jax.tree.map(lambda x: jnp.asarray(x), params)
        self.length_step = length_step
        self.max_batch = max_batch
        self.dtype = dtype
        self._fns = {}

    def _fn(self, B: int, T: int):
        key = (B, T)
        if key not in self._fns:
            model = self.model

            @jax.jit
            def run(params, wave, lengths):
                outs, out_lens = model.extract_features(
                    params, wave.astype(self.dtype), lengths
                )
                return outs[-1], out_lens

            self._fns[key] = run
        return self._fns[key]

    def extract(
        self, waves: Sequence[np.ndarray]
    ) -> List[np.ndarray]:
        """Final-layer features for each clip, valid frames only."""
        results: List[Optional[np.ndarray]] = [None] * len(waves)
        order = sorted(range(len(waves)), key=lambda i: len(waves[i]))
        for start in range(0, len(order), self.max_batch):
            idx = order[start : start + self.max_batch]
            chunk = [np.asarray(waves[i], np.float32) for i in idx]
            T = _ceil_to(max(len(w) for w in chunk), self.length_step)
            B = len(chunk)
            batch = np.zeros((B, T), np.float32)
            lengths = np.zeros((B,), np.int32)
            for r, w in enumerate(chunk):
                batch[r, : len(w)] = w
                lengths[r] = len(w)
            out, out_lens = self._fn(B, T)(self.params, batch, lengths)
            out = np.asarray(out)
            out_lens = np.asarray(out_lens)
            for r, i in enumerate(idx):
                results[i] = out[r, : out_lens[r]]
        return results  # type: ignore[return-value]

    @property
    def compiled_shapes(self) -> Tuple[Tuple[int, int], ...]:
        return tuple(sorted(self._fns.keys()))
