"""Top-level model API: factories and the :class:`Wav2Vec2Model` wrapper.

Mirrors the reference public surface (``/root/reference/wav2vec2/model.py``):
``wav2vec2_model(**config)`` accepts the portable config dict verbatim and
dispatches to the WavLM variant when ``encoder_remaining_heads`` is present
(``model.py:172-178``); named presets build the published architectures.

The returned :class:`Wav2Vec2Model` is a thin immutable wrapper around a
static :class:`~dphubert_tpu.configs.ModelSpec` — all state lives in the
parameter pytree the caller owns, so model methods are pure and jit-safe.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax

from ..configs import ModelSpec, config_from_spec, spec_from_config
from ..params import init_params
from . import components
from .components import RngStream
from .gates import compile_gates, has_gates, sample_gates
from .size import model_size


class Wav2Vec2Model:
    """Stateless model handle.

    Methods take the parameter pytree explicitly.  ``spec`` is hashable and
    may be closed over as a static value in ``jax.jit``.
    """

    def __init__(self, spec: ModelSpec, config_override: Optional[dict] = None):
        self.spec = spec
        # surgery emits configs that retain info a spec cannot represent
        # (e.g. the recorded FFN width of a dead layer, reference
        # prune.py:47-59) — keep the exact dict for checkpoint fidelity
        self._config_override = config_override

    # -- construction -------------------------------------------------------

    def init(self, key) -> dict:
        return init_params(self.spec, key)

    @property
    def config(self) -> dict:
        if self._config_override is not None:
            return dict(self._config_override)
        return config_from_spec(self.spec, prune_flags=True)

    # -- inference ----------------------------------------------------------

    def extract_features(
        self,
        params,
        waveforms,
        lengths=None,
        num_layers: Optional[int] = None,
        *,
        gates=None,
        training: bool = False,
        rng=None,
        remat: bool = False,
        scan_layers: bool = False,
    ) -> Tuple[List[jax.Array], Optional[jax.Array]]:
        """List of per-layer hidden states (index 0 = projected CNN features)
        plus valid output lengths (reference ``model.py:57-107``)."""
        spec = self.spec
        rngs = RngStream(rng) if rng is not None else None
        if gates is None and training and has_gates(spec):
            raise ValueError(
                "spec has HardConcrete gates; pass gates= (see sample_gates)"
            )
        if spec.normalize_waveform:
            waveforms = components.normalize_waveform(waveforms, lengths)
        x, lengths = components.feature_extractor_forward(
            params["feature_extractor"], spec, waveforms, lengths, gates
        )
        xs = components.encoder_extract_features(
            params["encoder"], spec, x, lengths, gates, training, rngs,
            num_layers, remat=remat, scan_layers=scan_layers,
        )
        return xs, lengths

    def forward(
        self,
        params,
        waveforms,
        lengths=None,
        *,
        gates=None,
        training: bool = False,
        rng=None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Final encoder output (+aux head if configured)
        (reference ``model.py:127-169``)."""
        spec = self.spec
        rngs = RngStream(rng) if rng is not None else None
        if spec.normalize_waveform:
            waveforms = components.normalize_waveform(waveforms, lengths)
        x, lengths = components.feature_extractor_forward(
            params["feature_extractor"], spec, waveforms, lengths, gates
        )
        x = components.encoder_forward(
            params["encoder"], spec, x, lengths, gates, training, rngs
        )
        if self.spec.aux_num_out is not None and "aux" in params:
            x = components._linear(params["aux"], x, dtype=x.dtype)
        return x, lengths

    __call__ = forward

    # -- pruning ------------------------------------------------------------

    def get_num_params(self, params):
        """Differentiable current size (reference ``model.py:109-113``)."""
        return model_size(params, self.spec)

    def sample_gates(self, params, key):
        return sample_gates(self.spec, params, key)

    def compile_gates(self, params):
        return compile_gates(self.spec, params)

    def prune(self, params):
        """Host-side mask surgery -> (new_model, new_params).

        See :mod:`dphubert_tpu.prune.surgery` for the algorithm (mirrors
        reference ``model.py:115-125``)."""
        from ..prune.surgery import prune_model

        return prune_model(self.spec, params)


# ---------------------------------------------------------------------------
# Factories
# ---------------------------------------------------------------------------


def wav2vec2_model(**configs) -> Wav2Vec2Model:
    """Build a model from a portable config dict (wav2vec2/HuBERT or WavLM —
    dispatch on the ``encoder_remaining_heads`` key, reference
    ``model.py:172-178``)."""
    return Wav2Vec2Model(spec_from_config(**configs))


# API-parity alias (reference model.py:181: the explicit-signature builder)
def wav2vec2_model_original(**configs) -> Wav2Vec2Model:
    if "encoder_remaining_heads" in configs:
        raise ValueError("WavLM configs must go through wavlm_model")
    return Wav2Vec2Model(spec_from_config(**configs))


def wavlm_model(**configs) -> Wav2Vec2Model:
    if "encoder_remaining_heads" not in configs:
        # named presets pass uniform head counts; expand to index lists
        n = configs["encoder_num_layers"]
        heads = configs.pop("encoder_num_heads")
        configs["encoder_total_num_heads"] = [heads] * n
        configs["encoder_remaining_heads"] = [list(range(heads)) for _ in range(n)]
    return Wav2Vec2Model(spec_from_config(**configs))


def _base_like(
    *,
    extractor_mode: str,
    embed_dim: int,
    num_layers: int,
    num_heads: int,
    ff_interm: int,
    layer_norm_first: bool,
    conv_bias: bool = False,
    normalize_waveform: bool = False,
    encoder_projection_dropout: float = 0.1,
    encoder_attention_dropout: float = 0.1,
    encoder_ff_interm_dropout: float = 0.1,
    encoder_dropout: float = 0.1,
    encoder_layer_drop: float = 0.1,
    aux_num_out: Optional[int] = None,
    **prune_flags,
) -> Wav2Vec2Model:
    return wav2vec2_model(
        extractor_mode=extractor_mode,
        extractor_conv_layer_config=None,
        extractor_conv_bias=conv_bias,
        encoder_embed_dim=embed_dim,
        encoder_projection_dropout=encoder_projection_dropout,
        encoder_pos_conv_kernel=128,
        encoder_pos_conv_groups=16,
        encoder_num_layers=num_layers,
        encoder_use_attention=[True] * num_layers,
        encoder_use_feed_forward=[True] * num_layers,
        encoder_num_heads=[num_heads] * num_layers,
        encoder_head_dim=embed_dim // num_heads,
        encoder_attention_dropout=encoder_attention_dropout,
        encoder_ff_interm_features=[ff_interm] * num_layers,
        encoder_ff_interm_dropout=encoder_ff_interm_dropout,
        encoder_dropout=encoder_dropout,
        encoder_layer_norm_first=layer_norm_first,
        encoder_layer_drop=encoder_layer_drop,
        aux_num_out=aux_num_out,
        normalize_waveform=normalize_waveform,
        **prune_flags,
    )


def wav2vec2_base(**kw) -> Wav2Vec2Model:
    """wav2vec 2.0 Base (reference ``model.py:364``)."""
    return _base_like(
        extractor_mode="group_norm",
        embed_dim=768,
        num_layers=12,
        num_heads=12,
        ff_interm=3072,
        layer_norm_first=False,
        **kw,
    )


def wav2vec2_large(**kw) -> Wav2Vec2Model:
    return _base_like(
        extractor_mode="group_norm",
        embed_dim=1024,
        num_layers=24,
        num_heads=16,
        ff_interm=4096,
        layer_norm_first=False,
        **kw,
    )


def wav2vec2_large_lv60k(**kw) -> Wav2Vec2Model:
    return _base_like(
        extractor_mode="layer_norm",
        conv_bias=True,
        embed_dim=1024,
        num_layers=24,
        num_heads=16,
        ff_interm=4096,
        layer_norm_first=True,
        normalize_waveform=True,
        **kw,
    )


def hubert_base(**kw) -> Wav2Vec2Model:
    """HuBERT Base — the flagship teacher (reference ``model.py:586``)."""
    kw.setdefault("encoder_ff_interm_dropout", 0.0)
    kw.setdefault("encoder_layer_drop", 0.05)
    return _base_like(
        extractor_mode="group_norm",
        embed_dim=768,
        num_layers=12,
        num_heads=12,
        ff_interm=3072,
        layer_norm_first=False,
        **kw,
    )


def hubert_large(**kw) -> Wav2Vec2Model:
    for k, d in dict(
        encoder_projection_dropout=0.0,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_drop=0.0,
    ).items():
        kw.setdefault(k, d)
    return _base_like(
        extractor_mode="layer_norm",
        embed_dim=1024,
        num_layers=24,
        num_heads=16,
        ff_interm=4096,
        layer_norm_first=True,
        normalize_waveform=True,
        **kw,
    )


def hubert_xlarge(**kw) -> Wav2Vec2Model:
    for k, d in dict(
        encoder_projection_dropout=0.0,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_drop=0.0,
    ).items():
        kw.setdefault(k, d)
    return _base_like(
        extractor_mode="layer_norm",
        embed_dim=1280,
        num_layers=48,
        num_heads=16,
        ff_interm=5120,
        layer_norm_first=True,
        normalize_waveform=True,
        **kw,
    )


def wavlm_base(aux_num_out: Optional[int] = None, **kw) -> Wav2Vec2Model:
    n = 12
    return wavlm_model(
        extractor_mode="group_norm",
        extractor_conv_layer_config=None,
        extractor_conv_bias=False,
        encoder_embed_dim=768,
        encoder_projection_dropout=kw.get("encoder_projection_dropout", 0.1),
        encoder_pos_conv_kernel=128,
        encoder_pos_conv_groups=16,
        encoder_num_layers=n,
        encoder_use_attention=[True] * n,
        encoder_use_feed_forward=[True] * n,
        encoder_num_heads=12,
        encoder_num_buckets=320,
        encoder_max_distance=800,
        encoder_attention_dropout=kw.get("encoder_attention_dropout", 0.1),
        encoder_ff_interm_features=[3072] * n,
        encoder_ff_interm_dropout=kw.get("encoder_ff_interm_dropout", 0.1),
        encoder_dropout=kw.get("encoder_dropout", 0.1),
        encoder_layer_norm_first=False,
        encoder_layer_drop=kw.get("encoder_layer_drop", 0.1),
        aux_num_out=aux_num_out,
        normalize_waveform=False,
    )


def wavlm_large(aux_num_out: Optional[int] = None, **kw) -> Wav2Vec2Model:
    n = 24
    return wavlm_model(
        extractor_mode="layer_norm",
        extractor_conv_layer_config=None,
        extractor_conv_bias=False,
        encoder_embed_dim=1024,
        encoder_projection_dropout=kw.get("encoder_projection_dropout", 0.1),
        encoder_pos_conv_kernel=128,
        encoder_pos_conv_groups=16,
        encoder_num_layers=n,
        encoder_use_attention=[True] * n,
        encoder_use_feed_forward=[True] * n,
        encoder_num_heads=16,
        encoder_num_buckets=320,
        encoder_max_distance=800,
        encoder_attention_dropout=kw.get("encoder_attention_dropout", 0.1),
        encoder_ff_interm_features=[4096] * n,
        encoder_ff_interm_dropout=kw.get("encoder_ff_interm_dropout", 0.0),
        encoder_dropout=kw.get("encoder_dropout", 0.1),
        encoder_layer_norm_first=True,
        encoder_layer_drop=kw.get("encoder_layer_drop", 0.1),
        aux_num_out=aux_num_out,
        normalize_waveform=True,
    )
