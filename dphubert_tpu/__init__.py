"""dphubert_tpu — TPU-native joint distillation + structured pruning for
speech SSL models (HuBERT / wav2vec 2.0 / WavLM).

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
DPHuBERT (reference mounted at /root/reference): task-agnostic compression of
speech SSL teachers into small students via HardConcrete L0 gates, Lagrangian
sparsity control, layerwise distillation, and post-hoc mask surgery, producing
portable ``{"config", "state_dict"}`` checkpoints that reload with a single
``wav2vec2_model(**config)`` call.
"""

__version__ = "0.1.0"

from .configs import ModelSpec, spec_from_config, config_from_spec
from .models import (
    Wav2Vec2Model,
    wav2vec2_model,
    wavlm_model,
    wav2vec2_base,
    wav2vec2_large,
    wav2vec2_large_lv60k,
    hubert_base,
    hubert_large,
    hubert_xlarge,
    wavlm_base,
    wavlm_large,
)
from .params import flatten_params, unflatten_params, init_params

__all__ = [
    "ModelSpec",
    "spec_from_config",
    "config_from_spec",
    "Wav2Vec2Model",
    "wav2vec2_model",
    "wavlm_model",
    "wav2vec2_base",
    "wav2vec2_large",
    "wav2vec2_large_lv60k",
    "hubert_base",
    "hubert_large",
    "hubert_xlarge",
    "wavlm_base",
    "wavlm_large",
    "flatten_params",
    "unflatten_params",
    "init_params",
]
