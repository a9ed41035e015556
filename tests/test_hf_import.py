"""HuggingFace importer: key mapping + output parity vs transformers itself
(an oracle independent of the DPHuBERT reference)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _tiny_hubert():
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[8, 8, 8],
        conv_kernel=[10, 3, 3],
        conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    return HubertModel(cfg)


def _tiny_wavlm():
    from transformers import WavLMConfig, WavLMModel

    cfg = WavLMConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[8, 8, 8],
        conv_kernel=[10, 3, 3],
        conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        num_buckets=32,
        max_bucket_distance=80,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(1)
    return WavLMModel(cfg)


def test_hubert_import_parity():
    from dphubert_tpu.interop.hf import import_huggingface_model

    hf = _tiny_hubert().eval()
    model, params = import_huggingface_model(hf)

    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wave)).last_hidden_state.numpy()
    ours, _ = model.forward(params, wave)
    assert np.asarray(ours).shape == ref.shape
    err = float(np.max(np.abs(np.asarray(ours) - ref)))
    assert err < 1e-4, err


def test_wavlm_import_parity():
    from dphubert_tpu.interop.hf import import_huggingface_model

    hf = _tiny_wavlm().eval()
    model, params = import_huggingface_model(hf)
    assert model.spec.is_wavlm

    rng = np.random.default_rng(1)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wave)).last_hidden_state.numpy()
    ours, _ = model.forward(params, wave)
    err = float(np.max(np.abs(np.asarray(ours) - ref)))
    assert err < 1e-4, err


def test_import_into_reference_contract(reference_module):
    """The converted checkpoint must load into the reference torch model
    key-for-key (the interop contract the converters guarantee)."""
    from dphubert_tpu.interop.hf import import_huggingface_model
    from dphubert_tpu.params import flatten_params

    import jax

    hf = _tiny_hubert().eval()
    model, params = import_huggingface_model(hf)
    sd = flatten_params(jax.tree.map(np.asarray, params))
    ref = reference_module.wav2vec2_model(**model.config)
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=True
    )
    assert not res.missing_keys and not res.unexpected_keys
