"""Numerical parity of the forward pass vs the torch reference oracle.

Strategy: build the reference model with random torch init, export its
state_dict, load it into our param pytree (pure unflatten — no renaming),
and compare per-layer ``extract_features`` outputs in fp32 on CPU.
Tolerance 1e-4 absolute (the BASELINE.md north-star bound); typically ~1e-6.
"""

import jax
import numpy as np
import pytest

from dphubert_tpu import unflatten_params, wav2vec2_model
from dphubert_tpu.params import tree_to_jax


def _tiny_w2v2_config(layer_norm_first=False, extractor_mode="group_norm", **over):
    cfg = dict(
        extractor_mode=extractor_mode,
        extractor_conv_layer_config=[[32, 10, 5], [32, 3, 2], [32, 2, 2]],
        extractor_conv_bias=extractor_mode == "layer_norm",
        encoder_embed_dim=64,
        encoder_projection_dropout=0.0,
        encoder_pos_conv_kernel=16,
        encoder_pos_conv_groups=4,
        encoder_num_layers=3,
        encoder_use_attention=[True] * 3,
        encoder_use_feed_forward=[True] * 3,
        encoder_num_heads=[4] * 3,
        encoder_head_dim=16,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_features=[128] * 3,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_norm_first=layer_norm_first,
        encoder_layer_drop=0.0,
        aux_num_out=None,
        normalize_waveform=extractor_mode == "layer_norm",
    )
    cfg.update(over)
    return cfg


def _tiny_wavlm_config(**over):
    cfg = _tiny_w2v2_config()
    del cfg["encoder_num_heads"], cfg["encoder_head_dim"]
    cfg.update(
        encoder_total_num_heads=[4] * 3,
        encoder_remaining_heads=[list(range(4)) for _ in range(3)],
        encoder_num_buckets=32,
        encoder_max_distance=80,
    )
    cfg.update(over)
    return cfg


def _load_ref_into_ours(ref_model):
    sd = {k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()}
    return tree_to_jax(unflatten_params(sd))


def _compare(ref_model, our_model, params, wave, lengths, atol=1e-4):
    import torch

    ref_model.eval()
    with torch.no_grad():
        ref_outs, ref_lens = ref_model.extract_features(
            torch.from_numpy(wave),
            None if lengths is None else torch.from_numpy(lengths),
        )
    our_outs, our_lens = our_model.extract_features(
        params, wave, None if lengths is None else lengths
    )
    assert len(ref_outs) == len(our_outs)
    if lengths is not None:
        np.testing.assert_array_equal(
            np.asarray(our_lens), ref_lens.numpy().astype(np.int64)
        )
    for i, (r, o) in enumerate(zip(ref_outs, our_outs)):
        r = r.numpy()
        o = np.asarray(o)
        assert r.shape == o.shape, f"layer {i}: {r.shape} vs {o.shape}"
        err = np.max(np.abs(r - o))
        assert err < atol, f"layer {i}: max abs err {err}"


@pytest.mark.parametrize("layer_norm_first", [False, True])
def test_w2v2_forward_parity(reference_module, layer_norm_first):
    import torch

    torch.manual_seed(0)
    cfg = _tiny_w2v2_config(layer_norm_first=layer_norm_first)
    ref = reference_module.wav2vec2_model(**cfg)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 3200), dtype=np.float32)
    _compare(ref, ours, params, wave, None)


def test_w2v2_forward_parity_with_lengths(reference_module):
    """Padded batch: lengths drive the additive attention mask path."""
    import torch

    torch.manual_seed(1)
    cfg = _tiny_w2v2_config()
    ref = reference_module.wav2vec2_model(**cfg)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    rng = np.random.default_rng(1)
    wave = rng.standard_normal((3, 4000), dtype=np.float32)
    lengths = np.array([4000, 3000, 2600], dtype=np.int64)
    for b, l in enumerate(lengths):
        wave[b, l:] = 0.0
    _compare(ref, ours, params, wave, lengths)


def test_layer_norm_extractor_normalize_waveform(reference_module):
    """Large-family path: layer_norm extractor + per-utterance waveform LN."""
    import torch

    torch.manual_seed(2)
    cfg = _tiny_w2v2_config(layer_norm_first=True, extractor_mode="layer_norm")
    ref = reference_module.wav2vec2_model(**cfg)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    rng = np.random.default_rng(2)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    lengths = np.array([4000, 3310], dtype=np.int64)
    for b, l in enumerate(lengths):
        wave[b, l:] = 0.0
    _compare(ref, ours, params, wave, lengths)


def test_wavlm_forward_parity(reference_module):
    """WavLM: bucketed relative position bias + GRU gating path."""
    import torch

    torch.manual_seed(3)
    cfg = _tiny_wavlm_config()
    ref = reference_module.wav2vec2_model(**cfg)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    rng = np.random.default_rng(3)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    _compare(ref, ours, params, wave, None)


def test_wavlm_forward_parity_pruned_heads(reference_module):
    """Irregular remaining_heads per layer (post-pruning WavLM shape)."""
    import torch

    torch.manual_seed(4)
    cfg = _tiny_wavlm_config(
        encoder_remaining_heads=[[0, 2], [1, 2, 3], [0, 1, 2, 3]],
    )
    ref = reference_module.wav2vec2_model(**cfg)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    rng = np.random.default_rng(4)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    _compare(ref, ours, params, wave, None)


def test_pruned_irregular_architecture(reference_module):
    """Heterogeneous per-layer config with whole sublayers missing — the
    post-surgery student shape (use_attention/use_feed_forward False)."""
    import torch

    torch.manual_seed(5)
    cfg = _tiny_w2v2_config(
        encoder_use_attention=[True, False, True],
        encoder_use_feed_forward=[True, True, False],
        encoder_num_heads=[3, 0, 2],
        encoder_ff_interm_features=[96, 48, 0],
    )
    ref = reference_module.wav2vec2_model(**cfg)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    rng = np.random.default_rng(5)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    _compare(ref, ours, params, wave, None)


def test_hubert_base_fullsize_parity(reference_module):
    """Full-size HuBERT Base on a short clip (the flagship config)."""
    import torch

    from tests.test_params import HUBERT_BASE_CONFIG

    torch.manual_seed(6)
    ref = reference_module.wav2vec2_model(**HUBERT_BASE_CONFIG)
    ours = wav2vec2_model(**HUBERT_BASE_CONFIG)
    params = _load_ref_into_ours(ref)

    rng = np.random.default_rng(6)
    wave = (0.1 * rng.standard_normal((1, 16000))).astype(np.float32)
    _compare(ref, ours, params, wave, None)
