"""Prune surgery parity: our host-side pytree surgery must reproduce the
reference's in-place module surgery — same pruned config, same pruned
weights, same eval-mode outputs."""

import copy

import jax
import numpy as np
import pytest

from dphubert_tpu import flatten_params, unflatten_params, wav2vec2_model
from dphubert_tpu.params import tree_to_jax

from tests.test_forward_parity import (
    _load_ref_into_ours,
    _tiny_w2v2_config,
    _tiny_wavlm_config,
)

PRUNE_FLAGS = dict(
    extractor_prune_conv_channels=True,
    encoder_prune_attention_heads=True,
    encoder_prune_attention_layer=True,
    encoder_prune_feed_forward_intermediate=True,
    encoder_prune_feed_forward_layer=True,
)


def _randomize_gates(ref_model, seed, closed_frac=0.4):
    """Spread log_alphas so a sizeable fraction of gates compile to zero."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for name, p in ref_model.named_parameters():
        if "log_alpha" in name:
            with torch.no_grad():
                p.copy_(torch.randn(p.shape, generator=g) * 4.0 + 1.0)


def _run_surgery_pair(reference_module, cfg, seed):
    import torch

    torch.manual_seed(seed)
    ref = reference_module.wav2vec2_model(**cfg)
    _randomize_gates(ref, seed)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    # --- reference surgery ---
    (
        conv_config,
        use_attention,
        use_feed_forward,
        num_heads,
        remaining_heads,
        ff_interm_features,
    ) = ref.prune()
    ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # --- our surgery ---
    new_model, new_params = ours.prune(params)
    our_sd = flatten_params(new_params)
    our_cfg = new_model.config

    assert [list(c) for c in conv_config] == our_cfg["extractor_conv_layer_config"]
    assert list(use_attention) == our_cfg["encoder_use_attention"]
    assert list(use_feed_forward) == our_cfg["encoder_use_feed_forward"]
    assert list(ff_interm_features) == our_cfg["encoder_ff_interm_features"]
    if num_heads:
        assert list(num_heads) == our_cfg["encoder_num_heads"]
    if remaining_heads:
        assert [list(h) for h in remaining_heads] == our_cfg["encoder_remaining_heads"]

    assert set(ref_sd.keys()) == set(our_sd.keys()), (
        f"missing={set(ref_sd) - set(our_sd)}, extra={set(our_sd) - set(ref_sd)}"
    )
    for k in ref_sd:
        np.testing.assert_allclose(
            np.asarray(our_sd[k]), ref_sd[k], atol=1e-5, err_msg=k
        )
    return ref, new_model, new_params


def test_surgery_parity_w2v2(reference_module):
    cfg = _tiny_w2v2_config(**PRUNE_FLAGS)
    ref, new_model, new_params = _run_surgery_pair(reference_module, cfg, seed=10)

    # pruned model forward parity
    import torch

    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    ref.eval()
    with torch.no_grad():
        ref_outs, _ = ref.extract_features(torch.from_numpy(wave), None)
    our_outs, _ = new_model.extract_features(new_params, wave)
    for i, (r, o) in enumerate(zip(ref_outs, our_outs)):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy(), atol=1e-4, err_msg=f"layer {i}"
        )


def test_surgery_parity_wavlm(reference_module):
    cfg = _tiny_wavlm_config(**PRUNE_FLAGS)
    ref, new_model, new_params = _run_surgery_pair(reference_module, cfg, seed=11)

    import torch

    rng = np.random.default_rng(1)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    # The reference model object cannot run forward after in-place prune
    # (stale num_heads attribute); their pipeline reloads from the emitted
    # config (prune.py:70-74) — do the same here.
    ref_sd = ref.state_dict()
    ref = reference_module.wav2vec2_model(**new_model.config)
    ref.load_state_dict(ref_sd, strict=True)
    ref.eval()
    with torch.no_grad():
        ref_outs, _ = ref.extract_features(torch.from_numpy(wave), None)
    our_outs, _ = new_model.extract_features(new_params, wave)
    for i, (r, o) in enumerate(zip(ref_outs, our_outs)):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy(), atol=1e-4, err_msg=f"layer {i}"
        )


def test_surgery_output_matches_gated_eval(reference_module):
    """The pruned dense model must reproduce the gated model's eval-mode
    outputs (mask folding correctness).

    Note: conv-channel pruning is excluded — removing channels changes the
    feature-projection LayerNorm statistics (masked-to-zero channels no
    longer participate), so exact output preservation only holds for
    head/intermediate/layer pruning.  The reference behaves identically; its
    own check is strict reload, not output equality (prune.py:104-105)."""
    import torch

    cfg = _tiny_w2v2_config(**{**PRUNE_FLAGS, "extractor_prune_conv_channels": False})
    torch.manual_seed(12)
    ref = reference_module.wav2vec2_model(**cfg)
    _randomize_gates(ref, 12)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    rng = np.random.default_rng(2)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)

    # gated eval-mode forward (compiled masks)
    gates = ours.compile_gates(params)
    gated_outs, _ = ours.extract_features(params, wave, gates=gates)

    new_model, new_params = ours.prune(params)
    pruned_outs, _ = new_model.extract_features(new_params, wave)

    np.testing.assert_allclose(
        np.asarray(pruned_outs[-1]), np.asarray(gated_outs[-1]), atol=1e-4
    )


def test_surgery_roundtrip_strict_reload(reference_module):
    """The emitted config must rebuild a model whose expected key set matches
    the surgered params exactly (the reference's strict=True reload check,
    prune.py:104-105)."""
    cfg = _tiny_w2v2_config(**PRUNE_FLAGS)
    import torch

    torch.manual_seed(13)
    ref = reference_module.wav2vec2_model(**cfg)
    _randomize_gates(ref, 13)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    new_model, new_params = ours.prune(params)
    rebuilt = wav2vec2_model(**new_model.config)
    expect = flatten_params(rebuilt.init(jax.random.key(0)))
    got = flatten_params(new_params)
    assert set(expect.keys()) == set(got.keys())
    for k in expect:
        assert expect[k].shape == np.asarray(got[k]).shape, k


def test_compile_gates_lazy_matches_eager():
    """compile_gates only materializes log_alpha leaves to host (lazy per-leaf
    fetch, gates.py:100-123); the result must be identical whether the params
    pytree holds device jax.Arrays or host numpy arrays."""
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from dphubert_tpu.models.gates import compile_gates, has_gates

    cfg = _tiny_w2v2_config(**PRUNE_FLAGS)
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(7))
    assert has_gates(model.spec)

    dev = jax.tree.map(jnp.asarray, params)
    host = jax.tree.map(np.asarray, params)
    g_dev = compile_gates(model.spec, dev)
    g_host = compile_gates(model.spec, host)

    ld, lh = jtu.tree_leaves(g_dev), jtu.tree_leaves(g_host)
    assert len(ld) == len(lh) > 0
    for a, b in zip(ld, lh):
        assert isinstance(a, np.ndarray)  # host-side numpy compile
        np.testing.assert_array_equal(a, b)
