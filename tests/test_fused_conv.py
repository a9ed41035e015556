"""Parity tests for the fused conv feature-extractor kernels (interpret
mode on CPU) against the XLA reference path in components.py.

The XLA path is itself golden-parity-tested against the torch reference
(test_forward_parity.py), so matching it to ~fp32 precision transitively
matches the reference (``/root/reference/wav2vec2/components.py:64-235``).
"""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dphubert_tpu.configs import ConvLayerSpec
from dphubert_tpu.models import components
from dphubert_tpu.ops.fused_conv import (
    fused_feature_extractor,
    supports_spec,
    use_fused_conv,
)


def _make_spec(norm_mode="group_norm", bias=False, c=128, n_layers=4):
    strides = [5, 2, 2, 2, 2, 2, 2][:n_layers]
    kernels = [10, 3, 3, 3, 3, 2, 2][:n_layers]
    layers = []
    for i in range(n_layers):
        if norm_mode == "group_norm":
            norm = "group_norm" if i == 0 else None
        else:
            norm = "layer_norm"
        layers.append(
            ConvLayerSpec(
                in_channels=1 if i == 0 else c,
                out_channels=c,
                kernel_size=kernels[i],
                stride=strides[i],
                bias=bias,
                norm=norm,
                prune_channels=True,
            )
        )
    return types.SimpleNamespace(conv_layers=tuple(layers))


def _make_params(spec, key, bias=False):
    params = {"conv_layers": {}}
    for i, c in enumerate(spec.conv_layers):
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
        lp = {
            "conv": {
                "weight": jax.random.normal(
                    k1, (c.out_channels, c.in_channels, c.kernel_size), jnp.float32
                )
                * (0.5 / np.sqrt(c.in_channels * c.kernel_size))
            }
        }
        if bias:
            lp["conv"]["bias"] = jax.random.normal(k2, (c.out_channels,)) * 0.1
        if c.norm is not None:
            lp["layer_norm"] = {
                "weight": 1.0 + 0.1 * jax.random.normal(k3, (c.out_channels,)),
                "bias": 0.1 * jax.random.normal(k4, (c.out_channels,)),
            }
        params["conv_layers"][str(i)] = lp
    params["dummy_weight"] = jnp.ones((spec.conv_layers[-1].out_channels,))
    return params


def _make_gates(spec, key):
    gates = {"conv_layers": {}}
    for i, c in enumerate(spec.conv_layers):
        key, k = jax.random.split(key)
        gates["conv_layers"][str(i)] = jax.random.uniform(k, (c.out_channels,))
    return gates


def _xla_path(params, spec, wave, gates):
    os.environ["DPHUBERT_FUSED_CONV"] = "0"
    try:
        x, _ = components.feature_extractor_forward(params, spec, wave, None, gates)
    finally:
        del os.environ["DPHUBERT_FUSED_CONV"]
    return x


def _fused_path(params, spec, wave, gates, f_tile=512):
    x = fused_feature_extractor(params, spec, wave, gates, f_tile=f_tile)
    return x * params["dummy_weight"].astype(x.dtype)


@pytest.mark.parametrize("norm_mode,bias", [("group_norm", False), ("layer_norm", True)])
@pytest.mark.parametrize("gated", [False, True])
def test_forward_parity(norm_mode, bias, gated):
    spec = _make_spec(norm_mode, bias=bias)
    key = jax.random.key(0)
    params = _make_params(spec, key, bias=bias)
    wave = jax.random.normal(jax.random.key(1), (2, 2003), jnp.float32)
    gates = _make_gates(spec, jax.random.key(2)) if gated else None

    ref = _xla_path(params, spec, wave, gates)
    out = _fused_path(params, spec, wave, gates)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_forward_parity_small_tiles():
    """Multi-tile grids exercise the halo block specs and clamped edges."""
    spec = _make_spec("group_norm")
    params = _make_params(spec, jax.random.key(0))
    wave = jax.random.normal(jax.random.key(1), (2, 2003), jnp.float32)
    gates = _make_gates(spec, jax.random.key(2))

    ref = _xla_path(params, spec, wave, gates)
    out = _fused_path(params, spec, wave, gates, f_tile=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("norm_mode,bias", [("group_norm", False), ("layer_norm", True)])
def test_gradient_parity(norm_mode, bias):
    """Full-tree gradient parity (weights, norm affines, gates, wave) —
    covers the custom VJPs including the GroupNorm-stats chain."""
    spec = _make_spec(norm_mode, bias=bias, n_layers=3)
    params = _make_params(spec, jax.random.key(0), bias=bias)
    wave = jax.random.normal(jax.random.key(1), (2, 1501), jnp.float32)
    gates = _make_gates(spec, jax.random.key(2))
    probe = jax.random.normal(jax.random.key(3), (1,))

    def loss(fn):
        def f(params, wave, gates):
            y = fn(params, spec, wave, gates)
            return jnp.sum(jnp.sin(y * 3.0) * probe[0])

        return f

    def xla_fn(params, spec, wave, gates):
        return _xla_path(params, spec, wave, gates)

    def fused_fn(params, spec, wave, gates):
        return _fused_path(params, spec, wave, gates, f_tile=24)

    g_ref = jax.grad(loss(xla_fn), argnums=(0, 1, 2))(params, wave, gates)
    g_out = jax.grad(loss(fused_fn), argnums=(0, 1, 2))(params, wave, gates)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_out = jax.tree.leaves(g_out)
    assert len(flat_ref) == len(flat_out)
    for (path, a), b in zip(flat_ref, flat_out):
        np.testing.assert_allclose(
            np.asarray(b),
            np.asarray(a),
            atol=5e-4,
            rtol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_supports_spec_gating():
    ok = _make_spec("group_norm")
    assert supports_spec(ok)
    irregular = _make_spec("group_norm", c=100)
    assert not supports_spec(irregular)
    os.environ["DPHUBERT_FUSED_CONV"] = "1"
    try:
        assert use_fused_conv(ok)
        assert not use_fused_conv(irregular)  # unsupported spec wins
    finally:
        del os.environ["DPHUBERT_FUSED_CONV"]


def test_model_integration_parity():
    """Through the real ModelSpec/extract_features path: hubert-base-shaped
    conv stack (512 ch) on a short wave, fused vs XLA."""
    from dphubert_tpu.models.model import wav2vec2_model

    cfg_small = dict(
        extractor_mode="group_norm",
        extractor_conv_layer_config=[(128, 10, 5), (128, 3, 2), (128, 2, 2)],
        extractor_conv_bias=False,
        encoder_embed_dim=64,
        encoder_projection_dropout=0.0,
        encoder_pos_conv_kernel=16,
        encoder_pos_conv_groups=4,
        encoder_num_layers=1,
        encoder_use_attention=[True],
        encoder_use_feed_forward=[True],
        encoder_num_heads=[2],
        encoder_head_dim=32,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_features=[128],
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_norm_first=False,
        encoder_layer_drop=0.0,
        aux_num_out=None,
        normalize_waveform=False,
        extractor_prune_conv_channels=False,
        encoder_prune_attention_heads=False,
        encoder_prune_attention_layer=False,
        encoder_prune_feed_forward_intermediate=False,
        encoder_prune_feed_forward_layer=False,
    )
    model = wav2vec2_model(**cfg_small)
    params = model.init(jax.random.key(0))
    wave = jax.random.normal(jax.random.key(1), (2, 1600), jnp.float32)
    lengths = jnp.array([1600, 1200])

    os.environ["DPHUBERT_FUSED_CONV"] = "0"
    try:
        ref, ref_len = model.extract_features(params, wave, lengths)
    finally:
        del os.environ["DPHUBERT_FUSED_CONV"]
    os.environ["DPHUBERT_FUSED_CONV"] = "1"
    try:
        out, out_len = model.extract_features(params, wave, lengths)
    finally:
        del os.environ["DPHUBERT_FUSED_CONV"]

    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(ref_len))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-5
        )
