"""HardConcrete gate math + differentiable size accounting vs the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dphubert_tpu import unflatten_params, wav2vec2_model
from dphubert_tpu.models.hardconcrete import BETA, BIAS, eval_mask, l0_norm, sample_mask
from dphubert_tpu.params import tree_to_jax

from tests.test_forward_parity import _tiny_w2v2_config, _load_ref_into_ours


def test_l0_norm_matches_reference_formula(reference_module):
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import torch
        from wav2vec2.hardconcrete import HardConcrete
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)
    hc = HardConcrete(n_in=64, init_mean=0.1)
    la = hc.log_alpha.detach().numpy()
    ours = float(l0_norm(jnp.asarray(la)))
    theirs = float(hc.l0_norm())
    assert abs(ours - theirs) < 1e-4


def test_eval_mask_matches_reference(reference_module):
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        import torch
        from wav2vec2.hardconcrete import HardConcrete
    finally:
        sys.path.remove("/root/reference")

    for seed, init_mean in [(0, 0.5), (1, 0.01), (2, 0.9)]:
        torch.manual_seed(seed)
        hc = HardConcrete(n_in=100, init_mean=init_mean, init_std=2.0)
        hc.eval()
        theirs = hc().detach().numpy()
        ours = eval_mask(hc.log_alpha.detach().numpy())
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_sample_mask_statistics():
    """Sampled masks: support in [0,1], mean tracks the open probability."""
    la = jnp.full((4096,), 2.0)
    m = sample_mask(la, jax.random.key(0))
    assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0
    # P(gate > 0) = sigmoid(log_alpha + bias); fraction nonzero should match
    p_open = float(jax.nn.sigmoid(la[0] + BIAS))
    frac = float(jnp.mean(m > 0))
    assert abs(frac - p_open) < 0.05


def test_sample_mask_grad_flows():
    def f(la):
        return jnp.sum(sample_mask(la, jax.random.key(1)))

    g = jax.grad(f)(jnp.zeros((32,)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_model_size_matches_reference(reference_module):
    """Differentiable get_num_params vs the torch reference on a gated model."""
    import torch

    torch.manual_seed(3)
    cfg = _tiny_w2v2_config(
        extractor_prune_conv_channels=True,
        encoder_prune_attention_heads=True,
        encoder_prune_attention_layer=True,
        encoder_prune_feed_forward_intermediate=True,
        encoder_prune_feed_forward_layer=True,
    )
    ref = reference_module.wav2vec2_model(**cfg)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)

    theirs = float(ref.get_num_params())
    mine = float(ours.get_num_params(params))
    assert abs(mine - theirs) / theirs < 1e-5


def test_model_size_ungated_matches_reference(reference_module):
    import torch

    torch.manual_seed(4)
    cfg = _tiny_w2v2_config()
    ref = reference_module.wav2vec2_model(**cfg)
    ours = wav2vec2_model(**cfg)
    params = _load_ref_into_ours(ref)
    assert float(ours.get_num_params(params)) == float(ref.get_num_params())
