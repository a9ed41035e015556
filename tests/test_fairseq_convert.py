"""fairseq-layout state-dict conversion (synthetic fairseq dict — fairseq
itself is not a dependency)."""

import numpy as np
import pytest

from dphubert_tpu.interop.hf import rename_fairseq_state_dict


def test_fairseq_rename_map():
    sd = {
        "feature_extractor.conv_layers.0.0.weight": np.zeros((512, 1, 10)),
        "feature_extractor.conv_layers.0.2.1.weight": np.zeros((512,)),
        "feature_extractor.conv_layers.1.0.weight": np.zeros((512, 512, 3)),
        "post_extract_proj.weight": np.zeros((768, 512)),
        "post_extract_proj.bias": np.zeros((768,)),
        "layer_norm.weight": np.zeros((512,)),
        "layer_norm.bias": np.zeros((512,)),
        "encoder.pos_conv.0.bias": np.zeros((768,)),
        "encoder.pos_conv.0.weight_g": np.zeros((1, 1, 128)),
        "encoder.pos_conv.0.weight_v": np.zeros((768, 48, 128)),
        "encoder.layer_norm.weight": np.zeros((768,)),
        "encoder.layers.0.self_attn.k_proj.weight": np.zeros((768, 768)),
        "encoder.layers.0.self_attn.out_proj.bias": np.zeros((768,)),
        "encoder.layers.0.self_attn_layer_norm.weight": np.zeros((768,)),
        "encoder.layers.0.fc1.weight": np.zeros((3072, 768)),
        "encoder.layers.0.fc2.weight": np.zeros((768, 3072)),
        "encoder.layers.0.final_layer_norm.weight": np.zeros((768,)),
        # pretraining-only tensors must be dropped
        "quantizer.vars": np.zeros((1,)),
        "project_q.weight": np.zeros((256, 256)),
        "final_proj.weight": np.zeros((256, 768)),
        "mask_emb": np.zeros((768,)),
        "label_embs_concat": np.zeros((504, 256)),
    }
    out = rename_fairseq_state_dict(sd)
    expect = {
        "feature_extractor.conv_layers.0.conv.weight",
        "feature_extractor.conv_layers.0.layer_norm.weight",
        "feature_extractor.conv_layers.1.conv.weight",
        "encoder.feature_projection.projection.weight",
        "encoder.feature_projection.projection.bias",
        "encoder.feature_projection.layer_norm.weight",
        "encoder.feature_projection.layer_norm.bias",
        "encoder.transformer.pos_conv_embed.conv.bias",
        "encoder.transformer.pos_conv_embed.conv.weight_g",
        "encoder.transformer.pos_conv_embed.conv.weight_v",
        "encoder.transformer.layer_norm.weight",
        "encoder.transformer.layers.0.attention.k_proj.weight",
        "encoder.transformer.layers.0.attention.out_proj.bias",
        "encoder.transformer.layers.0.layer_norm.weight",
        "encoder.transformer.layers.0.feed_forward.intermediate_dense.weight",
        "encoder.transformer.layers.0.feed_forward.output_dense.weight",
        "encoder.transformer.layers.0.final_layer_norm.weight",
    }
    assert set(out.keys()) == expect


def test_grad_multiply():
    import jax
    import jax.numpy as jnp

    from dphubert_tpu.utils.grad import grad_multiply

    x = jnp.ones((4,))
    np.testing.assert_array_equal(np.asarray(grad_multiply(x, 0.3)), np.ones(4))
    g = jax.grad(lambda x: jnp.sum(grad_multiply(x, 0.3)))(x)
    np.testing.assert_allclose(np.asarray(g), 0.3 * np.ones(4))
