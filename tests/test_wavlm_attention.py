"""Parity tests for the fused WavLM attention kernel (interpret mode) vs
the dense XLA path (itself torch-parity-tested in test_forward_parity /
test_pipeline_wavlm).  Covers the in-kernel gated rel-pos bias
(reference ``/root/reference/wav2vec2/components.py:546-647``)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dphubert_tpu.configs import AttentionSpec
from dphubert_tpu.models.components import RngStream, self_attention_forward


def _spec(remaining=None, gru=True, th=4, hd=16):
    heads = len(remaining) if remaining is not None else th
    return AttentionSpec(
        embed_dim=th * hd,
        num_heads=heads,
        head_dim=hd,
        dropout=0.0,
        is_wavlm=True,
        total_num_heads=th,
        remaining_heads=tuple(remaining) if remaining is not None else tuple(range(th)),
        has_relative_attention_bias=True,
        num_buckets=32,
        max_distance=80,
        gru_rel_pos=gru,
    )


def _params(spec, key):
    e = spec.embed_dim
    inner = spec.num_heads * spec.head_dim
    ks = jax.random.split(key, 12)
    def lin(k, o, i):
        return {
            "weight": jax.random.normal(k, (o, i)) * (0.5 / np.sqrt(i)),
            "bias": jax.random.normal(jax.random.fold_in(k, 1), (o,)) * 0.02,
        }
    return {
        "q_proj": lin(ks[0], inner, e),
        "k_proj": lin(ks[1], inner, e),
        "v_proj": lin(ks[2], inner, e),
        "out_proj": lin(ks[3], e, inner),
        "gru_rel_pos_linear": lin(ks[4], 8, spec.embed_dim // spec.total_num_heads),
        "gru_rel_pos_const": 1.0 + 0.1 * jax.random.normal(
            ks[5], (1, spec.total_num_heads, 1, 1)
        ),
        "rel_attn_embed": {
            "weight": jax.random.normal(ks[6], (spec.num_buckets, spec.total_num_heads))
        },
    }


def _run(spec, params, x, lengths, flash, key=None, training=False):
    os.environ["DPHUBERT_FLASH_ATTENTION"] = "1" if flash else "0"
    try:
        rngs = RngStream(key) if key is not None else None
        mask = None
        if lengths is not None:
            B, L, _ = x.shape
            pad = jnp.arange(L)[None, :] >= lengths[:, None]
            mask = (-10000.0 * pad.astype(jnp.float32))[:, None, None, :]
            mask = jnp.broadcast_to(mask, (B, 1, L, L))
        out, bias = self_attention_forward(
            params, spec, x, mask, None, None, training, rngs, lengths=lengths
        )
        return out, bias
    finally:
        del os.environ["DPHUBERT_FLASH_ATTENTION"]


@pytest.mark.parametrize("gru", [True, False])
@pytest.mark.parametrize("lengths", [None, "ragged"])
def test_wavlm_forward_parity(gru, lengths):
    spec = _spec(gru=gru)
    params = _params(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 40, spec.embed_dim), jnp.float32)
    lens = jnp.array([40, 29]) if lengths else None

    ref, bias_ref = _run(spec, params, x, lens, flash=False)
    out, bias = _run(spec, params, x, lens, flash=True)
    np.testing.assert_allclose(np.asarray(bias), np.asarray(bias_ref), atol=1e-6)
    if lens is not None:
        # padded rows attend over garbage in both paths; compare valid rows
        for b, n in enumerate(np.asarray(lens)):
            np.testing.assert_allclose(
                np.asarray(out)[b, :n], np.asarray(ref)[b, :n], atol=2e-5, rtol=2e-5
            )
    else:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_wavlm_forward_parity_pruned_heads():
    spec = _spec(remaining=[0, 2, 3])
    params = _params(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 24, spec.embed_dim), jnp.float32)
    ref, _ = _run(spec, params, x, None, flash=False)
    out, _ = _run(spec, params, x, None, flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_wavlm_gradient_parity():
    """Covers dq/dk/dv, the in-kernel dbias accumulation over batch, and the
    dgate chain back through the GRU projection and the bias table."""
    spec = _spec()
    params = _params(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (3, 40, spec.embed_dim), jnp.float32)
    lens = jnp.array([40, 33, 21])
    probe = jax.random.normal(jax.random.key(2), (3, 40, spec.embed_dim))
    valid = (jnp.arange(40)[None, :, None] < lens[:, None, None]).astype(jnp.float32)

    def loss(flash):
        def f(params, x):
            out, _ = _run(spec, params, x, lens, flash=flash)
            return jnp.sum(out * probe * valid)

        return f

    g_ref = jax.grad(loss(False), argnums=(0, 1))(params, x)
    g_out = jax.grad(loss(True), argnums=(0, 1))(params, x)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref), jax.tree.leaves(g_out)
    ):
        np.testing.assert_allclose(
            np.asarray(b),
            np.asarray(a),
            atol=2e-4,
            rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("lengths", [None, "ragged"])
def test_wavlm_blocking_paths_agree(lengths):
    """The single-KV-block fast path (n_kv==1: batch-innermost grids +
    fused dq/dg/dbias kernel) must match the general multi-block path
    bitwise-close, forward AND backward — including n_q > 1, which slices
    the whole-head bias column in-kernel in the dkv kernel."""
    from dphubert_tpu.ops.wavlm_attention import wavlm_flash_attention

    B, H, L, D = 2, 3, 256, 32
    ks = jax.random.split(jax.random.key(7), 6)
    q = jax.random.normal(ks[0], (B, H, L, D))
    k = jax.random.normal(ks[1], (B, H, L, D))
    v = jax.random.normal(ks[2], (B, H, L, D))
    bias = 0.5 * jax.random.normal(ks[3], (H, L, L))
    gate = jax.nn.sigmoid(jax.random.normal(ks[4], (B, H, L))) * 2
    lens = jnp.array([256, 173]) if lengths else None
    probe = jax.random.normal(ks[5], (B, H, L, D))

    def run(block_q, block_kv):
        def f(q, k, v, bias, gate):
            out = wavlm_flash_attention(
                q, k, v, bias, gate, lens,
                block_q=block_q, block_kv=block_kv, interpret=True,
            )
            if lens is not None:
                valid = (jnp.arange(L)[None, :, None]
                         < lens[:, None, None]).astype(q.dtype)[:, None]
                out = out * valid
            return jnp.sum(out * probe)

        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))(
            q, k, v, bias, gate)
        return val, grads

    # n_q=2 & n_kv=1 (fast path, multi-q bias column slicing in dkv)
    v_fast, g_fast = run(block_q=128, block_kv=None)
    # n_q=2 & n_kv=2 (general three-kernel path)
    v_gen, g_gen = run(block_q=128, block_kv=128)
    # n_q=1 & n_kv=1 (fast path, single tile)
    v_one, g_one = run(block_q=256, block_kv=None)

    np.testing.assert_allclose(float(v_fast), float(v_gen), rtol=1e-5)
    np.testing.assert_allclose(float(v_fast), float(v_one), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_gen)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_one)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_wavlm_dropout_runs():
    """Dropout path: kernel-side mask, just check it runs, is finite, and
    differs from the no-dropout output."""
    spec = AttentionSpec(
        embed_dim=64, num_heads=4, head_dim=16, dropout=0.3, is_wavlm=True,
        total_num_heads=4, remaining_heads=(0, 1, 2, 3),
        has_relative_attention_bias=True, num_buckets=32, max_distance=80,
        gru_rel_pos=True,
    )
    params = _params(spec, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 24, 64), jnp.float32)
    out, _ = _run(spec, params, x, None, flash=True, key=jax.random.key(3),
                  training=True)
    base, _ = _run(spec, params, x, None, flash=True)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3
