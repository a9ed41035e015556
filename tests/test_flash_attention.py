"""Flash-attention kernel vs the XLA dense reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dphubert_tpu.ops.flash_attention import flash_attention


def dense_reference(q, k, v, lengths=None, scale=None):
    B, H, L, D = q.shape
    if scale is None:
        scale = D ** -0.5
    s = jnp.einsum("bhld,bhmd->bhlm", q * scale, k).astype(jnp.float32)
    if lengths is not None:
        mask = jnp.arange(L)[None, :] < lengths[:, None]  # (B, L)
        s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", p.astype(q.dtype), v)


@pytest.mark.parametrize("L", [128, 256, 200])
def test_forward_matches_dense(L):
    rng = np.random.default_rng(0)
    B, H, D = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)

    out = flash_attention(q, k, v, interpret=True)
    ref = dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_lengths():
    rng = np.random.default_rng(1)
    B, H, L, D = 3, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    lengths = jnp.asarray([256, 100, 17], jnp.int32)

    out = flash_attention(q, k, v, lengths, interpret=True)
    ref = dense_reference(q, k, v, lengths)
    # only rows < length are meaningful (the model zeroes/ignores the rest)
    for b in range(B):
        n = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :n], np.asarray(ref)[b, :, :n], atol=2e-5
        )


def test_backward_matches_dense():
    rng = np.random.default_rng(2)
    B, H, L, D = 2, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_dense(q, k, v):
        o = dense_reference(q, k, v)
        return jnp.sum(jnp.sin(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_backward_with_lengths():
    rng = np.random.default_rng(3)
    B, H, L, D = 2, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    lengths = jnp.asarray([256, 130], jnp.int32)
    # valid-row mask so padded query rows don't contribute to the loss
    row_mask = (jnp.arange(L)[None, :] < lengths[:, None])[:, None, :, None]

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v)
            return jnp.sum(jnp.where(row_mask, jnp.sin(o), 0.0))
        return f

    gf = jax.grad(
        loss(lambda q, k, v: flash_attention(q, k, v, lengths, interpret=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    gd = jax.grad(
        loss(lambda q, k, v: dense_reference(q, k, v, lengths)), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_non_multiple_length_padding():
    """L=99 (a real frame count) pads to 128 internally and unpads."""
    rng = np.random.default_rng(4)
    B, H, L, D = 1, 2, 99, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = dense_reference(q, k, v)
    assert out.shape == (B, H, L, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
