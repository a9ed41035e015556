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


def test_dropout_deterministic_and_unbiased():
    import jax

    rng = np.random.default_rng(5)
    B, H, L, D = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)

    key = jax.random.key(0)
    a1 = flash_attention(q, k, v, dropout_rate=0.3, dropout_rng=key,
                         interpret=True)
    a2 = flash_attention(q, k, v, dropout_rate=0.3, dropout_rng=key,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a3 = flash_attention(q, k, v, dropout_rate=0.3,
                         dropout_rng=jax.random.key(1), interpret=True)
    assert not np.allclose(np.asarray(a1), np.asarray(a3))

    # expectation over seeds approaches the no-dropout output
    outs = [
        np.asarray(
            flash_attention(q, k, v, dropout_rate=0.3,
                            dropout_rng=jax.random.key(i), interpret=True)
        )
        for i in range(24)
    ]
    mean = np.mean(outs, axis=0)
    ref = np.asarray(dense_reference(q, k, v))
    err = np.abs(mean - ref).mean() / (np.abs(ref).mean() + 1e-6)
    assert err < 0.2, err


def test_dropout_gradients_finite_and_mask_consistent():
    import jax

    rng = np.random.default_rng(6)
    B, H, L, D = 1, 1, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    key = jax.random.key(7)

    def loss(q, k, v):
        o = flash_attention(q, k, v, dropout_rate=0.25, dropout_rng=key,
                            interpret=True)
        return jnp.sum(o * o)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # dV sanity via finite differences on one element (same in-kernel mask
    # regenerates across fwd/bwd because the seed is fixed)
    eps = 1e-3
    e = jnp.zeros_like(v).at[0, 0, 3, 5].set(eps)
    f1 = loss(q, k, v + e)
    f0 = loss(q, k, v - e)
    fd = float((f1 - f0) / (2 * eps))
    an = float(np.asarray(grads[2])[0, 0, 3, 5])
    assert abs(fd - an) < 5e-2 * max(1.0, abs(fd)), (fd, an)
