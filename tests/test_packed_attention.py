"""Packed-layout fused attention vs the dense reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dphubert_tpu.ops.packed_attention import packed_attention

from tests.test_flash_attention import dense_reference


def _pack(x):  # (B, H, L, D) -> (B, L, H*D)
    B, H, L, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def _unpack(x, H):  # (B, L, H*D) -> (B, H, L, D)
    B, L, HD = x.shape
    return x.reshape(B, L, H, HD // H).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("L", [128, 256, 149])
def test_packed_forward(L):
    rng = np.random.default_rng(0)
    B, H, D = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)

    out = packed_attention(_pack(q), _pack(k), _pack(v), num_heads=H,
                           interpret=True)
    ref = dense_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(_unpack(out, H)), np.asarray(ref), atol=2e-5
    )


def test_packed_forward_lengths():
    rng = np.random.default_rng(1)
    B, H, L, D = 3, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    lengths = jnp.asarray([256, 100, 17], jnp.int32)
    out = _unpack(
        packed_attention(_pack(q), _pack(k), _pack(v), lengths, num_heads=H,
                         interpret=True),
        H,
    )
    ref = dense_reference(q, k, v, lengths)
    for b in range(B):
        n = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :n], np.asarray(ref)[b, :, :n], atol=2e-5
        )


def test_packed_backward():
    rng = np.random.default_rng(2)
    B, H, L, D = 2, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)

    def loss_packed(q, k, v):
        o = packed_attention(_pack(q), _pack(k), _pack(v), num_heads=H,
                             interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(_pack(dense_reference(q, k, v))))

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_packed_backward_lengths_and_dropout_determinism():
    rng = np.random.default_rng(3)
    B, H, L, D = 2, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    lengths = jnp.asarray([256, 130], jnp.int32)
    row_mask = (jnp.arange(L)[None, :] < lengths[:, None])[:, :, None]

    def loss(fn):
        def f(q, k, v):
            o = fn(_pack(q), _pack(k), _pack(v))
            return jnp.sum(jnp.where(row_mask, jnp.sin(o), 0.0))
        return f

    gp = jax.grad(
        loss(lambda q, k, v: packed_attention(q, k, v, lengths, num_heads=H,
                                              interpret=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    gd = jax.grad(
        loss(lambda q, k, v: _pack(
            dense_reference(_unpack(q, H), _unpack(k, H), _unpack(v, H),
                            lengths))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b, name in zip(gp, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )

    # dropout: deterministic given the key, finite grads
    key = jax.random.key(5)
    o1 = packed_attention(_pack(q), _pack(k), _pack(v), num_heads=H,
                          dropout_rate=0.3, dropout_rng=key, interpret=True)
    o2 = packed_attention(_pack(q), _pack(k), _pack(v), num_heads=H,
                          dropout_rate=0.3, dropout_rng=key, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    g = jax.grad(lambda q: jnp.sum(
        packed_attention(_pack(q), _pack(k), _pack(v), num_heads=H,
                         dropout_rate=0.3, dropout_rng=key, interpret=True) ** 2
    ))(q)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("B,H,L,D", [
    (2, 16, 256, 64),   # 1024-wide (Large family): 2 x 512-lane head groups
    (2, 4, 800, 64),    # padded KV 1024: grouped to bound dKV scratch VMEM
])
def test_packed_grouped_forward_backward(B, H, L, D):
    """Head-grouped packed kernels (packed_num_groups > 1) must match the
    dense reference in both forward and gradients."""
    from dphubert_tpu.ops.packed_attention import packed_num_groups

    assert packed_num_groups(L, H, D) > 1
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    lengths = jnp.asarray([L, L - 57][:B], jnp.int32)

    # compare valid query rows only (rows past ``lengths`` attend to the
    # valid keys in both implementations, but training never reads them)
    row_mask = (jnp.arange(L)[None, None, :, None]
                < lengths[:, None, None, None])

    def f_packed(q, k, v):
        out = _unpack(
            packed_attention(_pack(q), _pack(k), _pack(v), lengths,
                             num_heads=H, interpret=True), H)
        return jnp.sum(jnp.where(row_mask, out, 0.0) ** 2)

    def f_dense(q, k, v):
        out = dense_reference(q, k, v, lengths)
        return jnp.sum(jnp.where(row_mask, out, 0.0) ** 2)

    v1, g1 = jax.value_and_grad(f_packed, argnums=(0, 1, 2))(q, k, v)
    v2, g2 = jax.value_and_grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)
