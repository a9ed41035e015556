"""Counter-hash dropout (DPHUBERT_DROPOUT_IMPL=hash).

The threefry bernoulli masks of a distill step are a measurable slice of
the bandwidth-bound elementwise budget (ROADMAP step-time table); the hash
impl replaces them with a murmur3-finalizer counter hash, the same
construction the Pallas attention kernels use in-kernel
(``ops/flash_attention.py:_dropout_keep_mask``).  These tests pin the
statistical and determinism contract of the swap.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dphubert_tpu.models.components import RngStream, _dropout, _hash_keep_mask


def test_hash_mask_statistics():
    for keep in (0.9, 0.5):
        m = _hash_keep_mask(jax.random.key(0), keep, (256, 1024))
        frac = float(jnp.mean(m.astype(jnp.float32)))
        assert abs(frac - keep) < 0.01, (keep, frac)


def test_hash_mask_deterministic_and_key_dependent():
    k1, k2 = jax.random.key(1), jax.random.key(2)
    a = np.asarray(_hash_keep_mask(k1, 0.9, (64, 64)))
    b = np.asarray(_hash_keep_mask(k1, 0.9, (64, 64)))
    c = np.asarray(_hash_keep_mask(k2, 0.9, (64, 64)))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_hash_mask_no_row_column_structure():
    # adjacent rows/cols must decorrelate: the flat-index counter feeds a
    # full avalanche finalizer, so row-shifted masks should overlap at
    # ~keep^2, not ~keep
    keep = 0.5
    m = np.asarray(_hash_keep_mask(jax.random.key(3), keep, (128, 128)))
    row_overlap = (m[1:] & m[:-1]).mean()
    col_overlap = (m[:, 1:] & m[:, :-1]).mean()
    assert abs(row_overlap - keep**2) < 0.03
    assert abs(col_overlap - keep**2) < 0.03


def test_dropout_impl_scaling_and_mean():
    x = jnp.ones((512, 512), jnp.float32)
    for impl in ("threefry", "hash"):
        y = _dropout(x, 0.1, True, RngStream(jax.random.key(0)), impl=impl)
        # kept entries are rescaled by 1/keep; mean stays ~1
        vals = np.unique(np.asarray(y))
        assert all(np.isclose(v, 0.0) or np.isclose(v, 1 / 0.9) for v in vals)
        assert abs(float(jnp.mean(y)) - 1.0) < 0.01


def test_dropout_impl_under_jit_and_grad():
    x = jnp.ones((64, 64), jnp.float32)

    @jax.jit
    def f(x, key):
        y = _dropout(x, 0.2, True, RngStream(key), impl="hash")
        return jnp.sum(y * y)

    g = jax.grad(f)(x, jax.random.key(0))
    y = _dropout(x, 0.2, True, RngStream(jax.random.key(0)), impl="hash")
    # d/dx sum((x*m/keep)^2) = 2*x*(m/keep)^2: zero exactly where dropped
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(y) / 0.8, rtol=1e-6)
