"""In-kernel counter-hash dropout mask + the plain activation dropout.

The Pallas attention kernels regenerate their probs-dropout mask in the
backward pass from a murmur3-finalizer counter hash
(``ops/flash_attention.py:_dropout_keep_mask``) instead of storing it or
depending on ``pltpu.prng_*`` (absent under the CPU interpreter).  These
tests pin the statistical and determinism contract of that construction.

(An out-of-kernel variant of the same hash was measured as a replacement
for the threefry activation-dropout masks in r4 and deleted: its mask
fusions pushed the packed-attention backward over the Mosaic scoped-VMEM
limit, so the train step stopped compiling on v5e — see
``docs/profile_r4_hash.log``.  The measured fast path for mask generation
is ``--rng_impl rbg``, the TPU hardware generator.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from dphubert_tpu.models.components import RngStream, _dropout
from dphubert_tpu.ops.flash_attention import _dropout_keep_mask


def _mask(shape, keep, seed=0, b=0, h=0, q_off=0, kv_off=0):
    return _dropout_keep_mask(
        shape, keep, jnp.asarray(seed, jnp.int32), b, h, q_off, kv_off
    )


def test_hash_mask_statistics():
    for keep in (0.9, 0.5):
        m = _mask((256, 1024), keep)
        frac = float(jnp.mean(m.astype(jnp.float32)))
        assert abs(frac - keep) < 0.01, (keep, frac)


def test_hash_mask_deterministic_and_seed_dependent():
    a = np.asarray(_mask((64, 64), 0.9, seed=1))
    b = np.asarray(_mask((64, 64), 0.9, seed=1))
    c = np.asarray(_mask((64, 64), 0.9, seed=2))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_hash_mask_offsets_are_absolute_coordinates():
    """The backward kernels regenerate the mask tile-by-tile at different
    grid offsets: a tile at (q_off, kv_off) must equal the same region of
    the full mask."""
    full = np.asarray(_mask((128, 128), 0.8, seed=7, b=1, h=2))
    tile = np.asarray(_mask((64, 64), 0.8, seed=7, b=1, h=2,
                            q_off=32, kv_off=64))
    np.testing.assert_array_equal(tile, full[32:96, 64:128])


def test_hash_mask_no_row_column_structure():
    # adjacent rows/cols must decorrelate: the (row, col) coordinates feed
    # a full avalanche finalizer, so row-shifted masks should overlap at
    # ~keep^2, not ~keep
    keep = 0.5
    m = np.asarray(_mask((128, 128), keep, seed=3))
    row_overlap = (m[1:] & m[:-1]).mean()
    col_overlap = (m[:, 1:] & m[:, :-1]).mean()
    assert abs(row_overlap - keep**2) < 0.03
    assert abs(col_overlap - keep**2) < 0.03


def test_dropout_scaling_and_mean():
    x = jnp.ones((512, 512), jnp.float32)
    y = _dropout(x, 0.1, True, RngStream(jax.random.key(0)))
    # kept entries are rescaled by 1/keep; mean stays ~1
    vals = np.unique(np.asarray(y))
    assert all(np.isclose(v, 0.0) or np.isclose(v, 1 / 0.9) for v in vals)
    assert abs(float(jnp.mean(y)) - 1.0) < 0.01


def test_dropout_under_rbg_keys():
    """The mask generator is the key's PRNG impl: rbg keys must work
    through the same _dropout path (the production recipes pass
    --rng_impl rbg; measured 6% faster steps on v5e, r4 profile)."""
    key = jax.random.key(0, impl="rbg")
    x = jnp.ones((256, 256), jnp.float32)
    y = _dropout(x, 0.2, True, RngStream(key))
    frac = float(jnp.mean((np.asarray(y) != 0).astype(np.float32)))
    assert abs(frac - 0.8) < 0.02
    # deterministic for a fixed key
    y2 = _dropout(x, 0.2, True, RngStream(jax.random.key(0, impl="rbg")))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
