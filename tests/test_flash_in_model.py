"""Model-level equivalence: forward with the flash-attention path forced on
must match the XLA dense path (CPU interpret mode)."""

import os

import numpy as np
import pytest

from dphubert_tpu import wav2vec2_model

from tests.test_forward_parity import _tiny_w2v2_config


@pytest.fixture
def force_flash(monkeypatch):
    monkeypatch.setenv("DPHUBERT_FLASH_ATTENTION", "1")
    yield
    # monkeypatch auto-restores


def test_model_flash_equals_dense(force_flash):
    import jax

    cfg = _tiny_w2v2_config()
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)

    outs_flash, _ = model.extract_features(params, wave)

    os.environ["DPHUBERT_FLASH_ATTENTION"] = "0"
    outs_dense, _ = model.extract_features(params, wave)

    for i, (a, b) in enumerate(zip(outs_flash, outs_dense)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=f"layer {i}"
        )


def test_model_flash_with_lengths(force_flash):
    import jax

    cfg = _tiny_w2v2_config()
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(1))
    rng = np.random.default_rng(1)
    wave = rng.standard_normal((2, 4000), dtype=np.float32)
    lengths = np.array([4000, 2500], dtype=np.int64)
    for b, l in enumerate(lengths):
        wave[b, l:] = 0.0

    outs_flash, lens_f = model.extract_features(params, wave, lengths)
    os.environ["DPHUBERT_FLASH_ATTENTION"] = "0"
    outs_dense, lens_d = model.extract_features(params, wave, lengths)
    np.testing.assert_array_equal(np.asarray(lens_f), np.asarray(lens_d))
    # compare only valid frames per sample
    for i, (a, b) in enumerate(zip(outs_flash, outs_dense)):
        for bi, n in enumerate(np.asarray(lens_d)):
            np.testing.assert_allclose(
                np.asarray(a)[bi, :n],
                np.asarray(b)[bi, :n],
                atol=2e-4,
                err_msg=f"layer {i} sample {bi}",
            )
