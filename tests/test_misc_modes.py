"""Remaining behavioral modes: predlayer distillation, LayerDrop, tri-stage
schedule, aux head fine-tuning path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dphubert_tpu import wav2vec2_model
from dphubert_tpu.train.distill_module import (
    DistillConfig,
    init_train_state,
    make_train_step,
)
from dphubert_tpu.train.schedules import tri_stage_factor

from tests.test_forward_parity import _tiny_w2v2_config


def test_predlayer_training_step():
    """DistilHuBERT-style predlayer mode: independent Linear+GELU heads on
    the student's last layer (reference distill.py:100-107)."""
    cfg = _tiny_w2v2_config()
    teacher = wav2vec2_model(**cfg)
    student = wav2vec2_model(**cfg)
    tp = teacher.init(jax.random.key(0))
    sp = student.init(jax.random.key(1))
    dcfg = DistillConfig(
        distill_mode="predlayer",
        distill_layer_groups=((0,), (1,), (3,)),
        use_reg=False,
        warmup_updates=2,
        max_updates=10,
    )
    state, tx = init_train_state(
        student=student, student_params=sp, cfg=dcfg,
        teacher_embed_dim=64, rng=jax.random.key(2),
    )
    fn = make_train_step(teacher, student, dcfg, tx, donate=False)
    wave = np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)
    state, m = fn(state, tp, (jnp.asarray(wave), None))
    assert np.isfinite(float(m["loss"]))
    assert set(state.params["projs"]["groups"].keys()) == {"0", "1", "2"}


def test_layerdrop_only_in_plain_forward():
    """LayerDrop applies in forward (components.py:902) but never in
    get_intermediate_outputs (components.py:909-927)."""
    cfg = _tiny_w2v2_config(encoder_layer_drop=0.999)
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))
    wave = np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32)

    # plain training forward with p~1: all layers dropped
    out_dropped, _ = model.forward(
        params, wave, training=True, rng=jax.random.key(1)
    )
    cfg0 = _tiny_w2v2_config(encoder_layer_drop=0.0)
    model0 = wav2vec2_model(**cfg0)
    out_kept, _ = model0.forward(
        params, wave, training=True, rng=jax.random.key(1)
    )
    assert not np.allclose(np.asarray(out_dropped), np.asarray(out_kept))

    # extract_features ignores layer_drop entirely: same rng => same result
    xs1, _ = model.extract_features(params, wave, training=True,
                                    rng=jax.random.key(2))
    xs2, _ = model0.extract_features(params, wave, training=True,
                                     rng=jax.random.key(2))
    np.testing.assert_allclose(
        np.asarray(xs1[-1]), np.asarray(xs2[-1]), atol=1e-6
    )


def test_tri_stage_schedule_shape():
    w, h, d = 10, 5, 20
    f0 = float(tri_stage_factor(0, w, h, d))
    assert 0 < f0 < 1  # init_lr_scale ramp
    assert float(tri_stage_factor(9, w, h, d)) == pytest.approx(1.0)
    assert float(tri_stage_factor(12, w, h, d)) == pytest.approx(1.0)  # hold
    f_mid = float(tri_stage_factor(25, w, h, d))
    assert 0.05 < f_mid < 1.0  # decaying
    assert float(tri_stage_factor(100, w, h, d)) == pytest.approx(0.05)


def test_aux_head_finetune_gradients():
    """The aux head path (model.py:127-169) is trainable end-to-end."""
    cfg = _tiny_w2v2_config(aux_num_out=16)
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))
    wave = np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)

    def loss(p):
        logits, _ = model.forward(p, wave)
        return jnp.mean(logits ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["aux"]["weight"]).sum()) > 0


def test_scan_layers_equivalence():
    """lax.scan fast path == unrolled path (eval exact, train to fp noise);
    heterogeneous specs silently fall back to unrolled."""
    from dphubert_tpu.models.components import _uniform_scannable

    cfg = _tiny_w2v2_config()
    model = wav2vec2_model(**cfg)
    assert _uniform_scannable(model.spec)
    params = model.init(jax.random.key(0))
    wave = np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)
    a, _ = model.extract_features(params, wave, scan_layers=False)
    b, _ = model.extract_features(params, wave, scan_layers=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)

    het = wav2vec2_model(**_tiny_w2v2_config(encoder_num_heads=[4, 2, 4]))
    assert not _uniform_scannable(het.spec)
    ph = het.init(jax.random.key(1))
    # scan request falls back without error
    c, _ = het.extract_features(ph, wave, scan_layers=True)
    d, _ = het.extract_features(ph, wave, scan_layers=False)
    np.testing.assert_allclose(
        np.asarray(c[-1]), np.asarray(d[-1]), atol=1e-6
    )


def test_serve_predictor():
    """Shape-bucketed inference: mixed-length clips, few compilations,
    per-clip trimmed outputs matching direct extract_features.

    Uses the layer_norm extractor mode — per-frame statistics make valid
    frames padding-invariant.  (group_norm mode normalizes over time incl.
    padding, so batch-padded outputs differ from solo runs by construction —
    the reference behaves identically.)"""
    from dphubert_tpu.serve import Predictor

    cfg = _tiny_w2v2_config(extractor_mode="layer_norm", layer_norm_first=True)
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(n).astype(np.float32)
             for n in (4000, 5100, 4800, 9000)]

    p = Predictor(model, params, length_step=4000, max_batch=2)
    feats = p.extract(waves)
    assert len(feats) == 4
    # direct single-clip reference
    for w, f in zip(waves, feats):
        direct, lens = model.extract_features(params, w[None, :])
        np.testing.assert_allclose(
            f, np.asarray(direct[-1])[0], atol=2e-4
        )
    # length bucketing keeps the compile count below clip count
    assert len(p.compiled_shapes) <= 3


def test_extract_features_num_layers():
    """num_layers early exit (reference model.py:80-84): returns
    [proj_input] + exactly k layer outputs, matching prefixes of the full run."""
    cfg = _tiny_w2v2_config()
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))
    wave = np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32)
    full, _ = model.extract_features(params, wave)
    partial, _ = model.extract_features(params, wave, num_layers=2)
    assert len(partial) == 3 and len(full) == 4
    for a, b in zip(partial, full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_persistent_cache_config(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at the directory (creating it) and
    respects the DPHUBERT_COMPILE_CACHE=off escape hatch."""
    import jax

    from dphubert_tpu.utils.compilation_cache import enable_persistent_cache

    target = tmp_path / "xla_cache"
    got = enable_persistent_cache(str(target))
    assert got == str(target) and target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)

    monkeypatch.setenv("DPHUBERT_COMPILE_CACHE", "off")
    assert enable_persistent_cache() is None
