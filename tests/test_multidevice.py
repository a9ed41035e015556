"""Multi-device SPMD: the full train step over an 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from dphubert_tpu import wav2vec2_model
from dphubert_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
from dphubert_tpu.train.distill_module import (
    DistillConfig,
    init_train_state,
    make_train_step,
)

from tests.test_forward_parity import _tiny_w2v2_config
from tests.test_train import PRUNE_FLAGS


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_8_device_mesh():
    mesh = create_mesh(n_data=8)
    teacher = wav2vec2_model(**_tiny_w2v2_config())
    student = wav2vec2_model(**_tiny_w2v2_config(**PRUNE_FLAGS))
    tp = replicate(mesh, teacher.init(jax.random.key(0)))
    dcfg = DistillConfig(
        distill_layer_groups=((0,), (1, 3)),
        warmup_updates=2, max_updates=10,
        sparsity_warmup_updates=2, target_sparsity=0.5,
    )
    state, tx = init_train_state(
        student=student, student_params=student.init(jax.random.key(1)),
        cfg=dcfg, teacher_embed_dim=64, rng=jax.random.key(2),
    )
    state = state._replace(params=replicate(mesh, state.params))
    fn = make_train_step(teacher, student, dcfg, tx, donate=False)

    wave = np.random.default_rng(0).standard_normal((16, 4000)).astype(np.float32)
    wave = jax.device_put(wave, batch_sharding(mesh))
    assert len(wave.sharding.device_set) == 8

    state, m = fn(state, tp, (wave, None))
    assert np.isfinite(float(m["loss"]))
    # params remain replicated across all 8 devices after the update
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_batch_sharding_layout():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    x = np.zeros((8, 16), np.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    # batch axis split over data (4 shards of 2 rows)
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 16)}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_tensor_parallel_mesh():
    """2-D (data=4, model=2) SPMD: attention/FFN inner dims sharded over the
    model axis; XLA inserts the contraction psums."""
    from dphubert_tpu.parallel.sharding import param_shardings, place_train_params

    mesh = create_mesh(n_data=4, n_model=2)
    teacher = wav2vec2_model(**_tiny_w2v2_config())
    student = wav2vec2_model(**_tiny_w2v2_config(**PRUNE_FLAGS))
    tp = replicate(mesh, teacher.init(jax.random.key(0)))
    dcfg = DistillConfig(
        distill_layer_groups=((0,), (1, 3)),
        warmup_updates=2, max_updates=10,
        sparsity_warmup_updates=2, target_sparsity=0.5,
    )
    state, tx = init_train_state(
        student=student, student_params=student.init(jax.random.key(1)),
        cfg=dcfg, teacher_embed_dim=64, rng=jax.random.key(2),
    )
    params = place_train_params(student.spec, mesh, state.params)
    # q_proj weight really is split over the model axis
    qw = params["student"]["encoder"]["transformer"]["layers"]["0"]["attention"]["q_proj"]["weight"]
    shapes = {s.data.shape for s in qw.addressable_shards}
    assert shapes == {(qw.shape[0] // 2, qw.shape[1])}

    state = state._replace(params=params, opt_state=tx.init(params))
    fn = make_train_step(teacher, student, dcfg, tx, donate=False)
    wave = np.random.default_rng(0).standard_normal((8, 4000)).astype(np.float32)
    wave = jax.device_put(wave, batch_sharding(mesh))
    state, m = fn(state, tp, (wave, None))
    assert np.isfinite(float(m["loss"]))
    # updated params keep the TP layout (Adam moments followed it)
    qw2 = state.params["student"]["encoder"]["transformer"]["layers"]["0"]["attention"]["q_proj"]["weight"]
    assert {s.data.shape for s in qw2.addressable_shards} == shapes
