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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_steps_per_dispatch_on_mesh(tmp_path):
    """steps_per_dispatch=2 through train() on the 8-device mesh: the
    (K, B, T) stack shards its *batch* axis (axis 1) over data while the
    scanned steps axis stays unsharded, and training completes.

    max_updates=5 is deliberately NOT a multiple of K: the tail dispatch
    must step device-side slices ``wave[j]`` of the P(None, 'data')-sharded
    stack (the overshoot path, trainer.py) so the run stops exactly at 5."""
    from dphubert_tpu.train.trainer import train

    mesh = create_mesh(n_data=8)
    cfg = _tiny_w2v2_config()
    teacher = wav2vec2_model(**cfg)
    student = wav2vec2_model(**cfg)

    class FakeLoader:
        def epoch(self, e, skip=0):
            rng = np.random.default_rng(e)
            for i in range(20):
                w = rng.standard_normal((16, 4000)).astype(np.float32)
                if i >= skip:
                    yield w, None

    state = train(
        teacher=teacher, teacher_params=teacher.init(jax.random.key(0)),
        student=student, student_params=student.init(jax.random.key(1)),
        cfg=DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)),
                          warmup_updates=2, max_updates=5),
        loader=FakeLoader(), exp_dir=tmp_path, mesh=mesh,
        log_interval=100, ckpt_interval=100, steps_per_dispatch=2,
    )
    assert int(state.step) == 5
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_fsdp_mesh():
    """ZeRO-3-style layouts (parallel/fsdp.py): params + Adam moments +
    frozen teacher sharded over the data axis; the jitted step's loss must
    match the replicated DP run and the updated params must keep the
    sharded layout (XLA reduce-scatters behind the update)."""
    from dphubert_tpu.parallel.fsdp import place_fsdp, place_train_params_fsdp

    mesh = create_mesh(n_data=8)
    teacher = wav2vec2_model(**_tiny_w2v2_config())
    student = wav2vec2_model(**_tiny_w2v2_config(**PRUNE_FLAGS))
    teacher_params = teacher.init(jax.random.key(0))
    dcfg = DistillConfig(
        distill_layer_groups=((0,), (1, 3)),
        warmup_updates=2, max_updates=10,
        sparsity_warmup_updates=2, target_sparsity=0.5,
    )

    def one_step(placed_tp, place_state):
        state, tx = init_train_state(
            student=student, student_params=student.init(jax.random.key(1)),
            cfg=dcfg, teacher_embed_dim=64, rng=jax.random.key(2),
        )
        params = place_state(state.params, tx)
        state = state._replace(params=params, opt_state=tx.init(params))
        fn = make_train_step(teacher, student, dcfg, tx, donate=False)
        wave = np.random.default_rng(0).standard_normal((16, 4000)).astype(np.float32)
        wave = jax.device_put(wave, batch_sharding(mesh))
        return fn(state, placed_tp, (wave, None))

    # min_size=1024 so the tiny test model actually shards something
    state_f, m_f = one_step(
        place_fsdp(mesh, teacher_params, min_size=1024),
        lambda p, tx: place_train_params_fsdp(
            student.spec, mesh, p, min_size=1024),
    )
    state_r, m_r = one_step(
        replicate(mesh, teacher_params),
        lambda p, tx: replicate(mesh, p),
    )
    assert np.isfinite(float(m_f["loss"]))
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_r["loss"]), rtol=1e-5
    )

    # something large is genuinely sharded, before AND after the update
    def sharded_leaves(tree):
        return [
            x for x in jax.tree.leaves(tree)
            if any(s is not None for s in getattr(x.sharding, "spec", ()))
        ]

    assert sharded_leaves(state_f.params["student"])
    for leaf in sharded_leaves(state_f.params["student"]):
        n_shards = len({s.index for s in leaf.addressable_shards})
        assert n_shards == 8, leaf.shape
    # Adam moments followed the param layouts
    assert sharded_leaves(state_f.opt_state)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_hsdp_mesh():
    """Hybrid (data=4 FSDP) x (model=2 TP): TP dims keep the model axis and
    the data axis lands on a remaining free dim of the same leaf."""
    from dphubert_tpu.parallel.fsdp import place_fsdp, place_train_params_fsdp

    mesh = create_mesh(n_data=4, n_model=2)
    teacher = wav2vec2_model(**_tiny_w2v2_config())
    student = wav2vec2_model(**_tiny_w2v2_config(**PRUNE_FLAGS))
    tp = place_fsdp(mesh, teacher.init(jax.random.key(0)), min_size=1024)
    dcfg = DistillConfig(
        distill_layer_groups=((0,), (1, 3)),
        warmup_updates=2, max_updates=10,
        sparsity_warmup_updates=2, target_sparsity=0.5,
    )
    state, tx = init_train_state(
        student=student, student_params=student.init(jax.random.key(1)),
        cfg=dcfg, teacher_embed_dim=64, rng=jax.random.key(2),
    )
    params = place_train_params_fsdp(
        student.spec, mesh, state.params, tensor_parallel=True, min_size=1024
    )
    qw = params["student"]["encoder"]["transformer"]["layers"]["0"]["attention"]["q_proj"]["weight"]
    spec = tuple(qw.sharding.spec)
    assert "model" in spec and "data" in spec, spec

    state = state._replace(params=params, opt_state=tx.init(params))
    fn = make_train_step(teacher, student, dcfg, tx, donate=False)
    wave = np.random.default_rng(0).standard_normal((8, 4000)).astype(np.float32)
    wave = jax.device_put(wave, batch_sharding(mesh))
    state, m = fn(state, tp, (wave, None))
    assert np.isfinite(float(m["loss"]))
    qw2 = state.params["student"]["encoder"]["transformer"]["layers"]["0"]["attention"]["q_proj"]["weight"]
    assert tuple(qw2.sharding.spec) == spec


def test_fsdp_spec_rule():
    """Layout rule unit: largest free divisible dim gets the data axis;
    small leaves replicate; dims taken by the base (TP) spec are skipped."""
    from jax.sharding import PartitionSpec as P

    from dphubert_tpu.parallel.fsdp import fsdp_spec

    assert fsdp_spec((768, 768), 8, min_size=1024) == P("data", None)
    assert fsdp_spec((512, 256, 3), 8, min_size=1024) == P("data", None, None)
    # too small -> replicate
    assert fsdp_spec((768,), 8, min_size=1024) == P()
    # largest dim not divisible -> falls to next divisible dim
    assert fsdp_spec((1023, 512), 8, min_size=1024) == P(None, "data")
    # base (TP) owns dim 0 -> data lands on dim 1
    assert fsdp_spec((768, 768), 8, base=P("model"), min_size=1024) == P("model", "data")
    # nothing free/divisible -> base kept as-is
    assert fsdp_spec((768, 1023), 8, base=P("model"), min_size=1024) == P("model", None)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fsdp_trainer_resume_exact(tmp_path):
    """trainer.train(fsdp=True): checkpoints round-trip through npz and
    load_train_state re-places leaves onto the FSDP layouts; a 2+2-step
    resumed run must equal the uninterrupted 4-step run bitwise."""
    from dphubert_tpu.train.trainer import train

    mesh = create_mesh(n_data=8)
    cfg = _tiny_w2v2_config()
    teacher = wav2vec2_model(**cfg)
    student = wav2vec2_model(**cfg)
    tp = teacher.init(jax.random.key(0))
    sp = student.init(jax.random.key(1))

    class FakeLoader:
        def epoch(self, e):
            rng = np.random.default_rng(e)
            for _ in range(10):
                yield rng.standard_normal((8, 4000)).astype(np.float32), None

    dcfg = DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)),
                         warmup_updates=2, max_updates=4)

    s_full = train(teacher=teacher, teacher_params=tp, student=student,
                   student_params=sp, cfg=dcfg, loader=FakeLoader(),
                   exp_dir=tmp_path / "a", mesh=mesh, fsdp=True,
                   log_interval=100, ckpt_interval=100)
    # identical config, preempted mid-run at step 2 (SIGTERM path)
    s_half = train(teacher=teacher, teacher_params=tp, student=student,
                   student_params=sp, cfg=dcfg, loader=FakeLoader(),
                   exp_dir=tmp_path / "b", mesh=mesh, fsdp=True,
                   log_interval=100, ckpt_interval=100, stop_at_step=2)
    assert int(s_half.step) == 2
    s_res = train(teacher=teacher, teacher_params=tp, student=student,
                  student_params=sp, cfg=dcfg, loader=FakeLoader(),
                  exp_dir=tmp_path / "c", mesh=mesh, fsdp=True,
                  log_interval=100, ckpt_interval=100,
                  resume=str(tmp_path / "b" / "ckpts" / "last.npz"))
    assert int(s_res.step) == 4

    # resumed == uninterrupted, and the layout survived the round-trip
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sharded = [
        x for x in jax.tree.leaves(s_res.params["student"])
        if any(s is not None for s in getattr(x.sharding, "spec", ()))
    ]
    assert sharded
