"""Data pipeline: samplers, loader, manifests, checkpoint/resume."""

import numpy as np
import pytest

from dphubert_tpu.data.sampler import (
    BucketizeBatchSampler,
    DistributedBatchSampler,
    StaticShapeBatcher,
)


def test_bucketize_filters_and_packs():
    lengths = [10, 50, 100, 160, 200, 210, 999, 5]
    s = BucketizeBatchSampler(
        lengths, num_buckets=10, min_len=40, max_len=250,
        max_token_count=400, shuffle=False,
    )
    batches = list(s)
    # all indices within bounds, each batch under the token budget
    flat = [i for b in batches for i in b]
    assert set(flat) == {1, 2, 3, 4, 5}  # 10, 5, 999 filtered out
    for b in batches:
        assert sum(lengths[i] for i in b) <= 400
    # sorted-by-length packing: batch boundaries respect ordering
    assert flat == sorted(flat, key=lambda i: lengths[i])


def test_bucketize_batch_size_mode():
    lengths = list(range(100, 200))
    s = BucketizeBatchSampler(
        lengths, num_buckets=5, batch_size=8, shuffle=False, drop_last=True
    )
    batches = list(s)
    assert all(len(b) == 8 for b in batches)


def test_distributed_batch_sampler_partition():
    lengths = list(range(100, 180))
    base = BucketizeBatchSampler(
        lengths, num_buckets=5, batch_size=4, shuffle=False
    )
    parts = [
        list(DistributedBatchSampler(base, num_replicas=4, rank=r, shuffle=True,
                                     seed=3, epoch=1))
        for r in range(4)
    ]
    # equal share per rank; identical lengths
    n = len(parts[0])
    assert all(len(p) == n for p in parts)
    # same seed+epoch on every rank slices a single consistent permutation:
    # rebuilding rank 0 gives the same subset
    again = list(DistributedBatchSampler(base, num_replicas=4, rank=0,
                                         shuffle=True, seed=3, epoch=1))
    assert again == parts[0]


def test_static_shape_batcher_closed_shape_set():
    rng = np.random.default_rng(0)
    lengths = rng.integers(32000, 250001, size=500)
    b = StaticShapeBatcher(
        lengths, max_token_count=320000, num_shapes=8, seed=0
    )
    shapes = set()
    for rung, idx in b.epoch_batches(0):
        shapes.add((len(idx), rung))
        # every member is at least rung long (crop never pads)
        assert (lengths[idx] >= rung).all()
    assert shapes <= set(b.shapes)
    assert len(shapes) <= 8


def test_static_shape_batcher_deterministic_and_replica_consistent():
    lengths = np.random.default_rng(1).integers(32000, 250001, size=300)
    b1 = StaticShapeBatcher(lengths, max_token_count=500000, seed=7,
                            num_replicas=2)
    b2 = StaticShapeBatcher(lengths, max_token_count=500000, seed=7,
                            num_replicas=2)
    e1, e2 = b1.epoch_batches(3), b2.epoch_batches(3)
    assert len(e1) == len(e2)
    for (r1, i1), (r2, i2) in zip(e1, e2):
        assert r1 == r2
        np.testing.assert_array_equal(i1, i2)  # same global batch on all ranks
        assert len(i1) % 2 == 0  # divisible across replicas
    # different epoch reshuffles
    assert any(
        not np.array_equal(a[1], b[1])
        for a, b in zip(e1, b1.epoch_batches(4))
    )


def test_static_shape_batcher_run_length_groups_shapes():
    """run_length=K emits same-rung runs of K consecutive batches with the
    same batch multiset as the plain shuffle (only epoch order changes)."""
    lengths = np.random.default_rng(2).integers(32000, 250001, size=600)
    plain = StaticShapeBatcher(lengths, max_token_count=320000, num_shapes=6,
                               seed=5)
    grouped = StaticShapeBatcher(lengths, max_token_count=320000,
                                 num_shapes=6, seed=5, run_length=4)
    ep, eg = plain.epoch_batches(1), grouped.epoch_batches(1)
    assert len(ep) == len(eg)
    # identical multiset of batches
    key = lambda b: (b[0], tuple(sorted(b[1])))
    assert sorted(map(key, ep)) == sorted(map(key, eg))
    # runs: every full group of 4 starting at a run boundary shares a rung
    i = 0
    runs = []
    while i < len(eg):
        rung = eg[i][0]
        j = i
        while j < len(eg) and eg[j][0] == rung:
            j += 1
        runs.append(j - i)
        i = j
    # all but the per-rung tails are multiples of 4 joined together; at
    # minimum, most batches must sit in runs >= 4
    in_runs = sum(r for r in runs if r >= 4)
    assert in_runs >= 0.7 * len(eg), runs
    # determinism
    eg2 = StaticShapeBatcher(lengths, max_token_count=320000, num_shapes=6,
                             seed=5, run_length=4).epoch_batches(1)
    for (r1, i1), (r2, i2) in zip(eg, eg2):
        assert r1 == r2
        np.testing.assert_array_equal(i1, i2)


def test_train_state_save_load_roundtrip(tmp_path):
    import jax

    from dphubert_tpu import wav2vec2_model
    from dphubert_tpu.train.distill_module import DistillConfig, init_train_state
    from dphubert_tpu.train.trainer import load_train_state, save_train_state

    from tests.test_forward_parity import _tiny_w2v2_config

    cfg = _tiny_w2v2_config()
    student = wav2vec2_model(**cfg)
    dcfg = DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)))
    state, _ = init_train_state(
        student=student,
        student_params=student.init(jax.random.key(0)),
        cfg=dcfg,
        teacher_embed_dim=64,
        rng=jax.random.key(1),
    )
    state = state._replace(step=state.step + 41)
    save_train_state(tmp_path / "s.npz", state)

    template, _ = init_train_state(
        student=student,
        student_params=student.init(jax.random.key(9)),
        cfg=dcfg,
        teacher_embed_dim=64,
        rng=jax.random.key(8),
    )
    restored = load_train_state(tmp_path / "s.npz", template)
    assert int(restored.step) == 41
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        jax.random.key_data(state.rng), jax.random.key_data(restored.rng)
    )


def test_resume_through_trainer(tmp_path):
    """trainer.train resumes from last.npz and continues to max_updates,
    preserving params exactly at the resume point."""
    import jax

    from dphubert_tpu import wav2vec2_model
    from dphubert_tpu.train.distill_module import DistillConfig
    from dphubert_tpu.train.trainer import load_train_state, train
    from dphubert_tpu.train.distill_module import init_train_state

    from tests.test_forward_parity import _tiny_w2v2_config

    class FakeLoader:
        def __init__(self, n):
            self.n = n
        def epoch(self, e):
            rng = np.random.default_rng(e)
            for _ in range(self.n):
                yield rng.standard_normal((2, 4000)).astype(np.float32), None

    cfg = _tiny_w2v2_config()
    teacher = wav2vec2_model(**cfg)
    student = wav2vec2_model(**cfg)
    tp = teacher.init(jax.random.key(0))
    sp = student.init(jax.random.key(1))
    dcfg = DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)),
                         warmup_updates=2, max_updates=4)

    exp1 = tmp_path / "a"
    s_full = train(teacher=teacher, teacher_params=tp, student=student,
                   student_params=sp, cfg=dcfg, loader=FakeLoader(10),
                   exp_dir=exp1, log_interval=100, ckpt_interval=2)
    assert int(s_full.step) == 4

    # resume from the step-2 checkpoint written mid-run? last.npz is final;
    # instead: run 2 steps, then resume to 4 and compare against the full run
    exp2 = tmp_path / "b"
    dcfg2 = DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)),
                          warmup_updates=2, max_updates=2)
    s_half = train(teacher=teacher, teacher_params=tp, student=student,
                   student_params=sp, cfg=dcfg2, loader=FakeLoader(10),
                   exp_dir=exp2, log_interval=100, ckpt_interval=100)
    assert int(s_half.step) == 2
    exp3 = tmp_path / "c"
    s_res = train(teacher=teacher, teacher_params=tp, student=student,
                  student_params=sp, cfg=dcfg, loader=FakeLoader(10),
                  exp_dir=exp3, log_interval=100, ckpt_interval=100,
                  resume=str(exp2 / "ckpts" / "last.npz"))
    assert int(s_res.step) == 4


def test_loader_skip_matches_tail():
    """epoch(e, skip=k) must yield exactly the batches an uninterrupted
    epoch(e) yields from position k on — same samples AND same crops (the
    per-batch rng seed is positional, not consumption-order)."""
    from dphubert_tpu.data.loader import DistillDataLoader

    class MemDataset:
        def __init__(self, n):
            rng = np.random.default_rng(0)
            self.len_list = rng.integers(800, 1600, size=n)
            self.waves = [
                rng.standard_normal(l).astype(np.float32) for l in self.len_list
            ]

        def load(self, i):
            return self.waves[i]

    ds = MemDataset(64)
    batcher = StaticShapeBatcher(
        ds.len_list, max_token_count=4000, min_len=400, max_len=1600,
        num_shapes=3, seed=5,
    )
    for workers in (0, 2):
        loader = DistillDataLoader(ds, batcher, num_workers=workers, seed=11)
        full = [w for w, _ in loader.epoch(0)]
        tail = [w for w, _ in loader.epoch(0, skip=3)]
        assert len(tail) == len(full) - 3
        for a, b in zip(full[3:], tail):
            np.testing.assert_array_equal(a, b)


def test_resume_replays_exact_batch_sequence(tmp_path):
    """(train 5, preempt, resume, train 5) consumes exactly the batch
    sequence of an uninterrupted 10-step run — the data position
    (epoch, batch_in_epoch) rides the checkpoint (reference restores
    Lightning's loop state the same way, distill.py:141-144,180-185)."""
    import signal

    import jax

    from dphubert_tpu import wav2vec2_model
    from dphubert_tpu.train.distill_module import DistillConfig
    from dphubert_tpu.train.trainer import train

    from tests.test_forward_parity import _tiny_w2v2_config

    class SeqLoader:
        """4 batches per epoch, each identified by (epoch, index); supports
        the resume ``skip`` protocol and records every batch it serves."""

        def __init__(self, sigterm_after=None):
            self.sigterm_after = sigterm_after
            self.served = []

        def epoch(self, e, skip=0):
            for i in range(skip, 4):
                self.served.append((e, i))
                wave = np.full((2, 4000), 0.01 * (7 * e + i), np.float32)
                if self.sigterm_after is not None and len(self.served) == self.sigterm_after:
                    # lands while the trainer steps on this batch: it
                    # finishes the step, then notices the flag
                    signal.raise_signal(signal.SIGTERM)
                yield wave, None

    cfg = _tiny_w2v2_config()
    teacher = wav2vec2_model(**cfg)
    student = wav2vec2_model(**cfg)
    tp = teacher.init(jax.random.key(0))
    sp = student.init(jax.random.key(1))
    base = dict(teacher=teacher, teacher_params=tp, student=student,
                student_params=sp, log_interval=100, ckpt_interval=100)
    dcfg = DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)),
                         warmup_updates=2, max_updates=10)

    full_loader = SeqLoader()
    s_full = train(cfg=dcfg, exp_dir=tmp_path / "a", loader=full_loader, **base)
    assert int(s_full.step) == 10

    # preempt: SIGTERM lands when batch 5 has been served; the trainer
    # finishes that step, checkpoints (epoch=1, batch_in_epoch=1), exits
    half_loader = SeqLoader(sigterm_after=5)
    s_half = train(cfg=dcfg, exp_dir=tmp_path / "b", loader=half_loader, **base)
    assert int(s_half.step) == 5

    res_loader = SeqLoader()
    s_res = train(cfg=dcfg, exp_dir=tmp_path / "c", loader=res_loader,
                  resume=str(tmp_path / "b" / "ckpts" / "last.npz"), **base)
    assert int(s_res.step) == 10
    # the trainer's device-prefetch pipeline pulls one batch ahead, so each
    # loader may have served one batch beyond what was consumed; compare the
    # CONSUMED sequences (5 + 5 == first 10 of the uninterrupted run)
    assert half_loader.served[:5] == full_loader.served[:5]
    assert res_loader.served[:5] == full_loader.served[5:10]
    # and the resumed state matches the uninterrupted run bitwise
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rss_watchdog_checkpoints_and_stops(tmp_path, monkeypatch):
    """DPHUBERT_MAX_RSS_GB: when host RSS exceeds the limit the trainer
    takes the SIGTERM checkpoint-and-exit path (OOM converted into a clean
    resumable preemption — the remote feed client pins one staging buffer
    per transfer, trainer.py watchdog comment)."""
    import jax

    from dphubert_tpu import wav2vec2_model
    from dphubert_tpu.train.distill_module import DistillConfig
    from dphubert_tpu.train.trainer import train

    from tests.test_forward_parity import _tiny_w2v2_config

    monkeypatch.setenv("DPHUBERT_MAX_RSS_GB", "0.001")

    class FakeLoader:
        def epoch(self, e):
            rng = np.random.default_rng(e)
            for _ in range(300):
                yield rng.standard_normal((2, 4000)).astype(np.float32), None

    cfg = _tiny_w2v2_config()
    teacher = wav2vec2_model(**cfg)
    student = wav2vec2_model(**cfg)
    s = train(teacher=teacher, teacher_params=teacher.init(jax.random.key(0)),
              student=student, student_params=student.init(jax.random.key(1)),
              cfg=DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)),
                                warmup_updates=2, max_updates=250),
              loader=FakeLoader(), exp_dir=tmp_path, log_interval=1000,
              ckpt_interval=1000)
    # first RSS check is at step 100; any real process exceeds 1 MB
    assert int(s.step) == 100
    assert (tmp_path / "ckpts" / "last.npz").exists()
