"""Async orbax checkpointing: resume-exact round trip, rotation, and the
trainer integration (reference keeps checkpoints via Lightning's
ModelCheckpoint, distill.py:34)."""

import numpy as np
import pytest

import jax

from dphubert_tpu import wav2vec2_model
from dphubert_tpu.train.checkpointing import AsyncCheckpointer
from dphubert_tpu.train.distill_module import DistillConfig, init_train_state
from dphubert_tpu.train.trainer import train

from tests.test_forward_parity import _tiny_w2v2_config


def _make_state(seed=0):
    cfg = _tiny_w2v2_config()
    student = wav2vec2_model(**cfg)
    dcfg = DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)))
    state, _ = init_train_state(
        student=student,
        student_params=student.init(jax.random.key(seed)),
        cfg=dcfg,
        teacher_embed_dim=64,
        rng=jax.random.key(seed + 1),
    )
    return state


def test_orbax_roundtrip_exact(tmp_path):
    state = _make_state(0)
    state = state._replace(step=state.step + 17)
    mgr = AsyncCheckpointer(tmp_path / "ck", keep=2)
    mgr.save(17, state, epoch=3, batch_in_epoch=41)
    mgr.wait()

    template = _make_state(9)
    restored, pos = mgr.restore_latest(template)
    mgr.close()
    assert int(restored.step) == 17
    assert pos == (3, 41)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        jax.random.key_data(state.rng), jax.random.key_data(restored.rng)
    )
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_rotation_keeps_last_n(tmp_path):
    state = _make_state(0)
    mgr = AsyncCheckpointer(tmp_path / "ck", keep=2)
    for s in (1, 2, 3, 4, 5):
        mgr.save(s, state._replace(step=state.step * 0 + s))
    mgr.wait()
    steps = sorted(mgr.manager.all_steps())
    assert steps == [4, 5]
    assert mgr.latest_step() == 5
    mgr.close()


def test_orbax_rng_impl_mismatch_refused(tmp_path):
    """An orbax checkpoint written under threefry must refuse a templated
    restore under rbg with the recorded-impl message — not a key-shape
    error (the template's rng key data wouldn't even match: 2 uint32
    words vs 4)."""
    state = _make_state(0)
    mgr = AsyncCheckpointer(tmp_path / "ck", keep=2)
    mgr.save(3, state, rng_impl="threefry2x32")
    mgr.wait()

    prev = str(jax.config.jax_default_prng_impl)
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        template = _make_state(9)  # rbg-keyed template
        with pytest.raises(ValueError, match="rng_impl"):
            mgr.restore_latest(template)
    finally:
        jax.config.update("jax_default_prng_impl", prev)
        mgr.close()


def test_device_snapshot_survives_donation():
    """The background checkpointer's device snapshot must be a REAL copy:
    after the original state is donated into (and overwritten by) further
    train steps, the snapshot still reads back the values it captured —
    a buffer-aliasing 'copy' (identity/param-forwarding) would be
    clobbered by the donation."""
    import jax.numpy as jnp

    from dphubert_tpu.train.checkpointing import device_snapshot

    state = _make_state(0)
    before = [np.array(x) for x in jax.tree.leaves(
        state._replace(rng=jax.random.key_data(state.rng)))]
    snap = device_snapshot(state)

    bump = jax.jit(
        lambda t: jax.tree.map(
            lambda a: a + jnp.ones((), a.dtype) if jnp.issubdtype(
                a.dtype, jnp.number) else a, t),
        donate_argnums=0,
    )
    mutated = bump(state._replace(rng=jax.random.key_data(state.rng)))
    jax.block_until_ready(mutated)

    after = [np.array(x) for x in jax.tree.leaves(snap)]
    assert len(before) == len(after)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)


def test_background_saver_captures_submit_time_state(tmp_path):
    """BackgroundSaver.submit returns before the device->host gather; the
    host tree handed to save_fn must still be the state AT SUBMIT TIME,
    bitwise, even though training keeps donating/overwriting the live
    state afterwards — and worker exceptions surface at close()."""
    import jax.numpy as jnp

    from dphubert_tpu.train.checkpointing import BackgroundSaver

    recorded = {}

    def save_fn(host_state, *, step):
        recorded[step] = [np.array(x) for x in jax.tree.leaves(host_state)]

    bump = jax.jit(
        lambda t: jax.tree.map(
            lambda a: a + jnp.ones((), a.dtype) if jnp.issubdtype(
                a.dtype, jnp.number) else a, t),
        donate_argnums=0,
    )

    state = _make_state(0)
    expected = {}
    saver = BackgroundSaver(save_fn)
    for s in (1, 2):
        expected[s] = [np.array(x) for x in jax.tree.leaves(
            state._replace(rng=jax.random.key_data(state.rng)))]
        saver.submit(state, step=s)
        raw = bump(state._replace(rng=jax.random.key_data(state.rng)))
        state = state._replace(
            **{k: v for k, v in raw._asdict().items() if k != "rng"},
            rng=jax.random.wrap_key_data(raw.rng),
        )
    saver.close()

    assert sorted(recorded) == [1, 2]
    for s in (1, 2):
        assert len(recorded[s]) == len(expected[s])
        for a, b in zip(expected[s], recorded[s]):
            np.testing.assert_array_equal(a, b)

def test_background_saver_degrades_to_sync_on_worker_failure():
    """A failed background save must NOT kill a multi-hour run: the next
    submit degrades to a synchronous save from the live state (so every
    later checkpoint still lands), and close() reports a failure of the
    LAST save so the trainer can rewrite the final checkpoint."""
    from dphubert_tpu.train.checkpointing import BackgroundSaver

    calls = {"n": 0, "steps": []}

    def flaky(host_state, *, step):
        calls["n"] += 1
        calls["steps"].append(step)
        if calls["n"] == 1:
            raise MemoryError("simulated RESOURCE_EXHAUSTED")

    saver = BackgroundSaver(flaky)
    saver.submit(_make_state(0), step=1)   # background; worker fails
    saver.submit(_make_state(0), step=2)   # detects failure -> sync save
    assert saver._degraded
    saver.submit(_make_state(0), step=3)   # stays sync
    assert saver.close() is None           # failure was already handled
    assert calls["steps"] == [1, 2, 3]

    # a failure of the FINAL save surfaces from close() for a sync rewrite
    failing = BackgroundSaver(lambda host_state, **kw: 1 / 0)
    failing.submit(_make_state(1), step=7)
    err = failing.close()
    assert isinstance(err, ZeroDivisionError)


def test_paced_gather_matches_flood_gather():
    """Leaf-serial paced gather and flood-enqueue gather must hand the
    writer identical host trees (pacing only changes transfer scheduling)."""
    from dphubert_tpu.train import checkpointing as ck

    snap = ck.device_snapshot(_make_state(3))
    paced = ck._paced_gather(snap, pace_mbps=1000.0)
    flood = ck._paced_gather(snap, pace_mbps=0.0)
    a, b = jax.tree.leaves(paced), jax.tree.leaves(flood)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_background_ckpt_size_gate(monkeypatch):
    """States a large fraction of device memory stay on the sync path."""
    from dphubert_tpu.train import checkpointing as ck

    small = _make_state(0)
    assert ck.background_ckpt_fits(small)

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 16 * 1024**3}

    # 15% of 16 GiB = 2.4 GiB; fake a leaf above it via nbytes
    class BigLeaf:
        nbytes = 3 * 1024**3
    assert not ck.background_ckpt_fits([BigLeaf()], device=FakeDev())
    assert ck.background_ckpt_fits([BigLeaf()], device=FakeDev()) is False

    monkeypatch.setenv("DPHUBERT_BG_CKPT", "1")
    assert ck.background_ckpt_fits([BigLeaf()], device=FakeDev())
    monkeypatch.setenv("DPHUBERT_BG_CKPT", "0")
    assert not ck.background_ckpt_fits(small)


def test_steps_per_dispatch_missing_metadata_treated_as_one():
    """Pre-metadata checkpoints were all written by K=1 trainers: resuming
    one under K>1 must fail loudly (the batcher's run-of-K grouping
    reorders the epoch stream), while K=1 passes."""
    from dphubert_tpu.train.checkpointing import check_steps_per_dispatch

    check_steps_per_dispatch({}, "old.npz", 1)  # ok
    with pytest.raises(ValueError, match="steps_per_dispatch=1"):
        check_steps_per_dispatch({}, "old.npz", 4)


def test_unknown_rng_impl_refused_at_save_time(tmp_path):
    """An impl outside the known code table must fail at SAVE time — it
    would otherwise encode as -1, decode to None, and silently disarm the
    resume guard."""
    state = _make_state(0)
    mgr = AsyncCheckpointer(tmp_path / "ck", keep=1)
    try:
        with pytest.raises(ValueError, match="rng_impl"):
            mgr.save(1, state, rng_impl="some_future_impl")
    finally:
        mgr.close()


def test_trainer_orbax_preempt_resume_exact(tmp_path):
    """Preemption-style resume: SIGTERM after 2 steps checkpoints through
    the orbax backend; resuming from the directory under the SAME config
    lands bitwise on the uninterrupted run's state.  (The config must be
    identical: a run with max_updates=2 would have a different LR decay
    boundary and legitimately diverge at its final update.)"""
    import signal

    class ConstLoader:
        """Same batch at every step so the resumed run sees the identical
        data stream as the uninterrupted one (loader position is not part
        of the checkpoint, matching the reference's resume semantics)."""

        def __init__(self, n, sigterm_after=None):
            self.n = n
            self.sigterm_after = sigterm_after
            self.batch = (
                np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)
            )

        def epoch(self, e):
            for i in range(self.n):
                yield self.batch, None
                if self.sigterm_after is not None and i + 1 == self.sigterm_after:
                    signal.raise_signal(signal.SIGTERM)

    cfg = _tiny_w2v2_config()
    teacher = wav2vec2_model(**cfg)
    student = wav2vec2_model(**cfg)
    tp = teacher.init(jax.random.key(0))
    sp = student.init(jax.random.key(1))
    base = dict(teacher=teacher, teacher_params=tp, student=student,
                student_params=sp, log_interval=100)
    dcfg = DistillConfig(use_reg=False, distill_layer_groups=((0,), (1, 3)),
                         warmup_updates=2, max_updates=4)

    s_full = train(cfg=dcfg, exp_dir=tmp_path / "a", ckpt_interval=100,
                   loader=ConstLoader(10), **base)
    assert int(s_full.step) == 4

    # preempted at step 2; the SIGTERM handler checkpoints via orbax
    s_half = train(cfg=dcfg, exp_dir=tmp_path / "b", ckpt_interval=100,
                   ckpt_backend="orbax", ckpt_keep=2,
                   loader=ConstLoader(10, sigterm_after=2), **base)
    # the signal lands while the device-prefetch generator pulls batch 3
    # (during step 2's compute), so the trainer notices it right after
    # completing step 2
    assert int(s_half.step) == 2

    s_res = train(cfg=dcfg, exp_dir=tmp_path / "c", ckpt_interval=100,
                  resume=str(tmp_path / "b" / "ckpts" / "orbax"),
                  loader=ConstLoader(10), **base)
    assert int(s_res.step) == 4
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_full.opt_state), jax.tree.leaves(s_res.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
