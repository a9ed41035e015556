"""Trainer-loop features: step-interval validation, final-partial-epoch
validation, the recorded dropout-impl resume guard, and the watchdog's
memory-budget derivation.

The reference validates on Lightning's per-epoch schedule
(``lightning.py:297-304``); at train960 scale one epoch is tens of
thousands of steps, so this trainer adds a ``val_interval`` (steps) knob
and always validates a *completed* run once on its final state.
"""

import jax
import numpy as np
import pytest

from dphubert_tpu import wav2vec2_model
from dphubert_tpu.train.distill_module import DistillConfig
from dphubert_tpu.train.trainer import train

from tests.test_forward_parity import _tiny_w2v2_config


class FakeLoader:
    def __init__(self, n_batches=50, batch=2, length=4000):
        self.n_batches, self.batch, self.length = n_batches, batch, length

    def epoch(self, e, skip=0):
        rng = np.random.default_rng(e)
        for i in range(self.n_batches):
            w = rng.standard_normal((self.batch, self.length)).astype(np.float32)
            if i >= skip:
                yield w, None


def _models():
    cfg = _tiny_w2v2_config()
    teacher = wav2vec2_model(**cfg)
    student = wav2vec2_model(**cfg)
    return (teacher, teacher.init(jax.random.key(0)),
            student, student.init(jax.random.key(1)))


def _cfg(**over):
    kw = dict(use_reg=False, distill_layer_groups=((0,), (1, 3)),
              warmup_updates=2, max_updates=6)
    kw.update(over)
    return DistillConfig(**kw)


def test_val_interval_fires_mid_epoch_and_on_final_state(tmp_path, capsys):
    """With val_interval=2 and a 50-batch epoch, validation must fire at
    steps 2 and 4 (mid-epoch) and once more on the final state of the
    completed run (step 6, mid-epoch) — not only at epoch boundaries."""
    t, tp, s, sp = _models()
    train(teacher=t, teacher_params=tp, student=s, student_params=sp,
          cfg=_cfg(), loader=FakeLoader(), valid_loader=FakeLoader(n_batches=2),
          exp_dir=tmp_path, log_interval=100, ckpt_interval=100,
          val_interval=2)
    out = capsys.readouterr().out
    val_steps = [int(l.split("step=")[1].split()[0])
                 for l in out.splitlines() if l.startswith("[valid]")]
    assert val_steps == [2, 4, 6], out  # interval hits incl. the final step


def test_no_val_interval_still_validates_final_partial_epoch(tmp_path, capsys):
    """Without val_interval, a run that completes mid-epoch still validates
    once at the end (previously: validation never fired in this case)."""
    t, tp, s, sp = _models()
    train(teacher=t, teacher_params=tp, student=s, student_params=sp,
          cfg=_cfg(max_updates=3), loader=FakeLoader(),
          valid_loader=FakeLoader(n_batches=2),
          exp_dir=tmp_path, log_interval=100, ckpt_interval=100)
    out = capsys.readouterr().out
    assert "[valid] step=3" in out, out


def test_preempted_run_skips_validation_and_names_reason(tmp_path, capsys):
    """A preempted (stop_at_step) run must not run the final validation (it
    will resume) and the stop message names the actual reason, not SIGTERM."""
    t, tp, s, sp = _models()
    train(teacher=t, teacher_params=tp, student=s, student_params=sp,
          cfg=_cfg(), loader=FakeLoader(), valid_loader=FakeLoader(n_batches=2),
          exp_dir=tmp_path, log_interval=100, ckpt_interval=100,
          stop_at_step=2)
    out = capsys.readouterr().out
    assert "[valid]" not in out, out
    assert "preempted (stop_at_step)" in out, out


def test_deadline_stop_checkpoints_and_reports(tmp_path, capsys, monkeypatch):
    """DPHUBERT_DEADLINE_TS in the past stops the run at the first step
    boundary with a checkpoint, names the reason, and surfaces
    why='deadline' through stop_info (the CLIs exit 76 on it so the recipe
    driver aborts instead of auto-resuming into the expired deadline)."""
    monkeypatch.setenv("DPHUBERT_DEADLINE_TS", "1")  # 1970: always expired
    t, tp, s, sp = _models()
    stop_info: dict = {}
    state = train(teacher=t, teacher_params=tp, student=s, student_params=sp,
                  cfg=_cfg(), loader=FakeLoader(),
                  valid_loader=FakeLoader(n_batches=2),
                  exp_dir=tmp_path, log_interval=100, ckpt_interval=100,
                  stop_info=stop_info)
    out = capsys.readouterr().out
    assert "preempted (deadline)" in out, out
    assert "[valid]" not in out, out  # preempted runs skip final validation
    assert stop_info["why"] == "deadline"
    assert int(state.step) == 1
    assert (tmp_path / "ckpts" / "last.npz").exists()


def test_completed_run_reports_no_stop_reason(tmp_path):
    """A run that reaches max_updates surfaces why=None through stop_info
    (the CLIs distinguish completion from preemption/deadline by it)."""
    t, tp, s, sp = _models()
    stop_info: dict = {}
    train(teacher=t, teacher_params=tp, student=s, student_params=sp,
          cfg=_cfg(max_updates=2), loader=FakeLoader(), exp_dir=tmp_path,
          log_interval=100, ckpt_interval=100, stop_info=stop_info)
    assert stop_info["why"] is None


def test_rng_impl_resume_mismatch_refused(tmp_path):
    """The checkpoint records the global PRNG impl (it generates every
    dropout mask / gate-noise draw); resuming under a different impl must
    fail loudly instead of silently switching the mask stream.  The
    production recipes pass --rng_impl rbg (measured 6% faster on v5e),
    so a stray default-impl resume of an rbg run is a real hazard."""
    from dphubert_tpu.train.trainer import load_train_meta

    t, tp, s, sp = _models()
    train(teacher=t, teacher_params=tp, student=s, student_params=sp,
          cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path,
          log_interval=100, ckpt_interval=100, stop_at_step=2)
    ckpt = tmp_path / "ckpts" / "last.npz"
    assert ckpt.exists()
    assert load_train_meta(ckpt)["rng_impl"] == "threefry2x32"

    prev = str(jax.config.jax_default_prng_impl)
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        with pytest.raises(ValueError, match="rng_impl"):
            train(teacher=t, teacher_params=tp, student=s, student_params=sp,
                  cfg=_cfg(), loader=FakeLoader(),
                  exp_dir=tmp_path, log_interval=100, ckpt_interval=100,
                  resume=str(ckpt))
    finally:
        jax.config.update("jax_default_prng_impl", prev)

    # same impl resumes fine
    state = train(teacher=t, teacher_params=tp, student=s, student_params=sp,
                  cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path,
                  log_interval=100, ckpt_interval=100, resume=str(ckpt))
    assert int(state.step) == 6


def test_steps_per_dispatch_trains_and_matches_single(tmp_path, capsys):
    """steps_per_dispatch=2 must (a) reach the same step count, (b) log
    every step's metrics at log_interval=1 with finite losses, and (c)
    land numerically on the single-dispatch trajectory (same math, the
    scanned graph only reassociates float ops)."""
    t, tp, s, sp = _models()
    s1 = train(teacher=t, teacher_params=tp, student=s, student_params=sp,
               cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path / "a",
               log_interval=100, ckpt_interval=100)
    capsys.readouterr()
    s2 = train(teacher=t, teacher_params=tp, student=s, student_params=sp,
               cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path / "b",
               log_interval=1, ckpt_interval=100, steps_per_dispatch=2)
    out = capsys.readouterr().out
    assert int(s1.step) == int(s2.step) == 6
    logged = [l for l in out.splitlines() if l.startswith("[train] step=")]
    assert len(logged) == 6, out  # every micro-step logged
    assert all("loss=" in l for l in logged)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_steps_per_dispatch_stops_exactly_at_max_updates(tmp_path):
    """K=4 with max_updates=6: the prefetch-ahead grouper still emits a
    full stack for steps 5-8, but the trainer must consume only 2 of it
    (device-side slices) and stop exactly at 6, with batch_in_epoch
    counting exactly the consumed batches."""
    from dphubert_tpu.train.trainer import load_train_position

    t, tp, s, sp = _models()
    state = train(teacher=t, teacher_params=tp, student=s, student_params=sp,
                  cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path,
                  log_interval=100, ckpt_interval=100, steps_per_dispatch=4)
    assert int(state.step) == 6
    assert load_train_position(tmp_path / "ckpts" / "last.npz") == (0, 6)


def test_steps_per_dispatch_resume_positions(tmp_path):
    """A K=2 run preempted mid-stream checkpoints on a dispatch boundary
    and resumes position-exact to completion."""
    t, tp, s, sp = _models()
    train(teacher=t, teacher_params=tp, student=s, student_params=sp,
          cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path,
          log_interval=100, ckpt_interval=100, steps_per_dispatch=2,
          stop_at_step=3)  # lands on the dispatch boundary at step 4
    ckpt = tmp_path / "ckpts" / "last.npz"
    assert ckpt.exists()
    from dphubert_tpu.train.trainer import load_train_position
    assert load_train_position(ckpt) == (0, 4)

    state = train(teacher=t, teacher_params=tp, student=s, student_params=sp,
                  cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path,
                  log_interval=100, ckpt_interval=100, steps_per_dispatch=2,
                  resume=str(ckpt))
    assert int(state.step) == 6


def test_steps_per_dispatch_resume_mismatch_refused(tmp_path):
    """The batcher's run-of-K grouping reorders the deterministic epoch
    stream, so resuming under a different K would silently skip/duplicate
    batches — the checkpoint records K and a mismatch fails loudly."""
    t, tp, s, sp = _models()
    train(teacher=t, teacher_params=tp, student=s, student_params=sp,
          cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path,
          log_interval=100, ckpt_interval=100, steps_per_dispatch=2,
          stop_at_step=3)
    ckpt = tmp_path / "ckpts" / "last.npz"
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        train(teacher=t, teacher_params=tp, student=s, student_params=sp,
              cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path,
              log_interval=100, ckpt_interval=100, resume=str(ckpt))


def test_pre_metadata_checkpoint_wrong_impl_fails_helpfully(tmp_path):
    """A pre-metadata checkpoint (no recorded rng_impl) resumed under a
    different PRNG impl cannot be caught by the recorded-impl guard — but
    the rng key-shape mismatch must surface as a helpful --rng_impl
    message, not a bare shape error."""
    from dphubert_tpu.train.trainer import save_train_state
    from dphubert_tpu.train.distill_module import init_train_state

    t, tp, s, sp = _models()
    state, _ = init_train_state(student=s, student_params=sp, cfg=_cfg(),
                                teacher_embed_dim=t.spec.embed_dim,
                                rng=jax.random.key(0))
    ckpt = tmp_path / "old.npz"
    save_train_state(ckpt, state)  # meta=None: the pre-metadata format

    prev = str(jax.config.jax_default_prng_impl)
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        with pytest.raises(ValueError, match="--rng_impl"):
            train(teacher=t, teacher_params=tp, student=s, student_params=sp,
                  cfg=_cfg(), loader=FakeLoader(), exp_dir=tmp_path,
                  log_interval=100, ckpt_interval=100, resume=str(ckpt))
    finally:
        jax.config.update("jax_default_prng_impl", prev)


def test_memory_budget_prefers_cgroup_limit(tmp_path, monkeypatch):
    """In a container the OOM killer fires at the cgroup limit, not host
    RAM — the watchdog default must use the smaller of the two."""
    from dphubert_tpu.train import trainer as tr

    budget = tr._memory_budget_bytes()
    assert budget > 0  # host RAM at minimum
    # if a cgroup limit is readable and finite, it must bound the budget
    for p in ("/sys/fs/cgroup/memory.max",
              "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            text = open(p).read().strip()
        except OSError:
            continue
        if text != "max":
            assert budget <= int(text)
