"""Training loop: epochs, device placement, logging, checkpoint/resume.

The runtime equivalent of the reference's ``pl.Trainer`` usage
(``distill.py:37-51``): steps until ``max_updates``, per-step LR schedule,
gradient clipping inside the optimizer, rank-0-style logging, latest-state
checkpointing, and deterministic resume.  Data parallelism is a jit-sharded
batch over the mesh's ``data`` axis instead of DDP processes.
"""

from __future__ import annotations

import json
import logging
import os
import pathlib
import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gates import compile_gates, has_gates
from ..models.model import Wav2Vec2Model
from ..parallel.mesh import batch_sharding, replicate, stacked_batch_sharding
from ..parallel.multihost import global_batch_from_local
from ..params import flatten_params
from .distill_module import (
    DistillConfig,
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from .projections import projections_to_state_dict


class MetricLogger:
    """stdout + JSONL metrics log (the reference logs via Lightning's
    log_dict every ``log_interval`` steps, distill.py:49)."""

    def __init__(self, exp_dir: pathlib.Path, interval: int = 50,
                 enabled: bool = True):
        # rank-aware: only process 0 writes/prints (the reference demotes
        # non-rank-0 loggers to WARNING, distill.py:334-343)
        self.enabled = enabled
        self.interval = interval
        self.path = exp_dir / "metrics.jsonl"
        self._f = open(self.path, "a") if enabled else None
        self._t0 = time.time()
        self._last_step = 0
        self._last_time = self._t0
        self._audio_acc = 0.0

    def log(self, step: int, metrics: dict, audio_seconds: float = 0.0):
        self._audio_acc += audio_seconds
        if not self.enabled or step % self.interval != 0:
            return
        now = time.time()
        dt = now - self._last_time
        row = {
            "step": step,
            "elapsed": round(now - self._t0, 1),
            "steps_per_sec": round((step - self._last_step) / dt, 3) if dt > 0 else 0,
            # the BASELINE.json north-star counter
            "audio_sec_per_sec": round(self._audio_acc / dt, 1) if dt > 0 else 0,
            **{k: float(v) for k, v in metrics.items()},
        }
        self._last_step, self._last_time, self._audio_acc = step, now, 0.0
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        msg = " ".join(
            f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in row.items()
        )
        print(f"[train] {msg}", flush=True)


def save_train_state(path, state: TrainState, *, epoch: int = 0,
                     batch_in_epoch: int = 0, meta: Optional[dict] = None
                     ) -> None:
    """Full-fidelity training-state checkpoint (params + Adam moments +
    step + rng + data position) as a flat npz — resume-exact, torch-free.

    ``epoch``/``batch_in_epoch`` record the deterministic batcher's position
    so a resumed run consumes exactly the batches an uninterrupted run would
    (the reference restores Lightning's epoch/loop state the same way,
    distill.py:141-144,180-185).  ``meta`` records static training config a
    resume must not silently change (e.g. ``rng_impl`` — the PRNG behind
    every dropout mask and gate-noise draw)."""
    from .checkpointing import rng_as_data

    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten(
        state._replace(rng=rng_as_data(state.rng))
    )
    for i, leaf in enumerate(leaves):
        flat[f"leaf_{i}"] = np.asarray(leaf)
    if meta:
        flat["__meta_json__"] = np.asarray(json.dumps(meta))
    np.savez(path, __num_leaves__=np.asarray(len(leaves)),
             __epoch__=np.asarray(epoch),
             __batch_in_epoch__=np.asarray(batch_in_epoch), **flat)


def load_train_position(path) -> tuple:
    """(epoch, batch_in_epoch) recorded in an npz training checkpoint
    (0, 0 for checkpoints written before data-position tracking)."""
    data = np.load(path)
    if "__epoch__" not in data:
        return 0, 0
    return int(data["__epoch__"]), int(data["__batch_in_epoch__"])


def load_train_meta(path) -> dict:
    """Static-config metadata recorded by :func:`save_train_state` ({} for
    checkpoints written before metadata tracking)."""
    data = np.load(path)
    if "__meta_json__" not in data:
        return {}
    return json.loads(str(data["__meta_json__"]))


def _current_rng_impl() -> str:
    """Name of the active global PRNG impl ("threefry2x32" default;
    "rbg" = TPU hardware generator, set via the CLIs' --rng_impl)."""
    return str(jax.config.jax_default_prng_impl)


def _memory_budget_bytes() -> int:
    """Effective memory budget for the RSS watchdog: the smaller of host
    physical RAM and the cgroup limit — in a container the OOM killer fires
    at the cgroup limit, typically far below host RAM."""
    budgets = []
    try:
        budgets.append(os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE"))
    except (ValueError, OSError, AttributeError):
        pass
    for p in ("/sys/fs/cgroup/memory.max",  # cgroup v2
              "/sys/fs/cgroup/memory/memory.limit_in_bytes"):  # cgroup v1
        try:
            text = open(p).read().strip()
            if text != "max":
                budgets.append(int(text))
        except (OSError, ValueError):
            pass
    return min(budgets) if budgets else 0


def load_train_state(path, template: TrainState) -> TrainState:
    """Restore a checkpoint into the template's structure; leaves are placed
    onto the template's shardings (so TP/replicated layouts survive resume)
    by the rule shared with the orbax path
    (``checkpointing._place_restored_leaf``)."""
    from .checkpointing import _place_restored_leaf, _wrap_rng

    data = np.load(path)
    n = int(data["__num_leaves__"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    tmpl_flat, treedef = jax.tree_util.tree_flatten(
        template._replace(rng=jax.random.key_data(template.rng))
    )
    placed = [_place_restored_leaf(leaf, t)
              for leaf, t in zip(leaves, tmpl_flat)]
    state = jax.tree_util.tree_unflatten(treedef, placed)
    return state._replace(rng=_wrap_rng(state.rng, path))


def train(
    *,
    teacher: Wav2Vec2Model,
    teacher_params,
    student: Wav2Vec2Model,
    student_params,
    cfg: DistillConfig,
    loader,
    exp_dir,
    mesh=None,
    valid_loader=None,
    log_interval: int = 50,
    ckpt_interval: int = 1000,
    ckpt_backend: str = "npz",  # "npz" (sync, last-only) | "orbax" (async, rotated)
    ckpt_keep: int = 3,
    resume: Optional[str] = None,
    seed: int = 2022,
    proj_state_dict=None,
    tensor_parallel: bool = False,
    fsdp: bool = False,
    stop_at_step: Optional[int] = None,
    val_interval: Optional[int] = None,
    steps_per_dispatch: int = 1,
    stop_info: Optional[dict] = None,
) -> TrainState:
    """Run stage-1 (use_reg) or stage-2 (final distill) training to
    ``cfg.max_updates``; returns the final state.

    ``steps_per_dispatch=K`` stacks K consecutive same-shape batches into
    one jitted multi-step dispatch (``make_train_step(steps_per_call=K)``):
    one launch and one feed transfer per K steps, which keeps the device
    saturated when the host link is slow (remote/tunneled chips) or the
    host is loaded.  Identical math to K single dispatches modulo float
    reassociation in the differently-compiled graph; pair it with the
    batcher's ``run_length=K`` so same-shape batches actually arrive
    consecutively.  Checkpoint/validation intervals fire on crossing
    (within K-1 steps of the exact multiple)."""
    exp_dir = pathlib.Path(exp_dir)
    K = max(int(steps_per_dispatch), 1)
    is_main = jax.process_index() == 0
    if is_main:
        (exp_dir / "ckpts").mkdir(parents=True, exist_ok=True)
    logger = MetricLogger(exp_dir, log_interval, enabled=is_main)

    state, tx = init_train_state(
        student=student,
        student_params=student_params,
        cfg=cfg,
        teacher_embed_dim=teacher.spec.embed_dim,
        rng=jax.random.key(seed),
    )
    if proj_state_dict is not None:
        # warm-start projections from stage 1 (reference final_distill.py:93)
        from .projections import projections_from_state_dict

        state = state._replace(
            params={
                **state.params,
                "projs": projections_from_state_dict(
                    proj_state_dict, cfg.distill_mode, cfg.distill_layer_groups
                ),
            }
        )
    # Placement must precede resume: load_train_state re-places restored
    # leaves onto this template's shardings, so TP/replicated layouts (and
    # the restored Adam moments) survive.
    if mesh is not None:
        if fsdp:
            # ZeRO-3-style layouts: params, Adam moments, and the frozen
            # teacher all sharded over the data axis (parallel/fsdp.py);
            # composes with the TP model-axis split (HSDP)
            from ..parallel.fsdp import place_fsdp, place_train_params_fsdp

            teacher_params = place_fsdp(mesh, teacher_params)
            params = place_train_params_fsdp(
                student.spec, mesh, state.params,
                tensor_parallel=tensor_parallel,
            )
            # re-init optimizer state so Adam moments inherit the layouts
            state = state._replace(params=params, opt_state=tx.init(params))
        elif tensor_parallel and mesh.shape.get("model", 1) > 1:
            from ..parallel.sharding import place_train_params

            teacher_params = replicate(mesh, teacher_params)
            params = place_train_params(student.spec, mesh, state.params)
            # re-init optimizer state so Adam moments inherit the TP layouts
            state = state._replace(params=params, opt_state=tx.init(params))
        else:
            teacher_params = replicate(mesh, teacher_params)
            state = state._replace(params=replicate(mesh, state.params))
        bsh = batch_sharding(mesh)
    else:
        bsh = None

    ckpt_mgr = None
    if ckpt_backend == "orbax":
        from .checkpointing import AsyncCheckpointer

        # every process participates (orbax coordinates the multi-host
        # commit); rotation keeps the last ``ckpt_keep`` steps
        ckpt_mgr = AsyncCheckpointer(exp_dir / "ckpts" / "orbax", keep=ckpt_keep)

    resume_pos = (0, 0)  # (epoch, batches already consumed in that epoch)
    if resume:
        if pathlib.Path(resume).is_dir():
            from .checkpointing import AsyncCheckpointer

            rdir = pathlib.Path(resume).absolute()
            if ckpt_mgr is not None and rdir == ckpt_mgr.directory:
                mgr = ckpt_mgr
            else:
                mgr = AsyncCheckpointer(rdir, async_save=False)
            restored = mgr.restore_latest(state)
            if restored is None:
                raise FileNotFoundError(f"no checkpoints under {resume}")
            state, resume_pos = restored
            from .checkpointing import check_steps_per_dispatch

            check_steps_per_dispatch(mgr.restored_meta, resume, K)
            if mgr is not ckpt_mgr:
                mgr.close()
        else:
            from .checkpointing import check_rng_impl, check_steps_per_dispatch

            resume_pos = load_train_position(resume)
            # guard BEFORE loading: the recorded PRNG impl generates every
            # dropout mask / gate noise draw of the trained trajectory,
            # and a mismatched impl would fail in load_train_state with a
            # key-shape error instead of this message
            meta = load_train_meta(resume)
            check_rng_impl(meta, resume)
            check_steps_per_dispatch(meta, resume, K)
            state = load_train_state(resume, state)
        print(f"[train] resumed from {resume} at step {int(state.step)} "
              f"(epoch {resume_pos[0]}, batch {resume_pos[1]})")

    # preemption safety: a SIGTERM checkpoints the full training state before
    # exit (the reference relies on manual --resume_checkpoint only)
    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True

    # OOM safety: some accelerator clients pin a host staging buffer per
    # host->device transfer (measured: the remote-attached chip's client
    # leaks exactly the feed bytes, ~6 MB/step, until the OOM killer
    # SIGKILLs the run mid-step and the latest checkpoint is lost).  Watch
    # RSS and convert the impending kill into a clean checkpoint-and-exit
    # the recipe drivers resume from.  DPHUBERT_MAX_RSS_GB overrides the
    # default 85%-of-RAM threshold; 0 disables.
    rss_limit = os.environ.get("DPHUBERT_MAX_RSS_GB")
    if rss_limit is not None:
        rss_limit = int(float(rss_limit) * 1e9)
    else:
        rss_limit = int(_memory_budget_bytes() * 0.85)

    # wall-clock deadline: DPHUBERT_DEADLINE_TS (unix seconds) converts a
    # hard end-of-session time into a clean checkpoint-and-stop — e.g. a
    # time-boxed chip reservation where an overrunning stage would be
    # killed mid-step (losing the since-last-checkpoint progress) or
    # collide with the next reservation's client.  The CLIs exit 76 on
    # this reason (vs 75 for preemption), so run.sh aborts the recipe
    # instead of resuming into the same deadline; resume later with
    # --resume_checkpoint.  0/unset disables.
    deadline_ts = float(os.environ.get("DPHUBERT_DEADLINE_TS", 0) or 0)

    stop_reason = {"why": None}

    rss_last_check = {"step": 0}

    def _rss_exceeded(step: int) -> bool:
        if not rss_limit or step - rss_last_check["step"] < 100:
            return False
        rss_last_check["step"] = step
        try:
            with open("/proc/self/statm") as f:
                rss = int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
        except (OSError, ValueError, IndexError):
            return False
        if rss > rss_limit:
            print(f"[train] rss {rss/1e9:.1f} GB > limit "
                  f"{rss_limit/1e9:.1f} GB: checkpointing and exiting "
                  "(resumable)", flush=True)
            return True
        return False

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # non-main thread
        prev_handler = None

    step_fn = make_train_step(teacher, student, cfg, tx)
    multi_fn = (make_train_step(teacher, student, cfg, tx, steps_per_call=K)
                if K > 1 else None)
    eval_fn = make_eval_step(teacher, student, cfg) if valid_loader else None

    # ``state.step`` counts micro-steps; optimizer updates advance every
    # ``accum_grad`` micro-steps (optax.MultiSteps).  max_updates bounds the
    # number of *updates*, matching the reference (distill.py:240-245).
    accum = max(cfg.accum_grad, 1)
    max_micro_steps = cfg.max_updates * accum
    step = int(state.step)
    epoch, skip = resume_pos
    batch_in_epoch = skip
    done = False
    last_val_step = -1

    # orbax steps are save-once: seed from the directory so a resumed run's
    # SIGTERM/final save cannot collide with a step already on disk
    last_saved = {"step": -1}
    if ckpt_mgr is not None:
        existing = ckpt_mgr.latest_step()
        if existing is not None:
            last_saved["step"] = existing

    def _write_ckpt(ckpt_state, *, step, epoch, batch_in_epoch):
        """Backend write; ``ckpt_state`` may hold device arrays (sync path)
        or an already-host-gathered snapshot (background path)."""
        if ckpt_mgr is not None:
            ckpt_mgr.save(step, ckpt_state, epoch=epoch,
                          batch_in_epoch=batch_in_epoch,
                          rng_impl=_current_rng_impl(),
                          steps_per_dispatch=K)
        else:
            save_train_state(exp_dir / "ckpts" / "last.npz", ckpt_state,
                             epoch=epoch, batch_in_epoch=batch_in_epoch,
                             meta={"rng_impl": _current_rng_impl(),
                                   "steps_per_dispatch": K})

    # background gather: the device->host copy of the full train state
    # (~1 GB at HuBERT-Base scale, 20-50 s through a remote link — r4
    # measured 655 ms/step across the npz crossing window vs 154 clean)
    # moves off the step path: _checkpoint() dispatches a device-side
    # snapshot copy (~ms) and a worker thread gathers + writes while
    # stepping continues.  DPHUBERT_SYNC_CKPT=1 restores the old
    # synchronous behavior (escape hatch).
    participates = (ckpt_mgr is not None) or is_main
    saver = None
    if participates and os.environ.get("DPHUBERT_SYNC_CKPT") != "1":
        from .checkpointing import BackgroundSaver, background_ckpt_fits

        # the snapshot doubles the train state in HBM while training keeps
        # dispatching — states that are a large fraction of device memory
        # (the Large family) stay on the synchronous path
        if background_ckpt_fits(state):
            saver = BackgroundSaver(_write_ckpt)
            # pre-compile the snapshot copy now (remote compile can take
            # ~a minute) so the first checkpoint crossing doesn't pay it
            from .checkpointing import device_snapshot

            jax.block_until_ready(device_snapshot(state))
        else:
            logging.getLogger("dphubert_tpu").info(
                "train state too large for the background checkpoint "
                "snapshot — using synchronous saves")

    def _checkpoint():
        if not participates or step == last_saved["step"]:
            return
        last_saved["step"] = step
        kw = dict(step=step, epoch=epoch, batch_in_epoch=batch_in_epoch)
        if saver is not None:
            saver.submit(state, **kw)
        else:
            _write_ckpt(state, **kw)

    stacked_bsh = stacked_batch_sharding(mesh) if mesh is not None else None

    def _to_device(wave):
        if bsh is not None:
            if wave.ndim == 3:  # (K, local_B, T) stack for one dispatch
                gshape = (wave.shape[0],
                          wave.shape[1] * jax.process_count()) + wave.shape[2:]
                return global_batch_from_local(stacked_bsh, wave, gshape)
            gshape = (wave.shape[0] * jax.process_count(),) + wave.shape[1:]
            return global_batch_from_local(bsh, wave, gshape)
        return jax.device_put(wave)

    def _log_dispatch(prev_step, n, metrics, audio_sec):
        """Per-micro-step logging for an n-step dispatch.  Stacked metrics
        are fetched to host in ONE transfer, and only when a micro-step in
        this dispatch actually hits the log interval — other dispatches
        stay fully async (no device sync between launches)."""
        if n == 1:
            metrics["updates"] = (prev_step + 1) // accum
            logger.log(prev_step + 1, metrics, audio_seconds=audio_sec)
            return
        iv = logger.interval
        need = any((prev_step + 1 + j) % iv == 0 for j in range(n))
        rows = jax.device_get(metrics) if (need and logger.enabled) else None
        share = audio_sec / n
        for j in range(n):
            ms = prev_step + 1 + j
            if rows is not None:
                row = {k: v[j] for k, v in rows.items()}
                row["updates"] = ms // accum
            else:
                row = {}
            logger.log(ms, row, audio_seconds=share)

    while not done:
        epoch_yielded = 0
        for wave, lengths, audio_sec in _device_prefetch(
            _group_iter(_epoch_iter(loader, epoch, skip), K,
                        lambda: max_micro_steps - step),
            _to_device,
        ):
            n = wave.shape[0] if wave.ndim == 3 else 1
            if n > 1 and step + n > max_micro_steps:
                # the grouper's remaining() guard is evaluated one dispatch
                # early (prefetch runs ahead): consume only the micro-steps
                # that fit, stepping device-side slices of the stack, so
                # the run ends exactly at max_updates and batch_in_epoch
                # counts exactly the consumed batches
                need = max_micro_steps - step
                for j in range(need):
                    lj = None if lengths is None else lengths[j]
                    state, metrics = step_fn(state, teacher_params,
                                             (wave[j], lj))
                    epoch_yielded += 1
                    prev_step = step
                    step += 1
                    batch_in_epoch += 1
                    _log_dispatch(prev_step, 1, metrics, audio_sec / n)
                done = True
                break
            epoch_yielded += n
            if n > 1:
                state, metrics = multi_fn(state, teacher_params, (wave, lengths))
            else:
                state, metrics = step_fn(state, teacher_params, (wave, lengths))
            prev_step = step
            step += n
            batch_in_epoch += n
            _log_dispatch(prev_step, n, metrics, audio_sec)
            if step // ckpt_interval > prev_step // ckpt_interval:
                _checkpoint()
            # step-interval validation: at train960 scale one epoch is tens
            # of thousands of steps, so epoch-boundary-only validation would
            # effectively never fire (the reference validates per epoch over
            # a 50-epoch-scale run, lightning.py:297-304)
            if (eval_fn is not None and val_interval
                    and step // val_interval > prev_step // val_interval):
                _run_validation(eval_fn, state, teacher_params, student,
                                valid_loader, bsh, step)
                last_val_step = step
            # ``stop_at_step`` injects a preemption at an exact step (test
            # hook for resume-fidelity: same checkpoint-and-exit path); with
            # K>1 the checkpoint lands on the dispatch boundary >= the mark
            if stop_requested["flag"]:
                stop_reason["why"] = "sigterm"
            elif (stop_at_step is not None
                    and prev_step < stop_at_step <= step):
                stop_reason["why"] = "stop_at_step"
            elif _rss_exceeded(step):
                stop_reason["why"] = "rss watchdog"
            elif deadline_ts and time.time() >= deadline_ts:
                stop_reason["why"] = "deadline"
            if stop_reason["why"]:
                _checkpoint()
                print(f"[train] preempted ({stop_reason['why']}): "
                      f"checkpointed at step {step}, exiting")
                done = True
                break
            if step >= max_micro_steps:
                done = True
                break
        if done:
            break  # keep (epoch, batch_in_epoch) for the final checkpoint
        if epoch_yielded == 0 and skip == 0:
            # an empty epoch with nothing skipped would spin forever: the
            # corpus cannot fill even one global batch (too few samples for
            # batch_size x num_replicas at every rung) — fail loudly
            raise RuntimeError(
                f"loader produced no batches in epoch {epoch}: corpus too "
                "small for the configured seconds_per_batch x data shards"
            )
        if eval_fn is not None:
            _run_validation(eval_fn, state, teacher_params, student, valid_loader, bsh, step)
            last_val_step = step
        epoch += 1
        skip = 0
        batch_in_epoch = 0

    # validate once on the final state of a *completed* run, even when it
    # ends mid-epoch (a preempted run skips this — it will resume)
    if (eval_fn is not None and stop_reason["why"] is None and step > 0
            and last_val_step != step):
        _run_validation(eval_fn, state, teacher_params, student, valid_loader,
                        bsh, step)

    _checkpoint()
    if saver is not None:
        err = saver.close()  # drain the background gather + write
        if err is not None and participates:
            # the FINAL checkpoint has no successor to supersede it —
            # rewrite it synchronously from the live state
            logging.getLogger("dphubert_tpu").warning(
                "final background checkpoint save failed (%s: %s); "
                "rewriting synchronously", type(err).__name__, err)
            _write_ckpt(state, step=step, epoch=epoch,
                        batch_in_epoch=batch_in_epoch)
    if ckpt_mgr is not None:
        ckpt_mgr.close()  # drain pending async writes
    if prev_handler is not None:
        signal.signal(signal.SIGTERM, prev_handler)
    if stop_info is not None:
        stop_info["why"] = stop_reason["why"]
    return state


def _group_iter(it, k: int, remaining):
    """Stack runs of ``k`` consecutive same-shape batches into one
    (k, B, T) feed for a multi-step dispatch; shape changes, epoch tails,
    and the last < k steps before ``remaining()`` runs out flush as
    single batches.  Pair the batcher's ``run_length=k`` with this so
    runs actually form (a plain shuffled epoch interleaves shapes)."""
    if k <= 1:
        yield from it
        return
    pend = []

    def _flush_single(p):
        for w, l in p:
            yield w, l

    for wave, lengths in it:
        if pend and (pend[0][0].shape != wave.shape
                     or (pend[0][1] is None) != (lengths is None)):
            yield from _flush_single(pend)
            pend = []
        pend.append((wave, lengths))
        if len(pend) == k:
            if remaining() < k:  # don't overshoot max_updates
                yield from _flush_single(pend)
            else:
                yield (
                    np.stack([w for w, _ in pend]),
                    (np.stack([l for _, l in pend])
                     if pend[0][1] is not None else None),
                )
            pend = []
    yield from _flush_single(pend)


def _device_prefetch(it, to_device):
    """Run one batch ahead: issue the (async) host->device transfer of
    batch N+1 while the device computes step N, hiding the feed latency.
    On a remote accelerator link the un-overlapped transfer is the
    dominant per-step cost (measured ~2x step time through the relay
    tunnel); on a local PCIe host this is simply free pipelining.
    Yields (device_wave, lengths, local_audio_seconds)."""
    prev = None
    for wave, lengths in it:
        rows = int(np.prod(wave.shape[:-1]))
        audio_sec = rows * jax.process_count() * wave.shape[-1] / 16000
        cur = (to_device(wave), lengths, audio_sec)
        if prev is not None:
            yield prev
        prev = cur
    if prev is not None:
        yield prev


def _epoch_iter(loader, epoch: int, skip: int):
    """loader.epoch with a resume skip; loaders without ``skip`` support
    (e.g. test doubles) fall back to iterate-and-drop."""
    if not skip:
        return loader.epoch(epoch)
    try:
        return loader.epoch(epoch, skip=skip)
    except TypeError:
        it = loader.epoch(epoch)
        for _ in range(skip):
            next(it, None)
        return it


def _run_validation(eval_fn, state, teacher_params, student, valid_loader, bsh, step):
    gates = None
    if has_gates(student.spec):
        # compile_gates fetches only the log_alpha leaves to host (a blanket
        # np.asarray of the student would gather ~380 MB per epoch through a
        # remote accelerator link)
        gates = compile_gates(student.spec, state.params["student"])
        gates = jax.tree.map(jnp.asarray, gates)
    losses = []
    for wave, lengths in valid_loader.epoch(0):
        if bsh is not None:
            # assemble each host's locally-decoded rows into the global
            # sharded batch — a plain device_put of local rows is wrong on a
            # real multi-host slice
            gshape = (wave.shape[0] * jax.process_count(),) + wave.shape[1:]
            wave = global_batch_from_local(bsh, wave, gshape)
        m = eval_fn(state, teacher_params, (wave, lengths), gates)
        # keep the per-batch loss on device: a float() here would force a
        # device->host round trip per validation batch (a full link RTT
        # each through a remote tunnel) — fetch everything once below
        losses.append(m["loss"])
    losses = [float(v) for v in jax.device_get(losses)]
    if jax.process_index() == 0:
        if losses:
            print(f"[valid] step={step} loss={np.mean(losses):.4f} "
                  f"({len(losses)} batches)", flush=True)
        else:
            print(f"[valid] step={step} skipped: validation set too small "
                  "to fill one global batch", flush=True)


def export_student_checkpoint(
    state: TrainState,
    student: Wav2Vec2Model,
    cfg: DistillConfig,
    path,
) -> None:
    """Write the stage output as a portable ``{config, state_dict,
    distill_linear_projs}`` checkpoint consumable by the prune/export CLIs
    (and by the reference's tooling via the .pth format).  Rank-0 only on
    multi-host runs."""
    if jax.process_index() != 0:
        return
    from ..interop.torch_ckpt import save_checkpoint

    sd = flatten_params(jax.tree.map(np.asarray, state.params["student"]))
    projs = projections_to_state_dict(
        jax.tree.map(np.asarray, state.params["projs"]),
        cfg.distill_mode,
        cfg.distill_layer_groups,
    )
    save_checkpoint(path, student.config, sd, projs)
