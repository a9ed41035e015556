"""Async training-state checkpointing with rotation (orbax-backed).

The reference keeps checkpoints via Lightning's ``ModelCheckpoint``
(``distill.py:34``: save_last + topk).  Here the equivalent is an
``orbax.checkpoint.CheckpointManager``:

* **async**: the device->host gather happens at ``save()`` but the disk
  write runs on a background thread — the training loop does not stall for
  serialization (the synchronous npz path stalls ~seconds at HuBERT-Base
  scale).
* **rotation**: ``keep`` most recent steps are retained, older ones are
  garbage-collected.
* **multi-host**: orbax coordinates the barrier/commit protocol across
  processes (each process writes the shards it owns; the directory commit
  is atomic), which the shared-FS npz path cannot do safely.

``TrainState`` contains a typed PRNG key; it is carried as raw key data
(the same trick as the npz path) so the checkpoint stays a plain array
pytree.
"""

from __future__ import annotations

import pathlib
import queue
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .distill_module import TrainState


# static-config codes carried inside the checkpoint (orbax stores array
# pytrees, so strings travel as small int codes).  The PRNG impl is part
# of the trained trajectory (it generates every dropout mask / gate
# noise draw), so a resume under a different impl must fail loudly.
_RNG_IMPL_CODES = {"threefry2x32": 0, "rbg": 1, "unsafe_rbg": 2}
_RNG_IMPL_NAMES = {v: k for k, v in _RNG_IMPL_CODES.items()}


def rng_as_data(rng):
    """Typed PRNG key -> raw key-data array; raw key data passes through
    (checkpoint trees carry keys as plain uint32 arrays, and snapshot /
    host-gathered states arrive with the conversion already applied)."""
    dtype = getattr(rng, "dtype", None)
    if dtype is not None and jax.dtypes.issubdtype(dtype, jax.dtypes.prng_key):
        return jax.random.key_data(rng)
    return rng


def _to_pytree(state: TrainState, epoch: int = 0, batch_in_epoch: int = 0,
               rng_impl: str = "threefry2x32", steps_per_dispatch: int = 1):
    if rng_impl not in _RNG_IMPL_CODES:
        # an un-encodable impl would decode to None and silently disarm the
        # resume guard — refuse at save time instead
        raise ValueError(
            f"cannot encode rng_impl {rng_impl!r} into the checkpoint "
            f"(known: {sorted(_RNG_IMPL_CODES)}); extend _RNG_IMPL_CODES"
        )
    tree = state._replace(rng=rng_as_data(state.rng))._asdict()
    # deterministic-batcher position: lets resume skip already-consumed
    # batches so the sample stream matches an uninterrupted run
    tree["data_pos"] = {
        "epoch": np.asarray(epoch, np.int32),
        "batch_in_epoch": np.asarray(batch_in_epoch, np.int32),
        "rng_impl": np.asarray(
            _RNG_IMPL_CODES.get(rng_impl, -1), np.int32
        ),
        # the dispatch grouping (batcher run_length) reorders the epoch's
        # deterministic batch stream, so a resume under a different K
        # would silently skip/duplicate batches — recorded and guarded
        # like rng_impl
        "steps_per_dispatch": np.asarray(steps_per_dispatch, np.int32),
    }
    return tree


def check_rng_impl(meta: dict, source) -> None:
    """Refuse to continue a run under a different PRNG impl than it was
    checkpointed with: the impl generates every dropout mask / gate-noise
    draw of the trained trajectory (and the key data aren't even
    shape-compatible across impls — threefry2x32 keys are 2 uint32 words,
    rbg keys 4).  Pre-metadata checkpoints carry no record and pass."""
    recorded = meta.get("rng_impl")
    current = str(jax.config.jax_default_prng_impl)
    if recorded is not None and recorded != current:
        raise ValueError(
            f"checkpoint {source} was trained with rng_impl={recorded!r} "
            f"but this run uses {current!r}; pass --rng_impl {recorded}"
        )


def check_steps_per_dispatch(meta: dict, source, configured: int) -> None:
    """Refuse a resume under a different ``steps_per_dispatch`` than the
    run was checkpointed with: the batcher's run-of-K grouping reorders
    the deterministic epoch stream, so skipping ``batch_in_epoch`` batches
    of a *differently ordered* epoch trains some batches twice and others
    never.  Checkpoints that predate this metadata were all written by
    K=1 trainers, so a missing record is treated as 1 — resuming one
    under K>1 fails loudly instead of silently training a reordered
    epoch."""
    recorded = int(meta.get("steps_per_dispatch", 1))
    if recorded != int(configured):
        raise ValueError(
            f"checkpoint {source} was trained with "
            f"steps_per_dispatch={recorded} but this run configures "
            f"{int(configured)}; pass --steps_per_dispatch {recorded}"
        )


def _wrap_rng(data, source):
    """wrap_key_data with a helpful error: key data shapes differ across
    PRNG impls (threefry2x32 = 2 uint32 words, rbg = 4), so a pre-metadata
    checkpoint resumed under the wrong --rng_impl would otherwise die with
    a bare shape error."""
    data = jnp.asarray(data)
    try:
        return jax.random.wrap_key_data(data)
    except (ValueError, TypeError) as e:
        impl = str(jax.config.jax_default_prng_impl)
        raise ValueError(
            f"checkpoint {source}: stored rng key data has shape "
            f"{tuple(data.shape)}, which does not fit this run's PRNG impl "
            f"{impl!r} — the checkpoint predates impl metadata and was "
            "written under a different --rng_impl (threefry2x32 keys are 2 "
            "uint32 words, rbg keys 4); rerun with the matching --rng_impl"
        ) from e


def _as_host(leaf):
    if isinstance(leaf, jax.Array) and leaf.sharding.is_fully_addressable:
        return np.asarray(leaf)
    return leaf


def _place_restored_leaf(leaf, t):
    """Shared placement rule for restored checkpoint leaves (npz AND orbax
    paths — one invariant, one implementation): mesh-placed template
    leaves (NamedSharding) get the restored data placed on that sharding;
    host-local template leaves (step, rng, optimizer counters created
    eagerly outside the mesh) stay *uncommitted* host arrays — committing
    them to one device while params span the mesh makes jit reject the
    mixed placement."""
    from jax.sharding import NamedSharding

    if not (isinstance(t, jax.Array) and hasattr(t, "sharding")):
        return leaf
    if (isinstance(leaf, jax.Array)
            and isinstance(t.sharding, NamedSharding)
            and leaf.sharding == t.sharding):
        return leaf  # orbax already restored onto the template sharding
    if jax.process_count() > 1:
        if not t.sharding.is_fully_addressable:
            # device_put cannot target non-addressable devices; every host
            # has the full leaf (shared-FS npz), so hand each addressable
            # device its slice — correct for replicated AND sharded layouts
            full = np.asarray(leaf)
            return jax.make_array_from_callback(
                t.shape, t.sharding, lambda idx: full[idx]
            )
        return _as_host(leaf)
    if isinstance(t.sharding, NamedSharding):
        return jax.device_put(leaf, t.sharding)
    return _as_host(leaf)


def _from_pytree(tree, source="checkpoint"
                 ) -> Tuple[TrainState, Tuple[int, int], dict]:
    pos = tree.pop("data_pos", None)
    meta = {}
    if pos is not None and "rng_impl" in pos:
        meta["rng_impl"] = _RNG_IMPL_NAMES.get(int(pos["rng_impl"]))
    if pos is not None and "steps_per_dispatch" in pos:
        meta["steps_per_dispatch"] = int(pos["steps_per_dispatch"])
    # guard BEFORE reconstructing the state: wrap_key_data on a
    # mismatched impl fails with a shape error instead of this message
    check_rng_impl(meta, source)
    state = TrainState(**tree)
    state = state._replace(rng=_wrap_rng(state.rng, source))
    if pos is None:
        return state, (0, 0), {}
    return state, (int(pos["epoch"]), int(pos["batch_in_epoch"])), meta


class AsyncCheckpointer:
    """keep-last-N async checkpoint manager over a directory.

    save(step, state) enqueues an async save; restore_latest(template)
    returns the newest step placed on the template's shardings; close()
    drains pending writes.
    """

    def __init__(self, directory, keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = pathlib.Path(directory).absolute()
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            enable_async_checkpointing=async_save,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)
        # static-config metadata recovered by the most recent restore()
        # ({} until a restore runs, or for pre-metadata checkpoints)
        self.restored_meta: dict = {}

    def save(self, step: int, state: TrainState, *, epoch: int = 0,
             batch_in_epoch: int = 0,
             rng_impl: str = "threefry2x32",
             steps_per_dispatch: int = 1) -> None:
        self.manager.save(
            int(step),
            args=self._ocp.args.StandardSave(
                _to_pytree(state, epoch, batch_in_epoch, rng_impl,
                           steps_per_dispatch)
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: int, template: TrainState
                ) -> Tuple[TrainState, Tuple[int, int]]:
        """Returns (state, (epoch, batch_in_epoch)).  Checkpoints written
        before data-position tracking restore with position (0, 0); any
        recorded static-config metadata lands in ``self.restored_meta``.

        Older checkpoint formats are handled by trying a template per
        format generation — current, then each metadata key stripped in
        reverse-introduction order, then no data_pos at all.  If every
        templated restore fails, an untemplated raw restore runs ONLY to
        surface a clean rng-impl-mismatch diagnostic (a mismatched impl's
        key data has a different shape, so no template can match); when
        the raw metadata shows no mismatch the last templated error was
        the real problem and is re-raised — the raw tree itself is never
        returned (it has no sharding placement and a plain-dict opt_state,
        which would crash confusingly at the first optimizer update)."""
        full = _to_pytree(template)
        candidates = [full]
        pos_keys = dict(full["data_pos"])
        for newest in ("steps_per_dispatch", "rng_impl"):
            pos_keys = {k: v for k, v in pos_keys.items() if k != newest}
            candidates.append({**full, "data_pos": dict(pos_keys)})
        candidates.append({k: v for k, v in full.items() if k != "data_pos"})

        tree = None
        last_exc: Optional[Exception] = None
        for tmpl in candidates:
            try:
                tree = self.manager.restore(
                    int(step), args=self._ocp.args.StandardRestore(tmpl)
                )
                tree = jax.tree.map(_place_restored_leaf, tree, tmpl)
                break
            except (KeyError, ValueError) as e:
                last_exc = e
                continue
        if tree is None:
            raw = self.manager.restore(int(step))
            pos = raw.get("data_pos") if isinstance(raw, dict) else None
            meta = {}
            if pos is not None and "rng_impl" in pos:
                meta["rng_impl"] = _RNG_IMPL_NAMES.get(int(pos["rng_impl"]))
            check_rng_impl(meta, self.directory)  # the clean diagnostic
            raise last_exc  # no impl mismatch: surface the templated error
        state, pos, self.restored_meta = _from_pytree(
            tree, source=self.directory
        )
        return state, pos

    def restore_latest(self, template: TrainState
                       ) -> Optional[Tuple[TrainState, Tuple[int, int]]]:
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, template)

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self.manager.close()


def _forced_copy(x):
    """A copy op XLA cannot elide into parameter forwarding: bitcast to the
    matching integer type, add an optimization-barrier-hidden zero, bitcast
    back — bit-exact for every dtype (a plain ``x + 0.0`` would canonicalize
    -0.0, and a bare identity/``jnp.copy`` may alias the input buffer, which
    the next train step then clobbers via donation)."""
    if not isinstance(x, jax.Array) and not hasattr(x, "dtype"):
        return x
    dtype = jnp.asarray(x).dtype if not hasattr(x, "dtype") else x.dtype
    if jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_:
        bits, back = x.astype(jnp.int32) if dtype == jnp.bool_ else x, dtype
        out = bits + jax.lax.optimization_barrier(
            jnp.zeros((), bits.dtype if hasattr(bits, "dtype") else jnp.int32))
        return out.astype(back) if dtype == jnp.bool_ else out
    itemsize = jnp.dtype(dtype).itemsize
    uint = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint64}[itemsize]
    bits = jax.lax.bitcast_convert_type(x, uint)
    bits = bits + jax.lax.optimization_barrier(jnp.zeros((), uint))
    return jax.lax.bitcast_convert_type(bits, dtype)


_snapshot_fn = None


def device_snapshot(state: TrainState) -> TrainState:
    """On-device copy of the full train state (rng carried as raw key
    data): ONE jitted dispatch whose output buffers never alias the
    inputs, so the snapshot stays valid while subsequent train steps
    donate-and-overwrite ``state``.  Cost is one HBM read+write pass
    (~milliseconds at GB scale) instead of the multi-second device->host
    gather — the gather moves to a background thread
    (:class:`BackgroundSaver`)."""
    global _snapshot_fn
    if _snapshot_fn is None:
        _snapshot_fn = jax.jit(
            lambda tree: jax.tree.map(_forced_copy, tree))
    return _snapshot_fn(state._replace(rng=rng_as_data(state.rng)))


def _paced_gather(snap, pace_mbps: Optional[float] = None):
    """Gather a device snapshot to host WITHOUT starving the training feed.

    Through a shared device link (the axon relay tunnel, but equally a
    congested PCIe/ICI path), enqueueing every leaf's D2H at once puts the
    whole ~1 GB train state AHEAD of the training loop's per-dispatch feed
    uploads — each feed then waits behind the entire remaining gather and
    the 'background' save stalls stepping almost 1:1 (measured r5: ~40 s of
    excess per checkpoint, i.e. state-bytes / link-bandwidth).  Gathering
    **leaf-serially** bounds a feed's wait to one in-flight leaf (~10 MB),
    and pacing sleeps between leaves yield the link so concurrent feeds run
    at full rate.

    Measured head-to-head on the r5 WavLM stage-1 run (single-vCPU host,
    relay tunnel): flood ≈ 30-50 s of excess step time per checkpoint;
    paced 30 MB/s ≈ 70-160 s and growing — the sleeps stretch the save
    window into overlap with the (CPU-bound) checkpoint write, and on one
    core the bottleneck is host CPU, not link scheduling.  Default is
    therefore **flood** (pace 0); set ``DPHUBERT_BG_GATHER_PACE_MBPS`` to
    a positive rate on multi-core hosts whose link genuinely starves the
    feed."""
    import os
    import time

    if pace_mbps is None:
        pace_mbps = float(os.environ.get("DPHUBERT_BG_GATHER_PACE_MBPS", 0))
    if pace_mbps <= 0:
        for leaf in jax.tree.leaves(snap):
            if (isinstance(leaf, jax.Array)
                    and leaf.sharding.is_fully_addressable):
                leaf.copy_to_host_async()
        return jax.tree.map(_as_host, snap)

    def gather_one(leaf):
        if not (isinstance(leaf, jax.Array)
                and leaf.sharding.is_fully_addressable):
            return leaf
        leaf.copy_to_host_async()
        host = np.asarray(leaf)
        time.sleep(host.nbytes / (pace_mbps * 1e6))
        return host

    return jax.tree.map(gather_one, snap)


def background_ckpt_fits(state, *, device=None) -> bool:
    """Whether the background-gather path is safe for this train state:
    the device snapshot holds ONE extra full copy of the state in HBM
    while training keeps dispatching, so a state that is a large fraction
    of the chip's memory must stay on the synchronous path (measured: the
    ~3.8 GB wav2vec2-Large state's snapshot+gather dies with
    RESOURCE_EXHAUSTED mid-run on a 16 GB chip; the ~1.1 GB Base states
    are fine).  Budget: snapshot bytes <= 15% of the device memory limit
    (falls back to a 2 GiB cap when the backend reports no limit).
    ``DPHUBERT_BG_CKPT=1/0`` force-overrides."""
    import os

    force = os.environ.get("DPHUBERT_BG_CKPT")
    if force is not None:
        return force != "0"
    nbytes = sum(
        leaf.nbytes for leaf in jax.tree.leaves(state)
        if hasattr(leaf, "nbytes")
    )
    limit = None
    try:
        stats = (device or jax.devices()[0]).memory_stats()
        limit = (stats or {}).get("bytes_limit")
    except Exception:  # noqa: BLE001 — backend may not expose stats
        limit = None
    budget = int(limit * 0.15) if limit else 2 * 1024**3
    return nbytes <= budget


class BackgroundSaver:
    """Takes the checkpoint device->host gather off the training step path.

    ``submit(state, **kw)`` dispatches the device-side snapshot copy (one
    jitted launch) and returns immediately; a worker thread gathers the
    snapshot to host — concurrent with the training dispatches that follow
    — and hands the host pytree to ``save_fn(host_state, **kw)``.  One
    save is in flight at a time: a submit while the previous write is
    still running blocks until it lands (graceful fallback to the old
    synchronous behavior if checkpoints ever outpace the writer), which
    also bounds the snapshot HBM overhead to one extra train state.

    A worker failure (e.g. RESOURCE_EXHAUSTED gathering the snapshot under
    memory pressure) must not kill a multi-hour run: the failed step's
    checkpoint is lost (superseded by the next), a loud warning is logged,
    and the saver **degrades to synchronous saves** from the live state for
    the rest of the run.  ``close()`` returns the failure (or None) instead
    of raising so the trainer can rewrite the *final* checkpoint
    synchronously — the one save that has no successor to supersede it."""

    def __init__(self, save_fn):
        self._save_fn = save_fn
        self._q: queue.Queue = queue.Queue()
        self._slot = threading.Semaphore(1)
        self._exc: Optional[BaseException] = None
        self._degraded = False
        self._thread = threading.Thread(
            target=self._worker, daemon=True, name="ckpt-saver")
        self._thread.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            snap, kwargs = item
            try:
                host = _paced_gather(snap)
                del snap, item
                self._save_fn(host, **kwargs)
            except BaseException as e:  # noqa: BLE001 — handled on main
                self._exc = e
            finally:
                self._slot.release()

    def _take_exc(self) -> Optional[BaseException]:
        exc, self._exc = self._exc, None
        return exc

    def _warn_degrade(self, exc: BaseException, when: str) -> None:
        import logging

        logging.getLogger("dphubert_tpu").warning(
            "background checkpoint save failed %s (%s: %s); that step's "
            "checkpoint is lost — degrading to synchronous saves for the "
            "rest of the run", when, type(exc).__name__, exc)
        self._degraded = True

    def submit(self, state: TrainState, **kwargs) -> None:
        if self._degraded:
            self._save_fn(state, **kwargs)
            return
        self._slot.acquire()  # wait out an in-flight save, if any
        prev = self._take_exc()
        if prev is not None:
            self._slot.release()
            self._warn_degrade(prev, "in the gather worker")
            self._save_fn(state, **kwargs)
            return
        try:
            snap = device_snapshot(state)
        except BaseException as e:  # noqa: BLE001 — degrade, don't kill
            self._slot.release()
            self._warn_degrade(e, "dispatching the device snapshot")
            self._save_fn(state, **kwargs)
            return
        self._q.put((snap, kwargs))

    def close(self) -> Optional[BaseException]:
        """Drain the in-flight save and stop the worker.  Returns the
        pending failure (if the LAST background save died) so the caller
        can rewrite the final checkpoint synchronously; returns None when
        everything landed."""
        self._slot.acquire()  # drain the in-flight save
        self._q.put(None)
        self._thread.join()
        return self._take_exc()
