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


def _to_pytree(state: TrainState, epoch: int = 0, batch_in_epoch: int = 0,
               rng_impl: str = "threefry2x32", steps_per_dispatch: int = 1):
    tree = state._replace(rng=jax.random.key_data(state.rng))._asdict()
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
    never.  Pre-metadata checkpoints carry no record and pass."""
    recorded = meta.get("steps_per_dispatch")
    if recorded is not None and int(recorded) != int(configured):
        raise ValueError(
            f"checkpoint {source} was trained with "
            f"steps_per_dispatch={int(recorded)} but this run configures "
            f"{int(configured)}; pass --steps_per_dispatch {int(recorded)}"
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
        reverse-introduction order, then no data_pos at all — and finally
        an untemplated raw restore (e.g. when the stored rng key data has
        a different PRNG impl's shape, so no template matches and
        ``_from_pytree`` can surface the clean impl-mismatch error)."""
        full = _to_pytree(template)
        candidates = [full]
        pos_keys = dict(full["data_pos"])
        for newest in ("steps_per_dispatch", "rng_impl"):
            pos_keys = {k: v for k, v in pos_keys.items() if k != newest}
            candidates.append({**full, "data_pos": dict(pos_keys)})
        candidates.append({k: v for k, v in full.items() if k != "data_pos"})

        tree = None
        for tmpl in candidates:
            try:
                tree = self.manager.restore(
                    int(step), args=self._ocp.args.StandardRestore(tmpl)
                )
                tree = jax.tree.map(_place_restored_leaf, tree, tmpl)
                break
            except (KeyError, ValueError):
                continue
        if tree is None:
            tree = self.manager.restore(int(step))
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
