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
               rng_impl: str = "threefry2x32"):
    tree = state._replace(rng=jax.random.key_data(state.rng))._asdict()
    # deterministic-batcher position: lets resume skip already-consumed
    # batches so the sample stream matches an uninterrupted run
    tree["data_pos"] = {
        "epoch": np.asarray(epoch, np.int32),
        "batch_in_epoch": np.asarray(batch_in_epoch, np.int32),
        "rng_impl": np.asarray(
            _RNG_IMPL_CODES.get(rng_impl, -1), np.int32
        ),
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


def _from_pytree(tree, source="checkpoint"
                 ) -> Tuple[TrainState, Tuple[int, int], dict]:
    pos = tree.pop("data_pos", None)
    meta = {}
    if pos is not None and "rng_impl" in pos:
        meta["rng_impl"] = _RNG_IMPL_NAMES.get(int(pos["rng_impl"]))
    # guard BEFORE reconstructing the state: wrap_key_data on a
    # mismatched impl fails with a shape error instead of this message
    check_rng_impl(meta, source)
    state = TrainState(**tree)
    state = state._replace(rng=jax.random.wrap_key_data(jnp.asarray(state.rng)))
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
             rng_impl: str = "threefry2x32") -> None:
        self.manager.save(
            int(step),
            args=self._ocp.args.StandardSave(
                _to_pytree(state, epoch, batch_in_epoch, rng_impl)
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    @staticmethod
    def _unpin_host_local(tree, tmpl):
        """StandardRestore commits every leaf to its template's devices —
        including host-local leaves (optimizer counters, step, rng) that
        were created eagerly on the default device and never mesh-placed.
        A leaf committed to one device alongside params committed to the
        full mesh makes jit reject the mixed placement, so mirror the npz
        loader's rule (trainer.load_train_state): leaves whose template
        sharding is not a NamedSharding come back as uncommitted host
        arrays."""
        from jax.sharding import NamedSharding

        def fix(leaf, t):
            if (isinstance(t, jax.Array)
                    and not isinstance(t.sharding, NamedSharding)
                    and isinstance(leaf, jax.Array)
                    and leaf.sharding.is_fully_addressable):
                return np.asarray(leaf)
            return leaf

        return jax.tree.map(fix, tree, tmpl)

    def restore(self, step: int, template: TrainState
                ) -> Tuple[TrainState, Tuple[int, int]]:
        """Returns (state, (epoch, batch_in_epoch)).  Checkpoints written
        before data-position tracking restore with position (0, 0); any
        recorded static-config metadata lands in ``self.restored_meta``."""
        tmpl = _to_pytree(template)
        try:
            tree = self.manager.restore(
                int(step), args=self._ocp.args.StandardRestore(tmpl)
            )
            tree = self._unpin_host_local(tree, tmpl)
        except (KeyError, ValueError):
            try:
                # pre-metadata checkpoint: data_pos without rng_impl
                tmpl["data_pos"].pop("rng_impl")
                tree = self.manager.restore(
                    int(step), args=self._ocp.args.StandardRestore(tmpl)
                )
                tree = self._unpin_host_local(tree, tmpl)
            except (KeyError, ValueError):
                try:
                    tmpl.pop("data_pos", None)
                    tree = self.manager.restore(
                        int(step), args=self._ocp.args.StandardRestore(tmpl)
                    )
                    tree = self._unpin_host_local(tree, tmpl)
                except (KeyError, ValueError):
                    # template-shaped restore impossible (e.g. the rng key
                    # data of a different PRNG impl has a different
                    # shape): raw restore so _from_pytree can surface the
                    # recorded-impl mismatch as a clean error
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
