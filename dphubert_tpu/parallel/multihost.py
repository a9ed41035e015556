"""Multi-host (multi-slice / pod) support.

The reference scales with one DDP process per GPU and rank-strided batch
lists (``audio_dataset.py:196-211``).  TPU-natively, one process per host
drives all local chips; hosts agree on the global batch order (deterministic
seed+epoch batcher), each host decodes only the batch rows its own devices
own, and the shards are assembled into one global ``jax.Array`` — the jitted
step then runs SPMD with gradient reduction over ICI/DCN.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding


def initialize() -> None:
    """Initialize jax.distributed from the TPU runtime environment (no-op
    for single-process runs)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-host / already initialized


def process_row_slice(sharding: NamedSharding, global_batch: int) -> slice:
    """The contiguous row range of a batch-sharded global array owned by
    this process's addressable devices."""
    imap = sharding.devices_indices_map((global_batch,))
    starts = []
    stops = []
    for dev, idx in imap.items():
        if dev.process_index != jax.process_index():
            continue
        s = idx[0]
        starts.append(0 if s.start is None else s.start)
        stops.append(global_batch if s.stop is None else s.stop)
    if not starts:
        return slice(0, 0)
    return slice(min(starts), max(stops))


def global_batch_from_local(
    sharding: NamedSharding, local_rows: np.ndarray, global_shape: Tuple[int, ...]
):
    """Assemble this host's decoded rows into a global sharded array."""
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(
        sharding, local_rows, global_shape
    )
