"""Persistent XLA compilation cache.

The reference pays its CUDA kernel autotuning once per process too, but its
per-process cost is seconds; here a cold process compiles the full distill
step remotely in ~2-4 min *per static batch shape* (up to ``--num_shapes``
shapes), so a restart could spend tens of minutes before reaching full
throughput.  Pointing ``jax_compilation_cache_dir`` at a persistent
directory makes every later process (resume, stage 2, bench, serving) reuse
the serialized executables instead of recompiling.

Counterpart of nothing in the reference (torch caches nothing comparable);
this is TPU/XLA-specific operational plumbing.
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT_DIR = "~/.cache/dphubert_tpu/xla"


def enable_persistent_cache(directory: str | None = None) -> str | None:
    """Enable the on-disk compilation cache; returns the directory used.

    Priority: explicit arg > ``DPHUBERT_COMPILE_CACHE`` env var > default
    ``~/.cache/dphubert_tpu/xla``.  Set the env var to ``0``/``off`` to
    disable.  Safe to call more than once and before/after other jax config
    updates — but must run before the first compilation to be of any use.
    """
    env = os.environ.get("DPHUBERT_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable", "disabled"):
        return None
    path = pathlib.Path(directory or env or _DEFAULT_DIR).expanduser()
    path.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache every entry: the big train-step graphs are minutes of remote
    # compile, and even the small eval/serve graphs are seconds each
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return str(path)
