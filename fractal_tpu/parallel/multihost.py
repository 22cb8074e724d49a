"""Multi-host launch support (DCN) — SURVEY.md §5 "distributed backend".

The reference is a single shared-memory process; its only "collective" is
rayon's in-memory join.  This framework's collectives (the fern psum, the
escape stripes' output layout) already run over ICI within a slice; this
module is the thin entry for *multi-host* slices, where JAX needs every
host to call ``jax.distributed.initialize`` before any device API.

Usage (one process per host, e.g. under a TPU pod resource manager):

    from fractal_tpu.parallel import multihost
    multihost.initialize()              # env-driven (TPU pods: automatic)
    mesh = make_mesh()                  # now spans all hosts' devices
    img = render_escape_sharded(scene, mesh)

On TPU pods the coordinator address / process ids come from the runtime
environment and ``initialize()`` needs no arguments; elsewhere pass them
explicitly.  Single-process runs are a no-op — every entry point in this
package works unchanged without calling this.
"""

from __future__ import annotations

from typing import Optional

import jax


_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host cluster (idempotent; no-op if already joined).

    All arguments optional: on TPU pods the runtime supplies them.  Must be
    called before any other JAX API touches devices.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    try:
        jax.distributed.initialize(**kw)
    except (ValueError, RuntimeError):
        # ValueError: single-process environment without coordinator
        # configuration — nothing to join, local devices work as-is.
        # RuntimeError: the XLA backend is already up (e.g. a test suite
        # rendered first) — in a real multi-host launch initialize() must
        # be the first JAX call, so this can only be the single-host case.
        pass
    _initialized = True


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_row_range(height: int) -> tuple:
    """The contiguous output-row range this host owns when assembling a
    sharded render to per-host files (each host writes only its rows
    instead of all-gathering a 100MP image over DCN)."""
    p = jax.process_count()
    i = jax.process_index()
    rows = -(-height // p)
    lo = min(i * rows, height)
    return lo, min(lo + rows, height)
