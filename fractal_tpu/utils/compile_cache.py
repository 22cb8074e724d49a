"""Persistent XLA compilation cache for the CLI surfaces.

Every ``python -m fractal_tpu`` invocation is a fresh process; without a
persistent cache each one recompiles its kernels (~40-90 s for a deep-zoom
program on a tunneled TPU).  Pointing JAX's compilation cache at a per-user
directory makes repeat invocations of the same shape start in seconds.

Opt out with FRACTAL_TPU_NO_CACHE=1 (or point FRACTAL_TPU_CACHE_DIR
elsewhere).  Library importers are not affected — only the CLI entry points
call this.
"""

from __future__ import annotations

import os


def enable() -> None:
    if os.environ.get("FRACTAL_TPU_NO_CACHE"):
        return
    path = os.environ.get(
        "FRACTAL_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "fractal_tpu", "xla"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took real compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # never let cache plumbing break a render
