"""Persistent XLA compilation cache.

Compiles through the axon tunnel take minutes when the remote compile
service is loaded (measured 80+ s for a trivial matmul at busy times,
docs/TPU_NOTES.md); the persistent cache stores compiled executables
under .jax_cache/ so repeat processes (bench reruns, CLI invocations,
sweep subprocesses) skip them. Mirrors the reference's practice of
loading prebuilt indexes rather than rebuilding per run
(memory_node.hh:130-209) — here the artifact is the program, not the
data. Opt out with SHINE_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    if os.environ.get("SHINE_NO_COMPILE_CACHE") == "1":
        return
    import jax

    root = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", root)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: compile as usual
