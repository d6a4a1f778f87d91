"""Persistent XLA compilation cache setup.

TPU compiles are tens of seconds; training scans are recompiled per
(n_steps, shapes) signature.  Enabling JAX's persistent compilation cache
makes every rerun of the CLIs/benchmarks start hot.  Called by the CLI
entry points and bench harnesses; set CU2REC_NO_COMPILE_CACHE=1 to disable
or CU2REC_CACHE_DIR to relocate.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache() -> None:
    global _DONE
    if _DONE or os.environ.get("CU2REC_NO_COMPILE_CACHE"):
        return
    import jax

    # (CU2REC_PLATFORM=cpu[:N] backend forcing happens once, at package
    # import — cu2rec_tpu/__init__.py — which importing this module
    # already triggered; no second copy here.)
    cache_dir = os.environ.get(
        "CU2REC_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cu2rec_tpu",
                     "jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True


def persist_dir() -> str | None:
    """The cu2rec cache directory when persistent caching is enabled
    (same opt-in as the XLA compile cache), else None.  Used by the
    fused-sweep disabled-signature store (ops/als): the XLA cache only
    remembers SUCCESSFUL compiles, so without this every fresh process
    re-pays a doomed multi-minute Netflix-scale fused compile before
    falling to the group tier."""
    if not _DONE:
        return None
    return os.environ.get(
        "CU2REC_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cu2rec_tpu",
                     "jax_cache"))
