"""Device introspection — the ``getFreeBytes`` equivalent
(reference util.cu:184-195, printed at startup by mf.cu:33-37)."""

from __future__ import annotations

import jax


def free_memory_bytes(device=None):
    """(free_bytes, total_bytes) for the given (default first) device.
    Returns (None, None) when the backend exposes no memory stats (CPU)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None, None
    total = stats.get("bytes_limit")
    used = stats.get("bytes_in_use", 0)
    free = total - used if total is not None else None
    return free, total


def print_free_memory() -> None:
    free, _total = free_memory_bytes()
    if free is None:
        print("Free memory: n/a (backend exposes no memory stats)\n")
    else:
        print(f"Free memory: {free}\n")
