"""Honest device timing.

On the tunneled TPU platform used here, ``jax.block_until_ready`` can
return before queued programs actually finish (experimental plugin), which
silently *understates* wall time and overstates throughput.  The only
reliable barrier is a device→host fetch of a value that data-depends on
the computation.  All benchmark/timer paths use :func:`fetch_barrier`.
"""

from __future__ import annotations


def fetch_barrier(tree) -> float:
    """Force completion of every leaf's producing computation by fetching a
    dependent scalar; returns it (useful to defeat DCE in benchmarks)."""
    import jax
    import jax.numpy as jnp

    total = 0.0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ndim"):
            first = leaf[(0,) * leaf.ndim] if leaf.ndim else leaf
            total += float(jnp.asarray(first, dtype=jnp.float32))
    return total
