#!/usr/bin/env python
"""Micro-benchmark of the SGD step's constituent ops at ML-20M scale, to
find the slow one."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import time

import numpy as np


def timeit(fn, *args, n=50):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from cu2rec_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    U, I, F, R = 138_000, 27_000, 100, 20_000_000
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.normal(size=(U, F)), dtype=jnp.float32)
    Q = jnp.asarray(rng.normal(size=(I, F)), dtype=jnp.float32)
    items = jnp.asarray(rng.integers(0, I, U), dtype=jnp.int32)
    indptr = jnp.asarray(np.linspace(0, R, U + 1).astype(np.int32))
    indices = jnp.asarray(rng.integers(0, I, R), dtype=jnp.int32)
    data = jnp.asarray(rng.uniform(1, 5, R), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    e = jnp.asarray(rng.normal(size=U), dtype=jnp.float32)

    from cu2rec_tpu.ops.sgd import sample_items

    def sample(key):
        return sample_items(key, jnp.int32(3), indptr, indices, data)

    def gather(Q, items):
        return Q[items]

    def dense_update(P, e, q):
        return P + 0.01 * (e[:, None] * q - 0.02 * P)

    def scatter_add(Q, items, dq):
        return Q.at[items].add(dq)

    def scatter_min(items, prio):
        return jnp.full((I,), 2**31 - 1, dtype=jnp.int32).at[items].min(prio)

    def rowdot(P, q):
        return jnp.sum(P * q, axis=-1)

    q = Q[items]
    dq = q * 0.01
    prio = jnp.arange(U, dtype=jnp.int32)

    for name, fn, args in [
        ("sample_items (threefry per user)", jax.jit(sample), (key,)),
        ("gather Q[items]  (U rows of F)", jax.jit(gather), (Q, items)),
        ("dense P update   (U,F)", jax.jit(dense_update), (P, e, q)),
        ("rowdot sum(P*q)  (U,F)", jax.jit(rowdot), (P, q)),
        ("scatter-add Q    (U rows of F)", jax.jit(scatter_add), (Q, items, dq)),
        ("scatter-min elect (U scalars)", jax.jit(scatter_min), (items, prio)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name:35s} {dt * 1e3:8.3f} ms")

    # eval-shaped gather: 1M-row chunks
    rows = jnp.asarray(rng.integers(0, U, 1 << 20), dtype=jnp.int32)

    def eval_chunk(P, Q, rows, cols):
        return jnp.sum(P[rows] * Q[cols], axis=-1)

    cols = jnp.asarray(rng.integers(0, I, 1 << 20), dtype=jnp.int32)
    dt = timeit(jax.jit(eval_chunk), P, Q, rows, cols, n=20)
    print(f"{'eval chunk gather+dot (1M pairs)':35s} {dt * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
