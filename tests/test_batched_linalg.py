"""Batch-vectorized Cholesky/solve vs jnp.linalg reference."""

import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.ops.batched_linalg import (
    blocked_cholesky, cho_solve_batched, ridge_solve_batched,
)


def spd_batch(B, N, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    G = np.einsum("bik,bjk->bij", A, A) / N + \
        np.eye(N, dtype=np.float32)[None] * 0.5
    return jnp.asarray(G)


def test_blocked_cholesky_matches():
    for N in (5, 32, 33, 101):
        G = spd_batch(7, N, seed=N)
        L = np.asarray(blocked_cholesky(G))
        Lref = np.asarray(jnp.linalg.cholesky(G))
        np.testing.assert_allclose(L, Lref, atol=5e-4, rtol=5e-3)


def test_ridge_solve_matches():
    rng = np.random.default_rng(1)
    for N in (5, 64, 101):
        G = spd_batch(9, N, seed=N + 1)
        rhs = jnp.asarray(rng.normal(size=(9, N)).astype(np.float32))
        theta = np.asarray(ridge_solve_batched(G, rhs))
        ref = np.asarray(jnp.linalg.solve(G, rhs[..., None])[..., 0])
        np.testing.assert_allclose(theta, ref, atol=2e-3, rtol=2e-2)


def test_cho_solve_roundtrip():
    G = spd_batch(4, 48, seed=9)
    rng = np.random.default_rng(2)
    rhs = jnp.asarray(rng.normal(size=(4, 48)).astype(np.float32))
    L = blocked_cholesky(G)
    theta = cho_solve_batched(L, rhs)
    recon = np.asarray(jnp.einsum("bij,bj->bi", G, theta))
    np.testing.assert_allclose(recon, np.asarray(rhs), atol=2e-3, rtol=1e-2)
