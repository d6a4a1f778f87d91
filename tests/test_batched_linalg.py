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


def test_pallas_ridge_matches():
    """Lane-batched VMEM Cholesky (interpret mode) vs jnp.linalg.solve,
    including a batch that is not a multiple of the lane tile (pad path)."""
    from cu2rec_tpu.ops.pallas_linalg import ridge_solve_batched_pallas

    rng = np.random.default_rng(3)
    for B, N in ((9, 5), (130, 33), (64, 101)):
        G = spd_batch(B, N, seed=N + 7)
        rhs = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
        theta = np.asarray(ridge_solve_batched_pallas(G, rhs, interpret=True))
        ref = np.asarray(jnp.linalg.solve(G, rhs[..., None])[..., 0])
        np.testing.assert_allclose(theta, ref, atol=2e-3, rtol=2e-2)


def test_als_pallas_solver_matches_blocked():
    """ALS half-sweep output is solver-independent (pallas == blocked)."""
    from cu2rec_tpu.data.csr import csr_from_arrays
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.ops.als import als_half_sweep, bucket_csr
    from cu2rec_tpu.ops.packed import pack

    rng = np.random.default_rng(11)
    U, I, F = 37, 23, 8
    rows, cols, vals = [], [], []
    for u in range(U):
        picks = rng.choice(I, size=rng.integers(1, 12), replace=False)
        for i in sorted(picks):
            rows.append(u)
            cols.append(i)
            vals.append(float(rng.integers(1, 6)))
    csr = csr_from_arrays(np.asarray(rows, np.int32),
                          np.asarray(cols, np.int32),
                          np.asarray(vals, np.float32), U, I)
    model = init_model(U, I, F, float(np.mean(vals)), seed=3)
    pm = pack(model)
    buckets = bucket_csr(csr.indptr, csr.indices, csr.data)
    outs = {}
    for solver in ("blocked", "pallas"):
        outs[solver] = np.asarray(als_half_sweep(
            pm.T_u, pm.T_i, buckets, jnp.float32(model.global_bias),
            0.05, 0.05, F, solver=solver))
    np.testing.assert_allclose(outs["pallas"], outs["blocked"],
                               atol=2e-4, rtol=2e-3)


def test_pallas_tile_respects_vmem_frame():
    """The lane-batch tile must keep one (N, N, TB) G block within the
    4 MB budget (frame = 2 pipelined blocks + ~1 trailing-update temp
    must stay under the 16 MB scoped-VMEM limit; N=50 once picked
    TB=512 -> a 5.1 MB block and a 16.88 MB frame that failed AOT
    compile).  The 128-lane floor (large N) is the kernel's minimum and
    is measured working at N=101."""
    from cu2rec_tpu.ops.pallas_linalg import MAX_LANES_N, _pick_tile

    for n in range(2, MAX_LANES_N + 1):
        tb = _pick_tile(n)
        assert tb >= 128 and tb % 128 == 0
        block = n * n * tb * 4
        assert block <= (4 << 20) or tb == 128, (n, tb, block / 2**20)
    assert _pick_tile(50) <= 384  # the observed-failing shape
