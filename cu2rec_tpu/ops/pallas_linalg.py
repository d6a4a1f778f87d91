"""Pallas batched ridge solver — VMEM-resident Cholesky for many small
SPD systems (the ALS hot op).

Why this kernel exists (measured motivation, docs/RESULTS.md):

* XLA's ``jnp.linalg.cholesky`` custom call serializes small systems
  (~13 GFLOP/s on 138K systems of n≈101 — 85% of the r1 ALS sweep).
* The batch-vectorized blocked Cholesky (`ops/batched_linalg.py`) fixed
  the serialization (4.4×) but is **HBM-traffic-bound**: every one of
  its sequential panel steps re-streams a ``(B, nb, nb)`` slab through
  HBM because the full batch cannot be VMEM-resident at once.

This kernel tiles the BATCH instead: grid over ``B/TB`` tiles, each
tile's systems resident in VMEM for the whole factorization, so HBM
reads G exactly once and writes θ once.  Two layout decisions make the
inner loop fully vectorized on the VPU:

1. **Batch lives on the lane dimension** — arrays are ``(N, N, TB)`` /
   ``(N, TB)``, so each of the N sequential column steps slices only
   sublane/leading dims (lane-dim dynamic indexing is the thing TPUs
   cannot do efficiently).
2. **The column loop is a static Python loop** — every slice has a
   static shape, so step ``j`` touches exactly the trailing
   ``(N-j, N-j, TB)`` submatrix: no masked full-matrix updates (3× the
   necessary work), no dynamic shapes.

The reference has no counterpart (cu2rec is SGD-only); the semantics
anchor is the ridge solve in ops/als.py (Gram + λI, solve per row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ridge_kernel(g_ref, rhs_ref, out_ref, *, n: int):
    """Factor A = L Lᵀ in place and solve L Lᵀ θ = rhs for one batch
    tile.  ``g_ref``: (N, N, TB) — system b of this tile is
    ``g_ref[:, :, b]``; ``rhs_ref``/``out_ref``: (N, TB)."""
    # In-place right-looking Cholesky.  After step j, rows ≥ j of
    # column j hold L[:, j]; the strictly-lower part of g_ref
    # accumulates L as j advances.  The trailing update only ever
    # touches [j+1:, j+1:] — static slices, minimal work.
    for j in range(n):
        dinv = jax.lax.rsqrt(g_ref[j : j + 1, j, :])      # (1, TB)
        col = g_ref[j:, j, :] * dinv                       # (N-j, TB)
        g_ref[j:, j, :] = col
        if j + 1 < n:
            tail = col[1:]                                 # (N-j-1, TB)
            g_ref[j + 1 :, j + 1 :, :] = (
                g_ref[j + 1 :, j + 1 :, :]
                - tail[:, None, :] * tail[None, :, :]
            )

    # Forward substitution L z = rhs (z materialized into out_ref).
    out_ref[0:1, :] = rhs_ref[0:1, :] / g_ref[0:1, 0, :]
    for j in range(1, n):
        acc = jnp.sum(g_ref[j, :j, :] * out_ref[:j, :], axis=0,
                      keepdims=True)                        # (1, TB)
        out_ref[j : j + 1, :] = (rhs_ref[j : j + 1, :] - acc) / \
            g_ref[j : j + 1, j, :]

    # Backward substitution Lᵀ θ = z (in place in out_ref):
    # θ[j] = (z[j] - Σ_{k>j} L[k, j] θ[k]) / L[j, j].
    for j in range(n - 1, -1, -1):
        zj = out_ref[j : j + 1, :]
        if j + 1 < n:
            zj = zj - jnp.sum(g_ref[j + 1 :, j, :] * out_ref[j + 1 :, :],
                              axis=0, keepdims=True)        # (1, TB)
        out_ref[j : j + 1, :] = zj / g_ref[j : j + 1, j, :]


def _pick_tile(n: int) -> int:
    """Lane-aligned batch tile sized so the (N, N, TB) block plus its
    pipeline double-buffer AND the kernel's largest live temporary (the
    (N-1, N-1, TB) trailing update at step 0 — nearly one more block)
    stay under the 16 MB scoped-VMEM limit.

    The frame is ≈ 2 blocks (pipeline) + 1 block (temp) + small vectors,
    so the per-block budget must be ≤ ~4.5 MB: a 5 MB budget at N=50
    picked TB=512 and overflowed the scoped limit by 900 KB at compile
    time ("Ran out of memory in memory space vmem ... 16.88M vs 16.00M",
    first hit by the F=50 iALS journey)."""
    budget = 4 << 20  # bytes for one G block
    tb = budget // (n * n * 4)
    tb = max(128, (tb // 128) * 128)
    return min(tb, 512)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ridge_solve_lanes(G, rhs, interpret: bool = False):
    """θ = G⁻¹ rhs for lane-batched SPD systems.

    ``G``: (N, N, B) — system b is ``G[:, :, b]``, already
    ridge-regularized (and identity-padded if N was padded).
    ``rhs``: (N, B).  Returns (N, B).  B is padded to the lane tile
    internally (padded systems solve I θ = 0).
    """
    n, _, b = G.shape
    tb = _pick_tile(n)
    b_pad = -(-b // tb) * tb
    if b_pad != b:
        Gp = jnp.pad(G, ((0, 0), (0, 0), (0, b_pad - b)))
        eye = jnp.eye(n, dtype=G.dtype)[:, :, None]
        pad_mask = (jnp.arange(b_pad) >= b)[None, None, :]
        G = jnp.where(pad_mask, eye, Gp)
        rhs = jnp.pad(rhs, ((0, 0), (0, b_pad - b)))

    kernel = functools.partial(_ridge_kernel, n=n)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, b_pad), G.dtype),
        grid=(b_pad // tb,),
        in_specs=[
            pl.BlockSpec((n, n, tb), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tb), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, tb), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(G, rhs)
    return out[:, :b]


# Above this system size even the minimum 128-lane batch tile exceeds
# the VMEM budget ((N, N, 128) f32 double-buffered > ~12 MB), so the
# kernel cannot run; callers fall back to the blocked HBM-streaming
# Cholesky, which has no such ceiling.
MAX_LANES_N = 112


def ridge_solve_batched_pallas(G, rhs, interpret: bool = False):
    """Drop-in for :func:`ops.batched_linalg.ridge_solve_batched`:
    ``G`` (B, N, N), ``rhs`` (B, N) → θ (B, N).

    Transposes to the lane-batched layout the kernel wants; the two
    transposes cost two streaming passes of G (≈ what one blocked-path
    panel step used to cost).  Callers that can build G directly in
    (N, N, B) layout (ALS Gram einsum ``"bdf,bdg->fgb"``) should call
    :func:`ridge_solve_lanes` and skip the transpose entirely.

    Systems larger than :data:`MAX_LANES_N` (e.g. F=300 ALS) fall back
    to the blocked solver — their (N, N, 128) tiles don't fit VMEM.
    """
    if G.shape[-1] > MAX_LANES_N:
        from cu2rec_tpu.ops.batched_linalg import ridge_solve_batched
        return ridge_solve_batched(G, rhs)
    Gt = jnp.transpose(G, (1, 2, 0))
    rt = jnp.transpose(rhs, (1, 0))
    theta = ridge_solve_lanes(Gt, rt, interpret=interpret)
    return jnp.transpose(theta, (1, 0))
