"""Alternating Least Squares for biased MF — a second optimizer family.

The reference trains only by sampled SGD; ALS is the classic alternative
(and the industry-standard MF solver) and maps *beautifully* onto the MXU:
each half-sweep solves, for every user in parallel, the ridge system

    ( X_uᵀ X_u + diag(λ) ) θ_u = X_uᵀ y_u,      X_u = [ q_i | 1 ]_{i∈S_u}

for θ_u = [p_u, b_u] with the item side frozen (and symmetrically for
items).  Gram matrices are batched `einsum`s over degree-bucketed, padded
rating slices (power-law degrees → a few buckets bound padding waste),
and the solves are batched Cholesky factorizations — all dense MXU work,
no scatters at all.

Convergence: a handful of sweeps reaches the quality thousands of sampled
SGD iterations reach; each ML-20M half-sweep is ~2·R·F² ≈ 400 GFLOP.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.data.csr import CSRRatings

# Degree-bucket capacities. A row with degree d lands in the smallest
# bucket with capacity >= d; rows beyond the largest capacity are
# truncated to their most recent `cap` entries (ultra-heavy tail).
BUCKET_CAPS = (8, 32, 128, 512, 2048, 8192)


@dataclass
class BucketedRows:
    """Padded per-row rating slices grouped by degree bucket (host side).

    For each bucket: ``row_ids`` (B,), ``cols`` (B, D) padded counterpart
    ids, ``vals`` (B, D) ratings, ``mask`` (B, D).
    """

    buckets: list  # of dict(row_ids, cols, vals, mask)
    n_rows: int


def bucket_csr(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
               caps=BUCKET_CAPS) -> BucketedRows:
    n_rows = len(indptr) - 1
    nnz = len(indices)
    indptr = np.asarray(indptr, dtype=np.int64)
    deg = np.diff(indptr)
    buckets = []
    for bi, cap in enumerate(caps):
        lo = caps[bi - 1] if bi else 0
        sel = np.nonzero((deg > lo) & (deg <= cap))[0] if cap != caps[-1] \
            else np.nonzero(deg > lo)[0]
        if len(sel) == 0:
            continue
        # vectorized padded-slice extraction (no per-row Python loop):
        # keep each row's LAST min(deg, cap) entries
        ends = indptr[sel + 1]
        d = np.minimum(deg[sel], cap)
        j = np.arange(cap, dtype=np.int64)[None, :]
        mask = j < d[:, None]
        pos = np.clip((ends - d)[:, None] + j, 0, max(nnz - 1, 0))
        cols = np.where(mask, indices[pos], 0).astype(np.int32)
        vals = np.where(mask, data[pos], 0).astype(np.float32)
        buckets.append({"row_ids": sel.astype(np.int32), "cols": cols,
                        "vals": vals, "mask": mask})
    return BucketedRows(buckets=buckets, n_rows=n_rows)


def transpose_csr(csr: CSRRatings):
    """Item-major view of the ratings (indptr over items)."""
    order = np.lexsort((csr.row_ids, csr.indices))
    items_sorted = csr.indices[order]
    counts = np.bincount(items_sorted, minlength=csr.n_items)
    indptr = np.zeros(csr.n_items + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, csr.row_ids[order].astype(np.int32), csr.data[order]


def prepare_chunks(bucketed: BucketedRows, n_factors: int,
                   n_rows_total: int, row_sharding=None,
                   budget: int = 64 << 20):
    """Pre-upload bucket data as fixed-shape device chunks (done ONCE per
    training run — re-uploading per sweep dominated sweep time through
    slow H2D links).

    Chunking bounds the materialized (chunk, D, F+1) design matrix to
    ~``budget`` elements; tail chunks are padded to the common shape so
    each bucket compiles a single solve program, with padding rows given
    out-of-bounds row ids (scattered with mode='drop').
    """
    F1 = n_factors + 1
    chunks = []
    for b in bucketed.buckets:
        B, D = b["cols"].shape
        chunk = max(1, min(B, budget // max(D * F1, 1)))
        if row_sharding is not None:
            n_dev = row_sharding.mesh.shape[row_sharding.spec[0]]
            chunk = max(n_dev, (chunk // n_dev) * n_dev)

        def pad_chunk(x, s, e, fill=0):
            out = x[s:e]
            if e - s < chunk:
                pad = [(0, chunk - (e - s))] + [(0, 0)] * (x.ndim - 1)
                out = np.pad(out, pad, constant_values=fill)
            if row_sharding is not None:
                return jax.device_put(out, row_sharding)
            return jnp.asarray(out)

        for s in range(0, B, chunk):
            e = min(s + chunk, B)
            chunks.append((
                pad_chunk(b["cols"], s, e),
                pad_chunk(b["vals"], s, e),
                pad_chunk(b["mask"], s, e, fill=False),
                pad_chunk(b["row_ids"], s, e, fill=n_rows_total),
            ))
    return chunks


def als_half_sweep(T_self, T_other, bucketed, mu,
                   factor_reg: float, bias_reg: float, n_factors: int,
                   weight_by_degree: bool = True, row_sharding=None,
                   solver: str = "blocked"):
    """Update every row of ``T_self`` given frozen ``T_other``.

    ``bucketed`` may be a host-side :class:`BucketedRows` (chunks prepared
    and uploaded on the fly) or a pre-prepared chunk list from
    :func:`prepare_chunks` (preferred — upload once, sweep many).

    With ``weight_by_degree`` the ridge term is scaled by each row's
    degree (λ·|S|, the Zhou et al. weighted-λ regularization — the ALS
    analogue of the SGD reg being applied once per sampled update).
    """
    F = n_factors
    W = T_self.shape[1]
    T_new = T_self
    reg = jnp.concatenate([jnp.full((F,), factor_reg, jnp.float32),
                           jnp.full((1,), bias_reg, jnp.float32)])
    if isinstance(bucketed, BucketedRows):
        chunks = prepare_chunks(bucketed, F, T_self.shape[0], row_sharding)
    else:
        chunks = bucketed
    for cols, vals, mask, rows in chunks:
        if weight_by_degree:
            deg = mask.sum(axis=1).astype(jnp.float32)[:, None]
        else:
            deg = jnp.ones((cols.shape[0], 1), dtype=jnp.float32)
        theta = _solve_bucket_weighted(T_other, cols, vals, mask, mu,
                                       reg, deg, solver=solver)
        rowvec = jnp.zeros((theta.shape[0], W), dtype=T_self.dtype)
        rowvec = rowvec.at[:, :F].set(theta[:, :F].astype(T_self.dtype))
        rowvec = rowvec.at[:, F].set(theta[:, F].astype(T_self.dtype))
        T_new = T_new.at[rows].set(rowvec, mode="drop")
    return T_new


@partial(jax.jit, static_argnames=("solver",))
def _solve_bucket_weighted(T_other, cols, vals, mask, mu, reg_vec, deg,
                           solver: str = "blocked"):
    F1 = reg_vec.shape[0]
    F = F1 - 1
    other = T_other[cols]
    q = other[..., :F].astype(jnp.float32)
    b_other = other[..., F].astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]
    X = jnp.concatenate([q, jnp.ones_like(b_other)[..., None]], axis=-1) * m
    y = (vals - mu - b_other) * mask
    G = jnp.einsum("bdf,bdg->bfg", X, X,
                   preferred_element_type=jnp.float32)
    lam = reg_vec[None, None, :] * jnp.maximum(deg, 1.0)[..., None]
    G = G + jnp.eye(F1)[None] * lam
    rhs = jnp.einsum("bdf,bd->bf", X, y,
                     preferred_element_type=jnp.float32)
    if solver == "blocked":
        # batch-vectorized blocked Cholesky (ops/batched_linalg) — 4.4x
        # the XLA custom-call path for many small systems on TPU
        from cu2rec_tpu.ops.batched_linalg import ridge_solve_batched
        return ridge_solve_batched(G, rhs)
    chol = jnp.linalg.cholesky(G)
    z = jax.scipy.linalg.solve_triangular(chol, rhs[..., None], lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), z, lower=False)[..., 0]
