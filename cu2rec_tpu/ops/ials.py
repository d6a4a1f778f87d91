"""Implicit-feedback ALS (iALS) — the Hu/Koren/Volinsky (2008) weighted
matrix factorization, a model family beyond the reference's explicit MF
(the natural production companion: most recommender deployments are
implicit).

Model: preference p_ui = 1 for every observed (u, i), confidence
c_ui = 1 + α·r_ui; each half-sweep solves, per user,

    ( QᵀQ + Qᵀ(C_u − I)Q + λI ) x_u = Qᵀ C_u p_u = Σ_{i∈S_u} c_ui q_i

The **Gramian trick** makes this TPU-gold: QᵀQ is ONE (I, F)ᵀ(I, F)
matmul on the MXU shared by all users, and the per-user correction
Σ (c_ui − 1) q_i q_iᵀ touches only the user's rated items — reusing the
same degree-bucketed, padded rating slices as explicit ALS
(cu2rec_tpu.ops.als.prepare_chunks / prepare_chunks_device), including
the exact segmented heavy-tail path.  Solves ride the batch-vectorized
blocked Cholesky (ops/batched_linalg).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cu2rec_tpu.ops.als import _ridge_finish


def gramian(T: jax.Array) -> jax.Array:
    """G = TᵀT in float32 on the MXU."""
    T32 = T.astype(jnp.float32)
    return jnp.einsum("if,ig->fg", T32, T32,
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("solver",))
def _solve_ials_bucket(T_other, G_global, cols, vals, mask, alpha, reg,
                       solver: str = "auto"):
    q = T_other[cols].astype(jnp.float32)            # (B, D, F)
    m = mask.astype(jnp.float32)
    w = alpha * vals * m                              # c − 1, masked
    G = G_global[None] + jnp.einsum("bdf,bdg->bfg", q * w[..., None], q,
                                    preferred_element_type=jnp.float32)
    rhs = jnp.einsum("bdf,bd->bf", q, (1.0 + alpha * vals) * m,
                     preferred_element_type=jnp.float32)
    F = G.shape[-1]
    G = G + jnp.eye(F)[None] * reg
    return _ridge_finish(G, rhs, solver)


@partial(jax.jit, static_argnames=("solver",))
def _solve_ials_heavy(T_other, G_global, cols, vals, mask, seg_start,
                      seg_end, alpha, reg, solver: str = "auto"):
    """Exact iALS solve for ultra-heavy rows: per-segment corrections
    accumulated via prefix-sum differences (see ops/als._solve_heavy)."""
    q = T_other[cols].astype(jnp.float32)            # (S, D, F)
    m = mask.astype(jnp.float32)
    w = alpha * vals * m
    Gseg = jnp.einsum("sdf,sdg->sfg", q * w[..., None], q,
                      preferred_element_type=jnp.float32)
    rseg = jnp.einsum("sdf,sd->sf", q, (1.0 + alpha * vals) * m,
                      preferred_element_type=jnp.float32)
    F = Gseg.shape[-1]
    Gz = jnp.concatenate([jnp.zeros((1, F, F), jnp.float32),
                          jnp.cumsum(Gseg, axis=0)], axis=0)
    rz = jnp.concatenate([jnp.zeros((1, F), jnp.float32),
                          jnp.cumsum(rseg, axis=0)], axis=0)
    G = G_global[None] + (Gz[seg_end] - Gz[seg_start])
    rhs = rz[seg_end] - rz[seg_start]
    G = G + jnp.eye(F)[None] * reg
    return _ridge_finish(G, rhs, solver)


def ials_fold_in(Y, cols, vals, mask, alpha: float, reg: float,
                 solver: str = "auto"):
    """Exact one-shot fold-in for a BATCH of new implicit users: the
    user half-sweep solve applied to unseen rows,

        x_u = ( YᵀY + Yᵀ(C_u − I)Y + λI )⁻¹ Σ_{i∈S_u} (1 + α·r_ui) y_i

    with the item factors ``Y`` frozen — the iALS counterpart of the
    explicit model's SGD fold-in (predict.cu:126 semantics; implicit
    models have no rating loss to descend, the closed-form solve IS the
    partial fit).  ``cols/vals/mask``: (B, D) padded rated-item slices.
    Padded rows of a row-padded ``Y`` are zero and drop out of both the
    Gramian and the corrections.  Returns (B, F) user factor rows.
    """
    G = gramian(Y)
    return _solve_ials_bucket(Y, G, jnp.asarray(cols), jnp.asarray(vals),
                              jnp.asarray(mask), jnp.float32(alpha),
                              jnp.float32(reg), solver=solver)


def ials_half_sweep(T_self, T_other, chunks, alpha: float, reg: float,
                    solver: str = "auto", fused: bool = True):
    """Update every row of ``T_self`` (plain (N, F) factors) given frozen
    ``T_other``, from prepared rating-slice ``chunks`` (same contract as
    explicit ALS: ops/als.prepare_chunks[_device]).  ``fused`` runs every
    chunk solve in one jitted program per half-sweep (see
    ops/als.als_half_sweep)."""
    from cu2rec_tpu.ops import als as _als
    regs = tuple(ch[1:] for ch in chunks if ch[0] == "reg")
    heavies = tuple(ch[1:] for ch in chunks if ch[0] == "heavy")
    if len(regs) + len(heavies) != len(chunks):
        # Explicit raise (not assert): python -O must not silently skip
        # rows' solves (see ops/als.als_half_sweep).
        raise ValueError(
            "unknown chunk tag(s): "
            f"{sorted({ch[0] for ch in chunks} - {'reg', 'heavy'})}")
    a32, r32 = jnp.float32(alpha), jnp.float32(reg)

    def eager_fn(T, regs_g, heavies_g):
        return _ials_sweep_body(T, T_other, regs_g, heavies_g, a32, r32,
                                solver, barrier=False)

    if not fused:
        return eager_fn(T_self, regs, heavies)

    def fused_fn(T, regs_g, heavies_g):
        return _ials_half_sweep_fused(T, T_other, regs_g, heavies_g, a32,
                                      r32, solver=solver)

    # Shared three-tier dispatch with ALS: full-fused -> group-fused ->
    # per-chunk, disables sticky per program signature (ops/als).
    return _als.fused_dispatch(("ials", solver), T_self, fused_fn,
                               eager_fn, regs, heavies)


def _ials_sweep_body(T_self, T_other, regs, heavies, a, r, solver,
                     barrier=True):
    # Barrier per chunk: stops XLA hoisting every chunk's T_other gather
    # to the program start when the body is jitted whole (see
    # ops/als._als_half_sweep_fused — the unserialized form OOMed HBM).
    # The eager fallback path (barrier=False) instead BLOCKS per chunk:
    # eager dispatch is async, and each chunk's .at[].set materializes a
    # fresh full table, so letting ~20 chunk updates queue keeps ~20
    # live table copies — the measured r5 Netflix-F=300 OOM (see
    # ops/als.eager_fn).  Blocking bounds liveness to ~2 copies at ~7 ms
    # dispatch latency per chunk, noise on this fallback path.
    G = gramian(T_other)
    T_new = T_self
    for cols, vals, mask, rows in regs:
        if barrier:
            T_dep, T_new = jax.lax.optimization_barrier((T_other, T_new))
        else:
            T_dep = T_other
        theta = _solve_ials_bucket(T_dep, G, cols, vals, mask, a, r,
                                   solver=solver)
        T_new = T_new.at[rows].set(theta.astype(T_self.dtype), mode="drop")
        if not barrier:
            T_new = jax.block_until_ready(T_new)
    for cols, vals, mask, rows, s0, s1, _deg in heavies:
        if barrier:
            T_dep, T_new = jax.lax.optimization_barrier((T_other, T_new))
        else:
            T_dep = T_other
        theta = _solve_ials_heavy(T_dep, G, cols, vals, mask, s0, s1,
                                  a, r, solver=solver)
        T_new = T_new.at[rows].set(theta.astype(T_self.dtype), mode="drop")
        if not barrier:
            T_new = jax.block_until_ready(T_new)
    return T_new


@partial(jax.jit, static_argnames=("solver",))
def _ials_half_sweep_fused(T_self, T_other, regs, heavies, a, r, *,
                           solver: str):
    return _ials_sweep_body(T_self, T_other, regs, heavies, a, r, solver)
