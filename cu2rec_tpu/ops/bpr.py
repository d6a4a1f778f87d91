"""BPR-MF: Bayesian Personalized Ranking on the packed tables.

A third training family beyond the reference's scope (the reference,
matrix_factorization/sgd.cu, trains pointwise rating regression only):
pairwise ranking for implicit feedback, after Rendle et al., "BPR:
Bayesian Personalized Ranking from Implicit Feedback" (UAI 2009).  Each
sampled triple (u, i⁺, j⁻) — a user, one of their rated items, one
uniform catalog negative — takes a gradient step on

    x_uij = p_u · (q_i − q_j) + b_i − b_j,     loss = −log σ(x_uij) + reg.

TPU-native design (mirrors the pointwise twin step, ops/packed.py):
classic BPR-SGD scatters three rows per sampled triple — on TPU that is
three element-scattered writes.  Instead each SIDE samples its own
triples so every pass is a dense table map plus row gathers, fully
scatter-free:

  * user pass: every user u samples i⁺ ~ rated(u) (the CSR pair_pack
    stream shared with pointwise SGD) and j⁻ ~ Uniform(catalog), and
    updates its own row — dense over T_u;
  * item-positive pass: every item y samples a rater u ~ raters(y) (the
    item-major twin stream) and a negative j⁻, and takes y's positive
    gradient — dense over T_i;
  * item-negative pass: every item y samples a user v ~ Uniform(users)
    and v's positive i⁺ ~ rated(v), and takes y's negative gradient —
    dense over T_i.

Per iteration every user row gets one update and every item row one
positive + one negative update (vs. popularity-weighted occurrence in
classic sampling) — the same uniform-per-row semantic the twin pointwise
policy introduces, deterministic and shard-invariant by the same
counter-based-stream argument (ops/sgd.py: counter_uniform).  As in BPR
practice, negatives are drawn from the full catalog without rejecting
the (sparse) rated set.  Ridge decay of item rows is applied once, in
the positive pass.

The trained model serves through the unchanged stack: score(u, y) =
p_u · q_y + b_y (user/global bias stay zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cu2rec_tpu.ops.packed import PackedModel, _reg_vectors
from cu2rec_tpu.ops.sgd import (
    GATHER_LANES, Hyper, counter_uniform, fetch_pairs, gather_1d,
    sample_items,
)


def _uniform_ids(key, iteration, n_draws: int, n_range, tag: int,
                 offset: int = 0):
    """Counter-stream uniform ids in [0, n_range): one draw per position.

    ``tag`` separates streams (user-negatives, item-negatives, ...) by
    folding into the key, so every stream stays a pure shard-invariant
    function of (seed, iteration, global position id).
    """
    k = jax.random.fold_in(key, tag)
    pos = jnp.arange(n_draws, dtype=jnp.uint32) + jnp.uint32(offset)
    u01 = counter_uniform(k, iteration, pos)
    n = jnp.asarray(n_range, jnp.int32)
    return jnp.minimum((u01 * n).astype(jnp.int32), n - 1)


def bpr_step(pm: PackedModel, dev, hp: Hyper, key, iteration) -> PackedModel:
    """One BPR iteration: dense user pass + dense (pos+neg) item pass."""
    T_u, T_i = pm.T_u, pm.T_i
    U, W = T_u.shape
    I = T_i.shape[0]
    F = pm.n_factors
    dt = T_u.dtype
    lr = hp.learning_rate
    if dev.it_indptr is None:
        raise ValueError("BPR needs item-major arrays: build DeviceRatings "
                         "with item_major=True")

    factor, biascol, reg_u, reg_i = _reg_vectors(hp, F, W)
    T_u32 = T_u.astype(jnp.float32)
    T_i32 = T_i.astype(jnp.float32)

    def ihat(rows):
        # factors kept, bias col → 1: ∂x/∂(row) for the side that owns the
        # bias term; padding cols → 0.
        return rows * factor + biascol

    # ---- user pass: u updates p_u from (i⁺ ~ rated(u), j⁻ ~ catalog) ----
    i_pos, _r, has_u = sample_items(key, iteration, dev.indptr, dev.indices,
                                    dev.data, pair_pack=dev.pair_pack)
    j_neg = _uniform_ids(key, iteration, U, I, tag=1)
    t_i = T_i32[i_pos]                                      # (U, W)
    t_j = T_i32[j_neg]                                      # (U, W)
    diff = ihat(t_i) - ihat(t_j)       # bias cols cancel → factors only
    x_u = (jnp.sum(T_u32 * diff, axis=-1) + t_i[:, F] - t_j[:, F])
    e_u = jnp.where(has_u, jax.nn.sigmoid(-x_u), 0.0)
    du = lr * (e_u[:, None] * diff - reg_u * T_u32)
    T_u_new = jnp.where(has_u[:, None], T_u32 + du, T_u32).astype(dt)

    # ---- item-positive pass: y updates from (u ~ raters(y), j⁻) --------
    u_of_y, _r, has_y = sample_items(key, iteration, dev.it_indptr, None,
                                     None, user_offset=dev.n_users,
                                     pair_pack=dev.it_pair_pack)
    jn_y = _uniform_ids(key, iteration, I, I, tag=2, offset=U)
    w_rows = T_u32[u_of_y]                                  # (I, W)
    uhat = ihat(w_rows)
    t_jy = T_i32[jn_y]                                      # (I, W)
    x_pos = (jnp.sum(w_rows * factor * (T_i32 - t_jy), axis=-1)
             + T_i32[:, F] - t_jy[:, F])
    e_pos = jnp.where(has_y, jax.nn.sigmoid(-x_pos), 0.0)
    di_pos = lr * (e_pos[:, None] * uhat - reg_i * T_i32)

    # ---- item-negative pass: y updates from (v ~ users, i⁺ ~ rated(v)) --
    v = _uniform_ids(key, iteration, I, U, tag=3, offset=U + I)
    U_lanes = -(-U // GATHER_LANES) * GATHER_LANES
    starts = jnp.pad(dev.indptr[:-1], (0, U_lanes - U))
    lens = jnp.pad(dev.indptr[1:] - dev.indptr[:-1], (0, U_lanes - U))
    start_v = gather_1d(starts, v)
    len_v = gather_1d(lens, v)
    kv = jax.random.fold_in(key, 4)
    u01 = counter_uniform(kv, iteration,
                          jnp.arange(I, dtype=jnp.uint32) + jnp.uint32(2 * U))
    pos_v = start_v + jnp.minimum((u01 * len_v).astype(jnp.int32),
                                  jnp.maximum(len_v - 1, 0))
    has_v = len_v > 0
    iv, _rv = fetch_pairs(dev.pair_pack, pos_v)
    v_rows = T_u32[v]                                       # (I, W)
    t_iv = T_i32[iv]                                        # (I, W)
    x_neg = (jnp.sum(v_rows * factor * (t_iv - T_i32), axis=-1)
             + t_iv[:, F] - T_i32[:, F])
    e_neg = jnp.where(has_v, jax.nn.sigmoid(-x_neg), 0.0)
    di_neg = (-lr) * e_neg[:, None] * ihat(v_rows)   # reg applied in pos

    T_i_new = (T_i32 + jnp.where(has_y[:, None], di_pos, 0.0)
               + jnp.where(has_v[:, None], di_neg, 0.0)).astype(dt)
    return PackedModel(T_u=T_u_new, T_i=T_i_new,
                       global_bias=pm.global_bias, n_factors=F)


@jax.jit
def _bpr_run(pm, dev, hp, key, start_iter, n_steps):
    def body(i, m):
        return bpr_step(m, dev, hp, key, start_iter + i)

    return jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32), body, pm)


def bpr_run_steps(pm: PackedModel, dev, hp: Hyper, key, start_iter,
                  n_steps) -> PackedModel:
    """``n_steps`` is a dynamic trip count — one compiled program serves
    every segment length (remote compiles are minutes on this platform)."""
    return _bpr_run(pm, dev, hp, key, start_iter, n_steps)


def auc_eval(model, train_csr, test_csr, n_pairs: int = 100_000,
             seed: int = 0) -> float:
    """Sampled pairwise AUC: P(score(u, i⁺) > score(u, j)) over held-out
    positives i⁺ and uniform catalog negatives j — BPR's native metric
    (it directly optimizes a smoothed AUC)."""
    import numpy as np

    if test_csr.nnz == 0:
        return 0.5
    rng = np.random.default_rng(seed)
    sel = rng.integers(0, test_csr.nnz, size=min(n_pairs, test_csr.nnz))
    users = test_csr.row_ids[sel]
    pos = test_csr.indices[sel]
    neg = rng.integers(0, train_csr.n_items, size=len(sel)).astype(np.int32)
    P = jnp.asarray(model.P, jnp.float32)
    Q = jnp.asarray(model.Q, jnp.float32)
    ib = jnp.asarray(model.item_bias, jnp.float32)
    pu = P[jnp.asarray(users)]
    s_pos = jnp.sum(pu * Q[jnp.asarray(pos)], axis=-1) + ib[jnp.asarray(pos)]
    s_neg = jnp.sum(pu * Q[jnp.asarray(neg)], axis=-1) + ib[jnp.asarray(neg)]
    return float(jnp.mean((s_pos > s_neg).astype(jnp.float32)))
