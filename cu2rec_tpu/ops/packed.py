"""Packed-table fast path for the SGD step.

TPU memory layout optimization: each user/item row stores its factors AND
its bias in one lane-aligned vector —

    T_u[u] = [ p_u(F) | b_u | 0-pad → W ]      W = lane-aligned width
    T_i[i] = [ q_i(F) | b_i | 0-pad → W ]

One gather fetches an item's factors *and* bias (the unpacked path needs a
row gather plus a scalar gather), one scatter-add commits both updates
(saving the scalar scatter, which on TPU costs nearly as much as the row
scatter), and rows are 512-byte aligned for full-speed HBM access.

The update itself collapses into a single fused elementwise expression per
side by extending the gathered row: with ``x̂ = set_col(x, F, 1)``,

    Δrow_u = lr · (e · t̂_i − reg_u ⊙ row_u)      reg_u = [P_reg…, ub_reg, 0…]
    Δrow_i = lr · (e · t̂_u − reg_i ⊙ row_i)      reg_i = [Q_reg…, ib_reg, 0…]

— column F of ``t̂`` being 1 makes the bias update ``lr·(e − reg·b)`` fall
out of the same formula the factor columns use, and the zero padding stays
zero because its reg is 0.  Semantics are exactly those of
``cu2rec_tpu.ops.sgd.sgd_step`` (verified by tests/test_packed.py); only
the arithmetic layout changes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from cu2rec_tpu.models.state import MFModel
from cu2rec_tpu.ops.sgd import (
    Hyper, elect_winners, rotated_priority, sample_items,
)


def packed_width(n_factors: int) -> int:
    """Smallest lane-friendly width holding F factors + 1 bias."""
    need = n_factors + 1
    for w in (64, 128):
        if need <= w:
            return w
    return -(-need // 128) * 128


@dataclass
class PackedModel:
    """Packed parameter tables (a registered pytree)."""

    T_u: jax.Array        # (n_users, W)
    T_i: jax.Array        # (n_items, W)
    global_bias: jax.Array
    n_factors: int

    @property
    def width(self) -> int:
        return self.T_u.shape[1]


jax.tree_util.register_dataclass(
    PackedModel, data_fields=["T_u", "T_i", "global_bias"],
    meta_fields=["n_factors"])


def pack(model: MFModel) -> PackedModel:
    F = model.n_factors
    W = packed_width(F)

    def pack_side(M, b):
        row = jnp.concatenate([M, b[:, None].astype(M.dtype)], axis=1)
        return jnp.pad(row, ((0, 0), (0, W - F - 1)))

    return PackedModel(T_u=pack_side(model.P, model.user_bias),
                       T_i=pack_side(model.Q, model.item_bias),
                       global_bias=model.global_bias, n_factors=F)


def unpack(pm: PackedModel) -> MFModel:
    F = pm.n_factors
    return MFModel(P=pm.T_u[:, :F], Q=pm.T_i[:, :F],
                   user_bias=pm.T_u[:, F], item_bias=pm.T_i[:, F],
                   global_bias=pm.global_bias)


def _reg_vectors(hp: Hyper, F: int, W: int):
    col = jnp.arange(W)
    factor = col < F
    biascol = col == F
    reg_u = jnp.where(factor, hp.P_reg,
                      jnp.where(biascol, hp.user_bias_reg, 0.0))
    reg_i = jnp.where(factor, hp.Q_reg,
                      jnp.where(biascol, hp.item_bias_reg, 0.0))
    return (factor.astype(jnp.float32), biascol.astype(jnp.float32),
            reg_u.astype(jnp.float32), reg_i.astype(jnp.float32))


def packed_step(pm: PackedModel, dev, hp: Hyper, key, iteration,
                *, train_items: bool = True, collision: str = "first_wins",
                rotation: int = 250) -> PackedModel:
    """One SGD iteration over packed tables (single-device)."""
    T_u, T_i = pm.T_u, pm.T_i
    U, W = T_u.shape
    I = T_i.shape[0]
    F = pm.n_factors
    dt = T_u.dtype
    lr = hp.learning_rate

    items, ratings, has = sample_items(key, iteration, dev.indptr,
                                       dev.indices, dev.data,
                                       pair_pack=dev.pair_pack)
    row_i = T_i[items]                                   # (U, W) one gather
    row_u32 = T_u.astype(jnp.float32)
    row_i32 = row_i.astype(jnp.float32)

    factor, biascol, reg_u, reg_i = _reg_vectors(hp, F, W)
    # t̂: column F → 1 (so the bias update shares the factor formula),
    # padding columns → 0.
    ihat = row_i32 * factor + biascol

    # pred = μ + b_u + b_i + Σ_f p q  — Σ(row_u·î) contributes Σ p q + b_u.
    pred = (pm.global_bias + jnp.sum(row_u32 * ihat, axis=-1)
            + row_i32[:, F])
    err = jnp.where(has, ratings - pred, 0.0)

    hasf = has[:, None]
    du = lr * (err[:, None] * ihat - reg_u * row_u32)
    T_u_new = jnp.where(hasf, row_u32 + du, row_u32).astype(dt)

    if not train_items:
        return PackedModel(T_u=T_u_new, T_i=T_i,
                           global_bias=pm.global_bias, n_factors=F)

    if collision == "first_wins":
        # Election inversion: rotated priority is invertible
        # (uid = (prio + start_user) mod U), so after the scatter-min
        # election the item side needs NO scatter and NO win-mask gather —
        # it becomes a dense map over the item table that row-gathers each
        # item's winning user.  (Scatter-free first-wins; the single
        # remaining scatter in the step is the election's scalar min.)
        prio = rotated_priority(U, iteration, 0, U, rotation)
        best, _cand = elect_winners(items, has, prio, I)  # (I_pad,)
        start_user = (iteration * rotation) % jnp.int32(U)
        I_pad = best.shape[0]
        sentinel = jnp.iinfo(jnp.int32).max
        has_winner = best != sentinel                      # (I_pad,)
        winner_uid = jnp.where(has_winner,
                               (best + start_user) % jnp.int32(U), 0)
        w_rows = row_u32[winner_uid[:I]]                   # (I, W) pre-step
        # winner's sampled rating, via a lane-aligned gather over users
        U_lanes = -(-U // 128) * 128
        ratings_pad = jnp.pad(ratings, (0, U_lanes - U))
        from cu2rec_tpu.ops.sgd import gather_1d
        w_rat = gather_1d(ratings_pad, winner_uid[:I])     # (I,)
        T_i32 = T_i.astype(jnp.float32)
        ihat_d = T_i32 * factor + biascol                  # dense (I, W)
        uhat_w = w_rows * factor + biascol
        pred_w = (pm.global_bias + jnp.sum(w_rows * ihat_d, axis=-1)
                  + T_i32[:, F])
        err_w = jnp.where(has_winner[:I], w_rat - pred_w, 0.0)
        di = lr * (err_w[:, None] * uhat_w - reg_i * T_i32)
        T_i_new = jnp.where(has_winner[:I, None], T_i32 + di,
                            T_i32).astype(dt)
        return PackedModel(T_u=T_u_new, T_i=T_i_new,
                           global_bias=pm.global_bias, n_factors=F)

    if collision == "twin":
        # Twin sampling: the item side samples its OWN (user, rating) per
        # item from the item-major CSR, symmetric to the user side — every
        # rated item takes one SGD step per iteration, exactly as every
        # rating user does.  This replaces the election entirely: the step
        # becomes scatter-free (dense passes + row gathers only), removing
        # the I-proportional scatter-min that dominated the first_wins
        # step (~36% at ML-20M scale) and the pmin collective in the
        # sharded path.  A deliberate TPU-first semantic redesign of the
        # reference's Hogwild race (sgd.cu:47-63): where first-wins DROPS
        # colliding updates, twin gives every item exactly one update —
        # no lost work, no bias toward low-priority users.  Sample streams
        # are counter-based on (U_global + item id), disjoint from user
        # streams and shard-invariant.
        if dev.it_indptr is None:
            raise ValueError("collision='twin' needs item-major arrays: "
                             "build DeviceRatings with item_major=True")
        if dev.it_pair_pack is not None:
            s_uid, w_rat, has_i = sample_items(
                key, iteration, dev.it_indptr, None, None,
                user_offset=dev.n_users, pair_pack=dev.it_pair_pack)
        else:
            # Lean (mirror-free) layout: same counter-based positions,
            # fetched through the it_order permutation into the resident
            # row_ids/data arrays — identical sample stream, 12 fewer
            # bytes/rating of HBM (see data/csr.to_device lean=True).
            from cu2rec_tpu.ops.sgd import gather_1d, sample_positions
            pos, has_i = sample_positions(key, iteration, dev.it_indptr,
                                          user_offset=dev.n_users)
            q = gather_1d(dev.it_order, pos)
            s_uid = gather_1d(dev.row_ids, q)
            w_rat = gather_1d(dev.data, q)
        w_rows = row_u32[s_uid]                            # (I, W) pre-step
        T_i32 = T_i.astype(jnp.float32)
        ihat_d = T_i32 * factor + biascol
        uhat_w = w_rows * factor + biascol
        pred_w = (pm.global_bias + jnp.sum(w_rows * ihat_d, axis=-1)
                  + T_i32[:, F])
        err_w = jnp.where(has_i, w_rat - pred_w, 0.0)
        di = lr * (err_w[:, None] * uhat_w - reg_i * T_i32)
        T_i_new = jnp.where(has_i[:, None], T_i32 + di, T_i32).astype(dt)
        return PackedModel(T_u=T_u_new, T_i=T_i_new,
                           global_bias=pm.global_bias, n_factors=F)

    uhat = row_u32 * factor + biascol
    di = lr * (err[:, None] * uhat - reg_i * row_i32)
    if collision == "mean":
        from cu2rec_tpu.ops.sgd import GATHER_LANES, gather_1d
        I_pad = -(-I // GATHER_LANES) * GATHER_LANES
        counts = jnp.zeros((I_pad,), dtype=jnp.float32).at[items].add(
            has.astype(jnp.float32))
        denom = gather_1d(jnp.maximum(counts, 1.0), items)
        di = jnp.where(hasf, di / denom[:, None], 0.0)
    elif collision == "sum":
        # plain minibatch scatter-add: colliding updates accumulate.
        di = jnp.where(hasf, di, 0.0)
    else:
        raise ValueError(f"unknown collision policy: {collision}")
    T_i_new = T_i.at[items].add(di.astype(dt))
    return PackedModel(T_u=T_u_new, T_i=T_i_new,
                       global_bias=pm.global_bias, n_factors=F)


@partial(jax.jit, static_argnames=("train_items", "collision"),
         donate_argnames=("pm",))
def packed_run_steps(pm: PackedModel, dev, hp: Hyper, key, start_iter,
                     n_steps, train_items: bool = True,
                     collision: str = "first_wins") -> PackedModel:
    """``n_steps`` is a dynamic trip count — one compiled program serves
    every segment length (remote compiles are minutes on this platform)."""
    def body(i, m):
        return packed_step(m, dev, hp, key, start_iter + i,
                           train_items=train_items, collision=collision)

    return jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32), body, pm)
