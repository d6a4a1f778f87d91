"""Pallas TPU kernel for the SGD step's dense core.

The step decomposes into (a) sampling + row gather + winner election +
row scatter — memory ops XLA's native gather/scatter already run near
achievable HBM bandwidth — and (b) the dense arithmetic over the packed
(U, W) user rows: prediction, error, both delta computations.  This module
implements (b) as ONE Pallas kernel pass: a user-tile streams through VMEM
once, and the error, the user-row update, and the item-row delta all come
out of that single pass — where the XLA path may materialize intermediates
(î, û, masks) between fusions.

Wire-up: ``pallas_run_steps`` is a drop-in for
``cu2rec_tpu.ops.packed.packed_run_steps`` (enabled by
``Config.use_pallas``); everything except the dense core still runs through
the same XLA ops, keeping semantics identical (tests compare against the
packed path, interpret mode on CPU).

Measured reality (TPU v5e, ML-20M scale): 5.05 ms/step vs 2.74 ms for the
pure-XLA packed path — the step is bound by gather/election/scatter memory
ops, which XLA already schedules well, and this variant keeps the
scatter-based item commit (the XLA path uses the scatter-free election
inversion).  Kept as a correct, tested alternative implementation and the
scaffold for future fused-kernel work, not the default.

Kernel facts (see /opt/skills/guides/pallas_guide.md): tiles are
(TILE_U, W) with W ∈ {64, 128, 256, 384} — always a lane multiple; scalars
arrive as (1, 1) SMEM refs; the grid streams user tiles, so VMEM holds
only O(TILE_U × W) at a time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cu2rec_tpu.ops.packed import PackedModel
from cu2rec_tpu.ops.sgd import (
    Hyper, elect_winners, rotated_priority, sample_items, win_mask,
)

TILE_U = 512


def _dense_core_kernel(hp_ref, mu_ref, nf_ref,
                       tu_ref, ri_ref, rat_ref, hasw_ref,
                       tu_out_ref, di_out_ref):
    """One user-tile: fused pred/err/update/delta.

    hp_ref: (1, 8) SMEM — [lr, P_reg, Q_reg, ub_reg, ib_reg, pad...]
    mu_ref: (1, 1) SMEM — global bias
    nf_ref: (1, 1) SMEM — n_factors (runtime scalar; W is static)
    tu_ref/ri_ref: (TILE_U, W) VMEM — user rows / gathered item rows
    rat_ref: (TILE_U, 1) VMEM — sampled ratings
    hasw_ref: (TILE_U, 2) VMEM f32 — [has, win] masks
    outputs: updated user rows, item-row deltas
    """
    lr = hp_ref[0, 0]
    p_reg = hp_ref[0, 1]
    q_reg = hp_ref[0, 2]
    ub_reg = hp_ref[0, 3]
    ib_reg = hp_ref[0, 4]
    mu = mu_ref[0, 0]
    F = nf_ref[0, 0]

    tu = tu_ref[:].astype(jnp.float32)
    ri = ri_ref[:].astype(jnp.float32)
    W = tu.shape[1]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    factor = (col < F).astype(jnp.float32)
    biascol = (col == F).astype(jnp.float32)
    reg_u = factor * p_reg + biascol * ub_reg
    reg_i = factor * q_reg + biascol * ib_reg

    ihat = ri * factor + biascol
    uhat = tu * factor + biascol

    ib_g = jnp.sum(ri * biascol, axis=1, keepdims=True)
    pred = mu + jnp.sum(tu * ihat, axis=1, keepdims=True) + ib_g
    has = hasw_ref[:, 0:1]
    win = hasw_ref[:, 1:2]
    err = (rat_ref[:] - pred) * has

    du = lr * (err * ihat - reg_u * tu)
    tu_out_ref[:] = (tu + du * has).astype(tu_ref.dtype)
    di = lr * (err * uhat - reg_i * ri)
    di_out_ref[:] = (di * win).astype(di_out_ref.dtype)


def dense_core(T_u, row_i, ratings, has, win, hp: Hyper, mu, n_factors,
               *, interpret=False):
    """Fused dense pass over all users: returns (T_u_new, di_rows)."""
    U, W = T_u.shape
    n_tiles = pl.cdiv(U, TILE_U)
    U_pad = n_tiles * TILE_U
    if U_pad != U:
        T_u = jnp.pad(T_u, ((0, U_pad - U), (0, 0)))
        row_i = jnp.pad(row_i, ((0, U_pad - U), (0, 0)))
        ratings = jnp.pad(ratings, (0, U_pad - U))
        has = jnp.pad(has, (0, U_pad - U))
        win = jnp.pad(win, (0, U_pad - U))

    hp_arr = jnp.stack([hp.learning_rate, hp.P_reg, hp.Q_reg,
                        hp.user_bias_reg, hp.item_bias_reg,
                        jnp.float32(0), jnp.float32(0),
                        jnp.float32(0)]).reshape(1, 8)
    mu_arr = jnp.asarray(mu, dtype=jnp.float32).reshape(1, 1)
    nf_arr = jnp.asarray(n_factors, dtype=jnp.int32).reshape(1, 1)
    hasw = jnp.stack([has.astype(jnp.float32),
                      win.astype(jnp.float32)], axis=1)
    rat = ratings.astype(jnp.float32).reshape(-1, 1)

    tile_spec = pl.BlockSpec((TILE_U, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = lambda w: pl.BlockSpec((TILE_U, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    smem = lambda w: pl.BlockSpec((1, w), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)

    T_u_new, di = pl.pallas_call(
        _dense_core_kernel,
        grid=(n_tiles,),
        in_specs=[smem(8), smem(1), smem(1),
                  tile_spec, tile_spec, vec_spec(1), vec_spec(2)],
        out_specs=[tile_spec, tile_spec],
        out_shape=[jax.ShapeDtypeStruct((U_pad, W), T_u.dtype),
                   jax.ShapeDtypeStruct((U_pad, W), T_u.dtype)],
        interpret=interpret,
    )(hp_arr, mu_arr, nf_arr, T_u, row_i, rat, hasw)
    return T_u_new[:U], di[:U]


def pallas_step(pm: PackedModel, dev, hp: Hyper, key, iteration,
                *, train_items=True, collision="first_wins",
                rotation: int = 250, interpret=False) -> PackedModel:
    """One SGD iteration: XLA sampling/gather/election/scatter around the
    Pallas dense core."""
    U, W = pm.T_u.shape
    I = pm.T_i.shape[0]
    items, ratings, has = sample_items(key, iteration, dev.indptr,
                                       dev.indices, dev.data)
    if train_items and collision == "first_wins":
        prio = rotated_priority(U, iteration, 0, U, rotation)
        best, cand = elect_winners(items, has, prio, I)
        win = win_mask(best, items, cand, has)
    elif train_items:
        win = has
    else:
        win = jnp.zeros_like(has)

    row_i = pm.T_i[items]
    T_u_new, di = dense_core(pm.T_u, row_i, ratings, has, win, hp,
                             pm.global_bias, pm.n_factors,
                             interpret=interpret)
    T_i_new = pm.T_i
    if train_items:
        if collision == "mean":
            from cu2rec_tpu.ops.sgd import GATHER_LANES, gather_1d
            I_pad = -(-I // GATHER_LANES) * GATHER_LANES
            counts = jnp.zeros((I_pad,), dtype=jnp.float32).at[items].add(
                has.astype(jnp.float32))
            di = di / gather_1d(jnp.maximum(counts, 1.0), items)[:, None]
        T_i_new = pm.T_i.at[items].add(di.astype(pm.T_i.dtype))
    return PackedModel(T_u=T_u_new, T_i=T_i_new,
                       global_bias=pm.global_bias, n_factors=pm.n_factors)


@functools.partial(jax.jit,
                   static_argnames=("train_items", "collision",
                                    "interpret"),
                   donate_argnames=("pm",))
def pallas_run_steps(pm: PackedModel, dev, hp: Hyper, key, start_iter,
                     n_steps, train_items: bool = True,
                     collision: str = "first_wins",
                     interpret: bool = False) -> PackedModel:
    def body(i, m):
        return pallas_step(m, dev, hp, key, start_iter + i,
                           train_items=train_items, collision=collision,
                           interpret=interpret)

    return jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32), body, pm)
