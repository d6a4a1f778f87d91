"""Sharded BPR training — 2D ``Mesh(('dp', 'ip'))``: user axis sharded
over ``dp``, item table row-sharded over ``ip`` (replicated at ip=1).

BPR's three passes (ops/bpr.py) gather arbitrary item rows in every
pass (positives, uniform negatives, raters' sampled positives), so an
ip-sharded item table needs four dense row *assemblies* per step — the
same owned-contribution + ``psum`` trick the SGD engine uses
(parallel/sharded.py): each ip shard contributes the rows it owns and a
``psum`` over 'ip' materializes the full gathered batch.  At MovieLens/
Netflix catalog sizes ip=1 (replicated T_i) remains the right placement
(docs/SCALING.md) and the assemblies degenerate to no-ops; ip>1 is the
ranking-training path for catalogs too large for one chip's HBM —
T_i memory AND the two dp item-psums shrink to I/ip rows per shard.

Collectives per step:
  * over ``ip``: t_i/t_j shared-query assemblies (user pass, (U_loc, W)
    psum each), and t_jy/t_iv DIVERGENT-query assemblies (item passes:
    each ip shard queries its own negatives, so the queries are
    all-gathered first, the (I_pad, W) answer psum-materialized, and
    each shard slices its segment — see assemble_items_divergent);
  * over ``dp``: the item passes' sampled-user rows ((I_loc, W) × 2)
    and the item-neg pass's sampled slice lengths/ids ((I_loc,) × 2).

Determinism: every sampling stream is a counter function of the GLOBAL
row id (ops/sgd.py counter_uniform), so sharded training is bit-identical
to the single-device ops/bpr.py step for ANY (dp, ip) — verified by
tests/test_bpr.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cu2rec_tpu.data.csr import CSRRatings
from cu2rec_tpu.models.state import MFModel, init_model
from cu2rec_tpu.ops.bpr import _uniform_ids
from cu2rec_tpu.ops.packed import _reg_vectors, pack, unpack
from cu2rec_tpu.ops.sgd import Hyper, counter_uniform, sample_items
from cu2rec_tpu.parallel.sharded import (
    _ceil_to, make_mesh, shard_ratings, shard_ratings_item_major,
)
from cu2rec_tpu.utils.config import Config


def _local_bpr_step(T_u_l, T_i_l, mu, indptr_l, indices_l, data_l,
                    hp: Hyper, key, iteration,
                    n_users_global: int, n_items_global: int,
                    n_factors: int, it_indptr_l, it_pair_l):
    """One BPR iteration inside shard_map (axes 'dp' × 'ip').

    Semantics identical to ops.bpr.bpr_step: same streams keyed by global
    ids, same triple per global row, same arithmetic — only the layout
    (local user/item blocks + psum row assemblies) differs."""
    dp = jax.lax.axis_index("dp")
    ip = jax.lax.axis_index("ip")
    U_loc, W = T_u_l.shape
    I_loc = T_i_l.shape[0]
    U, I = n_users_global, n_items_global
    F = n_factors
    dt = T_u_l.dtype
    lr = hp.learning_rate
    user_offset = dp * U_loc
    item_offset = ip * I_loc

    factor, biascol, reg_u, reg_i = _reg_vectors(hp, F, W)
    row_u = T_u_l.astype(jnp.float32)
    T_i32 = T_i_l.astype(jnp.float32)

    def ihat(rows):
        return rows * factor + biascol

    def assemble_items(ids):
        """(N,) global item ids → (N, W) f32 rows, psum-assembled over
        'ip' from each shard's owned block (identity at ip=1).

        Correct ONLY when every ip shard in the collective holds the
        SAME ``ids`` vector (the user pass: i_pos/j_neg are functions of
        the dp-sharded ratings, identical across ip)."""
        owned = (ids >= item_offset) & (ids < item_offset + I_loc)
        loc = jnp.clip(ids - item_offset, 0, I_loc - 1)
        return jax.lax.psum(
            jnp.where(owned[:, None], T_i32[loc], 0.0), "ip")

    def assemble_items_divergent(ids_local):
        """(I_loc,) global item ids that DIFFER per ip shard (each
        shard's item pass queries its own negatives) → (I_loc, W) rows.

        A plain psum-assembly would sum rows gathered for DIFFERENT
        queries, so the queries are first all-gathered over 'ip'; every
        shard contributes its owned rows for ALL shards' queries, the
        psum materializes the (I_pad, W) answer, and each shard slices
        its own segment back out.  Degenerates to a plain gather at
        ip=1."""
        all_ids = jax.lax.all_gather(ids_local, "ip", axis=0,
                                     tiled=True)          # (I_pad,)
        owned = (all_ids >= item_offset) & (all_ids
                                            < item_offset + I_loc)
        loc = jnp.clip(all_ids - item_offset, 0, I_loc - 1)
        full = jax.lax.psum(
            jnp.where(owned[:, None], T_i32[loc], 0.0), "ip")
        return jax.lax.dynamic_slice_in_dim(full, ip * I_loc, I_loc, 0)

    # ---- user pass ----
    i_pos, _r, has_u = sample_items(key, iteration, indptr_l, indices_l,
                                    data_l, user_offset=user_offset)
    j_neg = _uniform_ids(key, iteration, U_loc, I, tag=1,
                         offset=user_offset)
    t_i = assemble_items(i_pos)
    t_j = assemble_items(j_neg)
    diff = ihat(t_i) - ihat(t_j)
    x_u = jnp.sum(row_u * diff, axis=-1) + t_i[:, F] - t_j[:, F]
    e_u = jnp.where(has_u, jax.nn.sigmoid(-x_u), 0.0)
    du = lr * (e_u[:, None] * diff - reg_u * row_u)
    T_u_new = jnp.where(has_u[:, None], row_u + du, row_u).astype(dt)

    # ---- item-positive pass (owned block; rater rows via dp psum) ----
    # Streams keyed by the GLOBAL item id: U + item_offset + local index.
    u_of_y, _r2, has_y = sample_items(key, iteration, it_indptr_l, None,
                                      None, user_offset=U + item_offset,
                                      pair_pack=it_pair_l)
    own_u = (u_of_y >= user_offset) & (u_of_y < user_offset + U_loc)
    loc_u = jnp.clip(u_of_y - user_offset, 0, U_loc - 1)
    w_rows = jax.lax.psum(
        jnp.where(own_u[:, None], row_u[loc_u], 0.0), "dp")
    jn_y = _uniform_ids(key, iteration, I_loc, I, tag=2,
                        offset=U + item_offset)
    uhat = ihat(w_rows)
    t_jy = assemble_items_divergent(jn_y)
    x_pos = (jnp.sum(w_rows * factor * (T_i32 - t_jy), axis=-1)
             + T_i32[:, F] - t_jy[:, F])
    e_pos = jnp.where(has_y, jax.nn.sigmoid(-x_pos), 0.0)
    di_pos = lr * (e_pos[:, None] * uhat - reg_i * T_i32)

    # ---- item-negative pass ----
    v = _uniform_ids(key, iteration, I_loc, U, tag=3,
                     offset=U + I + item_offset)
    own_v = (v >= user_offset) & (v < user_offset + U_loc)
    loc_v = jnp.clip(v - user_offset, 0, U_loc - 1)
    starts_l = indptr_l[:-1]
    lens_l = indptr_l[1:] - indptr_l[:-1]
    len_v = jax.lax.psum(
        jnp.where(own_v, lens_l[loc_v], 0), "dp")
    kv = jax.random.fold_in(key, 4)
    u01 = counter_uniform(kv, iteration,
                          jnp.arange(I_loc, dtype=jnp.uint32)
                          + jnp.uint32(2 * U + item_offset))
    off = jnp.minimum((u01 * len_v).astype(jnp.int32),
                      jnp.maximum(len_v - 1, 0))
    pos_v = starts_l[loc_v] + off          # valid only where own_v
    iv = jax.lax.psum(
        jnp.where(own_v, indices_l[pos_v], 0), "dp")
    has_v = len_v > 0
    v_rows = jax.lax.psum(
        jnp.where(own_v[:, None], row_u[loc_v], 0.0), "dp")
    t_iv = assemble_items_divergent(iv)
    x_neg = (jnp.sum(v_rows * factor * (t_iv - T_i32), axis=-1)
             + t_iv[:, F] - T_i32[:, F])
    e_neg = jnp.where(has_v, jax.nn.sigmoid(-x_neg), 0.0)
    di_neg = (-lr) * e_neg[:, None] * ihat(v_rows)

    T_i_new = (T_i32 + jnp.where(has_y[:, None], di_pos, 0.0)
               + jnp.where(has_v[:, None], di_neg, 0.0)).astype(dt)
    return T_u_new, T_i_new


class ShardedBPR:
    """(dp × ip)-sharded BPR engine: run(key, start, n) + model()."""

    def __init__(self, train_csr: CSRRatings, cfg: Config,
                 n_devices: int | None = None, mesh: Mesh | None = None,
                 model: MFModel | None = None, n_ip: int = 1):
        if mesh is None:
            n = n_devices or len(jax.devices())
            mesh = make_mesh(n // n_ip, n_ip)
        self.mesh = mesh
        self.n_dp = mesh.shape["dp"]
        self.n_ip = mesh.shape["ip"]
        self.cfg = cfg
        self.n_users = train_csr.n_users
        self.n_items = train_csr.n_items
        self.train_sh = shard_ratings(train_csr, self.n_dp, self.n_ip,
                                      mesh)
        self.U_pad = self.train_sh.n_users_padded
        self.I_pad = _ceil_to(self.n_items, self.n_ip)

        # item-major sampling structure, ip-sharded (replicated at ip=1)
        self.it_sh = shard_ratings_item_major(train_csr, self.n_ip, mesh)

        if model is None:
            model = init_model(self.n_users, self.n_items, cfg.n_factors,
                               0.0, seed=cfg.seed,
                               dtype=jnp.dtype(cfg.dtype))
            model = MFModel(P=model.P, Q=model.Q,
                            user_bias=jnp.zeros_like(model.user_bias),
                            item_bias=jnp.zeros_like(model.item_bias),
                            global_bias=jnp.float32(0.0))
        pm = pack(model)
        self.n_factors = pm.n_factors
        T_u = jnp.pad(pm.T_u, ((0, self.U_pad - self.n_users), (0, 0)))
        T_i = jnp.pad(pm.T_i, ((0, self.I_pad - self.n_items), (0, 0)))
        self.T_u = jax.device_put(T_u, NamedSharding(mesh, P("dp", None)))
        self.T_i = jax.device_put(T_i, NamedSharding(mesh, P("ip", None)))
        # fresh scalar: run() donates the model tuple, and donating the
        # caller's own global_bias array would delete it under them
        self.mu = jnp.float32(float(model.global_bias))
        self._build()

    def _build(self):
        mesh = self.mesh
        U, I, F = self.n_users, self.n_items, self.n_factors

        from cu2rec_tpu.parallel.sharded import shard_map_compat
        shard_map = shard_map_compat()

        model_specs = (P("dp", None), P("ip", None), P())
        ratings_specs = (P("dp", None), P("dp", None), P("dp", None))
        it_specs = (P("ip", None), P("ip", None, None))

        def body(model_t, ratings_t, it_t, hp, key, start_iter, n_steps):
            indptr, indices, data = (x[0] for x in ratings_t)
            it_indptr, it_pair = (x[0] for x in it_t)

            def one(i, carry):
                T_u_l, T_i_l, mu = carry
                T_u_new, T_i_new = _local_bpr_step(
                    T_u_l, T_i_l, mu, indptr, indices, data,
                    hp, key, start_iter + i, U, I, F, it_indptr, it_pair)
                return (T_u_new, T_i_new, mu)

            return jax.lax.fori_loop(0, n_steps, one, model_t)

        @partial(jax.jit, donate_argnums=(0,))
        def run(model_t, ratings_t, it_t, hp, key, start_iter, n_steps):
            f = shard_map(body, mesh=mesh,
                          in_specs=(model_specs, ratings_specs, it_specs,
                                    P(), P(), P(), P()),
                          out_specs=model_specs)
            return f(model_t, ratings_t, it_t, hp, key, start_iter,
                     jnp.asarray(n_steps, jnp.int32))

        self._run_jit = run

    def run(self, hp: Hyper, key, start_iter: int, n_steps: int) -> None:
        sh = self.train_sh
        model_t = (self.T_u, self.T_i, self.mu)
        ratings_t = (sh.indptr, sh.indices, sh.data)
        it_t = (self.it_sh.it_indptr, self.it_sh.it_pair)
        self.T_u, self.T_i, self.mu = self._run_jit(
            model_t, ratings_t, it_t, hp, key,
            jnp.asarray(start_iter, jnp.int32), n_steps)

    def model(self) -> MFModel:
        from cu2rec_tpu.ops.packed import PackedModel
        pm = PackedModel(T_u=self.T_u[:self.n_users],
                         T_i=self.T_i[:self.n_items],
                         global_bias=self.mu, n_factors=self.n_factors)
        return unpack(pm)
