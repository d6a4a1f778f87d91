"""Sharded BPR training — dp-sharded user axis, replicated item table.

Mesh design: BPR's three passes (ops/bpr.py) sample *per item row* in the
two item passes, so an ip-sharded item table would need per-ip-divergent
row assemblies (each ip shard queries different negatives) — a gather the
psum-assembly trick cannot express.  At every MovieLens/Netflix catalog
size the item table is small (I ≤ ~30K rows) and docs/SCALING.md already
establishes ip=1 as the right placement there, so the sharded BPR engine
shards ONLY the user axis (``Mesh(('dp',))``) and replicates T_i; the two
item passes run replicated (identical on every shard — the same
redundancy the twin step's ip=1 item pass has).

Collectives per step (all over ``dp``):
  * ``psum`` of the item-pos pass's sampled-rater rows (I, W);
  * ``psum`` of the item-neg pass's sampled-user rows (I, W);
  * two small (I,) ``psum``s assembling the sampled users' CSR slice
    lengths and sampled positive item ids.

Determinism: every sampling stream is a counter function of the GLOBAL
row id (ops/sgd.py counter_uniform), so sharded training is bit-identical
to the single-device ops/bpr.py step — verified by tests/test_bpr.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cu2rec_tpu.data.csr import CSRRatings, _interleave_pairs, transpose_csr
from cu2rec_tpu.models.state import MFModel, init_model
from cu2rec_tpu.ops.bpr import _uniform_ids
from cu2rec_tpu.ops.packed import _reg_vectors, pack, unpack
from cu2rec_tpu.ops.sgd import Hyper, counter_uniform, sample_items
from cu2rec_tpu.parallel.sharded import shard_ratings, _ceil_to
from cu2rec_tpu.utils.config import Config


def _local_bpr_step(T_u_l, T_i, mu, indptr_l, indices_l, data_l,
                    hp: Hyper, key, iteration,
                    n_users_global: int, n_items_global: int,
                    n_factors: int, it_indptr, it_pair):
    """One BPR iteration inside shard_map (axis 'dp').

    Semantics identical to ops.bpr.bpr_step: same streams keyed by global
    ids, same triple per global row, same arithmetic — only the layout
    (local user block + psum row assemblies) differs."""
    dp = jax.lax.axis_index("dp")
    U_loc, W = T_u_l.shape
    U, I = n_users_global, n_items_global
    F = n_factors
    dt = T_u_l.dtype
    lr = hp.learning_rate
    user_offset = dp * U_loc

    factor, biascol, reg_u, reg_i = _reg_vectors(hp, F, W)
    row_u = T_u_l.astype(jnp.float32)
    T_i32 = T_i.astype(jnp.float32)

    def ihat(rows):
        return rows * factor + biascol

    # ---- user pass (local: T_i replicated) ----
    i_pos, _r, has_u = sample_items(key, iteration, indptr_l, indices_l,
                                    data_l, user_offset=user_offset)
    j_neg = _uniform_ids(key, iteration, U_loc, I, tag=1,
                         offset=user_offset)
    t_i = T_i32[i_pos]
    t_j = T_i32[j_neg]
    diff = ihat(t_i) - ihat(t_j)
    x_u = jnp.sum(row_u * diff, axis=-1) + t_i[:, F] - t_j[:, F]
    e_u = jnp.where(has_u, jax.nn.sigmoid(-x_u), 0.0)
    du = lr * (e_u[:, None] * diff - reg_u * row_u)
    T_u_new = jnp.where(has_u[:, None], row_u + du, row_u).astype(dt)

    # ---- item-positive pass (replicated; rater rows assembled via psum) --
    u_of_y, _r2, has_y = sample_items(key, iteration, it_indptr, None, None,
                                      user_offset=U, pair_pack=it_pair)
    own_u = (u_of_y >= user_offset) & (u_of_y < user_offset + U_loc)
    loc_u = jnp.clip(u_of_y - user_offset, 0, U_loc - 1)
    w_rows = jax.lax.psum(
        jnp.where(own_u[:, None], row_u[loc_u], 0.0), "dp")
    jn_y = _uniform_ids(key, iteration, I, I, tag=2, offset=U)
    uhat = ihat(w_rows)
    t_jy = T_i32[jn_y]
    x_pos = (jnp.sum(w_rows * factor * (T_i32 - t_jy), axis=-1)
             + T_i32[:, F] - t_jy[:, F])
    e_pos = jnp.where(has_y, jax.nn.sigmoid(-x_pos), 0.0)
    di_pos = lr * (e_pos[:, None] * uhat - reg_i * T_i32)

    # ---- item-negative pass ----
    v = _uniform_ids(key, iteration, I, U, tag=3, offset=U + I)
    own_v = (v >= user_offset) & (v < user_offset + U_loc)
    loc_v = jnp.clip(v - user_offset, 0, U_loc - 1)
    starts_l = indptr_l[:-1]
    lens_l = indptr_l[1:] - indptr_l[:-1]
    len_v = jax.lax.psum(
        jnp.where(own_v, lens_l[loc_v], 0), "dp")
    kv = jax.random.fold_in(key, 4)
    u01 = counter_uniform(kv, iteration,
                          jnp.arange(I, dtype=jnp.uint32)
                          + jnp.uint32(2 * U))
    off = jnp.minimum((u01 * len_v).astype(jnp.int32),
                      jnp.maximum(len_v - 1, 0))
    pos_v = starts_l[loc_v] + off          # valid only where own_v
    iv = jax.lax.psum(
        jnp.where(own_v, indices_l[pos_v], 0), "dp")
    has_v = len_v > 0
    v_rows = jax.lax.psum(
        jnp.where(own_v[:, None], row_u[loc_v], 0.0), "dp")
    t_iv = T_i32[iv]
    x_neg = (jnp.sum(v_rows * factor * (t_iv - T_i32), axis=-1)
             + t_iv[:, F] - T_i32[:, F])
    e_neg = jnp.where(has_v, jax.nn.sigmoid(-x_neg), 0.0)
    di_neg = (-lr) * e_neg[:, None] * ihat(v_rows)

    T_i_new = (T_i32 + jnp.where(has_y[:, None], di_pos, 0.0)
               + jnp.where(has_v[:, None], di_neg, 0.0)).astype(dt)
    return T_u_new, T_i_new


class ShardedBPR:
    """dp-sharded BPR engine: run(key, start, n) + model()."""

    def __init__(self, train_csr: CSRRatings, cfg: Config,
                 n_devices: int | None = None, mesh: Mesh | None = None,
                 model: MFModel | None = None):
        if mesh is None:
            n = n_devices or len(jax.devices())
            mesh = Mesh(np.asarray(jax.devices()[:n]), ("dp",))
        self.mesh = mesh
        self.n_dp = mesh.shape["dp"]
        self.cfg = cfg
        self.n_users = train_csr.n_users
        self.n_items = train_csr.n_items
        self.train_sh = shard_ratings(train_csr, self.n_dp, 1, mesh)
        self.U_pad = self.train_sh.n_users_padded

        # item-major sampling arrays, replicated (full catalog)
        it_indptr, it_users, it_vals = transpose_csr(train_csr)
        pad = _ceil_to(max(len(it_users), 1), 64) - len(it_users)
        self.it_indptr = jax.device_put(
            jnp.asarray(it_indptr.astype(np.int32)),
            NamedSharding(mesh, P()))
        self.it_pair = jax.device_put(
            jnp.asarray(_interleave_pairs(
                np.pad(it_users, (0, pad)),
                np.pad(it_vals.astype(np.float32), (0, pad)))),
            NamedSharding(mesh, P()))

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
        self.T_u = jax.device_put(T_u, NamedSharding(mesh, P("dp", None)))
        self.T_i = jax.device_put(pm.T_i, NamedSharding(mesh, P()))
        # fresh scalar: run() donates the model tuple, and donating the
        # caller's own global_bias array would delete it under them
        self.mu = jnp.float32(float(model.global_bias))
        self._build()

    def _build(self):
        mesh = self.mesh
        U, I, F = self.n_users, self.n_items, self.n_factors

        from cu2rec_tpu.parallel.sharded import shard_map_compat
        shard_map = shard_map_compat()

        model_specs = (P("dp", None), P(), P())
        ratings_specs = (P("dp", None), P("dp", None), P("dp", None))
        it_specs = (P(), P())

        def body(model_t, ratings_t, it_t, hp, key, start_iter, n_steps):
            indptr, indices, data = (x[0] for x in ratings_t)
            it_indptr, it_pair = it_t

            def one(i, carry):
                T_u_l, T_i, mu = carry
                T_u_new, T_i_new = _local_bpr_step(
                    T_u_l, T_i, mu, indptr, indices, data,
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
        it_t = (self.it_indptr, self.it_pair)
        self.T_u, self.T_i, self.mu = self._run_jit(
            model_t, ratings_t, it_t, hp, key,
            jnp.asarray(start_iter, jnp.int32), n_steps)

    def model(self) -> MFModel:
        from cu2rec_tpu.ops.packed import PackedModel
        pm = PackedModel(T_u=self.T_u[:self.n_users], T_i=self.T_i,
                         global_bias=self.mu, n_factors=self.n_factors)
        return unpack(pm)
