"""Multi-device sharded training — the distributed layer the reference
never had (SURVEY §2: "no DP across devices … no distributed communication
backend at all"; the reference is single-process single-GPU).

Design (per BASELINE.json north star, built TPU-first):

* **Mesh**: 2D ``Mesh(('dp', 'ip'))``.  The user axis shards over ``dp``
  (data parallelism over rating shards: each dp shard owns a contiguous
  block of users, their P rows, user biases, and their CSR rating slices —
  the embedding-table analogue of DP).  The item axis shards over ``ip``
  (model parallelism: Q/item_bias row-sharded by item — the TP analogue
  for embedding tables).  ``ip=1`` replicates the item tables, which is
  the right choice at MovieLens/Netflix catalog sizes (I ≤ ~30K rows);
  ``ip>1`` shards catalogs too big for one chip's HBM.

* **Collectives** (XLA over ICI, replacing the nonexistent NCCL/MPI):
  - item-row *assembly*: each ip shard contributes its owned rows of the
    per-user gathered Q rows; a ``psum`` over ``ip`` assembles them
    (dense, MXU/VPU-friendly; no ragged all_to_all needed);
  - winner *election*: per-item best priority is a local scatter-min
    followed by ``pmin`` over ``dp`` — the deterministic, mesh-wide
    first-writer-wins that replaces sgd.cu:47-50's racy flag;
  - item-delta *reduction*: winner deltas scatter into a dense local
    (I/ip, F) buffer and ``psum`` over ``dp`` applies them to every
    replica consistently;
  - eval: local partial error sums + ``psum`` (the cross-device form of
    loss.cu's tree reduction).

* **Determinism**: sampling uses the counter-based per-(iteration, user)
  stream of ops.sgd.sample_items, so a sharded run computes *exactly* the
  same updates as the single-chip run — verified by tests/test_parallel.py.
  The reference could never make such a claim across any reshaping of its
  launch geometry.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cu2rec_tpu.data.csr import CSRRatings
from cu2rec_tpu.models.state import MFModel, init_model
from cu2rec_tpu.ops.sgd import Hyper, rotated_priority, sample_items
from cu2rec_tpu.utils.config import Config

INT32_MAX = np.iinfo(np.int32).max


def make_mesh(n_dp: int, n_ip: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None
                         else jax.devices()[:n_dp * n_ip])
    if devices.size < n_dp * n_ip:
        raise ValueError(f"need {n_dp * n_ip} devices, have {devices.size}")
    return Mesh(devices[:n_dp * n_ip].reshape(n_dp, n_ip), ("dp", "ip"))


def shard_map_compat(mesh=None):
    """``jax.shard_map`` across JAX versions (new ``check_vma`` kw vs the
    experimental module's ``check_rep``), replication checking off: the
    engines' outputs are replicated by psum construction, which the
    checker cannot always prove.  With ``mesh`` the kwarg is pre-bound."""
    try:
        from jax import shard_map as _sm
        f = partial(_sm, check_vma=False)
    except (ImportError, TypeError):  # older JAX
        from jax.experimental.shard_map import shard_map as _sm
        f = partial(_sm, check_rep=False)
    return partial(f, mesh=mesh) if mesh is not None else f


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class ShardedRatings:
    """Ratings pre-sharded by user block: stacked per-shard local CSRs with
    equal static shapes (a pytree).

    ``indptr`` (n_dp, U_loc+1) rebased per shard; ``indices``/``data``/
    ``row_ids`` (n_dp, NNZ_loc) padded to the max shard nnz; ``nnz``
    (n_dp,) true local counts; ``row_ids`` are *local* user offsets.
    """

    indptr: object
    indices: object
    data: object
    row_ids: object
    nnz: object
    total_nnz: int
    n_users_padded: int
    n_items_padded: int
    # Max LOCAL row-range width any EVAL_WINDOW_CHUNK-rating slice of any
    # shard's row_ids spans (0 = unknown) — the dp-sharded counterpart of
    # DeviceRatings.eval_span, taken as the max over shards so one static
    # span serves the single shard_map program.  Lets sharded eval
    # dynamic-slice a VMEM-sized window of the local user table per chunk
    # (see ops/loss.choose_window_span / _window_rows).
    eval_span: int = 0


import jax.tree_util as _jtu

_jtu.register_dataclass(
    ShardedRatings,
    data_fields=["indptr", "indices", "data", "row_ids", "nnz"],
    meta_fields=["total_nnz", "n_users_padded", "n_items_padded",
                 "eval_span"],
)


def shard_ratings(csr: CSRRatings, n_dp: int, n_ip: int = 1,
                  mesh: Mesh | None = None) -> ShardedRatings:
    """Host-side stratification of a CSR into dp user-block shards."""
    U_pad = _ceil_to(csr.n_users, n_dp)
    I_pad = _ceil_to(csr.n_items, n_ip)
    U_loc = U_pad // n_dp
    indptr_full = np.zeros(U_pad + 1, dtype=np.int64)
    indptr_full[:csr.n_users + 1] = csr.indptr
    indptr_full[csr.n_users + 1:] = csr.indptr[-1]

    locals_ = []
    for d in range(n_dp):
        lo_u, hi_u = d * U_loc, (d + 1) * U_loc
        lo, hi = indptr_full[lo_u], indptr_full[hi_u]
        locals_.append((
            (indptr_full[lo_u:hi_u + 1] - lo).astype(np.int32),
            csr.indices[lo:hi].astype(np.int32),
            csr.data[lo:hi].astype(np.float32),
            (np.repeat(np.arange(U_loc, dtype=np.int32),
                       np.diff(indptr_full[lo_u:hi_u + 1]).astype(np.int64))),
        ))
    nnz_loc = np.asarray([len(x[1]) for x in locals_], dtype=np.int32)
    NNZ = max(int(nnz_loc.max()), 1)
    indptr = np.stack([x[0] for x in locals_])
    indices = np.stack([np.pad(x[1], (0, NNZ - len(x[1]))) for x in locals_])
    data = np.stack([np.pad(x[2], (0, NNZ - len(x[2]))) for x in locals_])
    row_ids = np.stack([np.pad(x[3], (0, NNZ - len(x[3]))) for x in locals_])
    from cu2rec_tpu.data.csr import eval_window_span
    eval_span = max((eval_window_span(x[3], len(x[3])) for x in locals_),
                    default=0)

    def put(x, spec):
        if mesh is None:
            return jnp.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return ShardedRatings(
        indptr=put(indptr, P("dp", None)),
        indices=put(indices, P("dp", None)),
        data=put(data, P("dp", None)),
        row_ids=put(row_ids, P("dp", None)),
        nnz=put(nnz_loc, P("dp")),
        total_nnz=csr.nnz,
        n_users_padded=U_pad,
        n_items_padded=I_pad,
        eval_span=eval_span,
    )


@dataclass
class ShardedItemMajor:
    """Item-major sampling structure sharded by item block over ip
    (replicated over dp): per-shard rebased ``it_indptr`` (n_ip, I_loc+1)
    and interleaved (user, rating) ``it_pair`` (n_ip, NNZp/64, 128) for
    the twin-sampling step."""

    it_indptr: object
    it_pair: object


_jtu.register_dataclass(ShardedItemMajor,
                        data_fields=["it_indptr", "it_pair"],
                        meta_fields=[])


def shard_ratings_item_major(csr: CSRRatings, n_ip: int,
                             mesh: Mesh | None = None) -> ShardedItemMajor:
    """Stratify the item-major view into ip item-block shards."""
    from cu2rec_tpu.data.csr import _interleave_pairs, transpose_csr
    I_pad = _ceil_to(csr.n_items, n_ip)
    I_loc = I_pad // n_ip
    ip_host, it_users, it_vals = transpose_csr(csr)
    indptr_full = np.zeros(I_pad + 1, dtype=np.int64)
    indptr_full[:csr.n_items + 1] = ip_host
    indptr_full[csr.n_items + 1:] = ip_host[-1]

    locals_ = []
    for d in range(n_ip):
        lo_i, hi_i = d * I_loc, (d + 1) * I_loc
        lo, hi = indptr_full[lo_i], indptr_full[hi_i]
        locals_.append((
            (indptr_full[lo_i:hi_i + 1] - lo).astype(np.int32),
            it_users[lo:hi].astype(np.int32),
            it_vals[lo:hi].astype(np.float32),
        ))
    nnz_loc = [len(x[1]) for x in locals_]
    NNZ = _ceil_to(max(max(nnz_loc), 1), 64)
    indptr = np.stack([x[0] for x in locals_])
    pairs = np.stack([
        _interleave_pairs(np.pad(x[1], (0, NNZ - len(x[1]))),
                          np.pad(x[2].astype(np.float32),
                                 (0, NNZ - len(x[2]))))
        for x in locals_])

    def put(x, spec):
        if mesh is None:
            return jnp.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return ShardedItemMajor(it_indptr=put(indptr, P("ip", None)),
                            it_pair=put(pairs, P("ip", None, None)))


def pad_model(model: MFModel, U_pad: int, I_pad: int,
              mesh: Mesh | None = None) -> MFModel:
    """Zero-pad tables to sharding-divisible sizes and place them on the
    mesh (P/user_bias row-sharded over dp, Q/item_bias over ip)."""
    U, F = model.P.shape
    I = model.Q.shape[0]
    P_arr = jnp.pad(model.P, ((0, U_pad - U), (0, 0)))
    ub = jnp.pad(model.user_bias, (0, U_pad - U))
    Q_arr = jnp.pad(model.Q, ((0, I_pad - I), (0, 0)))
    ib = jnp.pad(model.item_bias, (0, I_pad - I))
    if mesh is not None:
        P_arr = jax.device_put(P_arr, NamedSharding(mesh, P("dp", None)))
        ub = jax.device_put(ub, NamedSharding(mesh, P("dp")))
        Q_arr = jax.device_put(Q_arr, NamedSharding(mesh, P("ip", None)))
        ib = jax.device_put(ib, NamedSharding(mesh, P("ip")))
    return MFModel(P=P_arr, Q=Q_arr, user_bias=ub, item_bias=ib,
                   global_bias=model.global_bias)


def trim_model(model: MFModel, n_users: int, n_items: int) -> MFModel:
    return MFModel(P=model.P[:n_users], Q=model.Q[:n_items],
                   user_bias=model.user_bias[:n_users],
                   item_bias=model.item_bias[:n_items],
                   global_bias=model.global_bias)


def _local_step_packed(T_u_l, T_i_l, mu, indptr_l, indices_l, data_l,
                       hp: Hyper, key, iteration, n_users_global: int,
                       n_factors: int, it_indptr_l=None, it_pair_l=None,
                       *, train_items: bool, collision: str,
                       rotation: int = 250):
    """Body of one sharded SGD iteration over packed tables (runs inside
    shard_map).  Collectives: one psum over 'ip' to assemble the sampled
    item rows (factors *and* bias in one exchange), one pmin over 'dp' for
    the election, one small psum over 'ip' for the win mask, and one psum
    over 'dp' to commit the item-row deltas."""
    dp = jax.lax.axis_index("dp")
    ip = jax.lax.axis_index("ip")
    U_loc, W = T_u_l.shape
    I_loc = T_i_l.shape[0]
    F = n_factors
    dt = T_u_l.dtype
    lr = hp.learning_rate
    user_offset = dp * U_loc
    item_offset = ip * I_loc

    items, ratings, has = sample_items(key, iteration, indptr_l, indices_l,
                                       data_l, user_offset=user_offset)

    # Assemble this shard's view of the sampled item rows.
    owned = (items >= item_offset) & (items < item_offset + I_loc)
    loc_idx = jnp.clip(items - item_offset, 0, I_loc - 1)
    row_i = jax.lax.psum(
        jnp.where(owned[:, None], T_i_l[loc_idx], 0.0).astype(jnp.float32),
        "ip")

    col = jnp.arange(W)
    factor = (col < F).astype(jnp.float32)
    biascol = (col == F).astype(jnp.float32)
    reg_u = jnp.where(col < F, hp.P_reg,
                      jnp.where(col == F, hp.user_bias_reg, 0.0))
    reg_i = jnp.where(col < F, hp.Q_reg,
                      jnp.where(col == F, hp.item_bias_reg, 0.0))

    row_u = T_u_l.astype(jnp.float32)
    ihat = row_i * factor + biascol
    uhat = row_u * factor + biascol
    pred = mu + jnp.sum(row_u * ihat, axis=-1) + row_i[:, F]
    err = jnp.where(has, ratings - pred, 0.0)
    hasf = has[:, None]

    du = lr * (err[:, None] * ihat - reg_u * row_u)
    T_u_new = jnp.where(hasf, row_u + du, row_u).astype(dt)

    if not train_items:
        return T_u_new, T_i_l

    if collision == "twin":
        # Item side samples its own (user, rating) per owned item (see
        # ops/packed.py collision="twin").  Collectives: ONE psum over dp
        # assembles the sampled users' pre-step rows — replacing the
        # first_wins path's pmin election + win-mask psum + delta psum.
        s_uid, w_rat, has_i = sample_items(
            key, iteration, it_indptr_l, None, None,
            user_offset=n_users_global + item_offset, pair_pack=it_pair_l)
        own_u = (s_uid >= user_offset) & (s_uid < user_offset + U_loc)
        loc_u = jnp.clip(s_uid - user_offset, 0, U_loc - 1)
        w_rows = jax.lax.psum(
            jnp.where(own_u[:, None], row_u[loc_u], 0.0), "dp")
        T_i32 = T_i_l.astype(jnp.float32)
        ihat_d = T_i32 * factor + biascol
        uhat_w = w_rows * factor + biascol
        pred_w = mu + jnp.sum(w_rows * ihat_d, axis=-1) + T_i32[:, F]
        err_w = jnp.where(has_i, w_rat - pred_w, 0.0)
        di = lr * (err_w[:, None] * uhat_w - reg_i * T_i32)
        T_i_new = jnp.where(has_i[:, None], T_i32 + di, T_i32).astype(dt)
        return T_u_new, T_i_new

    di = lr * (err[:, None] * uhat - reg_i * row_i)
    if collision == "first_wins":
        prio = rotated_priority(n_users_global, iteration, user_offset,
                                U_loc, rotation)
        cand = jnp.where(has, prio, INT32_MAX)
        cand_here = jnp.where(owned, cand, INT32_MAX)
        best_l = jnp.full((I_loc,), INT32_MAX,
                          dtype=jnp.int32).at[loc_idx].min(cand_here)
        best_l = jax.lax.pmin(best_l, "dp")
        win_part = owned & has & (best_l[loc_idx] == cand)
        win = jax.lax.psum(win_part.astype(jnp.int32), "ip") > 0
        di = jnp.where(win[:, None], di, 0.0)
    elif collision == "mean":
        counts_l = jnp.zeros((I_loc,), dtype=jnp.float32).at[loc_idx].add(
            jnp.where(owned & has, 1.0, 0.0))
        counts_l = jax.lax.psum(counts_l, "dp")
        denom = jax.lax.psum(
            jnp.where(owned, jnp.maximum(counts_l, 1.0)[loc_idx], 0.0), "ip")
        di = jnp.where(hasf, di / denom[:, None], 0.0)
    elif collision == "sum":
        di = jnp.where(hasf, di, 0.0)
    else:
        raise ValueError(f"unknown collision policy: {collision}")

    di_here = jnp.where(owned[:, None], di, 0.0)
    dT_l = jnp.zeros(T_i_l.shape, dtype=jnp.float32).at[loc_idx].add(di_here)
    T_i_new = (T_i_l.astype(jnp.float32)
               + jax.lax.psum(dT_l, "dp")).astype(dt)
    return T_u_new, T_i_new


def _eval_local_packed(T_u_l, T_i_full, mu, n_factors: int, row_ids_l,
                       indices_l, data_l, nnz_l, chunk_size: int,
                       span: int = 0):
    """Local partial error sums over this dp shard's ratings (item table
    pre-assembled to full via all_gather).

    ``span`` > 0 engages the windowed user-row path: each scan chunk's
    local row ids lie in a ``span``-wide ascending window (attested by
    ShardedRatings.eval_span), so the chunk dynamic-slices that window of
    the LOCAL user table once and gathers from it at the VMEM small-table
    rate — the same 3× win the single-chip eval ships (ops/loss.py),
    previously missing from the dp-sharded path (round-2 verdict item 4).
    """
    from cu2rec_tpu.data.csr import EVAL_WINDOW_CHUNK
    from cu2rec_tpu.ops.loss import _window_rows
    if span:
        chunk_size = EVAL_WINDOW_CHUNK
    n = indices_l.shape[0]
    mask = jnp.arange(n, dtype=jnp.int32) < nnz_l
    W = T_u_l.shape[1]
    F = n_factors
    col = jnp.arange(W)
    factor = (col < F).astype(jnp.float32)
    biascol = (col == F).astype(jnp.float32)

    n_chunks = max(-(-n // chunk_size), 1)
    padded = n_chunks * chunk_size

    def pad(x, fill=0):
        return jnp.pad(x, (0, padded - n), constant_values=fill)

    rows_c = pad(row_ids_l).reshape(n_chunks, -1)
    cols_c = pad(indices_l).reshape(n_chunks, -1)
    vals_c = pad(data_l).reshape(n_chunks, -1)
    mask_c = pad(mask, False).reshape(n_chunks, -1)

    def body(carry, chunk):
        sse, sae = carry
        r, c, v, m = chunk
        if span:
            ru = _window_rows(T_u_l, r, span).astype(jnp.float32)
        else:
            ru = T_u_l[r].astype(jnp.float32)
        ri = T_i_full[c].astype(jnp.float32)
        pred = mu + jnp.sum(ru * (ri * factor + biascol), axis=-1) + ri[:, F]
        err = jnp.where(m, v - pred, 0.0)
        return (sse + jnp.sum(err * err), sae + jnp.sum(jnp.abs(err))), None

    (sse, sae), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)),
                                 (rows_c, cols_c, vals_c, mask_c))
    return sse, sae


class ShardedEngine:
    """Execution engine running the training semantics over a device mesh.

    Drop-in for SingleChipEngine in the shared host loop
    (train.trainer.train_with_engine): same eval cadence, same plateau
    scheduler, bit-identical updates (see module docstring).
    """

    def __init__(self, train_csr: CSRRatings, test_csr: CSRRatings,
                 cfg: Config, n_devices: int | None = None,
                 n_ip: int = 1, mesh: Mesh | None = None,
                 eval_chunk: int = 1 << 20):
        if mesh is None:
            n_total = n_devices or len(jax.devices())
            mesh = make_mesh(n_total // n_ip, n_ip)
        self.mesh = mesh
        self.n_dp = mesh.shape["dp"]
        self.n_ip = mesh.shape["ip"]
        self.cfg = cfg
        self.eval_chunk = eval_chunk
        self.key = jax.random.PRNGKey(cfg.seed)
        # Align the test split's dimensions to the train CSR's before
        # sharding: shard_ratings rebases local row ids against its OWN
        # padded user count, so a test CSR with fewer users than train
        # would shard against a different U_loc and silently evaluate
        # wrong users (and the wrong RMSE would drive the LR scheduler).
        from cu2rec_tpu.data.csr import normalize_csr_dims
        n_users = max(train_csr.n_users, test_csr.n_users)
        n_items = max(train_csr.n_items, test_csr.n_items)
        train_csr = normalize_csr_dims(train_csr, n_users, n_items)
        test_csr = normalize_csr_dims(test_csr, n_users, n_items)
        self.n_users = train_csr.n_users
        self.n_items = train_csr.n_items
        self.train_sh = shard_ratings(train_csr, self.n_dp, self.n_ip, mesh)
        self.test_sh = shard_ratings(test_csr, self.n_dp, self.n_ip, mesh)
        self.U_pad = self.train_sh.n_users_padded
        self.I_pad = self.train_sh.n_items_padded
        self._it_sh_placeholder = cfg.collision_policy != "twin"
        if cfg.collision_policy == "twin":
            self.it_sh = shard_ratings_item_major(train_csr, self.n_ip, mesh)
        else:  # tiny placeholders keep the program signature uniform
            def put(x, spec):
                return jax.device_put(x, NamedSharding(mesh, spec))
            self.it_sh = ShardedItemMajor(
                it_indptr=put(np.zeros((self.n_ip, 2), np.int32),
                              P("ip", None)),
                it_pair=put(np.zeros((self.n_ip, 1, 128), np.int32),
                            P("ip", None, None)))
        self._compiled_runs: dict = {}
        self._build_programs()

    # -- program construction -------------------------------------------
    def _build_programs(self):
        mesh = self.mesh
        # Rotation modulus = the UNPADDED user count, matching the
        # single-chip paths exactly (ops/sgd.py rotated_priority with
        # n_users; trainer.single_step / packed_step use model.P.shape[0]
        # which is unpadded).  Padded users alias real priorities, but they
        # never sample (has=False), so the aliases never enter an election.
        # Using U_pad here broke the bit-identical sharded==single contract
        # whenever n_users % n_dp != 0.
        n_users_global = self.n_users
        eval_chunk = self.eval_chunk
        n_factors = self.cfg.n_factors

        shard_map = shard_map_compat()

        # Pytrees of arrays are passed to shard_map as flat tuples to keep
        # in_specs simple and independent of dataclass metadata.
        model_specs = (P("dp", None), P("ip", None), P())
        ratings_specs = (P("dp", None), P("dp", None), P("dp", None),
                         P("dp", None), P("dp"))
        it_specs = (P("ip", None), P("ip", None, None))

        def steps_body(model_t, ratings_t, it_t, hp, key, start_iter,
                       n_steps, train_items, collision):
            indptr, indices, data, _row_ids, _nnz = (x[0] for x in ratings_t)
            it_indptr, it_pair = (x[0] for x in it_t)

            def one(i, carry):
                T_u_l, T_i_l, mu = carry
                it = start_iter + i
                T_u_new, T_i_new = _local_step_packed(
                    T_u_l, T_i_l, mu, indptr, indices, data,
                    hp, key, it, n_users_global, n_factors,
                    it_indptr, it_pair,
                    train_items=train_items, collision=collision)
                return (T_u_new, T_i_new, mu)

            return jax.lax.fori_loop(0, n_steps, one, model_t)

        @partial(jax.jit, static_argnames=("train_items", "collision"),
                 donate_argnums=(0,))
        def run(model_t, ratings_t, it_t, hp, key, start_iter, n_steps,
                train_items, collision):
            f = shard_map(
                partial(steps_body, train_items=train_items,
                        collision=collision),
                mesh=mesh,
                in_specs=(model_specs, ratings_specs, it_specs,
                          P(), P(), P(), P()),
                out_specs=model_specs)
            return f(model_t, ratings_t, it_t, hp, key, start_iter,
                     jnp.asarray(n_steps, jnp.int32))

        self._run_jit = run

        def eval_body(model_t, ratings_t, total_nnz, span):
            T_u_l, T_i_l, mu = model_t
            _indptr, indices, data, row_ids, nnz = (x[0] for x in ratings_t)
            # Assemble the full item table once per eval (all_gather, ip).
            T_i_full = jax.lax.all_gather(T_i_l, "ip", axis=0, tiled=True)
            sse, sae = _eval_local_packed(T_u_l, T_i_full, mu, n_factors,
                                          row_ids, indices, data, nnz,
                                          eval_chunk, span)
            sse = jax.lax.psum(sse, "dp")
            sae = jax.lax.psum(sae, "dp")
            denom = total_nnz.astype(jnp.float32)
            return jnp.sqrt(sse / denom), sae / denom

        @partial(jax.jit, static_argnames=("span",))
        def evaluate(model_t, ratings_t, total_nnz, span=0):
            f = shard_map(
                partial(eval_body, span=span), mesh=mesh,
                in_specs=(model_specs, ratings_specs, P()),
                out_specs=(P(), P()))
            return f(model_t, ratings_t, total_nnz)

        self._evaluate_jit = evaluate

    @staticmethod
    def _ratings_tuple(sh: ShardedRatings):
        return (sh.indptr, sh.indices, sh.data, sh.row_ids, sh.nnz)

    # -- engine interface ------------------------------------------------
    # Engine state: (T_u (U_pad, W), T_i (I_pad, W), global_bias) — packed
    # tables (see ops/packed.py) placed on the mesh.

    def prepare(self, model: MFModel):
        from cu2rec_tpu.ops.packed import pack
        pm = pack(model)
        T_u = jnp.pad(pm.T_u, ((0, self.U_pad - pm.T_u.shape[0]), (0, 0)))
        T_i = jnp.pad(pm.T_i, ((0, self.I_pad - pm.T_i.shape[0]), (0, 0)))
        T_u = jax.device_put(T_u, NamedSharding(self.mesh, P("dp", None)))
        T_i = jax.device_put(T_i, NamedSharding(self.mesh, P("ip", None)))
        return (T_u, T_i, pm.global_bias)

    def init_model(self, n_users: int, n_items: int, global_bias: float,
                   Q=None, item_bias=None):
        model = init_model(n_users, n_items, self.cfg.n_factors, global_bias,
                           seed=self.cfg.seed,
                           dtype=jnp.dtype(self.cfg.dtype),
                           Q=Q, item_bias=item_bias)
        return self.prepare(model)

    def run(self, state, hp: Hyper, start_iter: int, n_steps: int):
        if isinstance(state, MFModel):
            state = self.prepare(state)
        if (self.cfg.collision_policy == "twin"
                and getattr(self, "_it_sh_placeholder", False)):
            # The engine was built under a different policy, so it_sh is
            # the tiny placeholder — running twin against it would
            # silently freeze the item table (every has_i is False).
            raise ValueError(
                "collision_policy changed to 'twin' after ShardedEngine "
                "construction; rebuild the engine so the item-major "
                "shards exist")
        return self._run_jit(state, self._ratings_tuple(self.train_sh),
                             (self.it_sh.it_indptr, self.it_sh.it_pair),
                             hp, self.key, jnp.int32(start_iter),
                             jnp.int32(n_steps), bool(self.cfg.is_train),
                             self.cfg.collision_policy)

    def evaluate(self, state, split: str):
        if isinstance(state, MFModel):
            state = self.prepare(state)
        sh = self.train_sh if split == "train" else self.test_sh
        from cu2rec_tpu.ops.loss import choose_window_span
        U_loc = self.U_pad // self.n_dp
        span = choose_window_span(sh.eval_span, U_loc,
                                  int(state[0].shape[1]) * 4)
        rmse, mae = self._evaluate_jit(state, self._ratings_tuple(sh),
                                       jnp.int32(sh.total_nnz), span)
        return float(rmse), float(mae)

    def finalize(self, state) -> MFModel:
        from cu2rec_tpu.ops.packed import PackedModel, unpack
        T_u, T_i, mu = state
        pm = PackedModel(T_u=T_u[:self.n_users], T_i=T_i[:self.n_items],
                         global_bias=mu, n_factors=self.cfg.n_factors)
        return unpack(pm)
