"""iALS training loop — implicit-feedback weighted MF (see ops/ials.py).

Loop contract mirrors the other trainers (per-sweep metrics via
MetricsLogger, losses dict, MFModel out), with the implicit-task metric:
recall@k over held-out positives replaces RMSE (an implicit model ranks;
it does not predict ratings).  The returned MFModel carries zero biases
and zero global bias so the serving stack (recommend/top-k/engine) works
unchanged: score(u, i) = x_u · y_i.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.data.csr import CSRRatings, transpose_csr
from cu2rec_tpu.models.state import MFModel, init_model
from cu2rec_tpu.ops.ials import ials_half_sweep
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.metrics import MetricsLogger
from cu2rec_tpu.utils.timing import fetch_barrier


def train_ials(train_csr: CSRRatings, test_csr: CSRRatings, cfg: Config,
               alpha: float = 40.0,
               model: MFModel | None = None,
               logger: MetricsLogger | None = None,
               recall_k: int = 10,
               recall_users: int = 2048,
               device_buckets: bool | None = None,
               mesh=None,
               solver: str = "auto"):
    """Train implicit weighted-MF for ``cfg.total_iterations`` sweeps.

    ``cfg.P_reg`` is the ridge λ (``Q_reg`` for the item side);
    ``alpha`` the confidence slope c = 1 + α·r.  Ratings act as raw
    counts/strengths; any observed pair is a positive.
    """
    logger = logger or MetricsLogger()
    F = cfg.n_factors
    recall_k = min(recall_k, train_csr.n_items)
    if model is None:
        model = init_model(train_csr.n_users, train_csr.n_items, F, 0.0,
                           seed=cfg.seed, dtype=jnp.dtype(cfg.dtype))
    X = jnp.asarray(model.P, jnp.float32)
    Y = jnp.asarray(model.Q, jnp.float32)

    row_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        # Full-mesh (dp×ip) row sharding of the solve chunks, counterpart
        # table replicated — same design + HBM bound as train_als
        # (docs/SCALING.md §ALS counterpart replication).
        row_sharding = NamedSharding(
            mesh, PartitionSpec(tuple(mesh.axis_names)))

    if device_buckets is None:
        device_buckets = train_csr.nnz > 5_000_000
    it_indptr, it_rows, it_vals = transpose_csr(train_csr)
    if device_buckets:
        from cu2rec_tpu.ops.als import prepare_chunks_device
        # Upload only the flat indices/data — NOT to_device(), whose
        # pair_pack/row_ids mirrors (~3x nnz ints) are never read by the
        # sweep and cost minutes over slow host links at 100M ratings.
        user_chunks = prepare_chunks_device(
            jnp.asarray(train_csr.indices), jnp.asarray(train_csr.data),
            train_csr.indptr, F, train_csr.n_users,
            train_csr.nnz, row_sharding=row_sharding)
        item_chunks = prepare_chunks_device(
            jnp.asarray(it_rows), jnp.asarray(it_vals), it_indptr, F,
            train_csr.n_items, train_csr.nnz, row_sharding=row_sharding)
    else:
        from cu2rec_tpu.ops.als import bucket_csr, prepare_chunks
        user_chunks = prepare_chunks(
            bucket_csr(train_csr.indptr, train_csr.indices, train_csr.data),
            F, train_csr.n_users, row_sharding)
        item_chunks = prepare_chunks(
            bucket_csr(it_indptr, it_rows, it_vals), F, train_csr.n_items,
            row_sharding)

    def as_model(X, Y) -> MFModel:
        return MFModel(P=X, Q=Y,
                       user_bias=jnp.zeros(train_csr.n_users, jnp.float32),
                       item_bias=jnp.zeros(train_csr.n_items, jnp.float32),
                       global_bias=jnp.float32(0.0))

    losses: dict[int, float] = {}
    start = time.perf_counter()
    # Resume skips completed sweeps (cur_iterations counts sweeps here).
    for sweep in range(min(cfg.cur_iterations, cfg.total_iterations) + 1,
                       cfg.total_iterations + 1):
        X = ials_half_sweep(X, Y, user_chunks, alpha, cfg.P_reg,
                            solver=solver)
        Y = ials_half_sweep(Y, X, item_chunks, alpha, cfg.Q_reg,
                            solver=solver)
        from cu2rec_tpu.ops.bpr import auc_eval
        from cu2rec_tpu.serve.recommend import ranking_eval
        mdl = as_model(X, Y)
        m = ranking_eval(mdl, train_csr, test_csr,
                         k=recall_k, max_users=recall_users)
        rec = m["recall"]
        # Sampled pairwise AUC against the same oracle ceiling BPR
        # reports (meta oracle_auc of the planted generator).
        auc = auc_eval(mdl, train_csr, test_csr, seed=cfg.seed)
        objective = 1.0 - rec
        logger.log_eval_implicit(sweep, algo="ials", auc=auc,
                                 recall_at_k=rec, ndcg_at_k=m["ndcg"],
                                 k=recall_k, objective=objective,
                                 line_prefix="IALS sweep")
        losses[sweep] = objective
        cfg.cur_iterations += 1

    fetch_barrier(X)
    logger.log_time(cfg.total_iterations, time.perf_counter() - start)
    return as_model(X, Y), losses
