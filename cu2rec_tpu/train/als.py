"""ALS training loop — the second optimizer family (see ops/als.py).

Keeps the familiar loop contract: per-sweep train/test RMSE+MAE through
the same MetricsLogger (one ALS "iteration" = one full sweep — a user
half-sweep then an item half-sweep), losses dict keyed by sweep, model
returned as MFModel.  No learning rate exists; the plateau scheduler is
not applicable (each sweep solves its subproblem exactly).
"""

from __future__ import annotations

import time

import jax.numpy as jnp

from cu2rec_tpu.data.csr import CSRRatings, to_device
from cu2rec_tpu.models.state import MFModel, init_model
from cu2rec_tpu.ops.als import als_half_sweep, bucket_csr, transpose_csr
from cu2rec_tpu.ops.loss import evaluate_packed
from cu2rec_tpu.ops.packed import PackedModel, pack, unpack
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.metrics import MetricsLogger
from cu2rec_tpu.utils.timing import fetch_barrier


def train_als(train_csr: CSRRatings, test_csr: CSRRatings, cfg: Config,
              global_bias: float,
              model: MFModel | None = None,
              logger: MetricsLogger | None = None,
              weight_by_degree: bool = True,
              mesh=None,
              device_buckets: bool | None = None,
              solver: str = "auto"):
    """Train by ALS for ``cfg.total_iterations`` sweeps.

    Returns (model, losses) like the SGD trainer.  With ``mesh`` (any
    axis set; the first axis is used) the batched ridge solves are
    data-parallel over rows: bucket chunks are placed sharded over the
    mesh's first axis with the counterpart table replicated, and XLA's
    SPMD partitioner splits the gram einsums and Cholesky batches — ALS
    needs no custom collectives at all (each row's solve is independent).

    ``device_buckets`` (auto: on above 5M ratings) extracts the padded
    degree-bucket slices ON DEVICE from the flat CSR arrays instead of
    uploading the multi-GB host-side bucket expansion — the fix for the
    r1 Netflix-scale upload bottleneck (docs/ROADMAP.md known limits).
    """
    logger = logger or MetricsLogger()
    if model is None:
        model = init_model(train_csr.n_users, train_csr.n_items,
                           cfg.n_factors, global_bias, seed=cfg.seed,
                           dtype=jnp.dtype(cfg.dtype))
    pm = pack(model)
    mu = jnp.float32(global_bias)
    F = cfg.n_factors

    row_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        # Shard solve chunks over the FULL mesh (dp×ip flattened): every
        # row's ridge solve is independent, so ALS has no reason to idle
        # the ip axis the SGD engine uses for item-table sharding.  The
        # counterpart table stays replicated — bounded-by-arithmetic at
        # every target scale (docs/SCALING.md §ALS counterpart
        # replication: Netflix F=300 user table = 0.58 GB ≈ 3.6% of one
        # v5e's HBM).
        row_sharding = NamedSharding(
            mesh, PartitionSpec(tuple(mesh.axis_names)))

    # pair_pack=False: ALS never samples, so the interleaved sampling
    # mirror (+8 bytes/rating, ~45 s of tunnel upload at 100M ratings)
    # would be dead weight; eval reads only row_ids/indices/data.
    train_dev = to_device(train_csr, pair_pack=False)
    # Eval-cost bounding at 100M-rating scale, same knobs as the SGD
    # trainer (Config.train_eval_sample / test_eval_sample).  When the
    # subsample replaces a split, skip the full upload entirely.
    from cu2rec_tpu.train.trainer import _subsample_dev
    train_eval_dev = train_dev
    if cfg.train_eval_sample and train_csr.nnz > cfg.train_eval_sample:
        train_eval_dev = _subsample_dev(train_csr, cfg.train_eval_sample,
                                        cfg.seed)
    if cfg.test_eval_sample and test_csr.nnz > cfg.test_eval_sample:
        test_eval_dev = _subsample_dev(test_csr, cfg.test_eval_sample,
                                       cfg.seed + 1)
    else:
        test_eval_dev = to_device(test_csr, pair_pack=False)

    if device_buckets is None:
        device_buckets = train_csr.nnz > 5_000_000
    it_indptr, it_rows, it_vals = transpose_csr(train_csr)
    if device_buckets:
        from cu2rec_tpu.ops.als import prepare_chunks_device
        user_buckets = prepare_chunks_device(
            train_dev.indices, train_dev.data, train_csr.indptr, F,
            train_csr.n_users, train_csr.nnz, row_sharding=row_sharding)
        item_buckets = prepare_chunks_device(
            jnp.asarray(it_rows), jnp.asarray(it_vals), it_indptr, F,
            train_csr.n_items, train_csr.nnz, row_sharding=row_sharding)
    else:
        from cu2rec_tpu.ops.als import prepare_chunks
        user_buckets = prepare_chunks(
            bucket_csr(train_csr.indptr, train_csr.indices, train_csr.data),
            F, train_csr.n_users, row_sharding)
        item_buckets = prepare_chunks(
            bucket_csr(it_indptr, it_rows, it_vals),
            F, train_csr.n_items, row_sharding)

    losses: dict[int, float] = {}
    n_sweeps = cfg.total_iterations
    start = time.perf_counter()
    # Resume skips completed sweeps (cur_iterations counts sweeps here).
    for sweep in range(min(cfg.cur_iterations, n_sweeps) + 1, n_sweeps + 1):
        T_u = als_half_sweep(pm.T_u, pm.T_i, user_buckets, mu,
                             cfg.P_reg, cfg.user_bias_reg, F,
                             weight_by_degree=weight_by_degree,
                             row_sharding=row_sharding, solver=solver)
        pm = PackedModel(T_u=T_u, T_i=pm.T_i, global_bias=pm.global_bias,
                         n_factors=F)
        T_i = als_half_sweep(pm.T_i, pm.T_u, item_buckets, mu,
                             cfg.Q_reg, cfg.item_bias_reg, F,
                             weight_by_degree=weight_by_degree,
                             row_sharding=row_sharding, solver=solver)
        pm = PackedModel(T_u=pm.T_u, T_i=T_i, global_bias=pm.global_bias,
                         n_factors=F)

        train_rmse, train_mae = evaluate_packed(pm, train_eval_dev)
        test_rmse, test_mae = evaluate_packed(pm, test_eval_dev)
        logger.log_eval(sweep, train_mae=train_mae, train_rmse=train_rmse,
                        test_mae=test_mae, test_rmse=test_rmse,
                        learning_rate=0.0)
        losses[sweep] = test_rmse
        cfg.cur_iterations += 1

    fetch_barrier(pm.T_u)
    logger.log_time(n_sweeps, time.perf_counter() - start)
    return unpack(pm), losses
