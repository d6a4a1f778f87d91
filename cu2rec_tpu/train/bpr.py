"""BPR training loop — pairwise-ranking MF (see ops/bpr.py).

Loop contract mirrors the other trainers (iteration-based like the SGD
trainer, per-eval metrics via MetricsLogger, MFModel out).  Metrics are
the implicit-task triple — sampled AUC (BPR's native objective),
recall@k and ndcg@k over held-out positives — emitted first-class via
``log_eval_implicit`` (schema: docs/API.md §metrics); the returned
``losses`` dict carries the minimized ``objective`` (1 − recall@k).

The returned MFModel has user_bias/global_bias zero and a trained
item_bias, so the serving stack (recommend/top-k/engine) works as-is:
score(u, y) = p_u · q_y + b_y.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from cu2rec_tpu.data.csr import CSRRatings, to_device
from cu2rec_tpu.models.state import MFModel, init_model
from cu2rec_tpu.ops.bpr import auc_eval, bpr_run_steps
from cu2rec_tpu.ops.packed import pack, unpack
from cu2rec_tpu.ops.sgd import Hyper
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.metrics import MetricsLogger
from cu2rec_tpu.utils.timing import fetch_barrier


def train_bpr(train_csr: CSRRatings, test_csr: CSRRatings, cfg: Config,
              model: MFModel | None = None,
              logger: MetricsLogger | None = None,
              recall_k: int = 10,
              recall_users: int = 2048,
              mesh=None, n_devices: int = 0):
    """Train BPR-MF for ``cfg.total_iterations`` iterations.

    One iteration = one pairwise update per user row + one positive and
    one negative update per item row (ops/bpr.py).  ``cfg.learning_rate``
    and the four reg fields apply as in the pointwise trainer.  With
    ``mesh``/``n_devices`` the user axis shards over dp (bit-identical
    updates — parallel/bpr.py).
    """
    logger = logger or MetricsLogger()
    F = cfg.n_factors
    recall_k = min(recall_k, train_csr.n_items)
    if model is None:
        model = init_model(train_csr.n_users, train_csr.n_items, F, 0.0,
                           seed=cfg.seed, dtype=jnp.dtype(cfg.dtype))
        # BPR has no user/global bias term in its score.
        model = MFModel(P=model.P, Q=model.Q,
                        user_bias=jnp.zeros_like(model.user_bias),
                        item_bias=jnp.zeros_like(model.item_bias),
                        global_bias=jnp.float32(0.0))
    hp = Hyper.from_config(cfg)
    key = jax.random.PRNGKey(cfg.seed)

    engine = None
    if mesh is not None or (n_devices and n_devices > 1):
        from cu2rec_tpu.parallel.bpr import ShardedBPR
        engine = ShardedBPR(train_csr, cfg, n_devices=n_devices or None,
                            mesh=mesh, model=model)
    else:
        dev = to_device(train_csr, item_major=True)
        pm = pack(model)

    check = max(1, cfg.check_error)
    # Resume skips completed work: only iterations past cur_iterations run
    # (same contract as the SGD trainer's eval_segments).
    start_at = min(cfg.cur_iterations, cfg.total_iterations)
    points = sorted({p for p in
                     {1, *range(check, cfg.total_iterations + 1, check),
                      cfg.total_iterations} if p > start_at})
    losses: dict[int, float] = {}
    done = start_at
    start = time.perf_counter()
    for point in points:
        seg = point - done
        if seg > 0:
            t0 = time.perf_counter()
            if engine is not None:
                engine.run(hp, key, done, seg)
                fetch_barrier(engine.T_u)
            else:
                pm = bpr_run_steps(pm, dev, hp, key, done, seg)
                fetch_barrier(pm.T_u)
            dt_seg = time.perf_counter() - t0
        else:
            dt_seg = 0.0
        done = point
        m = engine.model() if engine is not None else unpack(pm)
        auc = auc_eval(m, train_csr, test_csr, seed=cfg.seed)
        from cu2rec_tpu.serve.recommend import ranking_eval
        rk = ranking_eval(m, train_csr, test_csr, k=recall_k,
                          max_users=recall_users)
        rec = rk["recall"]
        ups = train_csr.n_users * seg / dt_seg if dt_seg > 0 else None
        objective = 1.0 - rec
        logger.log_eval_implicit(point, algo="bpr", auc=auc,
                                 recall_at_k=rec, ndcg_at_k=rk["ndcg"],
                                 k=recall_k, objective=objective,
                                 learning_rate=cfg.learning_rate,
                                 updates_per_s=ups,
                                 line_prefix="BPR iteration")
        losses[point] = objective
        cfg.cur_iterations = point

    logger.log_time(cfg.total_iterations, time.perf_counter() - start)
    return (engine.model() if engine is not None else unpack(pm)), losses
