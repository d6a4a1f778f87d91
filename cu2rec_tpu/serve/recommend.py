"""Serving: full-catalog scoring, ranked recommendations, recall@K.

Replaces the reference's CPU scoring + ``std::sort`` serving path
(predict.cu:17-29, 49-70) with the MXU matmul + ``lax.top_k`` — scoring a
block of users against the whole catalog is one ``P_u @ Q.T``.  Rated-item
filtering is scatter-masking (no sorted-iterator edge cases as in
predict.cu:52-59).  Batched ``recommend_users`` plus ``recall_at_k_eval``
give the retrieval-quality benchmark (BASELINE.json config 5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.models.state import MFModel
from cu2rec_tpu.ops.model import score_catalog
from cu2rec_tpu.ops.topk import mask_rated, recall_at_k


def predict_all_items(p_row, user_bias, Q, item_bias, global_bias):
    """Scores for every item for one user (predict_ratings equivalent,
    predict.cu:17-29)."""
    scores = score_catalog(jnp.asarray(p_row).reshape(1, -1),
                           jnp.asarray(user_bias).reshape(1),
                           Q, item_bias, global_bias)
    return scores[0]


@partial(jax.jit, static_argnames=("k",))
def _topk_users(P_rows, ub_rows, Q, item_bias, global_bias,
                rated_items, rated_mask, k: int):
    scores = score_catalog(P_rows, ub_rows, Q, item_bias, global_bias)
    scores = mask_rated(scores, rated_items, rated_mask)
    return jax.lax.top_k(scores, k)


def recommend_users(model: MFModel, user_ids, rated_items, rated_mask,
                    k: int = 10):
    """Top-k unrated items for a batch of users.

    ``rated_items``/``rated_mask``: (B, R) padded already-rated item ids.
    Returns (scores (B,k), item_ids (B,k)).  If a user has fewer than k
    unrated items, the surplus entries carry sentinel scores < -1e30 and
    should be discarded by the caller.
    """
    user_ids = jnp.asarray(user_ids)
    return _topk_users(model.P[user_ids], model.user_bias[user_ids],
                       model.Q, model.item_bias, model.global_bias,
                       jnp.asarray(rated_items), jnp.asarray(rated_mask), k)


def ranked_items(scores) -> list[tuple[float, int]]:
    """All items sorted by descending score — the
    ``get_recommendations`` output shape (predict.cu:49-63)."""
    scores = np.asarray(scores)
    order = np.argsort(-scores, kind="stable")
    return [(float(scores[i]), int(i)) for i in order]


def padded_user_lists(csr, user_ids, pad_to: int | None = None):
    """(items (B,R), mask (B,R)) of each user's rated items from a CSR."""
    slices = [csr.indices[csr.indptr[u]:csr.indptr[u + 1]] for u in user_ids]
    R = pad_to or max((len(s) for s in slices), default=1) or 1
    items = np.zeros((len(user_ids), R), dtype=np.int32)
    mask = np.zeros((len(user_ids), R), dtype=bool)
    for b, s in enumerate(slices):
        items[b, :len(s)] = s[:R]
        mask[b, :len(s)] = True
    return items, mask


def ranking_eval(model: MFModel, train_csr, test_csr, k: int = 10,
                 batch_size: int = 1024, max_users: int | None = None,
                 metrics: tuple = ("recall", "ndcg")) -> dict:
    """Mean top-k ranking metrics over test users: recommend k
    unrated-in-train items, score against the held-out test items.

    Returns ``{metric: mean}`` for the requested ``metrics`` —
    ``recall`` (hit fraction) and/or ``ndcg`` (position-discounted,
    binary relevance)."""
    from cu2rec_tpu.ops.topk import ndcg_at_k

    fns = {"recall": recall_at_k, "ndcg": ndcg_at_k}
    unknown = set(metrics) - fns.keys()
    if unknown:
        raise ValueError(f"unknown ranking metric(s): {sorted(unknown)}")
    test_counts = np.diff(test_csr.indptr)
    users = np.nonzero(test_counts > 0)[0]
    if max_users:
        users = users[:max_users]
    if len(users) == 0:
        return {m: 0.0 for m in metrics}
    totals = {m: 0.0 for m in metrics}
    n = 0
    for b0 in range(0, len(users), batch_size):
        batch = users[b0:b0 + batch_size]
        rated, rmask = padded_user_lists(train_csr, batch)
        _, rec = recommend_users(model, batch, rated, rmask, k)
        rel, relmask = padded_user_lists(test_csr, batch)
        rel, relmask = jnp.asarray(rel), jnp.asarray(relmask)
        for m in metrics:
            totals[m] += float(jnp.sum(fns[m](rec, rel, relmask)))
        n += len(batch)
    return {m: totals[m] / n for m in metrics}


def recall_at_k_eval(model: MFModel, train_csr, test_csr, k: int = 10,
                     batch_size: int = 1024, max_users: int | None = None):
    """Mean recall@k over test users: recommend k unrated-in-train items,
    count hits against the held-out test items."""
    return ranking_eval(model, train_csr, test_csr, k, batch_size,
                        max_users, metrics=("recall",))["recall"]


def foldin_ranking_eval(engine, input_csr, holdout_csr, cfg=None,
                        k: int = 10, batch_size: int = 256,
                        max_users: int | None = None,
                        metrics: tuple = ("recall", "ndcg"),
                        mode: str = "sgd", alpha: float = 40.0,
                        reg: float = 0.1) -> dict:
    """Fold-in quality (VERDICT r3 item 8): for each user with ratings in
    BOTH splits, learn a fresh (p_row, user_bias) from the ``input_csr``
    ratings alone via the engine's batched fold-in (frozen catalog —
    predict.cu:126-132 semantics), recommend k items with only the INPUT
    items masked, and score recall@k / ndcg@k against the user's
    ``holdout_csr`` items.

    ``engine`` is a ``ShardedServingEngine``; ``cfg`` configures the
    fold-in partial fit (iterations/lr).  ``mode="implicit"`` uses the
    one-shot exact iALS ridge fold-in (``fold_in_implicit`` with
    ``alpha``/``reg``) instead of the explicit-model SGD partial fit —
    input values then act as confidence strengths, not ratings.
    Returns ``{metric: mean, "n_users": count}``.
    """
    from cu2rec_tpu.ops.topk import ndcg_at_k

    fns = {"recall": recall_at_k, "ndcg": ndcg_at_k}
    unknown = set(metrics) - fns.keys()
    if unknown:
        raise ValueError(f"unknown ranking metric(s): {sorted(unknown)}")
    n_in = np.diff(input_csr.indptr)
    n_out = np.diff(holdout_csr.indptr)
    users = np.nonzero((n_in > 0) & (n_out > 0))[0]
    if max_users:
        users = users[:max_users]
    if len(users) == 0:
        return {**{m: 0.0 for m in metrics}, "n_users": 0}
    totals = {m: 0.0 for m in metrics}
    for b0 in range(0, len(users), batch_size):
        batch = users[b0:b0 + batch_size]
        rated, rmask = padded_user_lists(input_csr, batch)
        vals = np.zeros_like(rated, dtype=np.float32)
        for b, u in enumerate(batch):
            lo, hi = input_csr.indptr[u], input_csr.indptr[u + 1]
            vals[b, :hi - lo] = input_csr.data[lo:hi]
        if mode == "implicit":
            p_rows, ub = engine.fold_in_implicit(rated, vals, rmask,
                                                 alpha=alpha, reg=reg)
        elif mode == "sgd":
            p_rows, ub = engine.fold_in(rated, vals, rmask, cfg=cfg)
        else:
            raise ValueError(f"unknown fold-in mode: {mode!r}")
        _, rec = engine.recommend(p_rows, ub, rated, rmask, k=k)
        rel, relmask = padded_user_lists(holdout_csr, batch)
        rec = jnp.asarray(rec)
        rel, relmask = jnp.asarray(rel), jnp.asarray(relmask)
        for m in metrics:
            totals[m] += float(jnp.sum(fns[m](rec, rel, relmask)))
    return {**{m: totals[m] / len(users) for m in metrics},
            "n_users": int(len(users))}
