"""Serving-path tests: fold-in (partial fit), full-catalog scoring, top-K
filtering, recall@k — the predict.cu capabilities (predict.cu:17-133)."""

import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.ops.model import predict_pairs, score_catalog
from cu2rec_tpu.ops.topk import mask_rated, recall_at_k
from cu2rec_tpu.serve.foldin import fold_in_user
from cu2rec_tpu.serve.recommend import (
    padded_user_lists, predict_all_items, ranked_items, recall_at_k_eval,
    recommend_users,
)
from cu2rec_tpu.train.trainer import train
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.metrics import MetricsLogger


def test_score_catalog_matches_pairs():
    rng = np.random.default_rng(0)
    U, I, F = 4, 7, 3
    P = rng.normal(size=(U, F)).astype(np.float32)
    Q = rng.normal(size=(I, F)).astype(np.float32)
    ub = rng.normal(size=U).astype(np.float32)
    ib = rng.normal(size=I).astype(np.float32)
    mu = 3.3
    scores = score_catalog(jnp.asarray(P), jnp.asarray(ub), jnp.asarray(Q),
                           jnp.asarray(ib), jnp.float32(mu))
    for u in range(U):
        expect = predict_pairs(jnp.asarray(P), jnp.asarray(Q),
                               jnp.asarray(ub), jnp.asarray(ib),
                               jnp.float32(mu),
                               jnp.full(I, u), jnp.arange(I))
        np.testing.assert_allclose(np.asarray(scores[u]), np.asarray(expect),
                                   rtol=1e-5)


def test_mask_rated_excludes():
    scores = jnp.ones((2, 6))
    rated = jnp.asarray([[1, 3, 0], [5, 0, 0]])
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    out = np.asarray(mask_rated(scores, rated, mask))
    assert (out[0, [1, 3]] < -1e30).all()
    assert (out[0, [0, 2, 4, 5]] == 1).all()
    assert out[1, 5] < -1e30
    assert (out[1, :5] == 1).all()


def test_recall_at_k():
    rec = jnp.asarray([[0, 1, 2], [3, 4, 5]])
    rel = jnp.asarray([[1, 9, 0], [6, 0, 0]])
    relmask = jnp.asarray([[True, True, False], [True, False, False]])
    r = np.asarray(recall_at_k(rec, rel, relmask))
    assert r[0] == 0.5  # hit item 1, missed 9
    assert r[1] == 0.0


import pathlib

import pytest

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def trained():
    from cu2rec_tpu.data import build_csr, read_ratings_csv
    rd = read_ratings_csv(str(DATA_DIR / "test_ratings.csv"))
    csr = build_csr(rd)
    cfg = Config(total_iterations=300, n_factors=4, learning_rate=0.05,
                 check_error=300)
    model, _ = train(csr, csr, cfg, rd.global_bias,
                     logger=MetricsLogger(verbose=False))
    return model, cfg, csr


def test_recommend_users_excludes_rated(trained):
    model, _, toy_csr = trained
    users = [0, 4]
    rated, rmask = padded_user_lists(toy_csr, users)
    scores, recs = recommend_users(model, users, rated, rmask, k=2)
    for b, u in enumerate(users):
        lo, hi = toy_csr.indptr[u], toy_csr.indptr[u + 1]
        rated_items = set(toy_csr.indices[lo:hi].tolist())
        for score, item in zip(np.asarray(scores[b]), np.asarray(recs[b])):
            if score < -1e30:
                continue  # catalog exhausted: fewer than k unrated items
            assert int(item) not in rated_items


def test_ranked_items_descending(trained):
    model, _, toy_csr = trained
    scores = predict_all_items(model.P[0], model.user_bias[0], model.Q,
                               model.item_bias, model.global_bias)
    ranked = ranked_items(scores)
    vals = [s for s, _ in ranked]
    assert vals == sorted(vals, reverse=True)
    assert len(ranked) == toy_csr.n_items


def test_fold_in_learns_user(trained):
    model, cfg, toy_csr = trained
    # Fold in a user resembling user 3 (all ratings 5) with Q frozen.
    rated = np.asarray([0, 1, 2], dtype=np.int32)
    vals = np.asarray([5.0, 5.0, 5.0], dtype=np.float32)
    fcfg = cfg.replace(total_iterations=200, cur_iterations=0,
                       check_error=200, learning_rate=0.05)
    fmodel, losses = fold_in_user(np.asarray(model.Q),
                                  np.asarray(model.item_bias),
                                  float(model.global_bias),
                                  rated, vals, fcfg)
    # item tables frozen
    np.testing.assert_array_equal(np.asarray(fmodel.Q), np.asarray(model.Q))
    # fold-in fits the user's ratings better over time
    assert losses[200] < losses[1]
    pred = np.asarray(predict_all_items(fmodel.P[0], fmodel.user_bias[0],
                                        fmodel.Q, fmodel.item_bias,
                                        fmodel.global_bias))
    assert np.mean(np.abs(pred[rated] - 5.0)) < 1.5


def test_recall_eval_runs(trained):
    model, _, toy_csr = trained
    r = recall_at_k_eval(model, toy_csr, toy_csr, k=3)
    assert 0.0 <= r <= 1.0
