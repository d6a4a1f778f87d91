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


def test_serving_engine_recommend_matches_single(trained):
    """Sharded serving engine top-k == single-device recommend_users."""
    from cu2rec_tpu.serve.engine import ShardedServingEngine
    from cu2rec_tpu.serve.recommend import padded_user_lists
    import jax

    model, _, toy_csr = trained
    users = [0, 2, 4]
    rated, rmask = padded_user_lists(toy_csr, users)
    svals, srecs = recommend_users(model, users, rated, rmask, k=3)

    eng = ShardedServingEngine(model, devices=jax.devices()[:4])
    dvals, drecs = eng.recommend_known(users, toy_csr, k=3)
    dvals, drecs = np.asarray(dvals), np.asarray(drecs)
    svals, srecs = np.asarray(svals), np.asarray(srecs)
    for b in range(len(users)):
        dv = [(v, i) for v, i in zip(dvals[b], drecs[b]) if v > -1e30]
        sv = [(v, i) for v, i in zip(svals[b], srecs[b]) if v > -1e30]
        for (v1, i1), (v2, i2) in zip(dv, sv):
            np.testing.assert_allclose(v1, v2, rtol=1e-5)
            assert i1 == i2


def test_serving_engine_foldin_matches_single(trained):
    """Batched sharded fold-in (B=1) == the single-user fold-in path."""
    import jax
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.serve.engine import ShardedServingEngine

    model, cfg, toy_csr = trained
    rated = np.array([0, 2, 4], dtype=np.int32)
    vals = np.array([5.0, 4.5, 5.0], dtype=np.float32)
    fcfg = cfg.replace(total_iterations=50, cur_iterations=0,
                       check_error=50, learning_rate=0.05)
    ref_model, _ = fold_in_user(np.asarray(model.Q),
                                np.asarray(model.item_bias),
                                float(model.global_bias),
                                rated, vals, fcfg)

    eng = ShardedServingEngine(model, devices=jax.devices()[:4])
    init0 = init_model(1, model.n_items, cfg.n_factors,
                       float(model.global_bias), seed=fcfg.seed,
                       Q=model.Q, item_bias=model.item_bias)
    p_rows, ub = eng.fold_in(rated[None, :], vals[None, :],
                             np.ones((1, 3), bool), fcfg,
                             init_rows=(init0.P, init0.user_bias))
    np.testing.assert_allclose(np.asarray(p_rows[0]),
                               np.asarray(ref_model.P[0]), atol=1e-5)
    np.testing.assert_allclose(float(ub[0]),
                               float(ref_model.user_bias[0]), atol=1e-5)


def test_serving_engine_foldin_batch(trained):
    """A batch of new users folds in at once; users with identical lists
    and identical slots... each slot gets its own stream, so two slots
    with the same ratings may differ — but both must fit their ratings."""
    import jax
    from cu2rec_tpu.serve.engine import ShardedServingEngine
    from cu2rec_tpu.utils.config import Config

    model, cfg, toy_csr = trained
    eng = ShardedServingEngine(model, devices=jax.devices()[:2])
    rated = np.array([[0, 2, 4], [1, 3, 3]], dtype=np.int32)
    vals = np.array([[5.0, 4.5, 5.0], [1.0, 1.5, 1.5]], dtype=np.float32)
    mask = np.array([[True, True, True], [True, True, False]])
    fcfg = Config(total_iterations=300, n_factors=cfg.n_factors,
                  learning_rate=0.05, check_error=300)
    svals, srecs = eng.fold_in_and_recommend(rated, vals, mask, fcfg, k=2)
    assert np.asarray(srecs).shape == (2, 2)
    # recommended items must exclude the rated ones
    assert not set(np.asarray(srecs)[0]).intersection({0, 2, 4})
    assert not set(np.asarray(srecs)[1]).intersection({1, 3})


def test_serving_engine_foldin_holey_mask(trained):
    """A hole in the mask must neither train on the masked entry nor hide
    valid entries after it: fold_in([i0, GARBAGE, i2], mask=[T,F,T]) ==
    fold_in([i0, i2], mask=[T,T]) (regression: lens-only sampling read
    positions 0..len-1 of the UNcompacted list)."""
    import jax
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.serve.engine import ShardedServingEngine

    model, cfg, toy_csr = trained
    fcfg = cfg.replace(total_iterations=40, cur_iterations=0,
                       check_error=40, learning_rate=0.05)
    eng = ShardedServingEngine(model, devices=jax.devices()[:2])
    init0 = init_model(1, model.n_items, cfg.n_factors,
                       float(model.global_bias), seed=fcfg.seed,
                       Q=model.Q, item_bias=model.item_bias)
    init = (init0.P, init0.user_bias)

    holey = eng.fold_in(np.array([[0, 3, 4]], np.int32),
                        np.array([[5.0, -77.0, 4.0]], np.float32),
                        np.array([[True, False, True]]), fcfg,
                        init_rows=init)
    # same valid entries, compact, padded at the END (masked)
    compact = eng.fold_in(np.array([[0, 4, 1]], np.int32),
                          np.array([[5.0, 4.0, -77.0]], np.float32),
                          np.array([[True, True, False]]), fcfg,
                          init_rows=init)
    np.testing.assert_allclose(np.asarray(holey[0]),
                               np.asarray(compact[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(holey[1]),
                               np.asarray(compact[1]), atol=1e-6)


def test_serving_engine_recommend_1d_rated(trained):
    """recommend() accepts 1-D rated lists (one rated item per user)."""
    import jax
    from cu2rec_tpu.serve.engine import ShardedServingEngine

    model, _, _ = trained
    eng = ShardedServingEngine(model, devices=jax.devices()[:2])
    users = np.array([0, 1], dtype=np.int32)
    vals, recs = eng.recommend(model.P[users], model.user_bias[users],
                               np.array([3, 1], np.int32),
                               np.array([True, True]), k=3)
    assert vals.shape == (2, 3) and recs.shape == (2, 3)
    assert 3 not in np.asarray(recs[0]) and 1 not in np.asarray(recs[1])


def test_ndcg_at_k_known_values():
    """Hand-computed binary NDCG@3: position discounts 1/log2(j+2)."""
    import math

    from cu2rec_tpu.ops.topk import ndcg_at_k

    rec = jnp.asarray([[0, 1, 2], [3, 4, 5], [7, 8, 9]])
    rel = jnp.asarray([[1, 9, 0], [3, 4, 0], [1, 0, 0]])
    relmask = jnp.asarray([[True, True, False],
                           [True, True, False],
                           [True, False, False]])
    n = np.asarray(ndcg_at_k(rec, rel, relmask))
    d = [1.0 / math.log2(j + 2) for j in range(3)]
    # user 0: hit at rank 2 of 2 relevant -> DCG d[1], IDCG d[0]+d[1]
    assert abs(n[0] - d[1] / (d[0] + d[1])) < 1e-6
    # user 1: hits at ranks 1,2 of 2 relevant -> perfect
    assert abs(n[1] - 1.0) < 1e-6
    # user 2: no hits
    assert n[2] == 0.0


def test_ndcg_rewards_earlier_hits():
    from cu2rec_tpu.ops.topk import ndcg_at_k, recall_at_k

    rel = jnp.asarray([[5, 0, 0]])
    relmask = jnp.asarray([[True, False, False]])
    early = np.asarray(ndcg_at_k(jnp.asarray([[5, 1, 2]]), rel, relmask))
    late = np.asarray(ndcg_at_k(jnp.asarray([[1, 2, 5]]), rel, relmask))
    assert early[0] == 1.0 and 0.0 < late[0] < early[0]
    # recall can't tell them apart — that's what ndcg adds
    r_early = np.asarray(recall_at_k(jnp.asarray([[5, 1, 2]]), rel, relmask))
    r_late = np.asarray(recall_at_k(jnp.asarray([[1, 2, 5]]), rel, relmask))
    assert r_early[0] == r_late[0] == 1.0


def test_ranking_eval_returns_both_metrics(trained):
    from cu2rec_tpu.serve.recommend import ranking_eval

    model, _, toy_csr = trained
    out = ranking_eval(model, toy_csr, toy_csr, k=3)
    assert set(out) == {"recall", "ndcg"}
    assert 0.0 <= out["ndcg"] <= 1.0
    assert out["recall"] == recall_at_k_eval(model, toy_csr, toy_csr, k=3)
    with pytest.raises(ValueError, match="unknown ranking metric"):
        ranking_eval(model, toy_csr, toy_csr, k=3, metrics=("map",))


def test_serving_engine_chunked_catalog_scan_parity():
    """The chunked catalog scan (fori_loop over ≤8192-item tiles with a
    running top-k merge — bounds the score tile so B=4096 at a 1M-item
    catalog cannot OOM) must return the same top-k as the one-pass
    full-matrix reference, including rated-item masking and the padded
    catalog tail, across ip shardings that force multiple chunks."""
    import jax
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.serve.engine import ShardedServingEngine
    from cu2rec_tpu.serve.recommend import recommend_users

    U, I, F = 64, 20_001, 8
    model = init_model(U, I, F, 3.0, seed=13)
    rng = np.random.default_rng(5)
    users = rng.integers(0, U, 16).tolist()
    rated = rng.integers(0, I, (16, 7)).astype(np.int32)
    rmask = rng.random((16, 7)) > 0.3
    svals, srecs = recommend_users(model, users, rated, rmask, k=10)
    svals, srecs = np.asarray(svals), np.asarray(srecs)
    # chunk_items=3000: I_loc=20001 (ip=1) -> 7 chunks, the last clamped
    # to overlap its predecessor (I_loc % C != 0); I_loc=10001 (ip=2) ->
    # 4 chunks.  The auto formula floors C at 8192 so a small-B test
    # would otherwise never hit n_chunks > 1 on one shard (round-3
    # advisor finding) — the override forces the fori_loop merge,
    # clamped-start masking, and running top-k through real multi-chunk
    # traffic.
    for n_ip, chunk in ((1, None), (1, 3000), (2, None), (2, 3000)):
        eng = ShardedServingEngine(model, devices=jax.devices()[:n_ip],
                                   chunk_items=chunk)
        dvals, drecs = eng.recommend(
            np.asarray(model.P)[users], np.asarray(model.user_bias)[users],
            rated, rmask, k=10)
        np.testing.assert_allclose(np.asarray(dvals), svals, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(drecs), srecs)


def test_foldin_ranking_eval_planted():
    """Fold-in quality metric (VERDICT r3 item 8): hold out half of each
    user's ratings, fold in on the rest against the frozen trained
    catalog, and recall@k of the held-out items on planted block
    structure must be far above chance."""
    from cu2rec_tpu.data.csr import csr_from_arrays
    from cu2rec_tpu.serve.engine import ShardedServingEngine
    from cu2rec_tpu.serve.recommend import foldin_ranking_eval
    from cu2rec_tpu.train.als import train_als

    rng = np.random.default_rng(5)
    U, I = 40, 30
    rows = []
    for u in range(U):
        block = (u % 2) * (I // 2)
        liked = rng.choice(I // 2, size=10, replace=False) + block
        other = rng.choice(I // 2, size=3, replace=False) + (I // 2 - block)
        for i in liked:
            rows.append((u, i, float(rng.integers(4, 6))))
        for i in other:
            rows.append((u, i, float(rng.integers(1, 3))))
    arr = np.asarray(rows)
    users, items = arr[:, 0].astype(np.int32), arr[:, 1].astype(np.int32)
    vals = arr[:, 2].astype(np.float32)
    full = csr_from_arrays(users, items, vals, U, I)

    cfg = Config(total_iterations=8, n_factors=8, P_reg=0.05, Q_reg=0.05,
                 user_bias_reg=0.05, item_bias_reg=0.05, seed=3)
    model, _ = train_als(full, full, cfg, float(vals.mean()),
                         logger=MetricsLogger(verbose=False))

    # Per-user 50/50 split of the SAME ratings into input/holdout CSRs.
    in_rows, out_rows = [], []
    for u in range(U):
        lo, hi = full.indptr[u], full.indptr[u + 1]
        perm = rng.permutation(hi - lo)
        half = (hi - lo) // 2
        for j in perm[:half]:
            in_rows.append((u, full.indices[lo + j], full.data[lo + j]))
        for j in perm[half:]:
            # Holdout relevance = LIKED items only (rating >= 4): recall
            # of disliked holdout items would punish a model for ranking
            # them low.
            if full.data[lo + j] >= 4.0:
                out_rows.append((u, full.indices[lo + j],
                                 full.data[lo + j]))

    def mk(rws):
        a = np.asarray(rws)
        return csr_from_arrays(a[:, 0].astype(np.int32),
                               a[:, 1].astype(np.int32),
                               a[:, 2].astype(np.float32), U, I)

    engine = ShardedServingEngine(model)
    fold_cfg = Config(total_iterations=60, n_factors=8, learning_rate=0.1,
                      P_reg=0.05, user_bias_reg=0.05, seed=3)
    out = foldin_ranking_eval(engine, mk(in_rows), mk(out_rows),
                              cfg=fold_cfg, k=7)
    assert out["n_users"] > U * 0.8  # a few users may have no liked holdout
    # ~5 liked held-out items per user inside a 30-item catalog; chance
    # recall for 7 recommendations is ~7/24 ≈ 0.29.  The planted block
    # structure puts a competent fold-in far above that.
    assert out["recall"] > 0.55, out
    assert 0.0 < out["ndcg"] <= 1.0
