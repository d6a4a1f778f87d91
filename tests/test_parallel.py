"""Multi-device sharding tests on the 8-virtual-CPU-device mesh — the
multi-"host" test mode the reference could never have (it was single-GPU
with no distributed backend; SURVEY §2, §5).

Key property: the sharded engine computes *bit-identical* updates to the
single-chip path (deterministic counter-based sampling + mesh-wide winner
election), so these tests assert near-exact equality, not just "it runs".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cu2rec_tpu.data.csr import to_device
from cu2rec_tpu.models.state import init_model
from cu2rec_tpu.ops.loss import evaluate as eval_single
from cu2rec_tpu.ops.sgd import Hyper
from cu2rec_tpu.parallel.sharded import (
    ShardedEngine, make_mesh, pad_model, shard_ratings, trim_model,
)
from cu2rec_tpu.train.trainer import run_steps, train
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.metrics import MetricsLogger

HP = Hyper(jnp.float32(0.05), jnp.float32(0.1), jnp.float32(0.1),
           jnp.float32(0.1), jnp.float32(0.1))


def have_devices(n):
    return len(jax.devices()) >= n


@pytest.fixture
def cfg():
    return Config(total_iterations=10, n_factors=4, learning_rate=0.05,
                  check_error=5, P_reg=0.1, Q_reg=0.1, user_bias_reg=0.1,
                  item_bias_reg=0.1)


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape["dp"] == 4
    assert mesh.shape["ip"] == 2


def test_shard_ratings_reassembles(toy_csr):
    sh = shard_ratings(toy_csr, n_dp=4)
    assert sh.n_users_padded == 8
    indptr = np.asarray(sh.indptr)
    indices = np.asarray(sh.indices)
    nnz = np.asarray(sh.nnz)
    # each shard's local CSR matches the global slice
    U_loc = sh.n_users_padded // 4
    for d in range(4):
        lo_u = d * U_loc
        for u in range(U_loc):
            gu = lo_u + u
            g_lo = toy_csr.indptr[min(gu, toy_csr.n_users)]
            g_hi = toy_csr.indptr[min(gu + 1, toy_csr.n_users)]
            l_lo, l_hi = indptr[d, u], indptr[d, u + 1]
            np.testing.assert_array_equal(
                indices[d, l_lo:l_hi], toy_csr.indices[g_lo:g_hi])
    assert nnz.sum() == toy_csr.nnz


@pytest.mark.parametrize("n_dp,n_ip", [(2, 1), (4, 1), (2, 2), (4, 2),
                                       (1, 4)])
def test_sharded_matches_single_chip(toy_csr, cfg, n_dp, n_ip):
    """THE core test: N-device run == 1-device run, exactly (up to float
    associativity in eval) — against the plain UNPADDED single-chip run,
    including when n_users is not divisible by n_dp (toy U=6, dp=4): the
    election priority modulus must be the unpadded user count on both
    paths."""
    if not have_devices(n_dp * n_ip):
        pytest.skip("not enough devices")
    gb = 3.5556
    # two identical models (same seed) — engine.run donates its input
    # buffers, so each path gets its own copy
    model0 = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors,
                        gb, seed=cfg.seed)
    model0b = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors,
                         gb, seed=cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    engine = ShardedEngine(toy_csr, toy_csr, cfg, mesh=make_mesh(n_dp, n_ip))

    sharded = engine.finalize(engine.run(model0, HP, 0, 10))

    single = run_steps(model0b, to_device(toy_csr), HP, key, jnp.int32(0),
                       10, True, "first_wins")

    np.testing.assert_allclose(np.asarray(sharded.P), np.asarray(single.P),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.Q), np.asarray(single.Q),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.user_bias),
                               np.asarray(single.user_bias), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.item_bias),
                               np.asarray(single.item_bias), atol=1e-6)


def test_sharded_eval_matches_single(toy_csr, cfg):
    gb = 3.5556
    model = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors, gb,
                       seed=7)
    engine = ShardedEngine(toy_csr, toy_csr, cfg, mesh=make_mesh(4, 2))
    rmse_s, mae_s = engine.evaluate(model, "train")
    dev = to_device(toy_csr)
    rmse1, mae1 = eval_single(model, dev)
    np.testing.assert_allclose(rmse_s, rmse1, rtol=1e-5)
    np.testing.assert_allclose(mae_s, mae1, rtol=1e-5)


@pytest.mark.parametrize("n_dp,n_ip", [(2, 1), (4, 2)])
def test_sharded_windowed_eval_matches_plain(cfg, monkeypatch, n_dp, n_ip):
    """The windowed user-band eval (3× at ML-20M on a single chip) must
    compute the SAME RMSE/MAE on the dp-sharded path: window the LOCAL
    user table per scan chunk, parity vs the plain sharded gather and the
    single-device eval (round-2 verdict item 4)."""
    if not have_devices(n_dp * n_ip):
        pytest.skip("not enough devices")
    import cu2rec_tpu.ops.loss as loss_mod
    from cu2rec_tpu.data.csr import csr_from_arrays

    rng = np.random.default_rng(21)
    # Ratings confined to a user band much narrower than a local shard
    # (U_loc = 4096/n_dp), so the attested per-shard span is a real
    # window, not the whole local table.
    U, I, N = 4096, 97, 40000
    users = rng.integers(1000, 1800, N).astype(np.int32)
    items = rng.integers(0, I, N).astype(np.int32)
    vals = rng.uniform(1.0, 5.0, N).astype(np.float32)
    csr = csr_from_arrays(users, items, vals, U, I, use_native=False)
    model = init_model(U, I, cfg.n_factors, 3.0, seed=9)

    engine = ShardedEngine(csr, csr, cfg, mesh=make_mesh(n_dp, n_ip))
    assert engine.train_sh.eval_span > 0  # builder attested the window
    rmse_plain, mae_plain = engine.evaluate(model, "train")

    # Force the window regime at toy scale (thresholds are tuned for
    # multi-MB tables) and confirm the windowed program really engages.
    monkeypatch.setattr(loss_mod, "_WINDOW_TABLE_MIN", 0)
    from cu2rec_tpu.ops.loss import choose_window_span
    U_loc = engine.U_pad // n_dp
    span = choose_window_span(engine.train_sh.eval_span, U_loc,
                              (cfg.n_factors + 2) * 4)
    assert 0 < span < U_loc
    rmse_win, mae_win = engine.evaluate(model, "train")

    dev = to_device(csr)
    rmse1, mae1 = eval_single(model, dev)
    np.testing.assert_allclose(rmse_win, rmse_plain, rtol=1e-6)
    np.testing.assert_allclose(mae_win, mae_plain, rtol=1e-6)
    np.testing.assert_allclose(rmse_win, rmse1, rtol=1e-5)
    np.testing.assert_allclose(mae_win, mae1, rtol=1e-5)


def test_sharded_end_to_end_train(toy_csr, toy_ratings, cfg):
    """Full train loop through the sharded engine converges."""
    engine = ShardedEngine(toy_csr, toy_csr, cfg, mesh=make_mesh(2, 2))
    cfg.total_iterations = 60
    cfg.check_error = 30
    model, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                          logger=MetricsLogger(verbose=False), engine=engine)
    assert losses[60] < losses[1]
    assert model.P.shape[0] == toy_csr.n_users  # trimmed back


def test_dp_only_mesh(toy_csr, toy_ratings):
    cfg = Config(total_iterations=20, n_factors=2, learning_rate=0.1,
                 check_error=10)
    engine = ShardedEngine(toy_csr, toy_csr, cfg, mesh=make_mesh(8, 1))
    model, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                          logger=MetricsLogger(verbose=False), engine=engine)
    assert losses[20] <= losses[1]


@pytest.mark.parametrize("collision", ["mean", "sum"])
def test_sharded_collision_policies(toy_csr, toy_ratings, collision):
    cfg = Config(total_iterations=30, n_factors=4, learning_rate=0.05,
                 check_error=15, collision_policy=collision)
    engine = ShardedEngine(toy_csr, toy_csr, cfg, mesh=make_mesh(2, 2))
    model, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                          logger=MetricsLogger(verbose=False), engine=engine)
    assert losses[30] < losses[1]
    assert np.isfinite(np.asarray(model.Q)).all()


def test_sharded_mean_matches_single_chip(toy_csr, cfg):
    """Mean-collision parity between sharded and single-chip packed."""
    from cu2rec_tpu.ops.packed import pack, packed_run_steps, unpack
    from cu2rec_tpu.data.csr import CSRRatings
    cfg.collision_policy = "mean"
    gb = 3.5556
    model0 = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors,
                        gb, seed=cfg.seed)
    model0b = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors,
                        gb, seed=cfg.seed)
    engine = ShardedEngine(toy_csr, toy_csr, cfg, mesh=make_mesh(2, 2))
    sharded = engine.finalize(engine.run(model0, HP, 0, 8))

    U_pad, I_pad = engine.U_pad, engine.I_pad
    indptr_pad = np.zeros(U_pad + 1, dtype=np.int32)
    indptr_pad[:toy_csr.n_users + 1] = toy_csr.indptr
    indptr_pad[toy_csr.n_users + 1:] = toy_csr.indptr[-1]
    csr_pad = CSRRatings(indptr=indptr_pad, indices=toy_csr.indices,
                         data=toy_csr.data, n_users=U_pad, n_items=I_pad)
    dev_pad = to_device(csr_pad)
    pm = pack(pad_model(model0b, U_pad, I_pad))
    pm = packed_run_steps(pm, dev_pad, HP, jax.random.PRNGKey(cfg.seed),
                          jnp.int32(0), 8, True, "mean")
    single = trim_model(unpack(pm), toy_csr.n_users, toy_csr.n_items)
    np.testing.assert_allclose(np.asarray(sharded.P), np.asarray(single.P),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.Q), np.asarray(single.Q),
                               atol=1e-5)


def test_distributed_topk_matches_single(toy_csr):
    """Item-sharded serving top-k == single-device top-k."""
    from cu2rec_tpu.parallel.serving import distributed_topk
    from cu2rec_tpu.serve.recommend import padded_user_lists, recommend_users

    model = init_model(toy_csr.n_users, toy_csr.n_items, 4, 3.5, seed=5)
    users = [0, 2, 4]
    rated, rmask = padded_user_lists(toy_csr, users)
    svals, srecs = recommend_users(model, users, rated, rmask, k=3)

    mesh = make_mesh(1, 4)
    padded = pad_model(model, toy_csr.n_users, 8)  # I=5 → pad to 8 for ip=4
    dvals, drecs = distributed_topk(
        mesh, padded.P[jnp.asarray(users)],
        padded.user_bias[jnp.asarray(users)], padded.Q, padded.item_bias,
        float(model.global_bias), rated, rmask, k=3,
        n_items=toy_csr.n_items)
    # padded item rows score mu+0+ib(0)+0 — exclude any entries pointing at
    # padding by comparing only real-item recommendations
    dvals, drecs = np.asarray(dvals), np.asarray(drecs)
    svals, srecs = np.asarray(svals), np.asarray(srecs)
    for b in range(len(users)):
        # compare valid (non-sentinel, real-item) recommendations
        dv = [(v, i) for v, i in zip(dvals[b], drecs[b])
              if v > -1e30 and i < toy_csr.n_items]
        sv = [(v, i) for v, i in zip(svals[b], srecs[b]) if v > -1e30]
        for (v1, i1), (v2, i2) in zip(dv, sv):
            np.testing.assert_allclose(v1, v2, rtol=1e-5)
            assert i1 == i2


def test_sharded_recall_matches_single(toy_csr, toy_ratings):
    from cu2rec_tpu.parallel.serving import (sharded_ranking_eval,
                                             sharded_recall_at_k)
    from cu2rec_tpu.serve.recommend import ranking_eval, recall_at_k_eval
    cfg = Config(total_iterations=100, n_factors=4, learning_rate=0.05,
                 check_error=100)
    model, _ = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                     logger=MetricsLogger(verbose=False))
    r_single = recall_at_k_eval(model, toy_csr, toy_csr, k=2)
    r_sharded = sharded_recall_at_k(make_mesh(1, 4), model, toy_csr,
                                    toy_csr, k=2)
    assert abs(r_single - r_sharded) < 1e-6
    # the joint-metric path must agree with the single-device one too
    m_single = ranking_eval(model, toy_csr, toy_csr, k=2)
    m_sharded = sharded_ranking_eval(make_mesh(1, 4), model, toy_csr,
                                     toy_csr, k=2)
    for key in ("recall", "ndcg"):
        assert abs(m_single[key] - m_sharded[key]) < 1e-6


def test_sharded_eval_with_smaller_test_split(toy_csr, cfg):
    """Test split whose max user id < train's (e.g. the max-id user has no
    test ratings): ShardedEngine must align the test CSR's dims to train's
    before sharding, or local row ids rebase against the wrong U_loc and
    the engine evaluates the wrong users."""
    from cu2rec_tpu.data.csr import CSRRatings, normalize_csr_dims
    keep_users = 3  # 3 < 6 and not divisible alignment with dp=4
    hi = int(toy_csr.indptr[keep_users])
    test_csr = CSRRatings(indptr=toy_csr.indptr[:keep_users + 1],
                          indices=toy_csr.indices[:hi],
                          data=toy_csr.data[:hi],
                          n_users=keep_users, n_items=toy_csr.n_items)
    model = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors,
                       3.5556, seed=7)
    engine = ShardedEngine(toy_csr, test_csr, cfg, mesh=make_mesh(4, 1))
    rmse_s, mae_s = engine.evaluate(model, "test")
    dev = to_device(normalize_csr_dims(test_csr, toy_csr.n_users,
                                       toy_csr.n_items))
    rmse1, mae1 = eval_single(model, dev)
    np.testing.assert_allclose(rmse_s, rmse1, rtol=1e-5)
    np.testing.assert_allclose(mae_s, mae1, rtol=1e-5)


@pytest.mark.parametrize("n_dp,n_ip", [(2, 1), (4, 2), (1, 4)])
def test_sharded_twin_matches_single_chip(toy_csr, cfg, n_dp, n_ip):
    """Twin-sampling parity: sharded == single-chip packed, exactly."""
    from cu2rec_tpu.ops.packed import pack, packed_run_steps, unpack
    if not have_devices(n_dp * n_ip):
        pytest.skip("not enough devices")
    cfg.collision_policy = "twin"
    gb = 3.5556
    model0 = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors,
                        gb, seed=cfg.seed)
    model0b = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors,
                         gb, seed=cfg.seed)
    engine = ShardedEngine(toy_csr, toy_csr, cfg, mesh=make_mesh(n_dp, n_ip))
    sharded = engine.finalize(engine.run(model0, HP, 0, 10))

    dev = to_device(toy_csr, item_major=True)
    pm = packed_run_steps(pack(model0b), dev, HP,
                          jax.random.PRNGKey(cfg.seed), jnp.int32(0), 10,
                          True, "twin")
    single = unpack(pm)
    np.testing.assert_allclose(np.asarray(sharded.P), np.asarray(single.P),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.Q), np.asarray(single.Q),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.user_bias),
                               np.asarray(single.user_bias), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.item_bias),
                               np.asarray(single.item_bias), atol=1e-6)


def test_twin_end_to_end_train(toy_csr, toy_ratings):
    cfg = Config(total_iterations=60, n_factors=4, learning_rate=0.05,
                 check_error=30, collision_policy="twin")
    model, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                          logger=MetricsLogger(verbose=False))
    assert losses[60] < losses[1]
    assert np.isfinite(np.asarray(model.Q)).all()


def test_twin_after_construction_raises(toy_csr):
    """Flipping collision_policy to 'twin' after engine construction must
    fail loudly — the item-major shards are placeholders, and running
    twin against them would silently freeze the item table."""
    cfg = Config(n_factors=8, collision_policy="first_wins")
    engine = ShardedEngine(toy_csr, toy_csr, cfg, mesh=make_mesh(2, 1))
    model = init_model(toy_csr.n_users, toy_csr.n_items, cfg.n_factors,
                       3.5, seed=cfg.seed)
    cfg.collision_policy = "twin"
    with pytest.raises(ValueError, match="twin"):
        engine.run(model, HP, 0, 2)
