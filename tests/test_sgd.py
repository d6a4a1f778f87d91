"""SGD step tests.

The reference could only assert "no NaNs" after a kernel launch because its
Hogwild races made exact values unreproducible (test_sgd.cu:132-145).  Our
deterministic redesign is *exactly* checkable against a NumPy twin — the
step-exactness tests below are the race-detection posture SURVEY §5 calls
for: the collision policy is explicit and testable, not racy.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.data.csr import to_device
from cu2rec_tpu.models.state import init_model
from cu2rec_tpu.ops.sgd import (
    Hyper, elect_winners, rotated_priority, sample_items, win_mask,
)
from cu2rec_tpu.train.reference import reference_step
from cu2rec_tpu.train.trainer import single_step

HP = Hyper(jnp.float32(0.05), jnp.float32(0.1), jnp.float32(0.1),
           jnp.float32(0.1), jnp.float32(0.1))


def _model(toy_csr, seed=3):
    return init_model(toy_csr.n_users, toy_csr.n_items, 2, 3.5556, seed=seed)


def test_sampling_valid_and_masked(toy_csr):
    dev = to_device(toy_csr)
    key = jax.random.PRNGKey(0)
    for it in range(5):
        items, ratings, has = sample_items(key, jnp.int32(it), dev.indptr,
                                           dev.indices, dev.data)
        items, ratings, has = map(np.asarray, (items, ratings, has))
        assert has.all()  # toy fixture: every user has ratings
        for u in range(toy_csr.n_users):
            lo, hi = toy_csr.indptr[u], toy_csr.indptr[u + 1]
            assert items[u] in toy_csr.indices[lo:hi]
            # sampled rating belongs to the sampled (user, item) pair
            row = toy_csr.indices[lo:hi].tolist().index(items[u])
            assert ratings[u] == toy_csr.data[lo + row]


def test_sampling_missing_user(data_dir):
    from cu2rec_tpu.data import build_csr, read_ratings_csv
    rd = read_ratings_csv(str(data_dir / "test_missing_user_ratings.csv"))
    csr = build_csr(rd)
    dev = to_device(csr)
    _, _, has = sample_items(jax.random.PRNGKey(0), jnp.int32(0),
                             dev.indptr, dev.indices, dev.data)
    assert not bool(has[1])  # user 2 (0-based 1) has no ratings
    assert np.asarray(has).sum() == csr.n_users - 1


def test_sampling_deterministic_under_offset(toy_csr):
    """The counter-based stream: sampling users [0,6) in one shot equals
    sampling [0,3) and [3,6) with user_offset — the property that makes
    sharded runs bit-identical."""
    dev = to_device(toy_csr)
    key = jax.random.PRNGKey(7)
    it = jnp.int32(4)
    items, ratings, has = sample_items(key, it, dev.indptr, dev.indices,
                                       dev.data)
    # emulate two shards by rebuilding local CSRs
    indptr = np.asarray(dev.indptr)
    for lo_u, hi_u in ((0, 3), (3, 6)):
        local_indptr = jnp.asarray(indptr[lo_u:hi_u + 1] - indptr[lo_u])
        local_indices = dev.indices[indptr[lo_u]:indptr[hi_u]]
        local_data = dev.data[indptr[lo_u]:indptr[hi_u]]
        li, lr, lh = sample_items(key, it, local_indptr, local_indices,
                                  local_data, user_offset=lo_u)
        np.testing.assert_array_equal(np.asarray(li),
                                      np.asarray(items[lo_u:hi_u]))
        np.testing.assert_array_equal(np.asarray(lr),
                                      np.asarray(ratings[lo_u:hi_u]))


def test_winner_unique_per_item(toy_csr):
    items = jnp.asarray([0, 0, 0, 1, 1, 2], dtype=jnp.int32)
    has = jnp.asarray([True, True, False, True, True, True])
    prio = jnp.asarray([5, 2, 0, 3, 4, 1], dtype=jnp.int32)
    best, cand = elect_winners(items, has, prio, 5)
    win = np.asarray(win_mask(best, items, cand, has))
    # winner of item 0 is user 1 (prio 2; user 2 has no rating)
    np.testing.assert_array_equal(win, [False, True, False, True, False, True])
    # exactly one winner per sampled item
    for item in np.unique(np.asarray(items)[np.asarray(has)]):
        assert win[(np.asarray(items) == item) & np.asarray(has)].sum() == 1


def test_rotation_changes_priority():
    p0 = np.asarray(rotated_priority(6, jnp.int32(0), 0, 6))
    p1 = np.asarray(rotated_priority(6, jnp.int32(1), 0, 6))
    np.testing.assert_array_equal(p0, [0, 1, 2, 3, 4, 5])
    # iteration 1: start_user = 250 % 6 = 4
    np.testing.assert_array_equal(p1, [2, 3, 4, 5, 0, 1])


def _step_twin_check(toy_csr, collision):
    model = _model(toy_csr)
    dev = to_device(toy_csr)
    key = jax.random.PRNGKey(11)
    it = jnp.int32(2)
    out = single_step(model, dev, HP, key, it, collision=collision)

    items, ratings, has = sample_items(key, it, dev.indptr, dev.indices,
                                       dev.data)
    prio = rotated_priority(toy_csr.n_users, it, 0, toy_csr.n_users)
    P, Q, ub, ib = reference_step(
        np.asarray(model.P), np.asarray(model.Q),
        np.asarray(model.user_bias), np.asarray(model.item_bias),
        float(model.global_bias), np.asarray(items), np.asarray(ratings),
        np.asarray(has), np.asarray(prio),
        0.05, 0.1, 0.1, 0.1, 0.1, collision=collision)
    np.testing.assert_allclose(np.asarray(out.P), P, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.Q), Q, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.user_bias), ub, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.item_bias), ib, atol=1e-6)


def test_step_matches_numpy_twin_first_wins(toy_csr):
    _step_twin_check(toy_csr, "first_wins")


def test_step_matches_numpy_twin_mean(toy_csr):
    _step_twin_check(toy_csr, "mean")


def test_foldin_freezes_item_tables(toy_csr):
    model = _model(toy_csr)
    dev = to_device(toy_csr)
    out = single_step(model, dev, HP, jax.random.PRNGKey(0), jnp.int32(0),
                      train_items=False)
    np.testing.assert_array_equal(np.asarray(out.Q), np.asarray(model.Q))
    np.testing.assert_array_equal(np.asarray(out.item_bias),
                                  np.asarray(model.item_bias))
    assert not np.allclose(np.asarray(out.P), np.asarray(model.P))


def test_no_nans_after_step(toy_csr):
    # the reference's only sgd assertion (test_sgd.cu:134-145)
    model = _model(toy_csr)
    dev = to_device(toy_csr)
    out = single_step(model, dev, HP, jax.random.PRNGKey(1), jnp.int32(0))
    for arr in (out.P, out.Q, out.user_bias, out.item_bias):
        assert np.isfinite(np.asarray(arr)).all()
