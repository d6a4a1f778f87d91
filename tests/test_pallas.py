"""Pallas kernel tests (interpret mode — runs on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cu2rec_tpu.data.csr import to_device
from cu2rec_tpu.models.state import init_model
from cu2rec_tpu.ops.packed import pack, packed_step, unpack
from cu2rec_tpu.ops.sgd import Hyper
from cu2rec_tpu.ops.sgd_pallas import dense_core, pallas_step

HP = Hyper(jnp.float32(0.05), jnp.float32(0.1), jnp.float32(0.1),
           jnp.float32(0.1), jnp.float32(0.1))


def test_dense_core_matches_reference():
    rng = np.random.default_rng(0)
    U, W, F = 700, 64, 50   # non-multiple of TILE_U exercises padding
    T_u = jnp.asarray(rng.normal(size=(U, W)).astype(np.float32))
    row_i = jnp.asarray(rng.normal(size=(U, W)).astype(np.float32))
    ratings = jnp.asarray(rng.uniform(1, 5, U).astype(np.float32))
    has = jnp.asarray(rng.random(U) > 0.1)
    win = has & jnp.asarray(rng.random(U) > 0.5)
    mu = jnp.float32(3.3)

    T_u_new, di = dense_core(T_u, row_i, ratings, has, win, HP, mu, F,
                             interpret=True)

    # NumPy reference of the same packed formulas
    col = np.arange(W)
    factor = (col < F).astype(np.float32)
    biascol = (col == F).astype(np.float32)
    tu = np.asarray(T_u)
    ri = np.asarray(row_i)
    ihat = ri * factor + biascol
    uhat = tu * factor + biascol
    pred = 3.3 + (tu * ihat).sum(1) + ri[:, F]
    err = np.where(np.asarray(has), np.asarray(ratings) - pred, 0.0)
    reg_u = factor * 0.1 + biascol * 0.1
    reg_i = factor * 0.1 + biascol * 0.1
    du = 0.05 * (err[:, None] * ihat - reg_u * tu)
    exp_tu = np.where(np.asarray(has)[:, None], tu + du, tu)
    exp_di = np.where(np.asarray(win)[:, None],
                      0.05 * (err[:, None] * uhat - reg_i * ri), 0.0)

    np.testing.assert_allclose(np.asarray(T_u_new), exp_tu, atol=2e-5)
    np.testing.assert_allclose(np.asarray(di), exp_di, atol=2e-5)


@pytest.mark.parametrize("collision", ["first_wins", "mean"])
def test_pallas_step_matches_packed(toy_csr, collision):
    model = init_model(toy_csr.n_users, toy_csr.n_items, 4, 3.5556, seed=3)
    dev = to_device(toy_csr)
    key = jax.random.PRNGKey(11)
    a = pack(model)
    b = pack(model)
    for it in range(4):
        a = packed_step(a, dev, HP, key, jnp.int32(it), collision=collision)
        b = pallas_step(b, dev, HP, key, jnp.int32(it), collision=collision,
                        interpret=True)
    ua, ub = unpack(a), unpack(b)
    np.testing.assert_allclose(np.asarray(ub.P), np.asarray(ua.P), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ub.Q), np.asarray(ua.Q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ub.user_bias),
                               np.asarray(ua.user_bias), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ub.item_bias),
                               np.asarray(ua.item_bias), atol=1e-5)


def test_pallas_foldin_freezes(toy_csr):
    model = init_model(toy_csr.n_users, toy_csr.n_items, 4, 3.5, seed=3)
    dev = to_device(toy_csr)
    pm = pack(model)
    out = pallas_step(pm, dev, HP, jax.random.PRNGKey(0), jnp.int32(0),
                      train_items=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.T_i), np.asarray(pm.T_i))
