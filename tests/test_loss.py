"""Loss/eval tests — parity with reference tests/test_loss.cu.

The analytic golden value: with all-ones P/Q/biases (F=2) and μ forced to
1.0 on the toy fixture, every prediction is 5.0 and the squared errors sum
to exactly 74.0 (test_loss.cu:84-90)."""

import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.data.csr import to_device
from cu2rec_tpu.models.state import MFModel
from cu2rec_tpu.ops.loss import error_sums, evaluate, metrics_from_errors, \
    pairwise_errors


def ones_model(n_users, n_items, n_factors=2, mu=1.0):
    return MFModel(P=jnp.ones((n_users, n_factors)),
                   Q=jnp.ones((n_items, n_factors)),
                   user_bias=jnp.ones(n_users),
                   item_bias=jnp.ones(n_items),
                   global_bias=jnp.float32(mu))


def test_loss_analytic_74(toy_csr):
    m = ones_model(toy_csr.n_users, toy_csr.n_items)
    rows = jnp.asarray(toy_csr.row_ids)
    cols = jnp.asarray(toy_csr.indices)
    vals = jnp.asarray(toy_csr.data)
    err = pairwise_errors(m.P, m.Q, m.user_bias, m.item_bias, m.global_bias,
                          rows, cols, vals)
    assert float(jnp.sum(err * err)) == 74.0


def test_error_sums_chunked_matches_unchunked(toy_csr):
    m = ones_model(toy_csr.n_users, toy_csr.n_items)
    rows = jnp.asarray(toy_csr.row_ids)
    cols = jnp.asarray(toy_csr.indices)
    vals = jnp.asarray(toy_csr.data)
    mask = jnp.ones(toy_csr.nnz, dtype=bool)
    a = error_sums(m.P, m.Q, m.user_bias, m.item_bias, m.global_bias,
                   rows, cols, vals, mask)
    b = error_sums(m.P, m.Q, m.user_bias, m.item_bias, m.global_bias,
                   rows, cols, vals, mask, chunk_size=5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_metrics_all_ones_errors():
    # test_loss.cu:106-146: all-ones error vectors of many sizes must give
    # MAE == RMSE == 1 exactly (the grid-stride coverage test).
    for n in (1, 33, 1 << 10, 1 << 16):
        mae, rmse = metrics_from_errors(jnp.ones(n))
        # XLA CPU rewrites /n as *reciprocal(n) (fastmath), so allow 1 ulp.
        np.testing.assert_allclose(float(mae), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(rmse), 1.0, rtol=1e-6)


def test_evaluate_on_device(toy_csr):
    m = ones_model(toy_csr.n_users, toy_csr.n_items)
    dev = to_device(toy_csr)
    rmse, mae = evaluate(m, dev)
    np.testing.assert_allclose(rmse, float(np.sqrt(74.0 / 18.0)), rtol=1e-6)
    expected_mae = (4 * 3 + 2 * 3 + 1 * 3 + 3 + 1 + 1) / 18.0
    np.testing.assert_allclose(mae, expected_mae, rtol=1e-6)


def test_eval_window_span():
    from cu2rec_tpu.data.csr import eval_window_span

    # empty / degenerate
    assert eval_window_span(np.array([], dtype=np.int32), 0) == 0
    # one chunk spanning rows 3..10 → span 8
    rids = np.repeat(np.arange(3, 11, dtype=np.int32), 5)
    assert eval_window_span(rids, len(rids), chunk=1000) == 8
    # chunk=5: each 5-rating slice stays within 2 consecutive rows →
    # span 2, rounded up to 8
    assert eval_window_span(rids, len(rids), chunk=5) == 8
    # rounding: span 9 → 16
    rids = np.repeat(np.arange(9, dtype=np.int32), 2)
    assert eval_window_span(rids, len(rids), chunk=1000) == 16
    # nnz cuts off trailing rows (padding ignored)
    rids = np.array([0, 0, 1, 1, 99, 99], dtype=np.int32)
    assert eval_window_span(rids, 4, chunk=1000) == 8


def test_windowed_eval_matches_plain(toy_csr):
    """The windowed user-row path (dynamic-slice window + local gather)
    must agree with the plain gather path on both eval entry points.

    The gate needs a user table past _WINDOW_TABLE_MIN (12 MB) and a
    window strictly smaller than it, so: 26K users at W=128 (13.3 MB
    packed) with ratings confined to a 16K-user band."""
    import dataclasses

    import jax

    from cu2rec_tpu.data.csr import csr_from_arrays
    from cu2rec_tpu.ops.loss import (
        _window_span, evaluate, evaluate_packed,
    )
    from cu2rec_tpu.ops.packed import pack

    U, I, R = 26_000, 500, 40_000
    rng = np.random.default_rng(7)
    users = np.sort(rng.integers(4_000, 20_000, size=R, dtype=np.int32))
    items = rng.integers(0, I, size=R, dtype=np.int32)
    vals = rng.uniform(1.0, 5.0, size=R).astype(np.float32)
    csr = csr_from_arrays(users, items, vals, U, I)
    dev = to_device(csr)
    assert 0 < dev.eval_span <= 16_008

    key = jax.random.PRNGKey(0)
    m = MFModel(P=jax.random.normal(key, (U, 127)) * 0.1,
                Q=jax.random.normal(key, (I, 127)) * 0.1,
                user_bias=jnp.zeros(U), item_bias=jnp.zeros(I),
                global_bias=jnp.float32(3.0))
    pm = pack(m)
    assert _window_span(dev, pm.T_u.shape[0], pm.width * 4) > 0

    dev_plain = dataclasses.replace(dev, eval_span=0)  # forces plain path
    r_w, mae_w = evaluate_packed(pm, dev)
    r_p, mae_p = evaluate_packed(pm, dev_plain)
    np.testing.assert_allclose(r_w, r_p, rtol=1e-6)
    np.testing.assert_allclose(mae_w, mae_p, rtol=1e-6)
    r_w, mae_w = evaluate(m, dev)
    r_p, mae_p = evaluate(m, dev_plain)
    np.testing.assert_allclose(r_w, r_p, rtol=1e-6)
    np.testing.assert_allclose(mae_w, mae_p, rtol=1e-6)


def test_evaluate_respects_padding(toy_csr):
    m = ones_model(toy_csr.n_users, toy_csr.n_items)
    dev = to_device(toy_csr, pad_multiple=32)
    # pad_multiple is floored at 64 so pair_pack rows stay lane-aligned
    assert dev.indices.shape[0] == 64
    rmse, _ = evaluate(m, dev)
    np.testing.assert_allclose(rmse, float(np.sqrt(74.0 / 18.0)), rtol=1e-6)


def test_eval_only_upload_matches_full(toy_csr):
    """to_device(pair_pack=False) (the ALS/iALS eval-only upload — skips
    the nnz-sized sampling mirror) must evaluate identically to the full
    upload."""
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.ops.loss import evaluate_packed
    from cu2rec_tpu.ops.packed import pack

    pm = pack(init_model(toy_csr.n_users, toy_csr.n_items, 8, 3.5, seed=0))
    full = to_device(toy_csr)
    lite = to_device(toy_csr, pair_pack=False)
    assert lite.pair_pack is None
    assert lite.eval_span == full.eval_span
    r_f, m_f = evaluate_packed(pm, full)
    r_l, m_l = evaluate_packed(pm, lite)
    assert float(r_f) == float(r_l) and float(m_f) == float(m_l)
