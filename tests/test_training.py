"""Training-loop tests — parity with reference tests/test_training.cu
(convergence smoke: loss non-increasing over 10 iterations,
test_training.cu:42-45) plus plateau-decay and resume behavior."""

import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.train.trainer import eval_segments, train
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.metrics import MetricsLogger


def quiet():
    return MetricsLogger(verbose=False)


def test_eval_segments_cadence():
    # eval after iteration 1, every check_error, and the last iteration
    segs = list(eval_segments(10, 3))
    assert segs == [(1, 1), (2, 3), (3, 6), (3, 9), (1, 10)]
    segs = list(eval_segments(5, 500))
    assert segs == [(1, 1), (4, 5)]
    segs = list(eval_segments(1000, 500))
    assert segs == [(1, 1), (499, 500), (500, 1000)]


def test_convergence_smoke(toy_csr, toy_ratings):
    cfg = Config(total_iterations=10, n_factors=2, learning_rate=0.1,
                 check_error=1, patience=100)
    _, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                      logger=quiet())
    assert losses[1] >= losses[10]  # test_training.cu:42-45


def test_longer_training_reduces_rmse(toy_csr, toy_ratings):
    cfg = Config(total_iterations=200, n_factors=4, learning_rate=0.05,
                 check_error=50)
    _, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                      logger=quiet())
    assert losses[200] < 0.75 * losses[1]


def test_lr_plateau_decay(toy_csr, toy_ratings):
    # A huge LR diverges → validation RMSE worsens → decay must trigger.
    cfg = Config(total_iterations=30, n_factors=2, learning_rate=5.0,
                 check_error=2, patience=1, learning_rate_decay=0.5)
    logger = quiet()
    train(toy_csr, toy_csr, cfg, toy_ratings.global_bias, logger=logger)
    decays = [r for r in logger.history if r["event"] == "lr_decay"]
    assert decays, "plateau decay never triggered"
    assert cfg.learning_rate < 5.0


def test_cur_iterations_advances(toy_csr, toy_ratings):
    cfg = Config(total_iterations=7, n_factors=2, check_error=3)
    train(toy_csr, toy_csr, cfg, toy_ratings.global_bias, logger=quiet())
    assert cfg.cur_iterations == 7


def test_mean_collision_policy_trains(toy_csr, toy_ratings):
    cfg = Config(total_iterations=50, n_factors=2, learning_rate=0.1,
                 check_error=25, collision_policy="mean")
    _, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                      logger=quiet())
    assert losses[50] < losses[1]


def test_checkpoint_resume_roundtrip(toy_csr, toy_ratings, tmp_path):
    from cu2rec_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    cfg = Config(total_iterations=5, n_factors=2, check_error=2)
    model, _ = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                     logger=quiet())
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, model, cfg)
    model2, cfg2, _ = load_checkpoint(path)
    assert cfg2.cur_iterations == 5
    np.testing.assert_allclose(np.asarray(model2.P), np.asarray(model.P))
    np.testing.assert_allclose(np.asarray(model2.Q), np.asarray(model.Q))
    assert float(model2.global_bias) == float(model.global_bias)


def test_bfloat16_trains(toy_csr, toy_ratings):
    cfg = Config(total_iterations=20, n_factors=2, learning_rate=0.1,
                 check_error=10, dtype="bfloat16")
    model, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                          logger=quiet())
    assert model.P.dtype == jnp.bfloat16
    assert np.isfinite(losses[20])


def test_train_eval_subsample(toy_csr, toy_ratings):
    cfg = Config(total_iterations=10, n_factors=2, check_error=5,
                 train_eval_sample=8)
    _, losses = train(toy_csr, toy_csr, cfg, toy_ratings.global_bias,
                      logger=quiet())
    assert np.isfinite(losses[10])


def test_eval_segments_resume_start():
    from cu2rec_tpu.train.trainer import eval_segments
    assert list(eval_segments(10, 5)) == [(1, 1), (4, 5), (5, 10)]
    assert list(eval_segments(10, 5, start=5)) == [(5, 10)]
    assert list(eval_segments(10, 5, start=9)) == [(1, 10)]
    assert list(eval_segments(10, 5, start=10)) == []


def test_resume_skips_completed_work(toy_csr, toy_ratings):
    """A run interrupted at 5/10 and resumed trains ONLY the remaining 5
    iterations — and, because the sample streams are counter-based on the
    absolute iteration number, produces bit-identical results to the
    uninterrupted run."""
    import numpy as np
    from cu2rec_tpu.train.trainer import train
    from cu2rec_tpu.utils.config import Config
    from cu2rec_tpu.utils.metrics import MetricsLogger

    gb = toy_ratings.global_bias
    kw = dict(check_error=5, n_factors=4, learning_rate=0.05)
    full_cfg = Config(total_iterations=10, **kw)
    model_full, _ = train(toy_csr, toy_csr, full_cfg, gb,
                          logger=MetricsLogger(verbose=False))

    cfg_a = Config(total_iterations=5, **kw)
    model_a, _ = train(toy_csr, toy_csr, cfg_a, gb,
                       logger=MetricsLogger(verbose=False))
    assert cfg_a.cur_iterations == 5

    cfg_b = Config(total_iterations=10, **kw)
    cfg_b.cur_iterations = 5  # as restored from a checkpoint
    model_b, _ = train(toy_csr, toy_csr, cfg_b, gb, model=model_a,
                       logger=MetricsLogger(verbose=False))
    assert cfg_b.cur_iterations == 10  # trained exactly 5 more, not 10

    np.testing.assert_allclose(np.asarray(model_b.P),
                               np.asarray(model_full.P), atol=1e-6)
    np.testing.assert_allclose(np.asarray(model_b.Q),
                               np.asarray(model_full.Q), atol=1e-6)


def test_single_chip_mismatched_test_dims(toy_csr, toy_ratings):
    """Test split with a larger max user/item id than train: the engine
    must grow the model tables instead of silently gather-clamping eval
    row ids to the last row (same guard ShardedEngine grew in r2)."""
    from cu2rec_tpu.data.csr import CSRRatings

    extra_u = toy_csr.n_users + 2   # two users unseen in train
    extra_i = toy_csr.n_items + 1
    test_csr = CSRRatings(
        indptr=np.array([0] * (extra_u - 1) + [1, 2], np.int64),
        indices=np.array([toy_csr.n_items, 0], np.int32),
        data=np.array([4.0, 3.0], np.float32),
        n_users=extra_u, n_items=extra_i)
    cfg = Config(total_iterations=5, n_factors=2, check_error=2)
    model, losses = train(toy_csr, test_csr, cfg, toy_ratings.global_bias,
                          logger=quiet())
    assert model.P.shape[0] == extra_u
    assert model.Q.shape[0] == extra_i
    assert np.isfinite(list(losses.values())).all()


def test_engine_grows_supplied_model():
    """A caller-supplied model sized from the train split alone must be
    grown to the engine's normalized (max over train/test) dims — the
    r2 dimension guard otherwise only protected the model=None path."""
    from cu2rec_tpu.data.csr import csr_from_arrays
    from cu2rec_tpu.models.state import init_model

    train_csr = csr_from_arrays(
        np.array([0, 0, 1, 2], np.int32), np.array([0, 1, 1, 2], np.int32),
        np.array([3.0, 4.0, 5.0, 2.0], np.float32), 3, 3)
    # test split's max ids exceed train's
    test_csr = csr_from_arrays(
        np.array([3, 4], np.int32), np.array([3, 4], np.int32),
        np.array([4.0, 3.0], np.float32), 5, 5)
    model = init_model(3, 3, 4, 3.5, seed=1)
    cfg = Config(n_factors=4, total_iterations=3, check_error=10)
    out, losses = train(train_csr, test_csr, cfg, 3.5, model=model,
                        logger=MetricsLogger())
    assert out.P.shape[0] == 5 and out.Q.shape[0] == 5
    assert np.isfinite(list(losses.values())).all()


def test_stall_watchdog_heartbeat_and_silence():
    """The stall watchdog (utils/watchdog.py) prints an escalating
    heartbeat once a wrapped block exceeds its threshold — the operator
    signal for a WEDGED remote compile (blocked forever, no error, so
    the ALS tier ladder never fires; observed r4/r5) — and stays
    completely silent for fast blocks."""
    import io
    import time

    from cu2rec_tpu.utils.watchdog import stall_watchdog

    # fast block: no output, no lingering threads
    buf = io.StringIO()
    with stall_watchdog("fast thing", after_s=5.0, stream=buf):
        pass
    assert buf.getvalue() == ""

    # slow block: at least one heartbeat naming the region + the escapes
    buf = io.StringIO()
    with stall_watchdog("wedged compile", after_s=0.05, every_s=0.05,
                        stream=buf):
        time.sleep(0.35)
    out = buf.getvalue()
    assert "wedged compile" in out and "blocked for" in out
    assert "CU2REC_ALS_BUDGET" in out  # the documented escape hatch
    assert out.count("[cu2rec watchdog]") >= 2  # escalates, not one-shot

    # exception transparency: the watchdog never swallows the error
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        with stall_watchdog("raising block", after_s=60.0):
            raise RuntimeError("boom")

    # env kill-switch: every disable spelling, including the 0.0 and
    # case variants that previously slipped through (review r5)
    import os
    for off in ("0", "0.0", "-1", "off", "OFF", "False", "no", ""):
        buf = io.StringIO()
        os.environ["CU2REC_WATCHDOG"] = off
        try:
            with stall_watchdog("disabled", after_s=0.01, stream=buf):
                time.sleep(0.05)
        finally:
            del os.environ["CU2REC_WATCHDOG"]
        assert buf.getvalue() == "", f"CU2REC_WATCHDOG={off!r} not off"

    # env override: a positive number replaces the call-site threshold
    buf = io.StringIO()
    os.environ["CU2REC_WATCHDOG"] = "0.05"
    try:
        with stall_watchdog("overridden", after_s=60.0, every_s=0.05,
                            stream=buf):
            time.sleep(0.2)
    finally:
        del os.environ["CU2REC_WATCHDOG"]
    assert "overridden" in buf.getvalue()
