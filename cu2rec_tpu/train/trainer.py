"""Training orchestration — the equivalent of reference training.cu.

Reference loop shape (training.cu:107-170): one tiny ``sgd_update`` kernel
launch per iteration, driven from the host, with RMSE/MAE evaluated on the
first iteration, every ``check_error`` iterations, and the last iteration
(training.cu:118), and a learning-rate plateau scheduler (patience decrement
when validation RMSE worsens; multiply LR by ``learning_rate_decay`` at
zero; training.cu:145-155).

TPU-native redesign: the host never drives individual iterations — segments
of iterations between eval points run inside a single jitted ``lax.scan``
(one XLA program, zero per-step launch overhead, donated buffers so P/Q
update in place in HBM).  The eval cadence, plateau scheduling, metric
printing and loss bookkeeping keep the reference's observable contract,
including the stdout line format.

The host loop is engine-agnostic: a :class:`SingleChipEngine` runs the
plain jitted path, while ``cu2rec_tpu.parallel.ShardedEngine`` runs the
same semantics over a ``jax.sharding.Mesh`` via ``shard_map`` — the loop,
cadence, and scheduler are shared.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from cu2rec_tpu.data.csr import CSRRatings, DeviceRatings, to_device
from cu2rec_tpu.models.state import MFModel, init_model
from cu2rec_tpu.ops.loss import evaluate
from cu2rec_tpu.ops.sgd import (
    Hyper, apply_item_deltas, elect_winners, rotated_priority, sample_items,
    sgd_step, win_mask,
)
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.metrics import MetricsLogger


def single_step(model: MFModel, dev: DeviceRatings, hp: Hyper,
                key: jax.Array, iteration: jax.Array,
                *, train_items: bool = True,
                collision: str = "first_wins",
                rotation: int = 250) -> MFModel:
    """One full SGD iteration (all users), single-device semantics."""
    n_users = model.P.shape[0]
    n_items = model.Q.shape[0]
    items, ratings, has = sample_items(key, iteration, dev.indptr,
                                       dev.indices, dev.data)
    prio = rotated_priority(n_users, iteration, 0, n_users, rotation)
    best, cand = elect_winners(items, has, prio, n_items)
    win = win_mask(best, items, cand, has)
    P, ub, dq, dib = sgd_step(
        model.P, model.Q, model.user_bias, model.item_bias,
        model.global_bias, items, ratings, has, win, hp,
        train_items=train_items, collision=collision)
    Q, ib = model.Q, model.item_bias
    if train_items:
        Q, ib = apply_item_deltas(Q, ib, items, dq, dib)
    return MFModel(P=P, Q=Q, user_bias=ub, item_bias=ib,
                   global_bias=model.global_bias)


@partial(jax.jit, static_argnames=("train_items", "collision"),
         donate_argnames=("model",))
def run_steps(model: MFModel, dev: DeviceRatings, hp: Hyper,
              key: jax.Array, start_iter, n_steps,
              train_items: bool = True,
              collision: str = "first_wins") -> MFModel:
    """Run ``n_steps`` iterations inside one compiled loop.

    ``n_steps`` is a *dynamic* trip count (``lax.fori_loop``), so every
    segment length shares ONE compiled program — remote XLA compiles cost
    minutes on this platform, so the distinction matters a lot."""
    def body(i, m):
        it = start_iter + i
        return single_step(m, dev, hp, key, it, train_items=train_items,
                           collision=collision)

    return jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32), body, model)


def _subsample_dev(csr: CSRRatings, n_sample: int, seed: int,
                   pad_multiple: int = 128) -> DeviceRatings:
    """Random rating subsample as a DeviceRatings (train-eval speedup)."""
    import numpy as np

    from cu2rec_tpu.data.csr import eval_window_span

    rng = np.random.default_rng(seed)
    sel = np.sort(rng.choice(csr.nnz, size=n_sample, replace=False))
    padded = -(-n_sample // pad_multiple) * pad_multiple
    pad = padded - n_sample
    row_ids = csr.row_ids[sel]  # ascending: sel is sorted
    # indptr=None deliberately: the subsample's indices/data no longer
    # correspond to the full CSR's indptr, and eval never reads indptr —
    # any future caller that tries to sample from this (sample_items reads
    # indptr) fails loudly instead of reading garbage positions.
    return DeviceRatings(
        indptr=None,
        indices=jnp.asarray(np.pad(csr.indices[sel], (0, pad))),
        data=jnp.asarray(np.pad(csr.data[sel], (0, pad))),
        row_ids=jnp.asarray(np.pad(row_ids, (0, pad))),
        pair_pack=None,
        nnz=n_sample, n_users=csr.n_users, n_items=csr.n_items,
        eval_span=eval_window_span(row_ids, n_sample))


class SingleChipEngine:
    """Default execution engine: one device, plain jit.

    The engine's *state* is opaque to the host loop — here it is a
    :class:`cu2rec_tpu.ops.packed.PackedModel` (factors+bias packed into
    one lane-aligned row per user/item; see ops/packed.py for why), with
    ``prepare``/``finalize`` converting from/to the public MFModel.  Set
    ``packed=False`` to run the plain unpacked step.
    """

    def __init__(self, train_csr: CSRRatings, test_csr: CSRRatings,
                 cfg: Config, eval_chunk: int = 1 << 20,
                 packed: bool = True, lean: bool | None = None):
        # Align dimensions so evaluation of either split indexes the same
        # parameter tables (same guard as ShardedEngine; without it a test
        # CSR with a larger max id silently gather-clamps to the last row
        # and corrupts the validation RMSE driving the LR scheduler).
        from cu2rec_tpu.data.csr import normalize_csr_dims
        n_users = max(train_csr.n_users, test_csr.n_users)
        n_items = max(train_csr.n_items, test_csr.n_items)
        train_csr = normalize_csr_dims(train_csr, n_users, n_items)
        test_csr = normalize_csr_dims(test_csr, n_users, n_items)
        self.n_users = n_users
        self.n_items = n_items
        if lean is None:
            # Auto: drop the interleaved sampling mirrors (12 B/rating)
            # when the twin layout's sampling structures + step-liveness
            # estimate crowd the 16 GB HBM of one chip.  Measured at
            # Netflix F=300 (netflix_probe --factors 300 --collision
            # twin): full layout 13.2 ms/step, lean 18.1 ms/step,
            # identical results — in isolation BOTH fit, so the
            # threshold is set where the full layout's estimate plus a
            # full training journey's extra state (test split, eval
            # subsample, checkpoint staging) approaches the budget;
            # lean trades ~27% step time for 1.2 GB of headroom.
            from cu2rec_tpu.ops.packed import packed_width
            W = packed_width(cfg.n_factors)
            est = (28 * (train_csr.nnz + test_csr.nnz)
                   + 6 * 4 * W * n_users)
            lean = (cfg.collision_policy == "twin" and est > (6 << 30))
        self.lean = lean
        self.train_dev = to_device(
            train_csr, item_major=(cfg.collision_policy == "twin"),
            lean=lean)
        self.test_dev = to_device(test_csr)
        self.train_eval_dev = self.train_dev
        if cfg.train_eval_sample and train_csr.nnz > cfg.train_eval_sample:
            self.train_eval_dev = _subsample_dev(train_csr,
                                                 cfg.train_eval_sample,
                                                 cfg.seed)
        self.test_eval_dev = self.test_dev
        if cfg.test_eval_sample and test_csr.nnz > cfg.test_eval_sample:
            self.test_eval_dev = _subsample_dev(test_csr,
                                                cfg.test_eval_sample,
                                                cfg.seed + 1)
        self.cfg = cfg
        self.eval_chunk = eval_chunk
        self.key = jax.random.PRNGKey(cfg.seed)
        self.packed = packed
        if self.packed:
            from cu2rec_tpu.ops.packed import packed_run_steps
            self._runner = packed_run_steps
        else:
            self._runner = run_steps

    def init_model(self, n_users: int, n_items: int, global_bias: float,
                   Q=None, item_bias=None):
        return self.prepare(init_model(
            n_users, n_items, self.cfg.n_factors, global_bias,
            seed=self.cfg.seed, dtype=jnp.dtype(self.cfg.dtype),
            Q=Q, item_bias=item_bias))

    def prepare(self, model: MFModel):
        # Grow a caller-supplied model to the engine's normalized dims
        # (mirrors ShardedEngine.prepare's padding): a model built from
        # the train split alone may be smaller than max(train, test) ids,
        # and sampling/eval index the normalized CSRs.
        du = self.n_users - model.P.shape[0]
        di = self.n_items - model.Q.shape[0]
        if du > 0 or di > 0:
            model = MFModel(
                P=jnp.pad(model.P, ((0, max(du, 0)), (0, 0))),
                Q=jnp.pad(model.Q, ((0, max(di, 0)), (0, 0))),
                user_bias=jnp.pad(model.user_bias, (0, max(du, 0))),
                item_bias=jnp.pad(model.item_bias, (0, max(di, 0))),
                global_bias=model.global_bias)
        if self.packed:
            from cu2rec_tpu.ops.packed import pack
            return pack(model)
        return model

    def run(self, state, hp: Hyper, start_iter: int, n_steps: int):
        return self._runner(state, self.train_dev, hp, self.key,
                            jnp.int32(start_iter), n_steps,
                            bool(self.cfg.is_train),
                            self.cfg.collision_policy)

    def evaluate(self, state, split: str):
        dev = self.train_eval_dev if split == "train" else self.test_eval_dev
        if self.packed:
            from cu2rec_tpu.ops.loss import evaluate_packed
            return evaluate_packed(state, dev, self.eval_chunk)
        return evaluate(state, dev, self.eval_chunk)

    def finalize(self, state) -> MFModel:
        if self.packed:
            from cu2rec_tpu.ops.packed import unpack
            return unpack(state)
        return state


def eval_segments(total_iterations: int, check_error: int, start: int = 0):
    """Segment lengths between the reference's eval points
    (training.cu:118: eval after iteration i when (i+1)%check_error==0,
    i==0, or i is last).  Yields (n_steps, eval_iteration_1based).

    ``start`` skips completed work (resume: a run checkpointed at
    cur_iterations=4500/5000 trains only the remaining 500)."""
    points = sorted({1, total_iterations} | {
        j for j in range(check_error, total_iterations + 1, check_error)})
    prev = start
    for p in points:
        if p <= start:
            continue
        yield p - prev, p
        prev = p


def _warmup(engine, cfg: Config, model: MFModel):
    """Compile every program the loop will need before the timer starts —
    the analogue of the reference's timer excluding memcpys
    (training.cu:18-19): we exclude XLA compilation, not work."""
    from cu2rec_tpu.utils.watchdog import stall_watchdog
    hp = Hyper(jnp.float32(cfg.learning_rate), jnp.float32(cfg.P_reg),
               jnp.float32(cfg.Q_reg), jnp.float32(cfg.user_bias_reg),
               jnp.float32(cfg.item_bias_reg))
    throwaway = jax.tree.map(jnp.copy, model)
    # n_steps is a dynamic bound: one run compiles the program for every
    # segment length; run it twice so first-dispatch warmup is also paid.
    # The watchdog surfaces a WEDGED remote compile (blocked, no error,
    # no CPU — observed r4/r5) that would otherwise look like a freeze
    # at the hyperparameter banner.
    with stall_watchdog("training-step warmup compile"):
        throwaway = engine.run(throwaway, hp, 0, 1)
        throwaway = engine.run(throwaway, hp, 1, 1)
    with stall_watchdog("eval warmup compile"):
        engine.evaluate(throwaway, "train")
        engine.evaluate(throwaway, "test")


def train_with_engine(engine, cfg: Config, model: MFModel,
                      logger: MetricsLogger | None = None,
                      warmup: bool = True,
                      checkpoint_path: str | None = None,
                      checkpoint_every: int = 0):
    """The shared host loop: eval cadence + LR plateau + metrics.

    ``checkpoint_path`` + ``checkpoint_every`` (in eval points) enable
    periodic resumable checkpoints mid-run — the recovery mechanism the
    reference only had vestigially (SURVEY §5)."""
    logger = logger or MetricsLogger()
    lr = float(cfg.learning_rate)
    patience = cfg.patience
    last_validation_rmse = float("inf")
    validation_rmse = float("inf")
    losses: dict[int, float] = {}

    total = cfg.total_iterations
    start_iter = cfg.cur_iterations
    if start_iter >= total and start_iter > 0:
        # Nothing left to train (resume of a completed run) — return
        # before paying warmup's compiles + two full evals.
        model = engine.finalize(model)
        logger.log_time(0, 0.0)
        return model, losses
    if warmup:
        _warmup(engine, cfg, model)
    start_time = time.perf_counter()
    for n_steps, eval_iter in eval_segments(total, cfg.check_error,
                                            start=start_iter):
        hp = Hyper(jnp.float32(lr), jnp.float32(cfg.P_reg),
                   jnp.float32(cfg.Q_reg), jnp.float32(cfg.user_bias_reg),
                   jnp.float32(cfg.item_bias_reg))
        seg_t0 = time.perf_counter()
        model = engine.run(model, hp, cfg.cur_iterations, n_steps)
        cfg.cur_iterations += n_steps

        train_rmse, train_mae = engine.evaluate(model, "train")
        seg_dt = time.perf_counter() - seg_t0  # eval fetch syncs the run
        last_validation_rmse = validation_rmse
        validation_rmse, validation_mae = engine.evaluate(model, "test")
        n_users = getattr(engine, "n_users", None) or \
            getattr(getattr(engine, "train_dev", None), "n_users", 0)
        logger.log_eval(eval_iter, train_mae=train_mae, train_rmse=train_rmse,
                        test_mae=validation_mae, test_rmse=validation_rmse,
                        learning_rate=lr,
                        updates_per_s=round(n_users * n_steps / seg_dt, 1)
                        if n_users else None)
        losses[eval_iter] = validation_rmse

        if checkpoint_path and checkpoint_every and \
                (len(losses) % checkpoint_every == 0):
            from cu2rec_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(checkpoint_path, engine.finalize(model), cfg)

        # LR plateau decay (training.cu:145-155).
        if last_validation_rmse < validation_rmse:
            patience -= 1
        if patience <= 0:
            patience = cfg.patience
            lr *= cfg.learning_rate_decay
            cfg.learning_rate = lr
            logger.log_lr_decay(lr)

    model = engine.finalize(model)
    # device→host fetch: the only reliable completion barrier on this
    # platform (see cu2rec_tpu.utils.timing)
    from cu2rec_tpu.utils.timing import fetch_barrier
    fetch_barrier(model.P)
    elapsed = time.perf_counter() - start_time
    logger.log_time(total, elapsed)
    return model, losses


def train(train_csr: CSRRatings, test_csr: CSRRatings, cfg: Config,
          global_bias: float,
          model: MFModel | None = None,
          logger: MetricsLogger | None = None,
          eval_chunk: int = 1 << 20,
          engine=None,
          checkpoint_path: str | None = None,
          checkpoint_every: int = 0):
    """Full training — the main ``train`` overload of the reference
    (training.cu:21-204).

    Initializes the model unless a pre-loaded one is given (the fold-in
    path: training.cu:206-217 / predict.cu:126 pass pre-trained
    Q/item_bias).  Returns ``(model, losses)`` where ``losses`` maps
    1-based eval iterations to validation RMSE (the reference's ``losses``
    array, training.cu:29,158).
    """
    engine = engine or SingleChipEngine(train_csr, test_csr, cfg, eval_chunk)
    if model is None:
        # Use the engine's (dimension-normalized) sizes, not the raw train
        # CSR's — they differ when the test split has a larger max id.
        state = engine.init_model(getattr(engine, "n_users", train_csr.n_users),
                                  getattr(engine, "n_items", train_csr.n_items),
                                  global_bias)
    else:
        state = engine.prepare(model) if hasattr(engine, "prepare") else model
    return train_with_engine(engine, cfg, state, logger,
                             checkpoint_path=checkpoint_path,
                             checkpoint_every=checkpoint_every)
