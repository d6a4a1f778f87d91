"""The parallel-SGD update step — TPU-native redesign of the reference's
Hogwild CUDA kernel (matrix_factorization/sgd.cu:22-74).

Reference semantics being reproduced, per "iteration":
  * every user samples ONE uniformly random rated item from their CSR slice
    (sgd.cu:31-37) — users with no ratings are skipped (sgd.cu:30);
  * the error is computed against the *pre-step* tables; the P row and user
    bias update in place, race-free because each user owns them exclusively
    (sgd.cu:45-58, 67);
  * item-side updates collide: the reference resolves collisions by a racy
    non-atomic first-writer-wins flag into a double buffer, accepting lost
    updates "as mentioned in Hogwild" (sgd.cu:18-21, 47-63);
  * the thread→user mapping rotates by ``start_user`` each iteration so no
    user range is systematically favored as the early bird
    (sgd.cu:27, training.cu:95-98);
  * ``is_train=false`` freezes Q and item_bias entirely (fold-in,
    sgd.cu:61, 70).

TPU-native redesign (NOT a translation):
  * one fully vectorized, jit-compiled step over all users — a dense
    elementwise pass over P/user_bias plus one gather and one scatter-add on
    Q/item_bias; XLA fuses the arithmetic into the memory passes, so the
    step is HBM-bandwidth-bound, its roofline;
  * the race becomes an *election*: a deterministic scatter-min picks one
    winning user per item (the user whose rotated priority is lowest —
    the same fairness the start_user rotation aimed for), making the step
    reproducible and exactly testable, unlike test_sgd.cu:132-133 which
    could only assert "no NaNs";
  * the reference's double-buffer swap (training.cu:163-165) — which could
    silently *lose* an item's iteration-k update if the item wasn't touched
    again at k+1 — disappears: functional updates apply the winner's delta
    to the live table.  This is a deliberate semantic repair, documented
    here, not an accident of porting;
  * collisions can alternatively be *averaged* (``collision="mean"``), an
    option the CUDA design could not express;
  * sampling uses the counter-based PRNG: the uniform draw for user u at
    iteration t depends only on (seed, t, u), so any sharding of the user
    axis produces identical samples — multi-chip runs are bit-identical to
    single-chip runs by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Hyper(NamedTuple):
    """Dynamic (non-recompiling) hyperparameter scalars — the analogue of
    the reference's CUDA ``__constant__`` mirror (config.h:8-18), minus the
    re-upload on LR decay (training.cu:152): these are ordinary traced
    scalars, so decay is free."""

    learning_rate: jax.Array
    P_reg: jax.Array
    Q_reg: jax.Array
    user_bias_reg: jax.Array
    item_bias_reg: jax.Array

    @classmethod
    def from_config(cls, cfg) -> "Hyper":
        return cls(*(jnp.float32(v) for v in (
            cfg.learning_rate, cfg.P_reg, cfg.Q_reg,
            cfg.user_bias_reg, cfg.item_bias_reg)))


def _fmix32(x: jax.Array) -> jax.Array:
    """murmur3 finalizer: full-avalanche 32-bit integer mix."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _key_words(key: jax.Array):
    try:
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            kd = jax.random.key_data(key)
            return kd[..., 0].astype(jnp.uint32), kd[..., 1].astype(jnp.uint32)
    except (AttributeError, TypeError):
        pass
    kd = key.astype(jnp.uint32)
    return kd[..., 0], kd[..., 1]


def counter_uniform(key: jax.Array, iteration: jax.Array,
                    uids: jax.Array) -> jax.Array:
    """Uniform [0,1) as a pure function of (key, iteration, user id).

    A vectorized counter-based stream (two chained murmur3 finalizer
    rounds) replacing per-user ``fold_in`` threefry — ~30× cheaper on the
    VPU while keeping the property the design needs: the draw for a global
    user id is identical under any sharding of the user axis.  The
    reference used one curand state per user (sgd.cu:11-16); statistical
    (not cryptographic) quality is all item sampling needs.
    """
    k0, k1 = _key_words(key)
    it = iteration.astype(jnp.uint32) if hasattr(iteration, "astype") \
        else jnp.uint32(iteration)
    h = _fmix32(uids.astype(jnp.uint32) ^ _fmix32(it ^ k1) ^ k0)
    h = _fmix32(h + jnp.uint32(0x9E3779B9))
    # 24 high bits → exact float32 in [0, 1)
    return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2 ** -24)


GATHER_LANES = 128


def gather_1d(flat: jax.Array, pos: jax.Array) -> jax.Array:
    """Fast 1D gather: ``flat[pos]`` via a lane-aligned row gather.

    XLA TPU executes element gathers/scatters ~element-at-a-time (measured
    ~7-12 ns/elem — a 138K-element gather costs ~1.7 ms), while row
    gathers of (8,128)-tileable slabs run near memory bandwidth (the same
    element count in 128-wide rows: ~0.2 ms).  So: view the flat array as
    (N/128, 128), row-gather ``pos // 128``, and select lane ``pos % 128``
    with a one-hot reduce — all dense VPU work.

    Requires ``flat.size`` to be a multiple of 128 (callers pad; see
    ``cu2rec_tpu.data.csr.to_device``); falls back to the plain gather
    otherwise.  Out-of-range rows clamp (standard XLA gather semantics),
    matching ``flat[pos]``'s behavior for masked-out entries.
    """
    n = flat.shape[0]
    if n % GATHER_LANES != 0:
        return flat[pos]
    rows = flat.reshape(-1, GATHER_LANES)[pos // GATHER_LANES]
    onehot = (jnp.arange(GATHER_LANES, dtype=pos.dtype)
              == (pos % GATHER_LANES)[:, None])
    return jnp.sum(jnp.where(onehot, rows, 0), axis=1)


def sample_positions(key: jax.Array, iteration: jax.Array,
                     indptr: jax.Array, user_offset: int = 0):
    """Per-user sampled CSR position (the curand draw of sgd.cu:31-37).

    Counter-based: a pure function of (key, iteration, global user id), so
    identical under any sharding of the user axis.  Returns (pos, has).
    """
    start = indptr[:-1]
    length = indptr[1:] - start
    n = start.shape[0]
    uids = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(user_offset)
    u01 = counter_uniform(key, iteration, uids)
    off = jnp.minimum((u01 * length).astype(jnp.int32),
                      jnp.maximum(length - 1, 0))
    return start + off, length > 0


def fetch_pairs(pair_pack: jax.Array, pos: jax.Array):
    """(item, rating) at CSR positions ``pos`` from the interleaved pack.

    One lane-aligned row gather per position + two in-register lane
    selects — see DeviceRatings.pair_pack.  Returns (items, ratings).
    """
    rows = pair_pack[pos // 64]                       # (n, 128) int32
    lane = (pos % 64) * 2
    lanes = jnp.arange(128, dtype=pos.dtype)
    item = jnp.sum(jnp.where(lanes == lane[:, None], rows, 0), axis=1)
    rbits = jnp.sum(jnp.where(lanes == lane[:, None] + 1, rows, 0), axis=1)
    return item, jax.lax.bitcast_convert_type(rbits, jnp.float32)


def sample_items(key: jax.Array, iteration: jax.Array, indptr: jax.Array,
                 indices: jax.Array, data: jax.Array, user_offset: int = 0,
                 pair_pack: jax.Array | None = None):
    """Sample one rated item per user from the CSR slices.

    Equivalent of sgd.cu:31-37; see :func:`sample_positions`.  With
    ``pair_pack`` the (item, rating) fetch is one row gather; otherwise it
    falls back to two element gathers (via :func:`gather_1d` when padded).

    Returns (items, ratings, has_items) for the local users.
    """
    pos, has = sample_positions(key, iteration, indptr, user_offset)
    if pair_pack is not None:
        items, ratings = fetch_pairs(pair_pack, pos)
        return items, ratings, has
    return gather_1d(indices, pos), gather_1d(data, pos), has


def elect_winners(items: jax.Array, has: jax.Array, prio: jax.Array,
                  n_items: int):
    """Deterministic first-writer-wins election (replaces the racy
    ``early_bird`` flag of sgd.cu:47-50).

    ``prio`` is the rotated priority of each local user; the user with the
    minimum priority among all who sampled item y wins y.  Returns the
    per-item best priority (padded to a lane multiple so :func:`win_mask`
    can use the fast row-gather; for cross-shard ``pmin`` merging) —
    callers derive the win mask with :func:`win_mask`.
    """
    sentinel = jnp.iinfo(jnp.int32).max
    n_pad = -(-n_items // GATHER_LANES) * GATHER_LANES
    cand = jnp.where(has, prio, sentinel)
    best = jnp.full((n_pad,), sentinel, dtype=jnp.int32).at[items].min(cand)
    return best, cand


def win_mask(best: jax.Array, items: jax.Array, cand: jax.Array,
             has: jax.Array) -> jax.Array:
    return has & (gather_1d(best, items) == cand)


def sgd_step(P, Q, user_bias, item_bias, global_bias,
             items, ratings, has, win, hp: Hyper,
             *, train_items: bool = True, collision: str = "first_wins",
             q_rows=None, item_bias_rows=None):
    """One vectorized SGD update given sampled (item, rating) per user.

    All reads are against the pre-step tables (matching sgd.cu, where the
    error and every ``P_old``/``Q_old`` are read before writes land).
    Returns (P, user_bias, dQ_cols, dib_cols): the user-side tables fully
    updated, and the item-side *deltas per sampled row* (zero for losing
    users), ready for a local scatter-add or a cross-shard exchange.

    ``q_rows``/``item_bias_rows`` let callers pass pre-gathered item rows
    (the sharded path assembles them via psum); when None they are gathered
    from Q/item_bias here.
    """
    lr = hp.learning_rate
    table_dtype = P.dtype
    q = Q[items] if q_rows is None else q_rows                   # (U, F)
    ib_g = item_bias[items] if item_bias_rows is None else item_bias_rows
    # Arithmetic in float32 (bfloat16 tables upcast here, downcast on store).
    Pf = P.astype(jnp.float32)
    qf = q.astype(jnp.float32)
    ubf = user_bias.astype(jnp.float32)
    ibf = ib_g.astype(jnp.float32)
    pred = global_bias + ubf + ibf + jnp.sum(Pf * qf, axis=-1)
    err = jnp.where(has, ratings - pred, 0.0)                    # (U,)

    # User side: race-free dense update (sgd.cu:54-58, 67).
    hasf = has[:, None]
    P_new = jnp.where(hasf, Pf + lr * (err[:, None] * qf - hp.P_reg * Pf),
                      Pf).astype(table_dtype)
    ub_new = jnp.where(has, ubf + lr * (err - hp.user_bias_reg * ubf),
                       ubf).astype(table_dtype)

    if not train_items:
        # Fold-in: Q/item_bias frozen (sgd.cu:61, 70).
        return P_new, ub_new, jnp.zeros_like(q), jnp.zeros_like(ib_g)

    # Item side: per-row deltas, from the pre-step P (``P_old``).
    dq = lr * (err[:, None] * Pf - hp.Q_reg * qf)                # (U, F)
    dib = lr * (err - hp.item_bias_reg * ibf)                    # (U,)
    if collision == "first_wins":
        dq = jnp.where(win[:, None], dq, 0.0)
        dib = jnp.where(win, dib, 0.0)
    elif collision == "mean":
        # Average colliding updates instead of electing one winner.
        n_items = Q.shape[0]
        n_pad = -(-n_items // GATHER_LANES) * GATHER_LANES
        counts = jnp.zeros((n_pad,), dtype=jnp.float32).at[items].add(
            has.astype(jnp.float32))
        denom = gather_1d(jnp.maximum(counts, 1.0), items)
        dq = jnp.where(hasf, dq / denom[:, None], 0.0)
        dib = jnp.where(has, dib / denom, 0.0)
    else:
        raise ValueError(f"unknown collision policy: {collision}")
    return P_new, ub_new, dq.astype(table_dtype), dib.astype(table_dtype)


def apply_item_deltas(Q, item_bias, items, dq, dib):
    """Scatter-add the per-row item deltas into the live tables.

    With ``first_wins`` at most one row per item is nonzero, so this equals
    the reference's winner overwrite — but deterministically, and without
    the double-buffer staleness of training.cu:163-165."""
    return Q.at[items].add(dq), item_bias.at[items].add(dib)


def rotated_priority(n_users_global: int, iteration: jax.Array,
                     user_offset: int, n_local: int,
                     rotation: int = 250) -> jax.Array:
    """Priority of each local user at ``iteration``.

    Reproduces the fairness intent of the reference's
    ``start_user += 250`` rotation (training.cu:95-98, 115; sgd.cu:27):
    the election favor rotates over the user space instead of always
    favoring low thread ids."""
    start_user = (iteration * rotation) % n_users_global
    uids = jnp.arange(n_local, dtype=jnp.int32) + jnp.int32(user_offset)
    return (uids - start_user) % n_users_global
